"""Scalar column-expression library (SURVEY.md §2.3, §2.4).

Everything here is built from ``pyspark.sql.functions`` (JVM-side,
whole-stage-codegen'd) wherever the semantics allow; Arrow-vectorized
pandas UDFs appear only for unicodedata normalization and the image
codec, per ``BASELINE.json.input_hint`` (no per-row Python).
"""
