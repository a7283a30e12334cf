"""CSV source with the reference's encoding fallback (S9).

The reference reads its products CSV as UTF-8 and retries with latin1
on ``UnicodeDecodeError`` (scrape_shoprite.py:440-448 and clones), then
replaces NaN cells with a single space (scrape_shoprite.py:452-456).
Spark's CSV reader never throws on bad bytes — it silently mangles
them — so the fallback is made explicit here: a driver-side byte probe
picks the encoding (the same decision pandas makes), and the chosen
encoding is passed to the distributed read. Probing is O(probe_bytes)
per file, not O(data); at scale pass ``encoding=`` explicitly to skip
the probe entirely.
"""

from __future__ import annotations

import glob
import os

from pyspark.sql import DataFrame, SparkSession


def detect_csv_encoding(path: str, probe_bytes: int = 1 << 20) -> str:
    """utf-8 unless any file's leading bytes fail strict UTF-8 decode —
    then latin1 (which never fails), mirroring the reference's retry."""
    files = sorted(glob.glob(os.path.join(path, "*.csv"))) if os.path.isdir(path) else [path]
    for f in files:
        size = os.path.getsize(f)
        with open(f, "rb") as fh:
            chunk = fh.read(probe_bytes)
        try:
            chunk.decode("utf-8")
        except UnicodeDecodeError as e:
            # a multi-byte char truncated at the probe boundary is not
            # evidence of latin1 — only errors inside the chunk count
            if size > len(chunk) and e.start >= len(chunk) - 3:
                continue
            return "latin1"
    return "utf-8"


def read_products_csv(
    spark: SparkSession,
    path: str,
    schema=None,
    encoding: str | None = None,
) -> DataFrame:
    """S9 — header CSV read with utf-8 → latin1 fallback and the
    reference's NaN → ' ' fill. ``schema`` defaults to all-string
    inference off (pass ``schemas.PRODUCTS`` for the products table)."""
    enc = encoding or detect_csv_encoding(path)
    # JVM charset registry knows ISO-8859-1, not python's "latin1" alias
    jvm_enc = "ISO-8859-1" if enc.lower() in ("latin1", "latin-1") else enc
    reader = spark.read.option("header", True).option("encoding", jvm_enc)
    df = reader.schema(schema).csv(path) if schema is not None else reader.csv(path)
    return df.na.fill(" ")
