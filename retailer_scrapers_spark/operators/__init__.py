"""Relational + custom operators (SURVEY.md §2.5–§2.8).

Each operator is a DataFrame→DataFrame function; custom physical work
(membership filters, politeness scheduling) lives in Arrow-vectorized
grouped/partition UDFs per SURVEY.md §4.2 — no custom Catalyst rules.
"""
