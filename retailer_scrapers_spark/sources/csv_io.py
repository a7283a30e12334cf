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

import codecs
import glob
import os

from pyspark.sql import DataFrame, SparkSession


def detect_csv_encoding(
    path: str, probe_bytes: int = 1 << 20, full_probe_cap: int = 1 << 28
) -> str:
    """utf-8 unless a strict UTF-8 decode fails — then latin1 (which
    never fails), mirroring the reference's retry.

    Files up to ``full_probe_cap`` (256 MB) are stream-decoded in FULL,
    exactly like the reference's whole-file ``read_csv`` attempt — a
    latin1 byte anywhere in the file triggers the fallback (ADVICE r2:
    the old 1 MB probe misclassified late bytes). Larger files probe
    only the leading ``probe_bytes``, a documented approximation: at
    that size pass ``encoding=`` explicitly. A multi-byte char split at
    a chunk or probe boundary is carried by the incremental decoder —
    never misread as evidence of latin1; at the probe limit the read
    extends a few bytes to settle any split char.
    """
    files = sorted(glob.glob(os.path.join(path, "*.csv"))) if os.path.isdir(path) else [path]
    for f in files:
        size = os.path.getsize(f)
        limit = size if size <= full_probe_cap else probe_bytes
        dec = codecs.getincrementaldecoder("utf-8")()
        read = 0
        try:
            with open(f, "rb") as fh:
                while read < limit:
                    chunk = fh.read(min(1 << 20, limit - read))
                    if not chunk:
                        break
                    read += len(chunk)
                    dec.decode(chunk, final=False)
                if read >= size:
                    dec.decode(b"", final=True)  # truncated char at EOF = invalid
                else:
                    # probe-limited: extend past the boundary so a split
                    # multi-byte char can complete (or prove invalid)
                    dec.decode(fh.read(8), final=False)
        except UnicodeDecodeError:
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
