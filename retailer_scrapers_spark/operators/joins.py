"""Join-shaped operators (SURVEY.md §2.7).

J1 positional zip join, J2 keyed lookup join, F5 skip-refetch
predicate, K2 merge-upsert emulation (anti-join + union — the Iceberg
``MERGE INTO`` fallback when no catalog jars are present).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

PLACEHOLDER_IMAGE_URL = "https://via.placeholder.com/300x300.png?text=No+Image"


def zip_join(
    left: DataFrame,
    right: DataFrame,
    page_col: str = "page",
    pos_col: str = "pos",
    how: str = "left",
) -> DataFrame:
    """J1 — the reference's ``zip(scraped_data, api_response)``
    (scrape_shoprite.py:354): rows pair by POSITION within a page.
    Spark never guarantees zip order across partitions, so both sides
    must carry explicit (page, pos) ordinals (produced by
    ``posexplode`` in the parse stage); the zip becomes an equi-join on
    them. Right-side columns are suffixed ``_r`` on collision."""
    rcols = [
        F.col(c).alias(f"{c}_r") if c in left.columns and c not in (page_col, pos_col) else F.col(c)
        for c in right.columns
    ]
    return left.join(right.select(*rcols), [page_col, pos_col], how)


def lookup_join(df: DataFrame, existing: DataFrame, key: str = "name", suffix: str = "_existing") -> DataFrame:
    """J2 — ``existing_data.get(name)`` dict lookup
    (scrape_shoprite.py:267) as a broadcast LEFT join. The dict's
    last-wins semantics (J4) must be applied to ``existing`` by the
    caller (``dedup.last_wins``) so the key is unique."""
    renamed = existing.select(
        F.col(key), *[F.col(c).alias(f"{c}{suffix}") for c in existing.columns if c != key]
    )
    return df.join(F.broadcast(renamed), key, "left")


def skip_refetch_flag(
    df: DataFrame,
    image_url_existing: str = "image_url_existing",
    out_col: str = "reuse_image",
    placeholder: str = PLACEHOLDER_IMAGE_URL,
) -> DataFrame:
    """F5 — skip the image pipeline when the product already has a real
    (non-placeholder) image from a prior run (scrape_shoprite.py:265-271)."""
    c = F.col(image_url_existing)
    return df.withColumn(out_col, c.isNotNull() & (c != placeholder) & (F.trim(c) != ""))


def merge_upsert(
    target: DataFrame,
    updates: DataFrame,
    keys: tuple[str, ...] = ("name", "price"),
    order_col: str = "index",
) -> DataFrame:
    """K2 — the reference's batched Postgres upsert
    (scrape_shoprite.py:463-492) as set-oriented MERGE semantics:
    last-wins dedup of updates on the key, then target rows not matched
    by any update (anti-join) unioned with all updates. With Iceberg
    jars this is a genuine ``MERGE INTO`` (plans/catalog.py); the
    emulation is exactly equivalent for full-row updates."""
    w = Window.partitionBy(*keys).orderBy(F.col(order_col).desc())
    dedup_updates = updates.withColumn("__rn", F.row_number().over(w)).filter(F.col("__rn") == 1).drop("__rn")
    untouched = target.join(dedup_updates.select(*keys).distinct(), list(keys), "left_anti")
    # string-key joins move the keys to the front — restore target order
    return untouched.select(*target.columns).unionByName(dedup_updates.select(*target.columns))
