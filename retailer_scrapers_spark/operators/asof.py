"""As-of join — Spark has no native one (pyspark guide: bucketize or
merge_asof per group); this implementation is the pure-DataFrame
union-merge form, which needs NO Python and ONE shuffle:

  1. tag both sides, union on (key, ts);
  2. window per key ordered by (ts, tag): ``last(right_value,
     ignoreNulls)`` over rows-unbounded-preceding gives every left row
     the most recent right row at-or-before its timestamp;
  3. keep the left rows.

The right side sorts ahead of left rows at equal timestamps (tag 0 < 1)
so ``ts_left == ts_right`` matches — the standard backward as-of
semantics (pandas merge_asof / DuckDB ASOF JOIN).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    value_cols: tuple[str, ...],
    how: str = "backward",
) -> DataFrame:
    """For each left row: the right row with the greatest ``right_ts`` ≤
    ``left_ts`` within the same ``key`` (backward as-of). Left columns
    are preserved; ``value_cols`` arrive from the right side (null when
    no prior right row exists)."""
    assert how == "backward", "only backward as-of is implemented"
    lcols = left.columns
    l_tagged = left.select(
        F.col(key).alias("__k"),
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__tag"),
        *[F.col(c) for c in lcols],
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"__v_{c}") for c in value_cols],
    )
    r_tagged = right.select(
        F.col(key).alias("__k"),
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__tag"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in lcols],
        *[F.col(c).alias(f"__v_{c}") for c in value_cols],
    )
    merged = l_tagged.unionByName(r_tagged)
    w = Window.partitionBy("__k").orderBy(F.col("__ts").asc(), F.col("__tag").asc()).rowsBetween(
        Window.unboundedPreceding, 0
    )
    filled = merged.select(
        "*", *[F.last(f"__v_{c}", ignorenulls=True).over(w).alias(f"__asof_{c}") for c in value_cols]
    )
    return filled.filter(F.col("__tag") == 1).select(
        *lcols, *[F.col(f"__asof_{c}").alias(c) for c in value_cols]
    )
