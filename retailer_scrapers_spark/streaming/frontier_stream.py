"""Streaming frontier ingest (SURVEY.md §1.3 / task brief "streams").

Three composable stream stages:

- ``canonicalize_stream``   — F8 over a stream of raw URLs.
- ``dedup_stream``          — D6 as streaming state: watermarked
  ``dropDuplicates`` on ``url_canon`` (Spark keeps the seen-key state
  store per partition — the streaming analogue of the Bloom filter;
  the watermark bounds state exactly like the filter's epoch scope).
- ``host_window_metrics``   — per-host tumbling-window fetch counts
  (the metrics table of the batch plan, continuously).

All stages are source-agnostic: pass any streaming DataFrame with the
expected columns (tests use a parquet directory source; production
would use Kafka with the same code).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from retailer_scrapers_spark.functions.urls import canonicalize_urls


def canonicalize_stream(raw: DataFrame, url_col: str = "url") -> DataFrame:
    """F8 on a stream — pure column expressions, so it runs unchanged."""
    return canonicalize_urls(raw, url_col)


def dedup_stream(
    canon: DataFrame, ts_col: str = "discovered_ts", watermark: str = "10 minutes"
) -> DataFrame:
    """Streaming URL-seen dedup: exactly-once per ``url_canon`` within the
    watermark horizon. State is partitioned by the dedup key across
    executors (same partitioning story as the batch Bloom filter)."""
    return canon.withWatermark(ts_col, watermark).dropDuplicates(["url_canon"])


def host_window_metrics(
    fetched: DataFrame,
    ts_col: str = "discovered_ts",
    window: str = "5 minutes",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Per-host tumbling-window URL counts + mean priority."""
    return (
        fetched.withWatermark(ts_col, watermark)
        .groupBy(F.window(ts_col, window), "host")
        .agg(F.count(F.lit(1)).alias("n_urls"), F.round(F.avg("priority"), 6).alias("avg_priority"))
        .select(
            F.col("window.start").alias("window_start"),
            "host",
            "n_urls",
            "avg_priority",
        )
    )


def run_frontier_stream_once(
    spark,
    input_dir: str,
    schema: str = "url string, priority double, discovered_ts timestamp",
) -> tuple[DataFrame, DataFrame]:
    """Drive the full stream (ingest → canonicalize → dedup; metrics in
    parallel) to completion over the files currently in ``input_dir``
    using memory sinks; returns (deduped, metrics) as batch DataFrames.
    Used by tests and as executable documentation of the wiring."""
    raw = spark.readStream.schema(schema).parquet(input_dir)
    deduped = dedup_stream(canonicalize_stream(raw))
    metrics = host_window_metrics(canonicalize_stream(raw))

    q1 = deduped.writeStream.format("memory").queryName("frontier_dedup").outputMode("append").start()
    # complete mode: with a static file source the watermark never passes
    # the last window, so append would hold the final windows back
    q2 = metrics.writeStream.format("memory").queryName("frontier_metrics").outputMode("complete").start()
    try:
        q1.processAllAvailable()
        q2.processAllAvailable()
    finally:
        q1.stop()
        q2.stop()
    return spark.table("frontier_dedup"), spark.table("frontier_metrics")
