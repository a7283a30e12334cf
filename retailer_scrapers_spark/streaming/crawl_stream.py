"""The composed streaming crawl: continuous frontier ingest end-to-end.

Two chained streaming queries, decoupled through storage (the
production-realistic shape — each stage restarts/rescales alone, and
Spark's one-stateful-operator-per-query guidance stays satisfied):

  stage 1: raw URL stream → canonicalize (F8) → watermarked
           dropDuplicates (D6 streaming state) → parquet frontier dir
  stage 2: frontier dir stream → per-host stateful politeness
           (applyInPandasWithState, R1 with cross-batch state) →
           exactly-once snapshot-catalog sink (one epoch per batch)

The batch epoch loop (plans/crawl.py) remains the primary engine; this
is the continuous variant for deployments where outlinks arrive as a
stream.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

from retailer_scrapers_spark.plans.catalog import SnapshotCatalog
from retailer_scrapers_spark.streaming.frontier_stream import canonicalize_stream, dedup_stream
from retailer_scrapers_spark.streaming.sink import stream_to_catalog
from retailer_scrapers_spark.streaming.stateful import stateful_politeness

RAW_SCHEMA = "url string, priority double, discovered_ts timestamp"


def start_streaming_crawl(
    spark: SparkSession,
    in_dir: str,
    work_dir: str,
    delay_ms: int = 5000,
    watermark: str = "10 minutes",
):
    """Start both stages; returns (q1, q2, catalog). Callers drive with
    ``processAllAvailable()`` (tests) or leave running (production)."""
    frontier_dir = os.path.join(work_dir, "frontier_dedup")
    os.makedirs(frontier_dir, exist_ok=True)
    catalog = SnapshotCatalog(os.path.join(work_dir, "catalog"), spark)

    raw = spark.readStream.schema(RAW_SCHEMA).parquet(in_dir)
    deduped = dedup_stream(canonicalize_stream(raw), watermark=watermark)
    q1 = (
        deduped.select("url_canon", "host", "priority", "discovered_ts")
        .writeStream.format("parquet")
        .option("path", frontier_dir)
        .option("checkpointLocation", os.path.join(work_dir, "ckpt_dedup"))
        .outputMode("append")
        .queryName("crawl_stream_dedup")
        .start()
    )

    frontier = spark.readStream.schema(
        "url_canon string, host string, priority double, discovered_ts timestamp"
    ).parquet(frontier_dir)
    scheduled = stateful_politeness(
        frontier.withColumn("seq", frontier.discovered_ts.cast("long")).select(
            "host", "url_canon", "priority", "seq"
        ),
        delay_ms=delay_ms,
    )
    q2 = stream_to_catalog(
        scheduled, catalog, "scheduled_fetches", os.path.join(work_dir, "ckpt_sched"), "crawl_stream_sched"
    )
    return q1, q2, catalog
