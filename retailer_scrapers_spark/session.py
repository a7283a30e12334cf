"""SparkSession factory tuned for this engine.

Local-mode defaults mirror what a cluster deployment would set per
executor; the knobs that matter at 100 TB (AQE, Arrow batching, shuffle
partition count, UTC session TZ for oracle parity) are pinned here.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Arrow batches carry image ``bytes`` columns; cap the rows per batch so a
# batch of ~1 MB blobs stays well under executor memory (SURVEY.md §4.2.4).
_ARROW_MAX_RECORDS = "2048"


def get_spark(
    app_name: str = "retailer_scrapers_spark",
    cores: int | str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession.

    ``cores`` accepts an int (→ ``local[n]``) or a full master string; it
    defaults to ``$SPARK_GRAFT_CPUS`` then ``local[*]``. On a real cluster
    the master comes from spark-submit and this arg is ignored there.
    """
    if cores is None:
        cores = os.environ.get("SPARK_GRAFT_CPUS", "*")
    if isinstance(cores, str) and cores.startswith(("local", "spark", "yarn", "k8s")):
        master = cores
    else:
        master = f"local[{cores}]"
    if shuffle_partitions is None:
        digits = "".join(c for c in master if c.isdigit())
        shuffle_partitions = int(digits) if digits else (os.cpu_count() or 8)

    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", _ARROW_MAX_RECORDS)
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "24g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
