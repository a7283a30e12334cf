"""Bucketing evidence for the 100 TB story: the frontier⋈seen exact
anti-join is the epoch loop's biggest repeated shuffle. When both sides
are written bucketed by the join key (Spark's saveAsTable bucketBy —
the Iceberg bucket-partition analogue this sandbox's parquet fallback
stands in for), the join plans with NO Exchange on either side: the
shuffle happens once at write time and every later epoch reads
co-located buckets."""

import contextlib
import io

import pytest
from pyspark.sql import functions as F


def _plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode="simple")
    return buf.getvalue()


@pytest.fixture(scope="module")
def bucketed_tables(spark, tmp_path_factory):
    # warehouse.dir is a static conf; managed tables land in the session
    # default and are dropped (data included) on teardown
    spark.sql("DROP TABLE IF EXISTS frontier_b")
    spark.sql("DROP TABLE IF EXISTS seen_b")
    frontier = spark.range(20_000).select(
        F.concat(F.lit("https://h"), (F.col("id") % 97).cast("string"), F.lit(".test/p/"), F.col("id").cast("string")).alias("url_canon"),
        F.lit(1.0).alias("priority"),
    )
    seen = frontier.filter(F.xxhash64("url_canon") % 2 == 0).select("url_canon")
    frontier.write.bucketBy(16, "url_canon").sortBy("url_canon").mode("overwrite").saveAsTable("frontier_b")
    seen.write.bucketBy(16, "url_canon").sortBy("url_canon").mode("overwrite").saveAsTable("seen_b")
    yield spark.table("frontier_b"), spark.table("seen_b")
    spark.sql("DROP TABLE IF EXISTS frontier_b")
    spark.sql("DROP TABLE IF EXISTS seen_b")


def test_bucketed_anti_join_has_no_exchange(spark, bucketed_tables):
    frontier_b, seen_b = bucketed_tables
    # disable the broadcast fallback so the plan decision is bucketing's
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        unseen = frontier_b.join(seen_b, "url_canon", "left_anti")
        plan = _plan(unseen)
        assert "Exchange" not in plan, plan  # co-located: zero shuffle
        assert "SortMergeJoin" in plan and "LeftAnti" in plan
        # correctness unchanged vs the shuffling form
        n = unseen.count()
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        plain = frontier_b.join(seen_b.hint("shuffle_hash"), "url_canon", "left_anti").count()
        assert n == plain
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_unbucketed_join_shuffles_both_sides(spark, bucketed_tables):
    """Contrast: the same join over plain DataFrames exchanges both
    sides — the per-epoch cost bucketing removes."""
    frontier_b, seen_b = bucketed_tables
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        f = frontier_b.withColumn("priority", F.col("priority") + 0)  # strip bucket metadata via plain parquet round trip
        plain_f = spark.createDataFrame(frontier_b.toPandas())
        plain_s = spark.createDataFrame(seen_b.toPandas())
        plan = _plan(plain_f.join(plain_s, "url_canon", "left_anti"))
        assert plan.count("Exchange") >= 2
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
