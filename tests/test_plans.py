"""Physical-plan quality gates: these assertions pin the properties that
matter at 100 TB — predicate pushdown reaching the parquet scan, column
pruning, broadcast joins for small dims, and shuffle counts per
operator. If a refactor silently degrades a plan, these fail."""

import contextlib
import io

from pyspark.sql import functions as F


def plan_of(df, mode="formatted") -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode=mode)
    return buf.getvalue()


SF = "/root/testdata/sf0.001"


def test_filter_and_projection_pushdown(spark):
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    q = li.filter(F.col("l_shipdate") < "1996-01-01").select("l_orderkey", "l_extendedprice")
    plan = plan_of(q)
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThan(l_shipdate" in plan
    # column pruning: scan reads only the 3 referenced columns
    read_schema = [ln for ln in plan.splitlines() if "ReadSchema" in ln][0]
    assert "l_orderkey" in read_schema and "l_shipdate" in read_schema
    assert "l_comment" not in read_schema and "l_quantity" not in read_schema


def test_lookup_join_broadcasts(spark):
    from retailer_scrapers_spark.operators.joins import lookup_join

    orders = spark.read.parquet(f"{SF}/orders.parquet").select(F.col("o_custkey").alias("name"), "o_orderkey")
    cust = spark.read.parquet(f"{SF}/customer.parquet").select(F.col("c_custkey").alias("name"), "c_mktsegment")
    plan = plan_of(lookup_join(orders, cust, "name"))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_dedup_single_shuffle(spark):
    from retailer_scrapers_spark.operators.dedup import dedup_keep_promo

    li = spark.read.parquet(f"{SF}/lineitem.parquet").select(
        F.col("l_partkey").alias("name"),
        F.col("l_quantity").alias("price"),
        F.lit("No promo").alias("promotion_price"),
        F.col("l_orderkey").alias("index"),
    )
    plan = plan_of(dedup_keep_promo(li), mode="simple")
    assert plan.count("Exchange") == 1  # one hash partition by key, nothing else


def test_topk_single_shuffle_and_pushdown(spark):
    from retailer_scrapers_spark.operators.frontier import topk_per_host

    orders = spark.read.parquet(f"{SF}/orders.parquet").select(
        F.col("o_orderstatus").alias("host"), F.col("o_totalprice").alias("priority"), F.col("o_orderkey").alias("seq")
    )
    plan = plan_of(topk_per_host(orders, 3), mode="simple")
    assert plan.count("Exchange") == 1
    # rank-limit pushdown: Spark turns row_number<=k into a per-partition
    # local top-k before the shuffle (WindowGroupLimit)
    assert "WindowGroupLimit" in plan


def test_simhash_partial_aggregation(spark):
    from retailer_scrapers_spark.operators.dedup import simhash

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    plan = plan_of(simhash(docs, bits=8), mode="simple")
    # map-side combine: partial aggregation below the single exchange
    assert "HashAggregate" in plan
    assert plan.count("Exchange") == 1


def test_whole_stage_codegen_in_parsers(spark, site_df):
    from retailer_scrapers_spark.sources.parsers import parse_html_products

    q = parse_html_products(site_df.filter(F.col("payload_kind") == "html"))
    plan = plan_of(q, mode="simple")
    assert "EvalPython" not in plan  # the whole parse stage is JVM-side
    assert "Generate posexplode" in plan  # the 1→N record fan-out (S3)
    # the session runs interpreted (conftest codegen=False); flip the
    # RUNTIME conf back on just for the generated-code assertion so the
    # production default (codegen on) is what gets planned here
    spark.conf.set("spark.sql.codegen.wholeStage", "true")
    try:
        codegen = plan_of(q, mode="codegen")
        assert "WholeStageCodegen subtrees" in codegen
    finally:
        spark.conf.set("spark.sql.codegen.wholeStage", "false")


def test_session_knobs(spark):
    """The test session opts out of AQE (its synchronous per-stage-update
    plan stringification dominates KB-scale e2e wall-clock — see
    session.get_spark), and every session caps plan-string length so a
    deep epoch plan can't cost the driver seconds per explain at any
    scale. Production defaults keep AQE on; bench.py exercises that path."""
    assert spark.conf.get("spark.sql.adaptive.enabled") == "false"
    assert int(spark.conf.get("spark.sql.maxPlanStringLength")) == 64 * 1024


def test_frontier_next_has_no_full_frontier_dedup(spark, site_df, robots_df, seeds_df, tmp_path_factory):
    """VERDICT r2 #3: frontier' must not dropDuplicates the whole union —
    only the `discovered` delta can self-collide, so the dedup (a scoped
    row_number window) happens before the union and no Deduplicate node
    (the frontier-sized aggregate) appears anywhere in the plan."""
    from retailer_scrapers_spark.plans.catalog import SnapshotCatalog
    from retailer_scrapers_spark.plans.crawl import CrawlConfig, CrawlPlan

    captured = {}
    orig_write = SnapshotCatalog.write

    def spy_write(self, df, table, epoch, meta=None):
        if table == "frontier":
            captured["frontier"] = df
        return orig_write(self, df, table, epoch, meta)

    work = str(tmp_path_factory.mktemp("plan_frontier"))
    plan = CrawlPlan(spark, CrawlConfig(workdir=work, epochs=1), site_df, robots_df)
    SnapshotCatalog.write, saved = spy_write, SnapshotCatalog.write
    try:
        plan.run(seeds_df, epochs=1)
    finally:
        SnapshotCatalog.write = saved
    assert "frontier" in captured
    optimized = captured["frontier"]._jdf.queryExecution().optimizedPlan().toString()
    assert "Deduplicate" not in optimized
    # the discovered-scoped dedup window exists and is keyed by url_canon
    assert "row_number()" in optimized


def test_politeness_schedule_fully_jvm_side(spark):
    """R1 is pure window arithmetic: no Python/pandas eval node in the
    plan, and the row-level window is partitioned by (host, salt)."""
    from pyspark.sql import functions as F

    from retailer_scrapers_spark.operators.politeness import politeness_schedule

    df = spark.range(1000).select(
        F.concat(F.lit("h"), (F.col("id") % 7).cast("string")).alias("host"),
        F.lit(1.0).alias("priority"),
        F.col("id").alias("seq"),
        F.lit(5.0).alias("crawl_delay_s"),
    )
    plan = politeness_schedule(df, 100.0)._jdf.queryExecution().executedPlan().toString()
    assert "FlatMapGroupsInPandas" not in plan and "EvalPython" not in plan
    assert "windowspecdefinition(host" in plan  # partitioned, not global


def test_split_topk_backlog_is_rank_split_not_anti_join(spark):
    """VERDICT r3 #2: backlog must be the `rank > budget` complement of
    the SAME topk window — one shuffle, zero joins — not a second
    frontier-sized anti-join on url_canon."""
    from retailer_scrapers_spark.operators.frontier import split_topk_per_host

    df = spark.range(5_000).select(
        F.concat(F.lit("h"), (F.col("id") % 13).cast("string")).alias("host"),
        (F.col("id") % 97).cast("double").alias("priority"),
        F.col("id").alias("seq"),
    )
    selected, backlog = split_topk_per_host(df, 5)
    for part in (selected, backlog):
        plan = part._jdf.queryExecution().optimizedPlan().toString()
        assert "Join" not in plan, plan  # pure window + filter
        assert "row_number" in plan
    # exact complement, no overlap
    assert selected.count() + backlog.count() == df.count()
    assert selected.join(backlog, ["host", "seq"], "inner").count() == 0


def test_filter_unseen_split_dup_is_semi_over_positives(spark):
    """VERDICT r3 #3: the dup_seen metric must come from the Bloom
    probe's positives slice (LEFT SEMI over probable positives), never
    an `in_window ANTI unseen` re-shuffle of the whole frontier."""
    from retailer_scrapers_spark.operators.bloom import build_bloom, filter_unseen_split

    seen = spark.range(500).select(
        F.concat(F.lit("https://h.test/p/"), F.col("id").cast("string")).alias("url_canon")
    )
    frontier = spark.range(1_000).select(
        F.concat(F.lit("https://h.test/p/"), F.col("id").cast("string")).alias("url_canon"),
        F.lit("h.test").alias("host"),
        F.lit(0).alias("attempt"),
    )
    bloom = build_bloom(seen, m_bits=1 << 14, k_hashes=5)
    unseen, dup = filter_unseen_split(frontier, bloom, seen)
    uplan = unseen._jdf.queryExecution().optimizedPlan().toString()
    assert uplan.count("LeftAnti") == 1, uplan  # exact verify only
    dplan = dup._jdf.queryExecution().optimizedPlan().toString()
    assert "LeftAnti" not in dplan, dplan
    assert "LeftSemi" in dplan, dplan
    # exactness: the split partitions the frontier by true membership
    assert {r.url_canon for r in dup.collect()} == {
        f"https://h.test/p/{i}" for i in range(500)
    }
    assert unseen.count() == 500


def test_run_epoch_has_no_complement_anti_joins():
    """Source-level pin for the epoch loop itself (plan text re-expands
    shared subtrees, so node counting is meaningless there): the only
    left_anti joins in run_epoch are the two discovery novelty checks,
    whose probe side is the discovered DELTA, and the split operators
    are in use."""
    import inspect

    from retailer_scrapers_spark.plans.crawl import CrawlPlan

    src = inspect.getsource(CrawlPlan.run_epoch)
    # exactly four remain: the broadcast-flipped discovery novelty check
    # (anti vs the tiny matched set), its two-shuffled-anti fallback for
    # a pathological delta, and the sched_state carry decay (probe side
    # = the tiny per-(host,salt) state table). No complement anti-joins
    # over unseen/selected.
    assert src.count('"left_anti"') == 4, src.count('"left_anti"')
    assert 'unseen.join(selected' not in src and 'in_window.join(unseen' not in src
    assert "split_topk_per_host" in src
    assert "filter_unseen_split" in src
    # the novelty check's default path scans (never shuffles) the big
    # union and broadcasts only the delta (VERDICT r5 #1)
    assert 'big_keys.join(F.broadcast(d_keys), "url_canon", "left_semi")' in src


def test_frontier_next_exchange_count_bounded(spark, site_df, robots_df, seeds_df, tmp_path_factory):
    """VERDICT r4 #9: pin the shuffle shape of one epoch's frontier'
    plan so a refactor can't silently reintroduce a frontier-sized
    exchange (the r3 backlog anti-join added one per complement). Plan
    text re-expands shared subtrees, so the count is an upper BOUND
    pinned to the current shape, not a node census — any new shuffle in
    any subtree strictly increases it."""
    from retailer_scrapers_spark.plans.catalog import SnapshotCatalog
    from retailer_scrapers_spark.plans.crawl import CrawlConfig, CrawlPlan

    captured = {}
    orig_write = SnapshotCatalog.write

    def spy_write(self, df, table, epoch, meta=None):
        captured.setdefault(table, df)
        return orig_write(self, df, table, epoch, meta)

    work = str(tmp_path_factory.mktemp("plan_exchange"))
    plan = CrawlPlan(spark, CrawlConfig(workdir=work, epochs=1), site_df, robots_df)
    SnapshotCatalog.write, saved = spy_write, SnapshotCatalog.write
    try:
        plan.run(seeds_df, epochs=1)
    finally:
        SnapshotCatalog.write = saved
    phys = captured["frontier"]._jdf.queryExecution().executedPlan().toString()
    n_exchange = phys.count("Exchange")
    print(f"frontier' exchanges: {n_exchange}")
    assert n_exchange <= EXPECTED_FRONTIER_EXCHANGES, (
        f"frontier' plan grew to {n_exchange} exchanges "
        f"(pinned ≤ {EXPECTED_FRONTIER_EXCHANGES}) — a new shuffle entered the epoch loop"
    )


# measured 70 on the current epoch shape (slice-routed probe, rank-split
# top-k, prefix-sum seq, scan-side verify/novelty flip; plan text
# re-expands the frontier subtree ~5×, so each real shuffle counts
# several times — the strings also match BroadcastExchange/
# ReusedExchange, which the r6 flip ADDS while removing real
# hash-partitioning shuffles; the per-kind seen-side assertion lives in
# test_bloom.test_exact_verify_has_no_seen_side_exchange). The r3
# backlog anti-join shape measured strictly higher — any added
# per-subtree shuffle moves this by ≥5.
EXPECTED_FRONTIER_EXCHANGES = 70
