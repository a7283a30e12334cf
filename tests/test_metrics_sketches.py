"""VERDICT r2 #7 — HLL + t-digest as CHECKPOINTED crawl metrics: one
``metrics_sketches`` delta per epoch, cross-epoch merge, resume parity,
and estimates consistent with the exact counts the crawl also records."""

import re

import numpy as np
from pyspark.sql import functions as F

from retailer_scrapers_spark.plans.catalog import SnapshotCatalog
from retailer_scrapers_spark.plans.crawl import CrawlConfig, CrawlPlan
from retailer_scrapers_spark.plans.metrics import merged_sketches


def test_metrics_sketches_written_per_epoch(crawl_run):
    plan, _ = crawl_run
    cat: SnapshotCatalog = plan.catalog
    eps = cat.committed_epochs("metrics_sketches")
    assert eps == cat.committed_epochs("fetch_log")  # one delta per crawl epoch
    df = cat.read_all("metrics_sketches")
    assert set(df.columns) == {"host", "kind", "sketch", "epoch"}
    kinds = {r.kind for r in df.select("kind").distinct().collect()}
    assert kinds == {"hll_urls", "tdigest_wait_ms"}


def test_hll_estimates_match_exact_touched_counts(crawl_run):
    """Merged per-host HLL ≈ exact distinct URLs the crawl touched per
    host (recoverable from the seen table, whose URLs embed the host)."""
    plan, _ = crawl_run
    merged = merged_sketches(plan.catalog)
    seen = plan.catalog.read_all("seen").collect()
    exact: dict[str, int] = {}
    for r in seen:
        host = re.match(r"https?://([^/]+)/", r.url_canon).group(1)
        exact[host] = exact.get(host, 0) + 1
    for host, n in exact.items():
        assert host in merged["hll_urls"], host
        est = merged["hll_urls"][host].estimate()
        # hll_urls counts TOUCHED urls ⊇ seen urls; at p=12 the error on
        # these cardinalities is ≈1.6%, so a ±10% fence is conservative
        assert est >= n * 0.9, (host, est, n)
        assert est <= n * 1.5, (host, est, n)


def test_tdigest_wait_quantiles_sane(crawl_run):
    """Merged per-host wait t-digest spans the actual fetch-log waits."""
    plan, _ = crawl_run
    merged = merged_sketches(plan.catalog)
    cat = plan.catalog
    waits: dict[str, list] = {}
    for ep in cat.committed_epochs("fetch_log"):
        for r in cat.read("fetch_log", ep).select("host", "wait_ms").collect():
            waits.setdefault(r.host, []).append(r.wait_ms)
    for host, vals in waits.items():
        td = merged["tdigest_wait_ms"][host]
        assert td.n == len(vals)
        lo, hi = min(vals), max(vals)
        for q in (0.1, 0.5, 0.95):
            est = td.quantile(q)
            assert lo <= est <= hi, (host, q, est)
        # median within the exact interquartile neighbourhood
        assert abs(td.quantile(0.5) - float(np.percentile(vals, 50))) <= (hi - lo) * 0.25 + 1e-9


def test_sketches_resume_merge_matches_one_shot(spark, site_df, robots_df, seeds_df, tmp_path_factory):
    """R8 for the sketches: crash after epoch 2 + resume produces the
    SAME merged per-host sketches as an uninterrupted run (per-epoch
    deltas are deterministic; merges are associative + idempotent)."""
    w1 = str(tmp_path_factory.mktemp("sk_a"))
    w2 = str(tmp_path_factory.mktemp("sk_b"))
    CrawlPlan(spark, CrawlConfig(workdir=w1, epochs=10, per_host_budget=6), site_df, robots_df).run(seeds_df)
    cfg2 = CrawlConfig(workdir=w2, epochs=10, per_host_budget=6)
    CrawlPlan(spark, cfg2, site_df, robots_df).run(seeds_df, epochs=2)
    CrawlPlan(spark, cfg2, site_df, robots_df).run(seeds_df, epochs=10)  # resume

    m1 = merged_sketches(SnapshotCatalog(w1, spark))
    m2 = merged_sketches(SnapshotCatalog(w2, spark))
    assert set(m1["hll_urls"]) == set(m2["hll_urls"])
    for host in m1["hll_urls"]:
        assert np.array_equal(m1["hll_urls"][host].registers, m2["hll_urls"][host].registers), host
    assert set(m1["tdigest_wait_ms"]) == set(m2["tdigest_wait_ms"])
    for host in m1["tdigest_wait_ms"]:
        a, b = m1["tdigest_wait_ms"][host], m2["tdigest_wait_ms"][host]
        assert a.n == b.n, host
        for q in (0.05, 0.5, 0.95):
            assert abs(a.quantile(q) - b.quantile(q)) < 1e-9, (host, q)
