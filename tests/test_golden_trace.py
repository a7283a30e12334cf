"""North-rule gate: the Spark engine reproduces the reference executor's
crawl ordering and final URL-seen set EXACTLY under the same seed list
and politeness budget (SURVEY.md §2.9, §5.2)."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from tests.reference_impl.executor import RefConfig, run_reference
from retailer_scrapers_spark.sources import synthetic_site as G


@pytest.fixture(scope="module")
def golden(site_spec):
    site_rows = G.build_site_pages(site_spec).to_dict("records")
    robots_rows = G.build_robots().to_dict("records")
    seed_rows = G.build_seeds().to_dict("records")
    return run_reference(site_rows, robots_rows, seed_rows, RefConfig(epochs=10, per_host_budget=8))


def test_seen_set_exact(crawl_run, golden):
    plan, _ = crawl_run
    engine_seen = {r.url_canon for r in plan.catalog.read_all("seen").collect()}
    assert engine_seen == golden.seen


def test_crawl_ordering_exact(crawl_run, golden):
    """Per-epoch fetch order (fetch_seq), schedule offsets, attempt counts
    and ok/retry/dropped results all match the reference serialization."""
    plan, _ = crawl_run
    cat = plan.catalog
    frames = [cat.read("fetch_log", ep).toPandas() for ep in cat.committed_epochs("fetch_log")]
    engine = pd.concat(frames, ignore_index=True)
    # result labels compare RAW: the engine's fetch_log emits the
    # reference's own ok/retry/dropped fates (no translation shim)
    engine = engine.sort_values(["epoch", "fetch_seq"]).reset_index(drop=True)
    ref = pd.DataFrame(golden.trace).sort_values(["epoch", "fetch_seq"]).reset_index(drop=True)

    assert len(engine) == len(ref), f"fetch count {len(engine)} vs golden {len(ref)}"
    for col in ("epoch", "fetch_seq", "url_canon", "host", "result", "scheduled_offset_ms", "attempt"):
        mism = (engine[col].to_numpy() != ref[col].to_numpy()).nonzero()[0]
        assert len(mism) == 0, (
            f"{col}: {len(mism)} mismatches; first at {mism[:3]}:\n"
            f"engine={engine.iloc[mism[:3]][['epoch', 'fetch_seq', 'url_canon', col]].values}\n"
            f"golden={ref.iloc[mism[:3]][['epoch', 'fetch_seq', 'url_canon', col]].values}"
        )


def test_lineage_events_match(crawl_run, golden):
    """Robots denials and window/budget deferrals match the reference."""
    plan, _ = crawl_run
    cat = plan.catalog
    frames = [cat.read("metrics", ep).toPandas() for ep in cat.committed_epochs("metrics")]
    metrics = pd.concat(frames, ignore_index=True)
    ref_events = pd.DataFrame(golden.events) if golden.events else pd.DataFrame(columns=["epoch", "url_canon", "result"])
    for result in ("denied_robots", "outside_window", "deferred_budget"):
        eng_n = int(metrics[metrics.result == result].n.sum()) if len(metrics) else 0
        ref_n = int((ref_events.result == result).sum()) if len(ref_events) else 0
        assert eng_n == ref_n, (result, eng_n, ref_n)
