"""Second golden-trace config: the exact-ordering/seen-set parity must
hold under a DIFFERENT politeness budget, not just the default one
(guards against accidentally fitting the serialization to one config)."""

import pandas as pd
import pytest

from retailer_scrapers_spark.plans.crawl import CrawlConfig, CrawlPlan
from retailer_scrapers_spark.sources import synthetic_site as G
from tests.reference_impl.executor import RefConfig, run_reference


@pytest.fixture(scope="module")
def alt_runs(spark, site_df, robots_df, seeds_df, site_spec, tmp_path_factory):
    work = str(tmp_path_factory.mktemp("crawl_alt"))
    cfg = CrawlConfig(workdir=work, epochs=6, per_host_budget=3)
    plan = CrawlPlan(spark, cfg, site_df, robots_df)
    plan.run(seeds_df)
    golden = run_reference(
        G.build_site_pages(site_spec).to_dict("records"),
        G.build_robots().to_dict("records"),
        G.build_seeds().to_dict("records"),
        RefConfig(epochs=6, per_host_budget=3),
    )
    return plan, golden


def test_alt_seen_set_exact(alt_runs):
    plan, golden = alt_runs
    engine_seen = {r.url_canon for r in plan.catalog.read_all("seen").collect()}
    assert engine_seen == golden.seen
    # with budget 3 × 6 epochs the crawl must NOT have finished — the
    # partial-progress state is what this config exercises
    assert not plan.catalog.read("frontier").isEmpty()
    assert golden.frontier_left > 0


def test_alt_ordering_exact(alt_runs):
    plan, golden = alt_runs
    cat = plan.catalog
    engine = pd.concat(
        [cat.read("fetch_log", ep).toPandas() for ep in cat.committed_epochs("fetch_log")],
        ignore_index=True,
    ).sort_values(["epoch", "fetch_seq"]).reset_index(drop=True)
    ref = pd.DataFrame(golden.trace).sort_values(["epoch", "fetch_seq"]).reset_index(drop=True)
    assert len(engine) == len(ref)
    for col in ("epoch", "fetch_seq", "url_canon", "scheduled_offset_ms", "attempt"):
        assert (engine[col].to_numpy() == ref[col].to_numpy()).all(), col
