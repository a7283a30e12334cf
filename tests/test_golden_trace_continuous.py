"""Third golden-trace config (VERDICT r1 #9): CONTINUOUS politeness —
the stateful streaming scheduler's cross-epoch spacing composed into the
batch epoch loop — over a LARGER SiteSpec (higher fanout), with an epoch
budget small enough that the carry-over actually engages. Exact parity
of fetch ordering, schedule offsets, and the final seen set vs the
pure-Python reference executor."""

import pandas as pd
import pytest

from retailer_scrapers_spark.plans.crawl import CrawlConfig, CrawlPlan
from retailer_scrapers_spark.sources import synthetic_site as G
from tests.reference_impl.executor import RefConfig, run_reference

# bigger site than the shared fixture: more pages + categories → higher
# discovery fanout per epoch
BIG_SPEC = G.SiteSpec(
    pages={"shoprite.test": 10, "checkers.test": 9, "pnp.test": 7},
    wool_pages_per_category=3,
)
# budget 25 s: woolworths' 4 category seeds at 10 s delay fill the
# window (offsets 0/10/20, the 4th overflows) and leave 5 s of owed
# wait — epoch 1 starts its first woolworths fetch at offset 5000
BUDGET_S = 25.0


@pytest.fixture(scope="module")
def cont_runs(spark, robots_df, seeds_df, tmp_path_factory):
    from retailer_scrapers_spark import schemas

    site_pdf = G.build_site_pages(BIG_SPEC)
    site_df = spark.createDataFrame(site_pdf, schemas.SITE_PAGES)
    work = str(tmp_path_factory.mktemp("crawl_cont"))
    cfg = CrawlConfig(
        workdir=work, epochs=8, per_host_budget=9,
        epoch_budget_s=BUDGET_S, politeness_mode="continuous",
    )
    plan = CrawlPlan(spark, cfg, site_df, robots_df)
    plan.run(seeds_df)
    golden = run_reference(
        site_pdf.to_dict("records"),
        G.build_robots().to_dict("records"),
        G.build_seeds().to_dict("records"),
        RefConfig(epochs=8, per_host_budget=9, epoch_budget_s=BUDGET_S, politeness_mode="continuous"),
    )
    return plan, golden


def test_carry_actually_engages(cont_runs):
    """Guard: the config must exercise cross-epoch carry, or this golden
    config proves nothing beyond the other two."""
    plan, golden = cont_runs
    logs = []
    for ep in plan.catalog.committed_epochs("fetch_log"):
        logs.append(plan.catalog.read("fetch_log", ep).toPandas())
    log = pd.concat(logs)
    first_waits = log.sort_values("scheduled_offset_ms").groupby(["epoch", "host"]).first()
    assert (first_waits.wait_ms > 0).any(), "no epoch started with owed wait — weak config"
    assert plan.catalog.committed_epochs("sched_state"), "sched_state never checkpointed"


def test_continuous_seen_set_exact(cont_runs):
    plan, golden = cont_runs
    engine_seen = {r.url_canon for r in plan.catalog.read_all("seen").collect()}
    assert engine_seen == golden.seen


def test_continuous_ordering_and_offsets_exact(cont_runs):
    plan, golden = cont_runs
    rows = []
    for ep in plan.catalog.committed_epochs("fetch_log"):
        rows.append(plan.catalog.read("fetch_log", ep).toPandas())
    engine = (
        pd.concat(rows)
        .sort_values(["epoch", "fetch_seq"])
        [["epoch", "fetch_seq", "url_canon", "scheduled_offset_ms", "attempt"]]
        .reset_index(drop=True)
    )
    ref = (
        pd.DataFrame(golden.trace)
        .sort_values(["epoch", "fetch_seq"])
        [["epoch", "fetch_seq", "url_canon", "scheduled_offset_ms", "attempt"]]
        .reset_index(drop=True)
    )
    assert len(engine) == len(ref)
    pd.testing.assert_frame_equal(engine.astype(str), ref.astype(str))
