"""Shared fixtures: one session-scoped SparkSession + the synthetic web."""

from __future__ import annotations

import pandas as pd
import pytest

from retailer_scrapers_spark import get_spark
from retailer_scrapers_spark import schemas
from retailer_scrapers_spark.sources import synthetic_site as site_gen


@pytest.fixture(scope="session")
def spark():
    # codegen=False: at KB-sized fixtures Janino compilation (seconds per
    # novel plan shape, ~25-50 s per-JVM cold start in this sandbox)
    # dwarfs interpreted evaluation — see session.get_spark. Tests that
    # assert on generated code re-enable spark.sql.codegen.wholeStage
    # locally (it is a runtime conf).
    # aqe=False: AQE stringifies the full plan per stage update — at
    # KB fixture scale that stringification dominates e2e wall-clock
    # while coalescing buys nothing (see session.get_spark). Tests that
    # assert AQE behavior set spark.sql.adaptive.enabled locally.
    s = get_spark("rss-tests", cores=8, shuffle_partitions=8, codegen=False, aqe=False)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def site_spec():
    return site_gen.SiteSpec()


@pytest.fixture(scope="session")
def site_df(spark, site_spec):
    return spark.createDataFrame(site_gen.build_site_pages(site_spec), schemas.SITE_PAGES).cache()


@pytest.fixture(scope="session")
def corpus_pdf(site_spec) -> pd.DataFrame:
    return site_gen.build_corpus(site_spec)


@pytest.fixture(scope="session")
def corpus_df(spark, corpus_pdf):
    return spark.createDataFrame(corpus_pdf, schemas.CORPUS).cache()


@pytest.fixture(scope="session")
def robots_df(spark):
    return spark.createDataFrame(site_gen.build_robots(), schemas.ROBOTS).cache()


@pytest.fixture(scope="session")
def seeds_df(spark):
    return spark.createDataFrame(site_gen.build_seeds(), schemas.SEEDS).cache()


@pytest.fixture(scope="session")
def existing_df(spark):
    return spark.createDataFrame(site_gen.build_existing_products(), schemas.PRODUCTS).cache()


@pytest.fixture(scope="session")
def baseline_crawl_10x6(spark, site_df, robots_df, seeds_df, tmp_path_factory):
    """One uninterrupted epochs=10/per_host_budget=6 crawl, shared by the
    resume-parity, compaction-parity and sketch-parity tests — they all
    compare against this exact config, so running it three times bought
    nothing (VERDICT r3 #9: suite wall-time). Returns the workdir."""
    from retailer_scrapers_spark.plans.crawl import CrawlConfig, CrawlPlan

    work = str(tmp_path_factory.mktemp("base10x6"))
    CrawlPlan(spark, CrawlConfig(workdir=work, epochs=10, per_host_budget=6), site_df, robots_df).run(seeds_df)
    return work


@pytest.fixture(scope="session")
def resumed_crawl_10x6(spark, site_df, robots_df, seeds_df, tmp_path_factory):
    """The same config killed after epoch 2 and resumed from a FRESH
    driver — the shared interrupted counterpart of
    ``baseline_crawl_10x6``. Returns the workdir."""
    from retailer_scrapers_spark.plans.crawl import CrawlConfig, CrawlPlan

    work = str(tmp_path_factory.mktemp("resume10x6"))
    cfg = CrawlConfig(workdir=work, epochs=10, per_host_budget=6)
    CrawlPlan(spark, cfg, site_df, robots_df).run(seeds_df, epochs=2)  # "crash"
    plan2 = CrawlPlan(spark, cfg, site_df, robots_df)  # fresh driver
    assert plan2.resume_epoch() == 2
    plan2.run(seeds_df, epochs=10)
    return work


@pytest.fixture(scope="session")
def crawl_run(spark, site_df, robots_df, seeds_df, corpus_df, existing_df, tmp_path_factory):
    """One full crawl over the synthetic web, shared by e2e + golden tests."""
    from retailer_scrapers_spark.plans.crawl import CrawlConfig, CrawlPlan

    work = str(tmp_path_factory.mktemp("crawl"))
    cfg = CrawlConfig(workdir=work, epochs=10, per_host_budget=8)
    plan = CrawlPlan(spark, cfg, site_df, robots_df)
    plan.run(seeds_df)
    products = plan.finalize(corpus_df, existing_df)
    return plan, products
