"""R1/R2/R3 politeness, visit-window and robots operators."""

import pandas as pd
from pyspark.sql import functions as F

from retailer_scrapers_spark.operators import politeness as P
from retailer_scrapers_spark.operators.frontier import salt_hot_hosts


def _robots(spark):
    return spark.createDataFrame(
        pd.DataFrame(
            [
                {"host": "a.test", "crawl_delay_s": 5.0, "visit_start_utc": "04:00", "visit_end_utc": "08:45",
                 "disallow": ["/private", "/cart"], "user_agent": "CustomBot/1.0"},
                {"host": "b.test", "crawl_delay_s": 10.0, "visit_start_utc": None, "visit_end_utc": None,
                 "disallow": [], "user_agent": "CustomBot/1.0"},
            ]
        )
    )


def test_robots_deny_prefix(spark):
    frontier = spark.createDataFrame(
        [
            ("https://a.test/private/x", "a.test"),
            ("https://a.test/products?page=1", "a.test"),
            ("https://b.test/anything", "b.test"),
            ("https://unknown.test/x", "unknown.test"),
        ],
        "url_canon string, host string",
    )
    allowed, denied = P.robots_filter(frontier, _robots(spark).select("host", "disallow", "crawl_delay_s"))
    assert sorted(r.url_canon for r in denied.collect()) == ["https://a.test/private/x"]
    assert allowed.count() == 3  # unknown hosts allowed


def test_visit_window(spark):
    frontier = spark.createDataFrame(
        [("u1", "a.test"), ("u2", "b.test")], "url_canon string, host string"
    ).join(F.broadcast(_robots(spark).select("host", "visit_start_utc", "visit_end_utc")), "host", "left")
    inside, deferred = P.visit_window_filter(frontier, 5 * 3600)  # 05:00 → in window
    assert inside.count() == 2 and deferred.count() == 0
    inside, deferred = P.visit_window_filter(frontier, 12 * 3600)  # noon → a.test deferred
    assert [r.url_canon for r in deferred.collect()] == ["u1"]
    assert [r.url_canon for r in inside.collect()] == ["u2"]  # no window → always ok


def _schedule(spark, n=6, delay=5.0, budget=1e9, salted=False):
    rows = [(f"https://h.test/{i}", "h.test", float(10 - i), i, delay) for i in range(n)]
    df = spark.createDataFrame(rows, "url_canon string, host string, priority double, seq long, crawl_delay_s double")
    if salted:
        df = salt_hot_hosts(df, target_rows_per_task=max(n // 2, 1))
    return P.politeness_schedule(df, epoch_budget_s=budget).toPandas()


def test_schedule_spacing_single_host(spark):
    out = _schedule(spark).sort_values("scheduled_offset_ms")
    offs = out.scheduled_offset_ms.to_numpy()
    assert offs[0] == 0
    assert (offs[1:] - offs[:-1] >= 5000).all()  # ≥ crawl delay between fetches
    # priority order respected: highest priority scheduled first
    assert list(out.priority) == sorted(out.priority, reverse=True)


def test_schedule_budget_cutoff(spark):
    out = _schedule(spark, n=6, delay=5.0, budget=12.0)  # fits offsets 0, 5000, 10000
    assert out.within_budget.sum() == 3
    assert (~out.within_budget).sum() == 3


def test_salted_schedule_preserves_host_rate(spark):
    out = _schedule(spark, n=8, delay=5.0, salted=True).sort_values("scheduled_offset_ms")
    offs = out.scheduled_offset_ms.to_numpy()
    # union across salts still honors the per-host delay exactly
    assert (offs[1:] - offs[:-1] >= 5000).all() or len(set(offs)) == len(offs)
    diffs = offs[1:] - offs[:-1]
    assert (diffs >= 5000).all(), diffs


def test_schedule_deterministic(spark):
    a = _schedule(spark).sort_values("url_canon").scheduled_offset_ms.tolist()
    b = _schedule(spark).sort_values("url_canon").scheduled_offset_ms.tolist()
    assert a == b
