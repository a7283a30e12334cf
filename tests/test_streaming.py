"""Structured Streaming frontier ops driven to completion over files."""

import datetime as dt

import pytest


@pytest.fixture(scope="module")
def stream_input(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("stream_in"))
    base = dt.datetime(2025, 8, 1, 6, 0, 0)
    rows = []
    for i in range(200):
        rows.append(
            (
                f"https://Host{i % 5}.test/p/{i % 60}?utm_source=k&b=2&a=1#x",  # dups: i%60
                1.0 + (i % 3),
                base + dt.timedelta(seconds=13 * i),
            )
        )
    df = spark.createDataFrame(rows, "url string, priority double, discovered_ts timestamp")
    df.coalesce(2).write.mode("overwrite").parquet(d)
    return d


def test_stream_dedup_and_metrics(spark, stream_input):
    from retailer_scrapers_spark.streaming.frontier_stream import run_frontier_stream_once

    deduped, metrics = run_frontier_stream_once(spark, stream_input)
    got = deduped.collect()
    # every url_canon exactly once; canonicalization applied (utm stripped, host lowered)
    canons = [r.url_canon for r in got]
    assert len(canons) == len(set(canons))
    assert all("utm_" not in c and "#" not in c for c in canons)
    assert all(c.startswith("https://host") for c in canons)
    # 5 hosts × distinct paths; 60 distinct (i%60) urls map across 5 hosts
    assert len(canons) == 60

    m = metrics.collect()
    assert len(m) > 0
    assert {r.host for r in m} == {f"host{i}.test" for i in range(5)}
    assert all(r.n_urls > 0 for r in m)
