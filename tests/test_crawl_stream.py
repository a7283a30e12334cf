"""Composed streaming crawl: ingest → dedup → stateful schedule → catalog."""

import datetime as dt

import pandas as pd


def test_streaming_crawl_end_to_end(spark, tmp_path):
    from retailer_scrapers_spark.streaming.crawl_stream import start_streaming_crawl

    in_dir = str(tmp_path / "in")
    base = dt.datetime(2025, 8, 1, 6, 0, 0)
    rows1 = [
        (f"https://HostA.test/p/{i % 4}?utm_source=x&b=1", 1.0, base + dt.timedelta(seconds=i))
        for i in range(8)  # 4 distinct after canon+dedup
    ]
    spark.createDataFrame(rows1, "url string, priority double, discovered_ts timestamp") \
        .coalesce(1).write.mode("append").parquet(in_dir)

    q1, q2, catalog = start_streaming_crawl(spark, in_dir, str(tmp_path / "work"), delay_ms=7000)
    try:
        q1.processAllAvailable()
        q2.processAllAvailable()
        # batch 2: overlapping + new URLs on a second host
        rows2 = [
            ("https://hosta.test/p/1?b=1", 1.0, base + dt.timedelta(minutes=1)),  # dup of batch 1
            ("https://HostB.test/x", 2.0, base + dt.timedelta(minutes=1)),
        ]
        spark.createDataFrame(rows2, "url string, priority double, discovered_ts timestamp") \
            .coalesce(1).write.mode("append").parquet(in_dir)
        q1.processAllAvailable()
        q2.processAllAvailable()
    finally:
        q1.stop()
        q2.stop()

    eps = catalog.committed_epochs("scheduled_fetches")
    assert eps, "no scheduled epochs committed"
    all_sched = pd.concat([catalog.read("scheduled_fetches", e).toPandas() for e in eps], ignore_index=True)
    # dedup held across the stream: each canonical URL scheduled exactly once
    assert not all_sched.url_canon.duplicated().any()
    assert set(all_sched.url_canon) == {
        *(f"https://hosta.test/p/{i}?b=1" for i in range(4)),
        "https://hostb.test/x",
    }
    # politeness state: hosta offsets spaced ≥ 7000 ms across ALL batches
    a = sorted(all_sched[all_sched.host == "hosta.test"].scheduled_offset_ms)
    assert all(b - x >= 7000 for x, b in zip(a, a[1:]))
