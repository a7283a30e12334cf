"""applyInPandasWithState politeness limiter: per-host spacing must
survive ACROSS micro-batches (state-store persistence)."""

import pandas as pd


def test_stateful_politeness_across_batches(spark, tmp_path):
    from retailer_scrapers_spark.streaming.stateful import stateful_politeness

    src = str(tmp_path / "in")
    schema = "host string, url_canon string, priority double, seq long"

    def write_batch(rows, part):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode("append").parquet(src)

    write_batch([("h1.test", f"https://h1.test/{i}", 1.0, i) for i in range(3)], 0)

    stream = spark.readStream.schema(schema).parquet(src)
    out = stateful_politeness(stream, delay_ms=5000)
    q = (
        out.writeStream.format("memory")
        .queryName("sched_stateful")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
        first = spark.table("sched_stateful").toPandas()
        assert len(first) == 3
        assert sorted(first.scheduled_offset_ms) == [0, 5000, 10000]

        # batch 2 arrives later: spacing must CONTINUE from the state
        write_batch([("h1.test", f"https://h1.test/{i}", 1.0, i) for i in range(3, 5)]
                    + [("h2.test", "https://h2.test/0", 1.0, 0)], 1)
        q.processAllAvailable()
        both = spark.table("sched_stateful").toPandas()
    finally:
        q.stop()

    h1 = both[both.host == "h1.test"].sort_values("seq")
    assert sorted(h1.scheduled_offset_ms) == [0, 5000, 10000, 15000, 20000]  # carried across batches
    h2 = both[both.host == "h2.test"]
    assert list(h2.scheduled_offset_ms) == [0]  # fresh host starts at 0
    diffs = pd.Series(sorted(h1.scheduled_offset_ms)).diff().dropna()
    assert (diffs >= 5000).all()
    # ADVICE r1: a host's FIRST-EVER fetch waits 0 (batch-scheduler
    # contract); every later fetch waits the full delay
    assert list(h2.wait_ms) == [0]
    waits = h1.sort_values("scheduled_offset_ms").wait_ms.tolist()
    assert waits[0] == 0 and all(w == 5000 for w in waits[1:])
