"""foreachBatch → SnapshotCatalog: one committed epoch per micro-batch,
idempotent on replay (exactly-once sink semantics)."""

from retailer_scrapers_spark.plans.catalog import SnapshotCatalog
from retailer_scrapers_spark.streaming.sink import stream_to_catalog


def test_stream_to_catalog_epochs_and_idempotence(spark, tmp_path):
    src = str(tmp_path / "in")
    ckpt = str(tmp_path / "ckpt")
    cat = SnapshotCatalog(str(tmp_path / "catalog"), spark)
    schema = "url string, priority double"

    spark.createDataFrame([(f"https://a.test/{i}", 1.0) for i in range(5)], schema) \
        .coalesce(1).write.mode("append").parquet(src)
    stream = spark.readStream.schema(schema).parquet(src)
    q = stream_to_catalog(stream, cat, "stream_frontier", ckpt)
    try:
        q.processAllAvailable()
        assert cat.committed_epochs("stream_frontier") == [0]
        assert cat.read("stream_frontier", 0).count() == 5

        spark.createDataFrame([(f"https://b.test/{i}", 2.0) for i in range(3)], schema) \
            .coalesce(1).write.mode("append").parquet(src)
        q.processAllAvailable()
        assert cat.committed_epochs("stream_frontier") == [0, 1]
        assert cat.read("stream_frontier", 1).count() == 3
    finally:
        q.stop()

    # restart from the same checkpoint: no duplicate epochs, new data lands
    spark.createDataFrame([("https://c.test/0", 3.0)], schema).coalesce(1).write.mode("append").parquet(src)
    q2 = stream_to_catalog(spark.readStream.schema(schema).parquet(src), cat, "stream_frontier", ckpt)
    try:
        q2.processAllAvailable()
    finally:
        q2.stop()
    eps = cat.committed_epochs("stream_frontier")
    assert eps == [0, 1, 2]
    assert cat.read("stream_frontier", 2).count() == 1
    assert cat.read_meta("stream_frontier", 2)["streaming"] is True
