"""Exactly-once streaming sink into the snapshot catalog.

``foreachBatch`` + the catalog's commit-marker atomicity gives
end-to-end exactly-once: Structured Streaming replays a failed
micro-batch with the SAME batch id, and the writer skips ids whose
snapshot already carries a ``_COMMIT`` marker — the standard
idempotent-foreachBatch pattern, here landing each micro-batch as one
catalog epoch (so the streaming frontier gets the same time travel /
resume story as the batch epoch loop).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from retailer_scrapers_spark.plans.catalog import SnapshotCatalog


def stream_to_catalog(
    stream: DataFrame,
    catalog: SnapshotCatalog,
    table: str,
    checkpoint_dir: str,
    query_name: str = "catalog_sink",
):
    """Start a streaming query writing each micro-batch as a committed
    catalog epoch (idempotent on replay). Returns the StreamingQuery."""

    def write_batch(df: DataFrame, batch_id: int) -> None:
        epoch = int(batch_id)
        if epoch in catalog.committed_epochs(table):
            return  # replayed batch — already durably committed
        catalog.write(df, table, epoch, meta={"batch_id": epoch, "streaming": True})

    return (
        stream.writeStream.foreachBatch(write_batch)
        .queryName(query_name)
        .option("checkpointLocation", checkpoint_dir)
        .start()
    )
