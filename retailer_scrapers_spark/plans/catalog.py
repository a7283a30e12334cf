"""Snapshot catalog (SURVEY.md K1–K5, R8, §4.2.6).

The reference checkpoints by appending CSV per page and copying
``products.csv`` to ``backup/products_{ts}.csv`` daily
(scrape_shoprite.py:382-384, daily_scrape.py:32-44). The engine's
contract is Iceberg snapshot-per-epoch; this module tries Iceberg and
falls back to *versioned Parquet with a commit marker* when the
runtime jars are absent (they are in this sandbox):

    {root}/{table}/epoch={K}/part-*.parquet
    {root}/{table}/epoch={K}/_COMMIT          ← written LAST

A snapshot is visible only once ``_COMMIT`` exists, so a job killed
mid-write never exposes a torn epoch — the same atomicity Iceberg's
metadata swap provides. ``latest_epoch`` + ``read`` give time travel;
resume = read the latest committed epoch (R8).
"""

from __future__ import annotations

import json
import os
import shutil

from pyspark.sql import DataFrame, SparkSession

COMMIT_MARKER = "_COMMIT"


def _iceberg_available(spark: SparkSession) -> bool:
    try:
        spark._jvm.java.lang.Class.forName("org.apache.iceberg.spark.SparkCatalog")  # noqa: SLF001
        return True
    except Exception:
        return False


class SnapshotCatalog:
    """Versioned-Parquet snapshot store emulating Iceberg epoch snapshots."""

    def __init__(self, root: str, spark: SparkSession):
        self.root = root
        self.spark = spark
        self.iceberg = _iceberg_available(spark)
        os.makedirs(root, exist_ok=True)

    # -- paths ---------------------------------------------------------------
    def _table_dir(self, table: str) -> str:
        return os.path.join(self.root, table)

    def _epoch_dir(self, table: str, epoch: int) -> str:
        return os.path.join(self._table_dir(table), f"epoch={epoch}")

    # -- snapshots -----------------------------------------------------------
    def write(self, df: DataFrame, table: str, epoch: int, meta: dict | None = None) -> None:
        """Write one epoch snapshot atomically (data first, marker last)."""
        path = self._epoch_dir(table, epoch)
        tmp = path + ".inprogress"
        if os.path.exists(tmp):
            shutil.rmtree(tmp)
        df.write.mode("overwrite").parquet(tmp)
        if os.path.exists(path):
            shutil.rmtree(path)
        os.rename(tmp, path)
        with open(os.path.join(path, COMMIT_MARKER), "w") as f:
            json.dump({"epoch": epoch, **(meta or {})}, f)

    def committed_epochs(self, table: str) -> list[int]:
        tdir = self._table_dir(table)
        if not os.path.isdir(tdir):
            return []
        out = []
        for name in os.listdir(tdir):
            if name.startswith("epoch=") and os.path.exists(os.path.join(tdir, name, COMMIT_MARKER)):
                out.append(int(name.split("=", 1)[1]))
        return sorted(out)

    def latest_epoch(self, table: str) -> int | None:
        eps = self.committed_epochs(table)
        return eps[-1] if eps else None

    def read(self, table: str, epoch: int | None = None) -> DataFrame | None:
        """Read a committed snapshot (latest by default) — time travel."""
        if epoch is None:
            epoch = self.latest_epoch(table)
        if epoch is None:
            return None
        return self.spark.read.parquet(self._epoch_dir(table, epoch))

    def read_all(self, table: str, max_epoch: int | None = None) -> DataFrame | None:
        """Union of ALL committed epoch snapshots (optionally only those
        ``<= max_epoch``) — the read side of DELTA-APPEND tables, where
        each epoch writes only its new rows (e.g. ``seen``: per-epoch
        newly-seen URL sets, disjoint by construction). At 10^10 URLs
        this keeps the per-epoch write volume ∝ newly-seen instead of
        rewriting the whole table. ``max_epoch`` makes resume consistent
        when a crash landed between the seen commit and the frontier
        commit (the seen table may be one epoch ahead).

        Transparent to :meth:`compact`: if a compacted generation C ≤
        ``max_epoch`` exists, the read is that single snapshot plus the
        raw deltas ABOVE it — so a 10^3-epoch crawl reads O(few) files
        instead of 10^3 directories."""
        eps = self.committed_epochs(table)
        comp = [c for c in self.committed_epochs(table + "__compacted")
                if max_epoch is None or c <= max_epoch]
        parts: list[str] = []
        if comp:
            c = comp[-1]
            parts.append(self._epoch_dir(table + "__compacted", c))
            eps = [e for e in eps if e > c]
        if max_epoch is not None:
            eps = [e for e in eps if e <= max_epoch]
        parts += [self._epoch_dir(table, e) for e in eps]
        if not parts:
            return None
        return self.spark.read.parquet(*parts)

    def compact(self, table: str, through: int | None = None) -> None:
        """Iceberg-style maintenance for delta-append tables: merge the
        committed deltas ``<= through`` (plus any previous compacted
        generation) into ONE snapshot, then drop the raw delta dirs they
        replace. Crash-safe ordering: the new generation commits first
        (atomic snapshot write); cleanup of superseded dirs is last and
        idempotent — a crash in between leaves extra dirs that
        :meth:`read_all` already ignores.

        Callers must keep ``through`` at or below the oldest epoch any
        resume can cap at (CrawlPlan uses the frontier's latest
        committed epoch), else a torn-state resume could need raw
        deltas this call deletes.
        """
        ctable = table + "__compacted"
        prev = self.latest_epoch(ctable)
        eps = [e for e in self.committed_epochs(table) if prev is None or e > prev]
        if through is not None:
            eps = [e for e in eps if e <= through]
        if not eps or (prev is None and len(eps) < 2):
            return  # nothing worth merging
        parts = ([self._epoch_dir(ctable, prev)] if prev is not None else []) + [
            self._epoch_dir(table, e) for e in eps
        ]
        union = self.spark.read.parquet(*parts)
        new_gen = eps[-1]
        self.write(union, ctable, new_gen)
        # cleanup: superseded raw deltas + older compacted generations
        for e in eps:
            shutil.rmtree(self._epoch_dir(table, e), ignore_errors=True)
        if prev is not None:
            shutil.rmtree(self._epoch_dir(ctable, prev), ignore_errors=True)

    def read_meta(self, table: str, epoch: int | None = None) -> dict | None:
        if epoch is None:
            epoch = self.latest_epoch(table)
        if epoch is None:
            return None
        with open(os.path.join(self._epoch_dir(table, epoch), COMMIT_MARKER)) as f:
            return json.load(f)

    def append_union(self, df: DataFrame, table: str, epoch: int) -> DataFrame:
        """K1 append semantics: new snapshot = previous ∪ df (each epoch is
        one immutable snapshot, like an Iceberg append).

        Idempotent under epoch REPLAY (crash between a staged-table commit
        and the epoch's frontier commit, then resume re-runs the epoch):
        the union base is the latest snapshot from a STRICTLY EARLIER
        epoch, and a re-append to an already-committed epoch is a no-op
        returning the committed snapshot — the same rows are never
        appended twice.
        """
        committed = self.committed_epochs(table)
        if epoch in committed:  # replay of a committed epoch → no-op
            return self.read(table, epoch)
        prior = [e for e in committed if e < epoch]
        prev = self.read(table, prior[-1]) if prior else None
        out = prev.unionByName(df) if prev is not None else df
        self.write(out, table, epoch)
        return self.read(table, epoch)
