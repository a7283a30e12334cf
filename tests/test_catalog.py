"""K5/R8 — snapshot catalog: atomic commits, time travel, append union."""

import os
import shutil

from retailer_scrapers_spark.plans.catalog import SnapshotCatalog


def test_time_travel_and_latest(spark, tmp_path):
    cat = SnapshotCatalog(str(tmp_path), spark)
    cat.write(spark.range(3).toDF("id"), "t", 0)
    cat.write(spark.range(5).toDF("id"), "t", 1)
    assert cat.committed_epochs("t") == [0, 1]
    assert cat.latest_epoch("t") == 1
    assert cat.read("t", 0).count() == 3  # time travel (the K5 backup analogue)
    assert cat.read("t").count() == 5
    assert cat.read_meta("t", 0)["epoch"] == 0


def test_uncommitted_epoch_invisible(spark, tmp_path):
    """A snapshot without the _COMMIT marker (torn write) is never read."""
    cat = SnapshotCatalog(str(tmp_path), spark)
    cat.write(spark.range(3).toDF("id"), "t", 0)
    cat.write(spark.range(9).toDF("id"), "t", 1)
    os.remove(os.path.join(str(tmp_path), "t", "epoch=1", "_COMMIT"))  # simulate crash
    assert cat.committed_epochs("t") == [0]
    assert cat.read("t").count() == 3


def test_inprogress_dir_cleaned(spark, tmp_path):
    cat = SnapshotCatalog(str(tmp_path), spark)
    stale = os.path.join(str(tmp_path), "t", "epoch=0.inprogress")
    os.makedirs(stale)
    cat.write(spark.range(2).toDF("id"), "t", 0)
    assert not os.path.exists(stale)
    assert cat.read("t").count() == 2


def test_append_union(spark, tmp_path):
    cat = SnapshotCatalog(str(tmp_path), spark)
    cat.append_union(spark.range(2).toDF("id"), "t", 0)
    out = cat.append_union(spark.range(2, 5).toDF("id"), "t", 1)
    assert sorted(r.id for r in out.collect()) == [0, 1, 2, 3, 4]
    assert cat.read("t", 0).count() == 2  # earlier snapshot untouched


def test_append_union_replay_idempotent(spark, tmp_path):
    """ADVICE r1: a crash between a staged commit and the frontier commit
    replays the epoch; re-appending to an already-committed epoch must be
    a no-op, and an append unions from the PREVIOUS epoch, never from the
    torn one."""
    cat = SnapshotCatalog(str(tmp_path), spark)
    cat.append_union(spark.range(2).toDF("id"), "t", 0)
    cat.append_union(spark.range(2, 5).toDF("id"), "t", 1)
    # replay epoch 1 (same deterministic rows) → unchanged
    out = cat.append_union(spark.range(2, 5).toDF("id"), "t", 1)
    assert sorted(r.id for r in out.collect()) == [0, 1, 2, 3, 4]
    # next epoch unions from the latest STRICTLY EARLIER epoch
    out2 = cat.append_union(spark.range(5, 6).toDF("id"), "t", 2)
    assert sorted(r.id for r in out2.collect()) == [0, 1, 2, 3, 4, 5]


def test_compact_merges_deltas_and_reads_transparently(spark, tmp_path):
    """Delta-table maintenance: compaction folds committed deltas into
    one generation; read_all output is unchanged, superseded raw dirs
    are dropped, and later deltas stack on top."""
    import os

    cat = SnapshotCatalog(str(tmp_path), spark)
    for e in range(4):
        cat.write(spark.range(e * 10, e * 10 + 10).toDF("id"), "t", e)
    before = sorted(r.id for r in cat.read_all("t").collect())
    cat.compact("t", through=3)
    assert sorted(r.id for r in cat.read_all("t").collect()) == before
    assert not os.path.exists(str(tmp_path / "t" / "epoch=0"))  # raw deltas dropped
    assert os.path.exists(str(tmp_path / "t__compacted" / "epoch=3"))
    # new deltas after compaction read on top of the generation
    cat.write(spark.range(100, 105).toDF("id"), "t", 4)
    assert sorted(r.id for r in cat.read_all("t").collect()) == before + list(range(100, 105))
    # second compaction folds the generation + the new delta
    cat.compact("t", through=4)
    assert sorted(r.id for r in cat.read_all("t").collect()) == before + list(range(100, 105))
    assert not os.path.exists(str(tmp_path / "t__compacted" / "epoch=3"))


def test_images_delta_write_volume(spark, tmp_path):
    """VERDICT r2 #5: the images table (the 100 TB blob column) is
    delta-appended — a finalize adding 5 new images writes bytes ∝ 5
    blobs, never a rewrite of the accumulated table."""

    def dir_bytes(p):
        return sum(
            os.path.getsize(os.path.join(r, f)) for r, _, fs in os.walk(p) for f in fs
        )

    cat = SnapshotCatalog(str(tmp_path), spark)
    day1 = spark.createDataFrame(
        [(f"i{i}", bytearray(os.urandom(4000))) for i in range(50)], "image_id string, bytes binary"
    )
    cat.write(day1, "images", 0)
    # day 2: 5 new images + 50 re-fetched ones, anti-joined like finalize
    day2 = spark.createDataFrame(
        [(f"i{i}", bytearray(os.urandom(4000))) for i in range(45, 55)], "image_id string, bytes binary"
    )
    prev = cat.read_all("images", max_epoch=0)
    delta = day2.join(prev.select("image_id"), "image_id", "left_anti")
    cat.write(delta, "images", 1)
    assert cat.read("images", 1).count() == 5
    assert cat.read_all("images").count() == 55
    s0 = dir_bytes(str(tmp_path / "images" / "epoch=0"))
    s1 = dir_bytes(str(tmp_path / "images" / "epoch=1"))
    assert s1 < s0 / 2  # delta bytes ∝ new blobs, not the full table


def test_compact_respects_through_and_max_epoch(spark, tmp_path):
    cat = SnapshotCatalog(str(tmp_path), spark)
    for e in range(4):
        cat.write(spark.range(e * 10, e * 10 + 10).toDF("id"), "t", e)
    cat.compact("t", through=2)  # epoch 3 stays a raw delta
    assert sorted(r.id for r in cat.read_all("t", max_epoch=2).collect()) == list(range(30))
    assert sorted(r.id for r in cat.read_all("t").collect()) == list(range(40))
