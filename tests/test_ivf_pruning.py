"""Materialized ANN pruning evidence (VERDICT r3 next #5): the
embeddings table written partitioned by IVF cell prunes whole cells at
the parquet SCAN (``PartitionFilters``), and the pruned query returns
the same top-k as the in-memory IVF path. This is the similarity-side
analogue of tests/test_bucketed_join.py."""

import contextlib
import io

import pytest
from pyspark.sql import functions as F

from retailer_scrapers_spark.operators import similarity as S

N_CELLS = 8
N_PROBE = 3
SEED = 7


def _plan(df, mode="formatted") -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode=mode)
    return buf.getvalue()


@pytest.fixture(scope="module")
def emb(spark):
    df = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    return df.select("vec_id", "embedding").persist()


@pytest.fixture(scope="module")
def ivf_table(spark, emb, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("ivf") / "emb_by_cell")
    centroids = S.write_ivf_partitioned(
        emb, path, n_cells=N_CELLS, n_iters=2, seed=SEED
    )
    return path, centroids


def test_partition_pruning_in_scan_plan(spark, emb, ivf_table):
    path, centroids = ivf_table
    query = [float(x) for x in emb.select("embedding").first()[0]]
    topk = S.ann_ivf_topk_partitioned(
        spark, path, centroids, query, k=5, n_probe=N_PROBE
    )
    plan = _plan(topk)
    # the cell predicate must reach the file source as a PARTITION
    # filter (prunes directories), not a post-scan Filter
    assert "PartitionFilters" in plan, plan
    pf = [ln for ln in plan.splitlines() if "PartitionFilters" in ln]
    assert any("cell" in ln and "[]" not in ln.replace("PartitionFilters: []", "[]") for ln in pf), plan
    # and the scan actually reads fewer files than the full table
    full = spark.read.parquet(path)
    pruned_rows = spark.read.parquet(path).filter(F.col("cell").isin(
        [int(c) for c in range(N_CELLS)][:N_PROBE]  # any probe subset
    ))
    assert pruned_rows.count() < full.count()


def test_pruned_topk_matches_in_memory_path(spark, emb, ivf_table):
    path, centroids = ivf_table
    query = [float(x) for x in emb.select("embedding").first()[0]]
    got = S.ann_ivf_topk_partitioned(
        spark, path, centroids, query, k=5, n_probe=N_PROBE
    ).collect()
    want = S.ann_ivf_topk(
        emb, query, k=5, n_cells=N_CELLS, n_probe=N_PROBE, seed=SEED
    ).collect()
    assert [(r.vec_id, r.cosine) for r in got] == [(r.vec_id, r.cosine) for r in want]


def test_unpartitioned_scan_has_no_partition_filter(
    spark, emb, ivf_table, tmp_path_factory
):
    """Control: the same predicate over a FLAT copy (cell as a plain
    column) is only a rowgroup-pushed data filter — the
    directory-level pruning is the partitioned layout's doing, not the
    predicate's."""
    path, _ = ivf_table
    flat_path = str(tmp_path_factory.mktemp("ivf_flat") / "emb_flat")
    spark.read.parquet(path).write.mode("overwrite").parquet(flat_path)
    plan = _plan(spark.read.parquet(flat_path).filter(F.col("cell").isin([0, 1])))
    pf = [ln for ln in plan.splitlines() if "PartitionFilters" in ln]
    assert all("cell" not in ln for ln in pf), plan
    assert "PushedFilters" in plan and "cell" in plan.split("PushedFilters", 1)[1][:200], plan
