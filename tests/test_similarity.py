"""Embedding similarity: brute-force exactness vs numpy, ANN recall,
near-dup pair detection."""

import numpy as np

from retailer_scrapers_spark.operators import similarity as S


def _vecs(n=200, d=16, seed=42):
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n, d)).astype(np.float32)


def _df(spark, vecs):
    return spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)], "vec_id long, embedding array<float>"
    )


def test_cosine_topk_matches_numpy(spark):
    vecs = _vecs()
    q = vecs[0].astype(np.float64)
    cos = (vecs @ q) / (np.linalg.norm(vecs, axis=1) * np.linalg.norm(q))
    want = list(np.argsort(-np.round(cos, 6))[:10])
    got = [r.vec_id for r in S.cosine_topk(_df(spark, vecs), list(q), k=10).collect()]
    assert got[0] == 0  # the query itself
    assert set(got) == set(int(i) for i in want)


def test_ann_lsh_recall(spark):
    vecs = _vecs(400)
    q = list(vecs[7].astype(np.float64))
    exact = {r.vec_id for r in S.cosine_topk(_df(spark, vecs), q, k=5).collect()}
    approx = {r.vec_id for r in S.ann_lsh_topk(_df(spark, vecs), q, k=5, n_planes=8, max_hamming=3).collect()}
    assert 7 in approx  # the query vector itself is always in its own bucket
    assert len(exact & approx) >= 2  # reasonable recall at this hamming radius


def test_ann_ivf_recall_and_partition(spark):
    from retailer_scrapers_spark.operators.similarity import ann_ivf_topk, ivf_assignments

    vecs = _vecs(300)
    df = _df(spark, vecs)
    assigned, centroids = ivf_assignments(df, n_cells=8, n_iters=2)
    cells = assigned.groupBy("cell").count().collect()
    assert 1 < len(cells) <= 8  # data actually partitions into cells
    assert centroids.shape == (8, 16)
    q = list(vecs[11].astype(np.float64))
    exact = {r.vec_id for r in S.cosine_topk(df, q, k=5).collect()}
    approx = {r.vec_id for r in ann_ivf_topk(df, q, k=5, n_cells=8, n_probe=3).collect()}
    assert 11 in approx  # the query's own vector is in the nearest cell
    assert len(exact & approx) >= 2


def test_embedding_near_dup_pairs(spark):
    vecs = _vecs(50)
    vecs[1] = vecs[0] + 0.001 * np.random.default_rng(1).standard_normal(16).astype(np.float32)
    vecs[10] = vecs[0] * 2.0  # same direction → cosine 1.0
    df = _df(spark, vecs)
    pairs = {(r.a, r.b): r.cosine for r in S.embedding_near_dup_pairs(df, threshold=0.98).collect()}
    assert (0, 1) in pairs and pairs[(0, 1)] > 0.99
    assert (0, 10) in pairs
    for (a, b), c in pairs.items():
        assert a < b and c >= 0.98


def test_embedding_near_dup_bucket_cap_bounds_pairs(spark):
    """VERDICT r2 #4: a near-constant-embedding corpus funnels into one
    (table, bucket) key; with bucket_cap below the corpus size no
    quadratic pair set is generated, while a distinct planted dup pair
    in a small bucket survives."""
    rng = np.random.default_rng(3)
    base = rng.standard_normal(16).astype(np.float32)
    # 40 near-identical vectors (the degenerate mega-bucket)
    vecs = [base + 1e-4 * rng.standard_normal(16).astype(np.float32) for _ in range(40)]
    # a planted pair pointing the OTHER way (its own small bucket)
    other = -base + 0.3 * rng.standard_normal(16).astype(np.float32)
    vecs += [other, other * 2.0]
    df = _df(spark, np.array(vecs))
    capped = {(r.a, r.b) for r in S.embedding_near_dup_pairs(df, threshold=0.95, n_tables=2, bucket_cap=10).collect()}
    assert (40, 41) in capped                       # planted pair survives
    assert all(a >= 40 for a, _ in capped)          # mega-bucket excluded, not exploded
    uncapped = S.embedding_near_dup_pairs(df, threshold=0.95, n_tables=2, bucket_cap=10**9).count()
    assert uncapped >= 40 * 39 / 2                  # sanity: the cap is what bounded it


def test_phash_near_dup_bucket_cap_bounds_pairs(spark):
    """Same cap for the image banded join: 30 identical-phash images
    (flat corpus) are excluded from candidate gen; a distinct lossy twin
    pair in small buckets survives."""
    from retailer_scrapers_spark.functions.images import phash64
    from retailer_scrapers_spark.operators.similarity import phash_near_dup_pairs

    rng = np.random.default_rng(9)
    flat = phash64(np.full((32, 32), 128, dtype=np.uint8))
    rows = [(f"flat_{i}", flat) for i in range(30)]
    img = rng.integers(0, 256, (32, 32), dtype=np.uint8)
    twin_hash = phash64(img)
    rows += [("twin_a", twin_hash), ("twin_b", twin_hash ^ 0b11)]  # hamming 2
    df = spark.createDataFrame(rows, "image_id string, phash long")
    capped = {(r.a, r.b) for r in phash_near_dup_pairs(df, max_hamming=6, bucket_cap=10).collect()}
    assert ("twin_a", "twin_b") in capped
    assert all(not a.startswith("flat") for a, _ in capped)
    uncapped = phash_near_dup_pairs(df, max_hamming=6, bucket_cap=10**9).count()
    assert uncapped >= 30 * 29 / 2


def test_phash_near_dup_pairs(spark):
    """Image near-dup via banded phash hamming join: lossy re-encodes of
    the same image pair up; distinct images don't."""
    from pyspark.sql import functions as F  # noqa: F401

    from retailer_scrapers_spark.functions.images import decode_image, encode_image, phash64
    from retailer_scrapers_spark.operators.similarity import phash_near_dup_pairs

    rng = np.random.default_rng(5)
    rows = []
    for i in range(20):
        img = rng.integers(0, 256, (32, 32), dtype=np.uint8)
        rows.append((f"orig_{i}", phash64(img)))
        lossy = decode_image(encode_image(img, "qjpg"), "qjpg")
        rows.append((f"lossy_{i}", phash64(lossy)))
    df = spark.createDataFrame(rows, "image_id string, phash long")
    pairs = {(r.a, r.b): r.hamming for r in phash_near_dup_pairs(df, max_hamming=6).collect()}
    # every (orig, lossy) twin found
    for i in range(20):
        key = tuple(sorted((f"orig_{i}", f"lossy_{i}")))
        assert key in pairs, key
        assert pairs[key] <= 6
    # unrelated random images rarely collide at hamming ≤ 6
    cross = [k for k in pairs if k[0].split("_")[1] != k[1].split("_")[1]]
    assert len(cross) <= 2
