"""D6 — partitioned Bloom URL-seen filter: no false negatives, bounded
fpp, driver merge, and exact unseen-set semantics via the prefilter."""

import numpy as np
from pyspark.sql import functions as F

from retailer_scrapers_spark.operators.bloom import (
    BloomFilter,
    build_bloom,
    filter_unseen,
    probe_bloom,
)


def test_no_false_negatives_and_fpp():
    bf = BloomFilter.for_capacity(10_000, fpp=1e-3)
    rng = np.random.default_rng(42)
    h1 = rng.integers(-(2**62), 2**62, 10_000, dtype=np.int64)
    h2 = rng.integers(-(2**62), 2**62, 10_000, dtype=np.int64)
    bf.add_hashes(h1, h2)
    assert bf.contains_hashes(h1, h2).all()  # membership property
    q1 = rng.integers(-(2**62), 2**62, 50_000, dtype=np.int64)
    q2 = rng.integers(-(2**62), 2**62, 50_000, dtype=np.int64)
    fp_rate = bf.contains_hashes(q1, q2).mean()
    assert fp_rate < 5e-3, fp_rate


def test_serialize_roundtrip_and_merge():
    a = BloomFilter(1 << 12, 5)
    b = BloomFilter(1 << 12, 5)
    a.add_hashes(np.array([1, 2, 3]), np.array([9, 8, 7]))
    b.add_hashes(np.array([100]), np.array([200]))
    rt = BloomFilter.deserialize(a.serialize())
    assert np.array_equal(rt.bits, a.bits) and rt.k == a.k and rt.n_items == 3
    a.merge(b)
    assert a.contains_hashes(np.array([100]), np.array([200]))[0]
    assert a.n_items == 4


def test_build_probe_distributed(spark):
    urls = [(f"https://h{i % 7}.test/p/{i}",) for i in range(2000)]
    df = spark.createDataFrame(urls, "url_canon string").repartition(8)
    bf = build_bloom(df, m_bits=1 << 16, k_hashes=7)
    assert bf.n_items == 2000
    probed = probe_bloom(df, bf)
    assert probed.filter(~F.col("__maybe_seen")).count() == 0  # no false negatives
    fresh = spark.createDataFrame([(f"https://new.test/{i}",) for i in range(2000)], "url_canon string")
    fp = probe_bloom(fresh, bf).filter(F.col("__maybe_seen")).count()
    assert fp < 2000 * 0.02


def test_filter_unseen_exact(spark):
    seen_urls = [(f"https://s.test/{i}",) for i in range(500)]
    seen = spark.createDataFrame(seen_urls, "url_canon string")
    bf = build_bloom(seen, m_bits=1 << 14, k_hashes=5)
    frontier = spark.createDataFrame(
        seen_urls[:100] + [(f"https://f.test/{i}",) for i in range(300)], "url_canon string"
    )
    out = filter_unseen(frontier, bf, seen)
    got = sorted(r.url_canon for r in out.collect())
    assert got == sorted(f"https://f.test/{i}" for i in range(300))  # EXACT despite Bloom fpp


def test_sliced_build_equivalent_and_state_roundtrip(spark):
    """Key-space-sliced build (the O(m)-total scale path) has the same
    membership semantics, and its per-slice checkpoint rows round-trip."""
    import numpy as np

    from retailer_scrapers_spark.operators.bloom import filter_from_state_rows, filter_state_rows

    urls = spark.createDataFrame([(f"https://h{i % 5}.test/{i}",) for i in range(3000)], "url_canon string")
    bf = build_bloom(urls, m_bits=1 << 16, k_hashes=7, n_slices=8)
    assert bf.n_slices == 8 and bf.n_items == 3000
    assert probe_bloom(urls, bf).filter(~F.col("__maybe_seen")).count() == 0  # no FN
    fresh = spark.createDataFrame([(f"https://x.test/{i}",) for i in range(3000)], "url_canon string")
    assert probe_bloom(fresh, bf).filter(F.col("__maybe_seen")).count() < 90
    rt = filter_from_state_rows(filter_state_rows(bf))
    assert np.array_equal(rt.bits, bf.bits) and (rt.m_bits, rt.k, rt.n_slices) == (bf.m_bits, bf.k, bf.n_slices)


def test_filter_unseen_without_bloom(spark):
    seen = spark.createDataFrame([("a",)], "url_canon string")
    frontier = spark.createDataFrame([("a",), ("b",)], "url_canon string")
    assert [r.url_canon for r in filter_unseen(frontier, None, seen).collect()] == ["b"]
    assert filter_unseen(frontier, None, None).count() == 2
