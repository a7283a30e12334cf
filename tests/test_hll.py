"""HyperLogLog: accuracy, merge associativity, serialization, and the
distributed per-key build."""

import numpy as np

from retailer_scrapers_spark.operators.hll import HyperLogLog, hll_by_key


def _hashes(n, seed=0):
    return np.random.default_rng(seed).integers(-(2**63), 2**63 - 1, n, dtype=np.int64)


def test_estimate_accuracy():
    hll = HyperLogLog(p=12)
    h = _hashes(100_000)
    hll.add_hashes(h)
    est = hll.estimate()
    # standard error ≈ 1.04/sqrt(4096) ≈ 1.6%; allow 5%
    assert abs(est - 100_000) / 100_000 < 0.05, est


def test_duplicates_dont_inflate():
    hll = HyperLogLog(p=12)
    h = _hashes(1000)
    for _ in range(5):
        hll.add_hashes(h)  # same values repeatedly
    assert abs(hll.estimate() - 1000) / 1000 < 0.10


def test_small_range_linear_counting():
    hll = HyperLogLog(p=12)
    hll.add_hashes(_hashes(50))
    assert abs(hll.estimate() - 50) < 8


def test_merge_equals_union():
    a, b = HyperLogLog(12), HyperLogLog(12)
    ha, hb = _hashes(30_000, 1), _hashes(30_000, 2)
    a.add_hashes(ha)
    b.add_hashes(hb)
    u = HyperLogLog(12)
    u.add_hashes(np.concatenate([ha, hb]))
    merged = a.merge(b)
    assert np.array_equal(merged.registers, u.registers)  # register-max == union


def test_serialize_roundtrip():
    hll = HyperLogLog(12)
    hll.add_hashes(_hashes(5000))
    rt = HyperLogLog.deserialize(hll.serialize())
    assert np.array_equal(rt.registers, hll.registers) and rt.p == 12


def test_hll_by_key_distributed(spark):
    rows = [(f"h{i % 4}.test", f"https://h{i % 4}.test/p/{i}") for i in range(40_000)]
    df = spark.createDataFrame(rows, "host string, url string").repartition(8)
    sketches = hll_by_key(df, "host", "url")
    assert set(sketches) == {f"h{i}.test" for i in range(4)}
    for host, sk in sketches.items():
        # 10k at p=12 sits in the classic-HLL bias band (2.5m–5m): ~2–5%
        # high bias on top of the 1.6% stderr → 8% bound
        assert abs(sk.estimate() - 10_000) / 10_000 < 0.08, (host, sk.estimate())
