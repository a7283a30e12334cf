"""t-digest: quantile accuracy, merge ≈ whole, tails tighter than middle,
serialization, distributed per-key build."""

import numpy as np

from retailer_scrapers_spark.operators.tdigest import TDigest, tdigest_by_key


def test_quantile_accuracy_uniform():
    rng = np.random.default_rng(42)
    x = rng.uniform(0, 1000, 50_000)
    td = TDigest(delta=100)
    for chunk in np.array_split(x, 10):
        td.add(chunk)
    for q in (0.01, 0.1, 0.5, 0.9, 0.99):
        got = td.quantile(q)
        want = np.quantile(x, q)
        assert abs(got - want) < 15, (q, got, want)  # 1.5% of range
    assert len(td.means) < 200  # compressed far below 50k samples


def test_tails_tight():
    # tail rank error scales with 1/δ — δ=300 buys ~0.1% quantiles on normals
    rng = np.random.default_rng(1)
    x = rng.standard_normal(100_000)
    td = TDigest(delta=300)
    td.add(x)
    for q in (0.001, 0.999):
        got = td.quantile(q)
        want = np.quantile(x, q)
        assert abs(got - want) < 0.12, (q, got, want)
    # tail clusters much lighter than middle ones (the t-digest property)
    assert td.weights[0] < td.weights[len(td.weights) // 2] / 5


def test_merge_close_to_whole():
    rng = np.random.default_rng(2)
    a, b = rng.exponential(5, 20_000), rng.exponential(5, 20_000)
    ta, tb, tw = TDigest(), TDigest(), TDigest()
    ta.add(a)
    tb.add(b)
    tw.add(np.concatenate([a, b]))
    merged = ta.merge(tb)
    for q in (0.1, 0.5, 0.9, 0.99):
        assert abs(merged.quantile(q) - tw.quantile(q)) < 0.35, q


def test_serialize_roundtrip_and_empty():
    td = TDigest()
    assert np.isnan(td.quantile(0.5))
    td.add(np.array([3.0, 1.0, 2.0]))
    rt = TDigest.deserialize(td.serialize())
    assert np.allclose(rt.means, td.means) and np.allclose(rt.weights, td.weights)
    assert rt.quantile(0.5) == td.quantile(0.5)


def test_order_independence():
    x = np.arange(1000, dtype=float)
    t1, t2 = TDigest(), TDigest()
    t1.add(x)
    t2.add(x[::-1].copy())
    assert np.allclose(t1.means, t2.means) and np.allclose(t1.weights, t2.weights)


def test_tdigest_by_key_distributed(spark):
    rng = np.random.default_rng(7)
    rows = [(f"h{i % 3}.test", float(rng.gamma(2.0, 50.0))) for i in range(30_000)]
    df = spark.createDataFrame(rows, "host string, latency_ms double").repartition(8)
    digests = tdigest_by_key(df, "host", "latency_ms")
    assert set(digests) == {"h0.test", "h1.test", "h2.test"}
    import collections

    by_host = collections.defaultdict(list)
    for h, v in rows:
        by_host[h].append(v)
    for h, td in digests.items():
        exact = np.quantile(by_host[h], 0.95)
        assert abs(td.quantile(0.95) - exact) / exact < 0.05, (h, td.quantile(0.95), exact)
