"""PageRank vs a numpy power-iteration oracle on the same graph."""

import numpy as np

from retailer_scrapers_spark.operators.pagerank import pagerank


def _numpy_pagerank(edges, nodes, iters=10, d=0.85):
    idx = {v: i for i, v in enumerate(nodes)}
    n = len(nodes)
    out = np.zeros(n)
    for s, _ in edges:
        out[idx[s]] += 1
    r = np.full(n, 1.0 / n)
    for _ in range(iters):
        contrib = np.zeros(n)
        for s, t in edges:
            contrib[idx[t]] += r[idx[s]] / out[idx[s]]
        dangling = r[out == 0].sum()
        r = (1 - d) / n + d * (contrib + dangling / n)
    return {v: r[idx[v]] for v in nodes}


def test_pagerank_matches_numpy(spark):
    edges = [
        ("a", "b"), ("a", "c"), ("b", "c"), ("c", "a"), ("d", "c"),  # e is dangling (pointed at, no out)
        ("c", "e"),
    ]
    nodes = sorted({x for e in edges for x in e})
    df = spark.createDataFrame(edges, "src string, dst string")
    got = {r.node: r.rank for r in pagerank(df, iterations=12).collect()}
    want = _numpy_pagerank(edges, nodes, iters=12)
    assert set(got) == set(nodes)
    for v in nodes:
        assert abs(got[v] - want[v]) < 1e-6, (v, got[v], want[v])
    assert abs(sum(got.values()) - 1.0) < 1e-6  # mass conserved
    # hub 'c' outranks everything
    assert got["c"] == max(got.values())


def test_pagerank_no_localcheckpoint_and_no_cache_leak(spark):
    """VERDICT r2 #6: the lineage cut is a persist/unpersist chain (no
    row-serializing localCheckpoint), and all caches are released once
    the caller drops the result."""
    import ast
    import gc
    import inspect

    from retailer_scrapers_spark.operators import pagerank as PR

    # Assert over CODE (ast call/attribute nodes), not raw source text —
    # docstrings/comments may legitimately mention the API by name
    # (ADVICE r3: the raw-text assert tripped on a why-note and
    # dead-coded the leak check below).
    tree = ast.parse(inspect.getsource(PR))
    called = {
        node.attr
        for node in ast.walk(tree)
        if isinstance(node, ast.Attribute)
    }
    assert "localCheckpoint" not in called
    before = spark.sparkContext._jsc.getPersistentRDDs().size()
    df = spark.createDataFrame([("a", "b"), ("b", "a"), ("a", "c")], "src string, dst string")
    out = pagerank(df, iterations=5)
    assert abs(sum(r.rank for r in out.collect()) - 1.0) < 1e-6
    del out
    gc.collect()
    assert spark.sparkContext._jsc.getPersistentRDDs().size() == before
