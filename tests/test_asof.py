"""As-of join: unit semantics + shuffle-count plan property."""

import contextlib
import io

from pyspark.sql import functions as F

from retailer_scrapers_spark.operators.asof import asof_join


def test_asof_backward_semantics(spark):
    left = spark.createDataFrame(
        [(1, 10, "e1"), (1, 20, "e2"), (1, 9, "e0"), (2, 5, "e3")], "k int, ts long, ev string"
    )
    right = spark.createDataFrame(
        [(1, 10, "a"), (1, 15, "b"), (2, 99, "z")], "k int, ts long, v string"
    )
    out = {(r.k, r.ts): r.v for r in asof_join(left, right, "k", "ts", "ts", ("v",)).collect()}
    assert out[(1, 9)] is None     # before any right row
    assert out[(1, 10)] == "a"     # equal timestamps match
    assert out[(1, 20)] == "b"     # latest at-or-before
    assert out[(2, 5)] is None     # right row is in the future


def test_asof_single_shuffle(spark):
    left = spark.createDataFrame([(1, 10, "x")], "k int, ts long, ev string")
    right = spark.createDataFrame([(1, 5, "a")], "k int, ts long, v string")
    q = asof_join(left, right, "k", "ts", "ts", ("v",))
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        q.explain(mode="simple")
    plan = buf.getvalue()
    assert plan.count("Exchange") == 1  # one hash partition on the key; no join node at all
    assert "Join" not in plan


def test_asof_matches_duckdb(spark):
    """Same data through Spark asof_join and DuckDB ASOF LEFT JOIN."""
    import duckdb

    events = [(i % 7, 100 + 13 * i, f"e{i}") for i in range(200)]
    quotes = [(i % 7, 90 + 29 * i, float(i)) for i in range(50)]
    left = spark.createDataFrame(events, "k int, ts long, ev string")
    right = spark.createDataFrame(quotes, "k int, ts long, v double")
    got = {
        (r.k, r.ts, r.ev): r.v
        for r in asof_join(left, right, "k", "ts", "ts", ("v",)).collect()
    }
    con = duckdb.connect()
    con.execute("CREATE TABLE l(k INT, ts BIGINT, ev VARCHAR)")
    con.execute("CREATE TABLE r(k INT, ts BIGINT, v DOUBLE)")
    con.executemany("INSERT INTO l VALUES (?, ?, ?)", events)
    con.executemany("INSERT INTO r VALUES (?, ?, ?)", quotes)
    want = {
        (k, ts, ev): v
        for k, ts, ev, v in con.execute(
            "SELECT l.k, l.ts, l.ev, r.v FROM l ASOF LEFT JOIN r ON l.k = r.k AND l.ts >= r.ts"
        ).fetchall()
    }
    assert got == want
