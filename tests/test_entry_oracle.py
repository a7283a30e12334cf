"""Local mirror of the driver's correctness gate: run every
``queries()[name]`` at sf0.01 and compare against ``oracle_sql()[name]``
via DuckDB (row count + column names + order-insensitive values)."""

import math
import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import __spark_entry__ as entrymod  # noqa: E402

SF_DIR = os.environ.get("ORACLE_SF_DIR", "/root/testdata/sf0.01")


def _duck():
    con = duckdb.connect()
    for t in entrymod.TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')")
    return con


def _normalize(df):
    """Column-name-sorted, row-sorted, float-rounded value matrix."""
    df = df[sorted(df.columns)]

    def canon(v):
        if v is None or (isinstance(v, float) and math.isnan(v)):
            return "∅"
        if isinstance(v, float):
            if v == int(v) and abs(v) < 1e15:
                return str(int(v))
            return f"{v:.6f}"
        return str(v)

    rows = sorted(tuple(canon(v) for v in row) for row in df.itertuples(index=False, name=None))
    return rows


ORACLES = entrymod.oracle_sql()
ALL_QUERIES = entrymod.queries()
CHECKED = sorted(set(ALL_QUERIES) & set(ORACLES))
ROWS_ONLY = sorted(set(ALL_QUERIES) - set(ORACLES))


@pytest.mark.parametrize("name", CHECKED)
def test_query_matches_oracle(spark, name):
    sdf = ALL_QUERIES[name](spark, SF_DIR).toPandas()
    con = _duck()
    ddf = con.execute(ORACLES[name]).fetchdf()
    assert len(sdf) == len(ddf), f"{name}: row count {len(sdf)} vs oracle {len(ddf)}"
    assert sorted(sdf.columns) == sorted(ddf.columns), f"{name}: columns differ"
    a, b = _normalize(sdf), _normalize(ddf)
    mism = [i for i, (x, y) in enumerate(zip(a, b)) if x != y][:3]
    assert a == b, f"{name}: values differ, first mismatches at {mism}: " + "; ".join(
        f"spark={a[i]} oracle={b[i]}" for i in mism
    )


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_queries_run(spark, name):
    df = ALL_QUERIES[name](spark, SF_DIR)
    assert df.count() >= 0
    assert df.columns


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    assert df.count() > 0
    assert df.columns


def test_bench_headline_keys_exist():
    """bench.py's HEADLINE list must stay in sync with queries()."""
    import bench

    missing = [k for k in bench.HEADLINE if k not in ALL_QUERIES]
    assert not missing, missing
