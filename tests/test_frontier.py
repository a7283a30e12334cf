"""R4/R6/R7/O2 frontier scheduling operators."""

from pyspark.sql import functions as F

from retailer_scrapers_spark.operators import frontier as FR


def test_topk_per_host(spark):
    rows = [("h1", float(p), i) for i, p in enumerate([5, 1, 9, 7])] + [("h2", 3.0, 10), ("h2", 3.0, 11)]
    df = spark.createDataFrame(rows, "host string, priority double, seq long")
    out = FR.topk_per_host(df, 2)
    got = {(r.host, r.seq) for r in out.collect()}
    assert got == {("h1", 2), ("h1", 3), ("h2", 10), ("h2", 11)}  # top prio; seq tie-break


def test_salt_hot_hosts(spark):
    rows = [("hot.test", f"https://hot.test/{i}") for i in range(100)] + [("cold.test", "https://cold.test/1")]
    df = spark.createDataFrame(rows, "host string, url_canon string")
    out = FR.salt_hot_hosts(df, target_rows_per_task=25)
    pd = out.toPandas()
    hot = pd[pd.host == "hot.test"]
    assert hot.n_salt.iloc[0] == 4 and set(hot.salt) <= {0, 1, 2, 3} and hot.salt.nunique() > 1
    cold = pd[pd.host == "cold.test"]
    assert (cold.n_salt == 1).all() and (cold.salt == 0).all()


def test_requeue_failures(spark):
    df = spark.createDataFrame(
        [(200, 0, 1.0, "a"), (503, 0, 1.0, "b"), (503, 2, 1.0, "c"), (404, 0, 1.0, "d")],
        "status int, attempt int, priority double, url_canon string",
    )
    ok, retry, dropped = FR.requeue_failures(df)
    assert sorted(r.url_canon for r in ok.collect()) == ["a", "d"]  # 404 is permanent-ok path
    r = retry.collect()
    assert [x.url_canon for x in r] == ["b"] and r[0].attempt == 1 and r[0].priority == -1.0
    assert [x.url_canon for x in dropped.collect()] == ["c"]


def test_assign_global_indexes(spark):
    df = spark.createDataFrame(
        [("Shoprite", 0, 1), ("Shoprite", 0, 0), ("Shoprite", 1, 0), ("Checkers", 0, 0)],
        "retailer string, page int, pos int",
    )
    out = FR.assign_global_indexes(df, {"Shoprite": 17500, "Checkers": 0})
    got = {(r.retailer, r.page, r.pos): r["index"] for r in out.collect()}
    assert got[("Shoprite", 0, 0)] == 17500
    assert got[("Shoprite", 0, 1)] == 17501
    assert got[("Shoprite", 1, 0)] == 17502
    assert got[("Checkers", 0, 0)] == 0


def test_assign_indexes_deterministic_under_partitioning(spark):
    rows = [("R", p, i) for p in range(5) for i in range(7)]
    df1 = spark.createDataFrame(rows, "retailer string, page int, pos int").repartition(8)
    df2 = spark.createDataFrame(list(reversed(rows)), "retailer string, page int, pos int").repartition(3)
    a = {(r.page, r.pos): r["index"] for r in FR.assign_global_indexes(df1, {"R": 100}).collect()}
    b = {(r.page, r.pos): r["index"] for r in FR.assign_global_indexes(df2, {"R": 100}).collect()}
    assert a == b  # §2.9: total-order windows → same ids under any layout


def test_assign_indexes_two_level_equals_naive(spark):
    """The scalable two-level prefix-sum must produce byte-identical ids
    to the naive single-window form."""
    import random

    rng = random.Random(7)
    rows = [(rng.choice(["A", "B"]), rng.randint(0, 9), i) for i in range(500)]
    df = spark.createDataFrame(rows, "retailer string, page int, pos int").repartition(8)
    got = {(r.retailer, r.page, r.pos): r["index"]
           for r in FR.assign_global_indexes(df, {"A": 100, "B": 9000}, order_cols=("page", "pos")).collect()}
    # naive oracle computed in Python
    for retailer, base in (("A", 100), ("B", 9000)):
        ordered = sorted([r for r in rows if r[0] == retailer], key=lambda r: (r[1], r[2]))
        for rank, r in enumerate(ordered):
            assert got[r] == base + rank, r
