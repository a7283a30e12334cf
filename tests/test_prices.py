"""C1–C11 scalar price/promo functions vs the reference's value shapes."""

from pyspark.sql import functions as F

from retailer_scrapers_spark.functions import prices as P


def _one(spark, col, row=(1,)):
    return spark.createDataFrame([row], "x int").select(col.alias("v")).collect()[0].v


def test_get_price_coalesce_table(spark):
    # C1 truth table (scrape_shoprite.py:190-220): original strings survive
    cases = [
        ("R119.99", "R99.99", "R119.99"),
        (None, "R99.99", "R99.99"),
        ("n/a", "R99.99", "R99.99"),
        ("", None, P.NO_PRICE),
        (None, None, P.NO_PRICE),
        ("abc", "xyz", P.NO_PRICE),
        ("R5", None, "R5"),
    ]
    df = spark.createDataFrame([(a, b) for a, b, _ in cases], "old string, now string")
    got = [r.p for r in df.select(P.get_price(F.col("old"), F.col("now")).alias("p")).collect()]
    assert got == [w for _, _, w in cases]


def test_initial_promo(spark):
    df = spark.createDataFrame([("R10.00", "R8.00"), (None, "R8.00"), ("", "R8.00")], "old string, now string")
    got = [r.p for r in df.select(P.initial_promo(F.col("old"), F.col("now")).alias("p")).collect()]
    assert got == ["R8.00", P.NO_PROMO, P.NO_PROMO]


def test_promo_price_derivation(spark):
    # C2 (scrape_shoprite.py:354-379)
    df = spark.createDataFrame(
        [(9.99, None), (None, "Buy 2 save R10"), (None, None), (float("nan"), "Bundle")],
        "sale double, bonus string",
    )
    got = [r.p for r in df.select(P.promo_price(F.col("sale"), F.col("bonus")).alias("p")).collect()]
    assert got == ["R9.99", "Buy 2 save R10", P.NO_PROMO, "Bundle"]


def test_promo_valid_span(spark):
    html = '&lt;div&gt;<span class="item-product__valid">Valid until 7 August 2025</span>'
    df = spark.createDataFrame([(html,)], "h string")
    got = df.select(P.promo_valid_span(F.col("h")).alias("v")).collect()[0].v
    assert got == "Valid until 7 August 2025"


def test_promo_end_date_format(spark):
    # C5 (scrape_pnp.py:211-214): ISO-with-offset → "Valid until 7 August 2025"
    df = spark.createDataFrame([("2025-08-07T21:59:59+00:00",), (None,)], "d string")
    got = [r.v for r in df.select(P.promo_end_date(F.col("d")).alias("v")).collect()]
    assert got == ["Valid until 7 August 2025", ""]


def test_offer_sentence_regex(spark):
    # C6 (scrape_woolworths.py:217)
    txt = "blah Offer valid 4 August - 17 August 2025 terms"
    df = spark.createDataFrame([(txt,), ("no offer here",)], "t string")
    got = [r.v for r in df.select(P.offer_sentence(F.col("t")).alias("v")).collect()]
    assert got == ["Offer valid 4 August - 17 August 2025", ""]


def test_page_index_formula(spark):
    # C11 (scrape_shoprite.py:303): index = page*20 - 1 + pos
    df = spark.createDataFrame([(1, 2), (0, 5), (3, 0)], "page int, pos int")
    got = [r.i for r in df.select(P.page_index(F.col("page"), F.col("pos")).alias("i")).collect()]
    assert got == [21, 4, 59]


def test_last_page_math(spark):
    # D5 (scrape_woolworths.py:118-123): count//24, minus 1 on exact multiple
    df = spark.createDataFrame([(48,), (49,), (24,), (23,), (1,)], "c int")
    got = [r.p for r in df.select(P.last_page_of(F.col("c")).alias("p")).collect()]
    assert got == [1, 2, 0, 0, 0]


def test_user_agent_pick_deterministic(spark):
    df = spark.createDataFrame([("u1",), ("u2",), ("u1",)], "k string")
    got = [r.ua for r in df.select(P.pick_user_agent(F.col("k")).alias("ua")).collect()]
    assert got[0] == got[2] and all(ua in P.USER_AGENTS for ua in got)


def test_content_type_extension(spark):
    df = spark.createDataFrame([("png",), ("qjpg",), ("SVG",), ("weird",)], "f string")
    got = [r.e for r in df.select(P.content_type_extension(F.col("f")).alias("e")).collect()]
    assert got == [".png", ".jpg", ".svg", ".jpg"]
