"""F7 sanitization + the text-analysis training-data ops."""

from pyspark.sql import functions as F

from retailer_scrapers_spark.functions import text as X


def test_sanitize_name_matches_python(spark):
    names = ["Café Crème 250g", "plain_name", "a b/c\\d", "Rooïbos & Honey!", ""]
    df = spark.createDataFrame([(n,) for n in names], "name string")
    got = [r.s for r in df.select(X.sanitize_name(F.col("name")).alias("s")).collect()]
    assert got == [X.sanitize_name_py(n) for n in names]
    assert got[0] == "Cafe_Creme_250g"  # NFKD: é→e; spaces→_


def test_image_filename(spark):
    df = spark.createDataFrame([("Shoprite", "Cafe_Creme", ".jpg")], "r string, s string, e string")
    got = df.select(X.image_filename(F.col("r"), F.col("s"), F.col("e")).alias("f")).collect()[0].f
    assert got == "Shoprite_image_Cafe_Creme.jpg"


def test_detect_language(spark):
    df = spark.createDataFrame(
        [
            ("the cat sat on the mat and it is happy",),
            ("die kat het op die mat gesit en dit is",),
            ("le chat est dans la maison pour le moment",),
            ("zzz qqq www",),
        ],
        "text string",
    )
    got = [r.l for r in df.select(X.detect_language(F.col("text")).alias("l")).collect()]
    assert got == ["en", "af", "fr", "und"]


def test_quality_score_ordering(spark):
    good = "the quick brown fox jumps over the lazy dog and runs through the field with great joy " * 3
    bad = "!!! ??? ### $$$ %%%"
    df = spark.createDataFrame([(good,), (bad,)], "text string")
    scores = [r.q for r in df.select(X.quality_score(F.col("text")).alias("q")).collect()]
    assert scores[0] > 0.6 > scores[1]
    assert all(0.0 <= s <= 1.0 for s in scores)


def test_token_counts(spark):
    df = spark.createDataFrame([("hello world, it's 42 degrees",), ("",), ("  ",)], "text string")
    got = df.select(
        X.whitespace_token_count(F.col("text")).alias("ws"),
        X.bpe_ish_token_count(F.col("text")).alias("bpe"),
    ).collect()
    assert got[0].ws == 5
    # hello|world|,|it|'|s|42|degrees = 8
    assert got[0].bpe == 8
    assert got[1].ws == 0 and got[2].ws == 0


def test_fingerprint_deterministic_and_discriminative(spark):
    df = spark.createDataFrame(
        [("the same document text here",), ("the same document text here",), ("another doc entirely",)],
        "text string",
    )
    got = [r.fp for r in df.select(X.fingerprint(F.col("text")).alias("fp")).collect()]
    assert got[0] == got[1] != got[2]
