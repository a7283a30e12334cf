"""S9/K1 — CSV source/sink parity with the reference's conventions:
header row, ``fillna(' ')`` for missing values, string-typed columns,
and a lossless round-trip of the products table."""

from pyspark.sql import functions as F

from retailer_scrapers_spark import schemas


def test_products_csv_roundtrip(spark, existing_df, tmp_path):
    out = str(tmp_path / "products_csv")
    # K1: header-on-create CSV sink; the reference's fillna(' ')
    # (scrape_shoprite.py:452-456) keeps missing cells as single spaces
    existing_df.na.fill(" ").coalesce(1).write.option("header", True).mode("overwrite").csv(out)
    back = (
        spark.read.schema(schemas.PRODUCTS).option("header", True).csv(out)
    )
    a = sorted(map(tuple, existing_df.na.fill(" ").collect()))
    b = sorted(map(tuple, back.na.fill(" ").collect()))
    # CSV writes ' ' then trims on read per CSV conventions → normalize both
    norm = lambda rows: [tuple(" " if v in (None, "", " ") else v for v in r) for r in rows]
    assert norm(a) == norm(b)
    assert back.columns == [f.name for f in schemas.PRODUCTS.fields]


def test_csv_encoding_option(spark, tmp_path):
    """The reference falls back utf-8 → latin1 (scrape_shoprite.py:439-448);
    the engine is UTF-8 end-to-end and reads accented content losslessly."""
    out = str(tmp_path / "acc")
    df = spark.createDataFrame([("Café Crème", "R9.99")], "name string, price string")
    df.coalesce(1).write.option("header", True).mode("overwrite").csv(out)
    back = spark.read.option("header", True).csv(out)
    assert back.collect()[0].name == "Café Crème"


def test_latin1_fallback_read(spark, tmp_path):
    """S9 parity (scrape_shoprite.py:440-448): a latin1-encoded CSV —
    which strict UTF-8 cannot decode — is detected and read losslessly;
    UTF-8 files stay UTF-8."""
    from retailer_scrapers_spark.sources.csv_io import detect_csv_encoding, read_products_csv

    lat = tmp_path / "latin1.csv"
    lat.write_bytes("name,price\nCafé Crème,R9.99\n".encode("latin1"))
    assert detect_csv_encoding(str(lat)) == "latin1"
    back = read_products_csv(spark, str(lat))
    assert back.collect()[0].name == "Café Crème"

    utf = tmp_path / "utf8.csv"
    utf.write_bytes("name,price\nCafé Crème,R9.99\n".encode("utf-8"))
    assert detect_csv_encoding(str(utf)) == "utf-8"
    assert read_products_csv(spark, str(utf)).collect()[0].name == "Café Crème"


def test_encoding_probe_covers_whole_file_and_boundaries(tmp_path):
    """ADVICE r2: (a) a latin1 byte AFTER the old 1 MB probe window must
    still flip the fallback (the reference decodes whole files); (b) a
    multi-byte char split exactly at a chunk/probe boundary is not
    evidence of latin1; (c) past the full-probe cap, the probe extends a
    few bytes so a split char at the limit settles cleanly."""
    from retailer_scrapers_spark.sources.csv_io import detect_csv_encoding

    # (a) latin1 byte at offset ~2 MB, past any 1 MB window
    late = tmp_path / "late.csv"
    late.write_bytes(b"name,price\n" + b"a,1\n" * 500_000 + "Café,9\n".encode("latin1"))
    assert detect_csv_encoding(str(late)) == "latin1"

    # (b) 'é' (2 bytes) straddling the 1 MiB chunk boundary of a valid utf-8 file
    straddle = tmp_path / "straddle.csv"
    pad = b"x" * ((1 << 20) - 1)
    straddle.write_bytes(pad + "é".encode("utf-8") + b",ok\n")
    assert detect_csv_encoding(str(straddle)) == "utf-8"

    # (c) probe-limited file: split char AT the limit → extended and accepted;
    #     a genuinely invalid byte inside the window → latin1
    capped = tmp_path / "capped.csv"
    capped.write_bytes(pad + "é".encode("utf-8") + b"y" * 64)
    assert detect_csv_encoding(str(capped), probe_bytes=1 << 20, full_probe_cap=100) == "utf-8"
    bad = tmp_path / "bad_in_window.csv"
    bad.write_bytes(b"abc\xe9def" + b"z" * 200)
    assert detect_csv_encoding(str(bad), probe_bytes=64, full_probe_cap=100) == "latin1"


def test_csv_nan_fill_matches_reference(spark, tmp_path):
    # reference load_existing_data: NaN cells → ' ' (scrape_shoprite.py:452-456)
    from retailer_scrapers_spark.sources.csv_io import read_products_csv

    p = tmp_path / "gaps.csv"
    p.write_text("name,price\nthing,\n")
    row = read_products_csv(spark, str(p)).collect()[0]
    assert row.price == " "
