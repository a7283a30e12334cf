"""Image codec, PSNR invariant, phash — plus the Spark-side UDF plumbing."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from retailer_scrapers_spark.functions import images as I


def _img(seed=7, h=24, w=31, chans=None):
    rng = np.random.default_rng(seed)
    shape = (h, w) if chans is None else (h, w, chans)
    return rng.integers(0, 256, shape, dtype=np.uint8)


def test_lossless_roundtrip():
    for fmt in ("png", "raw", "bmp"):
        for arr in (_img(), _img(chans=3)):
            got = I.decode_image(I.encode_image(arr, fmt), fmt)
            assert np.array_equal(arr, got), fmt


def test_lossy_psnr_invariant():
    # input_hint: decoded-pixel allclose with PSNR ≥ 40 dB for lossy fmts
    for arr in (_img(), _img(chans=3)):
        got = I.decode_image(I.encode_image(arr, "qjpg"), "qjpg")
        assert got.shape == arr.shape
        assert I.psnr(arr, got) >= 40.0


def test_multimedia_decode_is_stubbed():
    with pytest.raises(NotImplementedError):
        I.decode_image(b"xx", "mp4")


def test_phash_properties():
    a = _img(1)
    assert I.phash64(a) == I.phash64(a.copy())  # deterministic
    lossy = I.decode_image(I.encode_image(a, "qjpg"), "qjpg")
    ham = bin((I.phash64(a) ^ I.phash64(lossy)) & (2**64 - 1)).count("1")
    assert ham <= 4  # robust to mild quantization
    other = _img(999)
    ham2 = bin((I.phash64(a) ^ I.phash64(other)) & (2**64 - 1)).count("1")
    assert ham2 > ham
    assert -(2**63) <= I.phash64(a) < 2**63  # fits LongType


def test_phash_udf_matches_local(spark):
    arrs = [_img(s) for s in range(4)]
    rows = [(I.encode_image(a, "png"), "png") for a in arrs] + [(I.encode_image(arrs[0], "qjpg"), "qjpg")]
    df = spark.createDataFrame([(bytearray(b), f) for b, f in rows], "blob binary, fmt string")
    got = [r.p for r in df.select(I.phash_udf(F.col("blob"), F.col("fmt")).alias("p")).collect()]
    want = [I.phash64(a) for a in arrs] + [I.phash64(I.decode_image(rows[4][0], "qjpg"))]
    assert got == want


def test_image_stats_udf(spark):
    a = _img(3, h=10, w=20)
    df = spark.createDataFrame([(bytearray(I.encode_image(a, "png")), "png")], "blob binary, fmt string")
    row = df.select(I.image_stats_udf(F.col("blob"), F.col("fmt")).alias("s")).select("s.*").collect()[0]
    assert (row.w, row.h) == (20, 10)
    assert abs(row.mean_px - a.mean()) < 1e-9


def test_resize_udf(spark):
    a = _img(4, h=32, w=32)
    df = spark.createDataFrame([(bytearray(I.encode_image(a, "png")), "png")], "blob binary, fmt string")
    out = df.select(I.make_resize_udf(8, 8)(F.col("blob"), F.col("fmt")).alias("b")).collect()[0].b
    resized = I.decode_png(bytes(out))
    assert resized.shape == (8, 8)


# ---------------------------------------------------------------------------
# S8 SVG branch (ref scrape_shoprite.py:70-93)
# ---------------------------------------------------------------------------

SVG_DOC = (
    '<svg xmlns="http://www.w3.org/2000/svg" width="48" height="32">'
    '<rect x="4" y="4" width="20" height="12" fill="#ff0000"/>'
    '<circle cx="36" cy="16" r="8" fill="#00ff80"/></svg>'
).encode()


def test_decode_svg_rasterizes_subset():
    from retailer_scrapers_spark.functions.images import decode_svg

    arr = decode_svg(SVG_DOC)
    assert arr.shape == (32, 48, 3)
    assert tuple(arr[10, 10]) == (255, 0, 0)      # inside the rect
    assert tuple(arr[16, 36]) == (0, 255, 128)    # circle center
    assert tuple(arr[0, 0]) == (0, 0, 0)          # background


def test_svg_to_png_roundtrip_and_sniff():
    import numpy as np

    from retailer_scrapers_spark.functions.images import decode_image, decode_svg, sniff_svg, svg_to_png

    png = svg_to_png(SVG_DOC)
    assert np.array_equal(decode_image(png, "png"), decode_svg(SVG_DOC))  # lossless convert
    assert sniff_svg(SVG_DOC)
    assert sniff_svg(b'<?xml version="1.0"?>\n<svg width="2" height="2"/>')
    assert not sniff_svg(png)


def test_convert_svg_blobs_dataframe_step(spark):
    import numpy as np

    from retailer_scrapers_spark.functions.images import (
        convert_svg_blobs,
        decode_svg,
        encode_image,
        phash64,
        phash_udf,
    )
    from pyspark.sql import functions as F

    img = np.full((8, 8, 3), 200, dtype=np.uint8)
    rows = [
        ("svg1", bytearray(SVG_DOC), "svg"),
        ("png1", bytearray(encode_image(img, "png")), "png"),
        ("sniffed", bytearray(SVG_DOC), None),  # no declared fmt → content sniff
    ]
    df = spark.createDataFrame(rows, "image_id string, bytes binary, fmt string")
    out = {r.image_id: r for r in convert_svg_blobs(df).collect()}
    assert out["svg1"].fmt == "png" and out["sniffed"].fmt == "png"
    assert out["png1"].fmt == "png" and bytes(out["png1"].bytes) == bytes(rows[1][1])
    # converted blob phashes identically to the rasterized original —
    # the K3 verify-after-write invariant holds through the convert
    got = {r.image_id: r.ph for r in convert_svg_blobs(df).withColumn(
        "ph", phash_udf(F.col("bytes"), F.col("fmt"))).collect()}
    assert got["svg1"] == phash64(decode_svg(SVG_DOC))


def test_convert_svg_blobs_malformed_is_skipped_not_fatal(spark):
    # reference parity: a failed convert returns False / is skipped
    # (scrape_shoprite.py:100-102) — a corrupt blob must not kill the job
    df = spark.createDataFrame(
        [("bad", bytearray(b"<svg width='8' height='8'><rect x=BROKEN"), "svg"),
         ("ok", bytearray(SVG_DOC), "svg")],
        "image_id string, bytes binary, fmt string",
    )
    from retailer_scrapers_spark.functions.images import convert_svg_blobs

    out = {r.image_id: r for r in convert_svg_blobs(df).collect()}
    assert out["bad"].bytes is None
    assert out["ok"].fmt == "png" and out["ok"].bytes is not None
