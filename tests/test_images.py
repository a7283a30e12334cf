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
