"""Multimodal plumbing: frame-sampling fan-out, resize stage, stats
extraction over the corpus — Spark-side shapes real, codecs self-owned
or stubbed (no image/video libs in the container)."""

import numpy as np
from pyspark.sql import functions as F

from retailer_scrapers_spark.functions.images import decode_png, frame_sample, make_resize_udf


def test_frame_sample_fanout(spark, corpus_df):
    sample = corpus_df.limit(10)
    frames = frame_sample(sample, n_frames=3)
    pdf = frames.toPandas()
    assert len(pdf) == 30  # 1→N fan-out
    assert set(pdf.frame_idx.unique()) == {0, 1, 2}
    assert (pdf.frame_w == 16).all() and (pdf.frame_h == 16).all()
    # deterministic fake: same blob → identical frames across runs
    pdf2 = frame_sample(sample, n_frames=3).toPandas()
    a = pdf.sort_values(["image_id", "frame_idx"]).frame_bytes.map(bytes).tolist()
    b = pdf2.sort_values(["image_id", "frame_idx"]).frame_bytes.map(bytes).tolist()
    assert a == b
    decoded = decode_png(bytes(pdf.frame_bytes.iloc[0]))
    assert decoded.shape == (16, 16)


def test_resize_pipeline_over_corpus(spark, corpus_df):
    out = corpus_df.limit(8).select(
        "image_id", make_resize_udf(12, 10)(F.col("bytes"), F.col("fmt")).alias("resized")
    ).collect()
    for r in out:
        arr = decode_png(bytes(r.resized))
        assert arr.shape == (10, 12)
        assert arr.dtype == np.uint8
