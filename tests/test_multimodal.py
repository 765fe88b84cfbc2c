"""Multimodal plumbing tests: schema contract, Arrow batch path,
batch-shape independence, stub decoder behavior."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from go_mapreduce_spark.operators import multimodal as M


@pytest.fixture(scope="module")
def media(spark):
    return M.synthetic_media(spark, n=48)


def test_decode_schema_and_row_parity(spark, media):
    out = M.decode_media(media)
    assert out.schema == M.DECODED_SCHEMA
    rows = out.collect()
    assert len(rows) == media.count()
    assert all(len(r.features) == M.FEATURE_DIM for r in rows)


def test_decode_independent_of_partitioning(spark, media):
    """Results must not depend on batch/partition composition — the
    invariant that makes the operator safe at arbitrary scale."""
    one = {r.media_id: (r.payload_sha, tuple(r.features)) for r in M.decode_media(media.coalesce(1)).collect()}
    many = {r.media_id: (r.payload_sha, tuple(r.features)) for r in M.decode_media(media.repartition(7)).collect()}
    assert one == many


def test_features_unit_norm(spark, media):
    rows = M.decode_media(media).select("features").limit(8).collect()
    for r in rows:
        norm = sum(x * x for x in r.features) ** 0.5
        assert abs(norm - 1.0) < 1e-5


def test_strict_mode_raises(spark, media):
    M.set_decoder("strict")
    try:
        with pytest.raises(Exception, match="NotImplementedError|real media decode"):
            M.decode_media(media).collect()
    finally:
        M.set_decoder("fake")


def test_pil_decoder_selection(spark, media):
    """'pil' registers only when Pillow imports; otherwise it fails
    fast with ImportError and the default stays 'fake'."""
    if not M.pil_available():
        with pytest.raises(ImportError, match="Pillow"):
            M.set_decoder("pil")
        # failed registration must not change the active decoder
        rows = M.decode_media(media).limit(1).collect()
        assert len(rows) == 1
        return
    # Pillow present: real decode of a generated PNG
    import io

    import PIL.Image

    buf = io.BytesIO()
    PIL.Image.new("RGB", (8, 4), (200, 10, 10)).save(buf, format="PNG")
    png = spark.createDataFrame(
        [(1, "image", "png", bytearray(buf.getvalue()), 8, 4, -1)], M.MEDIA_SCHEMA
    )
    M.set_decoder("pil")
    try:
        r = M.decode_media(png).collect()[0]
        norm = sum(x * x for x in r.features) ** 0.5
        assert abs(norm - 1.0) < 1e-5
        # a uniform dark-red image concentrates in one histogram bin
        assert max(r.features) > 0.99
    finally:
        M.set_decoder("fake")


def test_unknown_decoder_rejected():
    with pytest.raises(ValueError):
        M.set_decoder("ffmpeg")


def test_frame_sample_plan_explodes_grid(spark, media):
    frames = M.frame_sample_plan(media, every_ms=1000)
    per_video = {
        r.media_id: r.n
        for r in frames.groupBy("media_id").agg(F.count("*").alias("n")).collect()
    }
    durations = {
        r.media_id: r.duration_ms
        for r in media.filter(F.col("kind") == "video").collect()
    }
    assert per_video, "some videos expected"
    for mid, n in per_video.items():
        expected = (durations[mid] - 1) // 1000 + 1
        assert n == expected
