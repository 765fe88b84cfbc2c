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
