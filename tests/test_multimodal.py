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


def test_strict_mode_raises_for_non_png(spark, media):
    """Strict mode's raise is narrowed to formats without a real
    codec — mp4 still raises; PNG and WAV decode for real (see the
    dedicated strict tests below)."""
    M.set_decoder("strict")
    try:
        with pytest.raises(Exception, match="NotImplementedError|decode requires"):
            M.decode_media(
                media.filter(~F.col("format").isin("png", "wav"))
            ).collect()
    finally:
        M.set_decoder("fake")


def _real_png_df(spark, value: int = 200, media_id: int = 900001):
    from go_mapreduce_spark.functions.png import encode_png

    payload = encode_png(8, 4, 0, bytes([value]) * 32)
    return spark.createDataFrame(
        [(media_id, "image", "png", bytearray(payload), 8, 4, -1)],
        M.MEDIA_SCHEMA,
    )


def _real_wav_df(spark, media_id: int = 900002):
    from go_mapreduce_spark.functions.wav import encode_wav

    payload = encode_wav(8000, 1, 16, [0] * 16)  # 16 frames of silence
    return spark.createDataFrame(
        [(media_id, "audio", "wav", bytearray(payload), -1, -1, 2)],
        M.MEDIA_SCHEMA,
    )


def test_strict_mode_decodes_real_wav(spark):
    """Strict mode performs REAL decode for WAV via the stdlib codec:
    pure silence concentrates the whole amplitude histogram in the
    middle bin."""
    M.set_decoder("strict")
    try:
        r = M.decode_media(_real_wav_df(spark)).collect()[0]
        assert r.features[8] == pytest.approx(1.0)
        assert sum(x * x for x in r.features) ** 0.5 == pytest.approx(1.0)
    finally:
        M.set_decoder("fake")


def test_strict_mode_rejects_fake_wav_bytes(spark, media):
    """Bytes labeled wav that are not a WAV must fail loudly under
    strict — no silent fake fallback."""
    M.set_decoder("strict")
    try:
        with pytest.raises(Exception, match="not a WAV|RIFF"):
            M.decode_media(media.filter(F.col("format") == "wav")).collect()
    finally:
        M.set_decoder("fake")


def test_strict_mode_decodes_real_png(spark):
    """Strict mode performs REAL decode for PNG via the stdlib codec:
    a solid-gray 200 image concentrates its whole luma histogram in
    bin 200//16 = 12."""
    M.set_decoder("strict")
    try:
        r = M.decode_media(_real_png_df(spark)).collect()[0]
        assert r.features[12] == pytest.approx(1.0)
        assert sum(x * x for x in r.features) ** 0.5 == pytest.approx(1.0)
    finally:
        M.set_decoder("fake")


def test_strict_mode_rejects_fake_png_bytes(spark, media):
    """Bytes labeled png that are not a PNG must fail loudly under
    strict — no silent fake fallback."""
    M.set_decoder("strict")
    try:
        with pytest.raises(Exception, match="not a PNG|bad signature"):
            M.decode_media(media.filter(F.col("format") == "png")).collect()
    finally:
        M.set_decoder("fake")


def test_png_mode_mixes_real_and_fake(spark, media):
    """'png' mode: real decode for the stdlib-codec formats (png AND
    wav), deterministic fake features for everything else —
    batch-shape independent."""
    M.set_decoder("png")
    try:
        mixed = _real_png_df(spark, value=40).union(
            _real_wav_df(spark).union(
                media.filter(~F.col("format").isin("png", "wav"))
            )
        )
        rows = {r.media_id: r for r in M.decode_media(mixed).collect()}
        assert rows[900001].features[40 // 16] == pytest.approx(1.0)
        # silence concentrates the REAL amplitude histogram mid-bin
        assert rows[900002].features[8] == pytest.approx(1.0)
        # formats without a stdlib codec keep the content-hash fakes
        mp4 = next(r for r in rows.values() if r.format == "mp4")
        assert sum(x * x for x in mp4.features) ** 0.5 == pytest.approx(1.0)
        assert max(mp4.features) < 0.99
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


def test_stream_decode_equals_batch(spark):
    """x416's streaming decode must emit exactly the batch x415 rows:
    decode depends only on row content, never on micro-batch
    boundaries — the invariant that lets one codec serve both the
    backfill and the live ingest path.  Run twice: the per-call
    checkpoint recreation makes every invocation a full deterministic
    replay (restart safety)."""
    sf = "/root/testdata/sf0.001"
    batch = [tuple(r) for r in M.x415_wav_decode(spark, sf).collect()]
    stream1 = [tuple(r) for r in M.x416_stream_media_decode(spark, sf).collect()]
    stream2 = [tuple(r) for r in M.x416_stream_media_decode(spark, sf).collect()]
    assert stream1 == batch
    assert stream2 == batch
