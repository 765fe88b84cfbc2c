"""Tests for Motion-JPEG-in-AVI (round 11, x419): the composition of
the stdlib AVI container walk (functions/avi.py) and the baseline-JPEG
entropy decoder (functions/jpeg.py) — exact round-trips inside the
JPEG codec's DC-only subspace, grayscale replication, scope
rejections, strict-mode routing, and fixture-vs-arithmetic parity."""

from __future__ import annotations

import struct

import pytest

from go_mapreduce_spark.functions.avi import (
    MJPG_FOURCC,
    decode_avi,
    encode_avi_mjpeg,
    frame_rgb_sums,
)
from go_mapreduce_spark.functions.jpeg import (
    const_block_coeffs,
    decode_jpeg,
    encode_jpeg_from_coeffs,
    rgb_sums,
)


def _gray_frame(w, h, vals):
    return encode_jpeg_from_coeffs(w, h, [const_block_coeffs(vals)])


def test_gray_mjpeg_roundtrip_exact():
    w, h = 14, 8  # edge-cropped second block column
    f0 = _gray_frame(w, h, [[40, 90]])
    f1 = _gray_frame(w, h, [[130, 220]])
    d = decode_avi(encode_avi_mjpeg(w, h, [f0, f1], rate=24, scale=1))
    assert (d["width"], d["height"], d["n_frames"], d["codec"]) == (w, h, 2, "mjpg")
    assert (d["rate"], d["scale"]) == (24, 1)
    # gray replicates into all three channels; edge crop weights cols
    exp0 = (8 * 40 + 6 * 90) * 8
    exp1 = (8 * 130 + 6 * 220) * 8
    assert frame_rgb_sums(d) == [(exp0, exp0, exp0), (exp1, exp1, exp1)]


def test_color_mjpeg_frame_matches_plain_jpeg_decode():
    fc = encode_jpeg_from_coeffs(
        16,
        8,
        [
            const_block_coeffs([[100, 150]]),
            const_block_coeffs([[120, 130]]),
            const_block_coeffs([[140, 90]]),
        ],
    )
    d = decode_avi(encode_avi_mjpeg(16, 8, [fc], rate=10))
    jr, jg, jb, _ = rgb_sums(decode_jpeg(fc))
    assert frame_rgb_sums(d) == [(jr, jg, jb)]
    assert d["frames"][0] == decode_jpeg(fc)["pixels"]


def test_junk_chunk_skipped_in_mjpeg_container():
    f = _gray_frame(8, 8, [[77]])
    d = decode_avi(encode_avi_mjpeg(8, 8, [f], junk=True))
    assert d["n_frames"] == 1 and d["codec"] == "mjpg"


def test_frame_dims_must_match_container():
    f = _gray_frame(8, 8, [[10]])
    with pytest.raises(ValueError, match="container says"):
        decode_avi(encode_avi_mjpeg(16, 8, [f]))


def test_mjpg_stream_requires_mjpg_bicompression():
    data = bytearray(encode_avi_mjpeg(8, 8, [_gray_frame(8, 8, [[5]])]))
    i = data.find(b"strf") + 8 + 16  # biCompression field
    assert struct.unpack_from("<I", data, i)[0] == MJPG_FOURCC
    data[i : i + 4] = struct.pack("<I", 0)
    with pytest.raises(ValueError, match="biCompression"):
        decode_avi(bytes(data))


def test_non_jpeg_frame_bytes_rejected_at_encode_and_decode():
    with pytest.raises(ValueError, match="JPEG"):
        encode_avi_mjpeg(8, 8, [b"\x00" * 32])
    data = bytearray(encode_avi_mjpeg(8, 8, [_gray_frame(8, 8, [[5]])]))
    i = data.find(b"00dc") + 8
    data[i : i + 2] = b"\x00\x00"  # corrupt the SOI marker
    with pytest.raises(ValueError, match="SOI"):
        decode_avi(bytes(data))


def test_interframe_handler_still_rejected():
    data = bytearray(encode_avi_mjpeg(8, 8, [_gray_frame(8, 8, [[5]])]))
    i = data.find(b"MJPG")  # strh handler comes first
    data[i : i + 4] = b"h264"
    with pytest.raises(ValueError, match="handler"):
        decode_avi(bytes(data))


def test_strict_mode_decodes_mjpeg_avi():
    import pandas as pd

    from go_mapreduce_spark.operators.multimodal import make_decode_batch

    payload = encode_avi_mjpeg(
        16, 8, [_gray_frame(16, 8, [[30, 200]]), _gray_frame(16, 8, [[90, 10]])]
    )
    fn = make_decode_batch("strict")
    out = list(
        fn(
            iter(
                [
                    pd.DataFrame(
                        {
                            "media_id": [1],
                            "kind": ["video"],
                            "format": ["avi"],
                            "payload": [payload],
                            "width": [16],
                            "height": [8],
                            "duration_ms": [200],
                        }
                    )
                ]
            )
        )
    )
    feats = out[0]["features"][0]
    assert abs(sum(x * x for x in feats) - 1.0) < 1e-9


def test_fixture_payloads_decode_and_match_contract():
    import os

    import pyarrow.parquet as pq

    from go_mapreduce_spark.operators.multimodal import MJPEG_FIXTURE_PATH

    assert os.path.exists(MJPEG_FIXTURE_PATH)
    t = pq.read_table(MJPEG_FIXTURE_PATH).to_pydict()
    assert len(t["media_id"]) == 48
    for i, payload in zip(t["media_id"], t["payload"]):
        d = decode_avi(bytes(payload))
        assert d["codec"] == "mjpg"
        wb, hb = 1 + i % 3, 1 + i % 2
        w, h = 8 * wb - i % 5, 8 * hb - i % 3
        assert (d["width"], d["height"]) == (w, h)
        assert d["n_frames"] == 2 + i % 3
        assert d["rate"] == (10, 24, 30)[i % 3]
        v, v2, v3 = (i * 37) % 251, (i * 53) % 199, (i * 29) % 173
        for t_idx, (sr, sg, sb) in enumerate(frame_rgb_sums(d)):
            er = eg = eb = 0
            for by in range(hb):
                for bx in range(wb):
                    npix = min(8, w - 8 * bx) * min(8, h - 8 * by)
                    yv = (v + 17 * bx + 29 * by + 19 * t_idx) % 256
                    if i % 2 == 1:
                        cb = ((v2 + 11 * bx + 5 * t_idx) % 256) - 128
                        cr = ((v3 + 7 * by + 3 * t_idx) % 256) - 128
                        r = min(255, max(0, yv + ((91881 * cr + 32768) >> 16)))
                        g = min(
                            255,
                            max(0, yv - ((22554 * cb + 46802 * cr + 32768) >> 16)),
                        )
                        b = min(255, max(0, yv + ((116130 * cb + 32768) >> 16)))
                    else:
                        r = g = b = yv
                    er += r * npix
                    eg += g * npix
                    eb += b * npix
            assert (sr, sg, sb) == (er, eg, eb), (i, t_idx)


def test_mjpeg_roundtrip_property():
    """Property over the exact subspace: ANY constant-per-block frame
    grid with edge crops round-trips bit-exactly through
    encode_jpeg_from_coeffs -> encode_avi_mjpeg -> decode_avi."""
    import random

    rng = random.Random(99)
    for _ in range(40):
        wb, hb = rng.randint(1, 4), rng.randint(1, 3)
        w = 8 * wb - rng.randint(0, 7)
        h = 8 * hb - rng.randint(0, 7)
        n_frames = rng.randint(1, 4)
        color = rng.random() < 0.5
        jpegs, expected = [], []
        for _t in range(n_frames):
            yv = [[rng.randrange(256) for _ in range(wb)] for _ in range(hb)]
            comps = [const_block_coeffs(yv)]
            if color:
                cbv = [[rng.randrange(256) for _ in range(wb)] for _ in range(hb)]
                crv = [[rng.randrange(256) for _ in range(wb)] for _ in range(hb)]
                comps += [const_block_coeffs(cbv), const_block_coeffs(crv)]
            f = encode_jpeg_from_coeffs(w, h, comps)
            jpegs.append(f)
            d = decode_jpeg(f)
            px = d["pixels"]
            if d["channels"] == 1:
                rgb = bytearray(w * h * 3)
                rgb[0::3] = px
                rgb[1::3] = px
                rgb[2::3] = px
                px = bytes(rgb)
            expected.append(px)
        dec = decode_avi(encode_avi_mjpeg(w, h, jpegs, rate=rng.choice((10, 24, 30))))
        assert (dec["width"], dec["height"], dec["n_frames"]) == (w, h, n_frames)
        assert dec["frames"] == expected
