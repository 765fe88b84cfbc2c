"""Tests for the stdlib baseline-JPEG codec (functions/jpeg.py) and
the x417 decode query: exact round-trips on the codec's DC-only
subspace, the general AC entropy/IDCT path against an independent
reference, restart-marker resync, scope rejections, and the strict-
mode decoder routing."""

from __future__ import annotations

import random

import pytest

from go_mapreduce_spark.functions.jpeg import (
    ZIGZAG,
    const_block_coeffs,
    decode_jpeg,
    encode_jpeg_from_coeffs,
    idct_8x8,
    rgb_sums,
)


def _fix_rgb(yv: int, cb: int, cr: int) -> tuple[int, int, int]:
    cb -= 128
    cr -= 128
    cl = lambda v: 0 if v < 0 else (255 if v > 255 else v)  # noqa: E731
    return (
        cl(yv + ((91881 * cr + 32768) >> 16)),
        cl(yv - ((22554 * cb + 46802 * cr + 32768) >> 16)),
        cl(yv + ((116130 * cb + 32768) >> 16)),
    )


def test_gray_constant_blocks_roundtrip_exact():
    vals = [[10, 200, 37], [255, 0, 128]]
    data = encode_jpeg_from_coeffs(20, 13, [const_block_coeffs(vals)], comment=b"c")
    d = decode_jpeg(data)
    assert (d["width"], d["height"], d["channels"]) == (20, 13, 1)
    for y in range(13):
        for x in range(20):
            assert d["pixels"][y * 20 + x] == vals[y >> 3][x >> 3]


def test_color_constant_blocks_roundtrip_exact():
    Y = [[100, 50], [220, 128]]
    Cb = [[128, 60], [200, 128]]
    Cr = [[128, 190], [90, 128]]
    data = encode_jpeg_from_coeffs(
        15, 11, [const_block_coeffs(c) for c in (Y, Cb, Cr)]
    )
    d = decode_jpeg(data)
    assert d["channels"] == 3
    for y in range(11):
        for x in range(15):
            e = _fix_rgb(Y[y >> 3][x >> 3], Cb[y >> 3][x >> 3], Cr[y >> 3][x >> 3])
            o = (y * 15 + x) * 3
            assert tuple(d["pixels"][o : o + 3]) == e


def test_restart_markers_resync_dc_predictors():
    vals = [[(7 * i + 13 * j) % 256 for i in range(5)] for j in range(4)]
    data = encode_jpeg_from_coeffs(
        40, 32, [const_block_coeffs(vals)], restart_interval=3
    )
    assert b"\xff\xd0" in data or b"\xff\xd1" in data
    d = decode_jpeg(data)
    for y in range(32):
        for x in range(40):
            assert d["pixels"][y * 40 + x] == vals[y >> 3][x >> 3]


def test_ac_coefficients_match_reference_idct():
    """Huffman AC decode + dequant + IDCT against the module's own
    idct_8x8 applied to the raw coefficients — exercises run/size
    symbols, ZRL, EOB, and negative-magnitude EXTEND."""
    rng = random.Random(3)
    zz = [0] * 64
    zz[0] = 40
    for k in (1, 3, 7, 15, 30, 45, 63):
        zz[k] = rng.randint(-30, 30)
    d = decode_jpeg(encode_jpeg_from_coeffs(8, 8, [[[zz]]]))
    raster = [0] * 64
    for i in range(64):
        raster[ZIGZAG[i]] = zz[i]
    assert list(d["pixels"]) == idct_8x8(raster)


def test_zrl_long_zero_runs():
    zz = [0] * 64
    zz[0] = 8
    zz[40] = 5  # forces at least two ZRL symbols before the AC value
    d = decode_jpeg(encode_jpeg_from_coeffs(8, 8, [[[zz]]]))
    raster = [0] * 64
    for i in range(64):
        raster[ZIGZAG[i]] = zz[i]
    assert list(d["pixels"]) == idct_8x8(raster)


def test_rgb_sums_gray_counts_into_all_channels():
    vals = [[100]]
    d = decode_jpeg(encode_jpeg_from_coeffs(8, 8, [const_block_coeffs(vals)]))
    assert rgb_sums(d) == (6400, 6400, 6400, 64)


@pytest.mark.parametrize(
    "mutate,msg",
    [
        (lambda b: b"\x00" + b[1:], "SOI"),
        (lambda b: b[: len(b) // 2], "missing SOS|truncated|Huffman|restart"),
    ],
)
def test_malformed_rejected(mutate, msg):
    data = encode_jpeg_from_coeffs(8, 8, [const_block_coeffs([[1]])])
    import re

    with pytest.raises(ValueError, match=None):
        bad = mutate(data)
        try:
            decode_jpeg(bad)
        except ValueError as e:
            assert re.search(msg, str(e))
            raise


def test_progressive_rejected():
    data = bytearray(encode_jpeg_from_coeffs(8, 8, [const_block_coeffs([[1]])]))
    i = data.find(b"\xff\xc0")
    data[i + 1] = 0xC2  # SOF0 -> SOF2 (progressive)
    with pytest.raises(ValueError, match="baseline"):
        decode_jpeg(bytes(data))


def test_subsampling_rejected():
    data = bytearray(encode_jpeg_from_coeffs(8, 8, [const_block_coeffs([[1]])]))
    i = data.find(b"\xff\xc0")
    # SOF0 payload: len(2) prec(1) h(2) w(2) nc(1) then cid,hv,tq
    data[i + 11] = 0x22  # claim 2x2 sampling
    with pytest.raises(ValueError, match="sampling"):
        decode_jpeg(bytes(data))


def test_strict_mode_decodes_jpeg_format():
    from go_mapreduce_spark.operators.multimodal import make_decode_batch

    import pandas as pd

    payload = encode_jpeg_from_coeffs(16, 8, [const_block_coeffs([[30, 200]])])
    fn = make_decode_batch("strict")
    out = list(
        fn(
            iter(
                [
                    pd.DataFrame(
                        {
                            "media_id": [1],
                            "kind": ["image"],
                            "format": ["jpeg"],
                            "payload": [payload],
                            "width": [16],
                            "height": [8],
                            "duration_ms": [-1],
                        }
                    )
                ]
            )
        )
    )
    feats = out[0]["features"][0]
    assert len(feats) > 0 and abs(sum(x * x for x in feats) - 1.0) < 1e-9


def test_fixture_payloads_decode_and_match_contract():
    """Every committed fixture payload is a real decodable JPEG whose
    decode matches the generator's media_id arithmetic."""
    import os

    import pyarrow.parquet as pq

    from go_mapreduce_spark.operators.multimodal import JPEG_FIXTURE_PATH

    assert os.path.exists(JPEG_FIXTURE_PATH)
    t = pq.read_table(JPEG_FIXTURE_PATH).to_pydict()
    assert len(t["media_id"]) == 48
    for i, payload in zip(t["media_id"], t["payload"]):
        d = decode_jpeg(bytes(payload))
        wb, hb = 1 + i % 3, 1 + i % 2
        assert d["width"] == 8 * wb - i % 5
        assert d["height"] == 8 * hb - i % 3
        assert d["channels"] == (3 if i % 2 == 1 else 1)
        v = (i * 37) % 251
        # spot-check the (0,0) block's top-left pixel
        if d["channels"] == 1:
            assert d["pixels"][0] == v % 256
        else:
            e = _fix_rgb(v % 256, (i * 53) % 199 % 256, (i * 29) % 173 % 256)
            assert tuple(d["pixels"][0:3]) == e


def test_ff_fill_bytes_before_marker_skipped():
    """T.81 B.1.1.2: markers may be preceded by any number of 0xFF fill
    bytes; the segment walk must resync past them."""
    vals = [[40, 90], [130, 220]]
    data = bytearray(encode_jpeg_from_coeffs(16, 16, [const_block_coeffs(vals)]))
    i = data.find(b"\xff\xdb")  # pad before the DQT marker
    padded = bytes(data[:i]) + b"\xff\xff\xff" + bytes(data[i:])
    d = decode_jpeg(padded)
    assert (d["width"], d["height"]) == (16, 16)
    assert d == decode_jpeg(bytes(data))
