"""Stdlib PNG codec tests: encode/decode round-trips across every
color type and scanline filter, luma/histogram feature contracts,
fixture parity, and error paths."""

from __future__ import annotations

import hashlib
import random

import pytest

from go_mapreduce_spark.functions.png import (
    OUT_CHANNELS,
    decode_png,
    encode_png,
    gray_histogram,
    luma_stats,
)

_RAW_CH = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


@pytest.mark.parametrize("ct", [0, 2, 3, 4, 6])
@pytest.mark.parametrize("fmode", [None, 0, 1, 2, 3, 4])
def test_round_trip_every_color_type_and_filter(ct, fmode):
    rng = random.Random(ct * 10 + (fmode if fmode is not None else 9))
    w, h = rng.randint(1, 17), rng.randint(1, 11)
    ch = _RAW_CH[ct]
    if ct == 3:
        palette = bytes(rng.randrange(256) for _ in range(16 * 3))
        raw = bytes(rng.randrange(16) for _ in range(w * h * ch))
    else:
        palette = b""
        raw = bytes(rng.randrange(256) for _ in range(w * h * ch))
    fpl = None if fmode is None else (lambda y: fmode)
    d = decode_png(encode_png(w, h, ct, raw, palette=palette, filter_per_line=fpl))
    assert (d["width"], d["height"]) == (w, h)
    assert d["channels"] == OUT_CHANNELS[ct]
    if ct == 3:
        expected = b"".join(palette[3 * i : 3 * i + 3] for i in raw)
    else:
        expected = raw
    assert d["pixels"] == expected


def test_luma_stats_exact_integers():
    # RGB where every pixel is (g, g, g): luma == g exactly because
    # the 299/587/114 weights sum to 1000
    px = bytes([10, 10, 10, 250, 250, 250, 0, 0, 0, 100, 100, 100])
    total, n = luma_stats(decode_png(encode_png(2, 2, 2, px)))
    assert (total, n) == (360, 4)
    # gray+alpha: alpha ignored
    ga = bytes([7, 255, 9, 0])
    total, n = luma_stats(decode_png(encode_png(2, 1, 4, ga)))
    assert (total, n) == (16, 2)


def test_gray_histogram_unit_norm_and_binning():
    hist = gray_histogram(decode_png(encode_png(1, 1, 0, bytes([255]))))
    assert hist[15] == 1.0
    mixed = decode_png(encode_png(2, 1, 0, bytes([0, 255])))
    h2 = gray_histogram(mixed)
    assert h2[0] == h2[15] == pytest.approx(2 ** -0.5)


@pytest.mark.parametrize(
    "bad",
    [
        b"",
        b"nope",
        b"\x89PNG\r\n\x1a\n",  # signature only, no IHDR
        b"\x89PNG\r\n\x1a\n" + b"junkjunkjunkjunk",
    ],
)
def test_non_png_bytes_rejected(bad):
    with pytest.raises(ValueError):
        decode_png(bad)


def test_corrupted_crc_rejected():
    png = bytearray(encode_png(4, 4, 0, bytes(range(16))))
    png[-3] ^= 0xFF  # flip a bit inside IEND's CRC (last 4 bytes)
    with pytest.raises(ValueError, match="CRC"):
        decode_png(bytes(png))


def test_unsupported_features_named():
    import struct
    import zlib

    def chunk(t, b):
        return struct.pack(">I", len(b)) + t + b + struct.pack(">I", zlib.crc32(t + b))

    sig = b"\x89PNG\r\n\x1a\n"
    ihdr16 = struct.pack(">IIBBBBB", 2, 2, 16, 0, 0, 0, 0)
    with pytest.raises(ValueError, match="bit depth"):
        decode_png(sig + chunk(b"IHDR", ihdr16))
    ihdr_i = struct.pack(">IIBBBBB", 2, 2, 8, 0, 0, 0, 1)
    with pytest.raises(ValueError, match="interlaced"):
        decode_png(sig + chunk(b"IHDR", ihdr_i))


def test_fixture_matches_generator_arithmetic():
    """Decode the committed fixture payloads and re-derive every
    field from media_id arithmetic — the same cross-check the x414
    oracle performs in SQL."""
    from tools.make_png_fixture import COLOR_TYPES, N, build_png

    for i in range(0, N, 7):
        payload, w, h = build_png(i)
        d = decode_png(payload)
        assert (d["width"], d["height"]) == (w, h)
        ct = COLOR_TYPES[i % 5]
        assert d["channels"] == OUT_CHANNELS[ct]
        v = (i * 37) % 251
        total, n = luma_stats(d)
        assert n == w * h
        row = 0
        for x in range(w):
            p = (v + 3 * x) % 256
            if ct in (0, 4):
                row += p
            elif ct == 3:
                row += (v + 5 * (p % 16)) % 256
            else:
                row += (
                    299 * p + 587 * ((p + 85) % 256) + 114 * ((p + 170) % 256)
                ) // 1000
        assert total == row * h


def test_decode_is_deterministic():
    payload, _, _ = __import__(
        "tools.make_png_fixture", fromlist=["build_png"]
    ).build_png(11)
    a = decode_png(payload)
    b = decode_png(payload)
    assert a == b
    assert hashlib.sha256(a["pixels"]).hexdigest() == hashlib.sha256(
        b["pixels"]
    ).hexdigest()
