"""Stdlib WAV codec tests: encode/decode round-trips across depths /
channel counts / rates, chunk-walk robustness (ancillary chunks, odd
padding), amplitude feature contracts, fixture parity, and error
paths."""

from __future__ import annotations

import random
import struct

import pytest

from go_mapreduce_spark.functions.wav import (
    amplitude_histogram,
    amplitude_stats,
    decode_wav,
    encode_wav,
)


@pytest.mark.parametrize("depth", [8, 16])
@pytest.mark.parametrize("channels", [1, 2, 4])
@pytest.mark.parametrize("rate", [8000, 44100])
def test_round_trip_depth_channels_rate(depth, channels, rate):
    rng = random.Random(depth * 100 + channels * 10 + rate % 7)
    n_frames = rng.randint(1, 40)
    lo, hi = (-128, 127) if depth == 8 else (-32768, 32767)
    samples = [rng.randint(lo, hi) for _ in range(n_frames * channels)]
    d = decode_wav(encode_wav(rate, channels, depth, samples))
    assert d["sample_rate"] == rate
    assert d["channels"] == channels
    assert d["bit_depth"] == depth
    assert d["n_frames"] == n_frames
    assert d["samples"] == samples


def test_ancillary_chunks_and_odd_padding_skipped():
    samples = [1, -2, 3, -4]
    # odd-sized LIST body forces the word-alignment pad; a second
    # unknown chunk after it must also be walked over
    payload = encode_wav(
        16000,
        2,
        16,
        samples,
        extra_chunks=[(b"LIST", b"INFOodd"), (b"junk", b"\x00" * 6)],
    )
    d = decode_wav(payload)
    assert d["samples"] == samples
    assert d["n_frames"] == 2


def test_amplitude_stats_exact_integers():
    d = decode_wav(encode_wav(8000, 1, 16, [5, -7, 0, 100]))
    assert amplitude_stats(d) == (112, 100, 4)
    # 8-bit excess-128 recenter must not shift amplitudes
    d8 = decode_wav(encode_wav(8000, 1, 8, [5, -7, 0, 100]))
    assert amplitude_stats(d8) == (112, 100, 4)


def test_amplitude_histogram_unit_norm_and_binning():
    # 16-bit full-negative extreme lands in bin 0, max in the last bin
    d = decode_wav(encode_wav(8000, 1, 16, [-32768, 32767]))
    hist = amplitude_histogram(d, 16)
    assert hist[0] > 0 and hist[15] > 0
    assert abs(sum(x * x for x in hist) - 1.0) < 1e-9
    # silence concentrates in the middle bin
    d0 = decode_wav(encode_wav(8000, 1, 16, [0, 0, 0]))
    assert amplitude_histogram(d0, 16)[8] == 1.0


@pytest.mark.parametrize(
    "bad",
    [
        b"",
        b"RIFF",
        b"OggS\x00\x02" + b"\x00" * 20,
        b"RIFF" + struct.pack("<I", 4) + b"AIFF",
    ],
)
def test_non_wav_bytes_rejected(bad):
    with pytest.raises(ValueError):
        decode_wav(bad)


def test_truncated_data_rejected():
    payload = encode_wav(8000, 1, 16, [1, 2, 3, 4])
    with pytest.raises(ValueError):
        decode_wav(payload[:-3])


def test_unsupported_features_named():
    good = encode_wav(8000, 1, 16, [0, 1])
    # flip the fmt audio-format field to 3 (IEEE float): unsupported
    idx = good.index(b"fmt ") + 8
    as_float = good[:idx] + struct.pack("<H", 3) + good[idx + 2 :]
    with pytest.raises(ValueError, match="audio format"):
        decode_wav(as_float)
    # inconsistent block align must be caught, not mis-framed
    ba_off = idx + 12
    bad_align = good[:ba_off] + struct.pack("<H", 5) + good[ba_off + 2 :]
    with pytest.raises(ValueError, match="block align"):
        decode_wav(bad_align)
    with pytest.raises(ValueError, match="bit depth"):
        encode_wav(8000, 1, 24, [0])
    with pytest.raises(ValueError, match="whole number of frames"):
        encode_wav(8000, 2, 16, [0, 1, 2])


def test_fixture_matches_generator_arithmetic():
    """Every committed clip decodes to exactly the generator formula —
    the same parity contract the x415 DuckDB oracle re-derives in SQL
    (tools/make_wav_fixture.py docstring)."""
    import duckdb

    from go_mapreduce_spark.operators.multimodal import WAV_FIXTURE_PATH

    rows = duckdb.sql(
        "SELECT media_id, payload FROM "
        f"read_parquet('{WAV_FIXTURE_PATH}/*.parquet') ORDER BY media_id"
    ).fetchall()
    assert len(rows) == 48
    rates = (8000, 11025, 16000, 22050)
    for mid, payload in rows:
        d = decode_wav(bytes(payload))
        channels = 1 + mid % 2
        n_frames = 25 + (mid * 11) % 40
        v = (mid * 37) % 97
        assert d["sample_rate"] == rates[mid % 4]
        assert d["channels"] == channels
        assert d["bit_depth"] == (8 if mid % 3 == 0 else 16)
        assert d["n_frames"] == n_frames
        assert d["samples"] == [
            ((v + 7 * t + 13 * ch) % 201) - 100
            for t in range(n_frames)
            for ch in range(channels)
        ]


def test_decode_is_deterministic():
    payload = encode_wav(22050, 2, 16, list(range(-20, 20)))
    assert decode_wav(payload) == decode_wav(payload)
