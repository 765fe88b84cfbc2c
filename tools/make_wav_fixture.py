"""Generate the committed REAL-WAV fixture parquet.

One-shot tool (output committed so the DuckDB oracle reads a stable
absolute path): 48 genuine PCM WAV payloads produced by the stdlib
encoder (go_mapreduce_spark/functions/wav.py), covering both
supported bit depths, mono and stereo, four sample rates, and — on
every third clip — an ancillary LIST chunk before ``data`` so the
fixture itself exercises the chunk walk.

Every clip parameter is pure ARITHMETIC on media_id, so the x415
oracle recomputes the expected decode results (framing, exact
integer amplitude sums) from first principles in SQL without ever
touching the payload bytes — the same cross-check discipline as the
x414 PNG fixture:

    i            = media_id, 0..N-1
    sample_rate  = [8000, 11025, 16000, 22050][i % 4]
    channels     = 1 + i % 2
    bit_depth    = 8 if i % 3 == 0 else 16
    n_frames     = 25 + (i * 11) % 40
    v            = (i * 37) % 97       (base amplitude)
    sample(t,ch) = ((v + 7*t + 13*ch) % 201) - 100

The sample formula stays inside −100..100 so the SAME signed values
round-trip at either depth (8-bit stores excess-128), keeping the
oracle arithmetic depth-independent.

Run from the repo root:  python tools/make_wav_fixture.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from go_mapreduce_spark.functions.wav import encode_wav
from go_mapreduce_spark.operators.multimodal import MEDIA_SCHEMA
from go_mapreduce_spark.session import get_spark

OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "fixtures",
    "media_wav.parquet",
)
N = 48
RATES = (8000, 11025, 16000, 22050)


def build_wav(i: int) -> tuple[bytes, int, int]:
    rate = RATES[i % 4]
    channels = 1 + i % 2
    depth = 8 if i % 3 == 0 else 16
    n_frames = 25 + (i * 11) % 40
    v = (i * 37) % 97
    samples = [
        ((v + 7 * t + 13 * ch) % 201) - 100
        for t in range(n_frames)
        for ch in range(channels)
    ]
    extra = [(b"LIST", b"INFOIART" + b"\x07\x00\x00\x00fixture")] if i % 3 == 2 else None
    payload = encode_wav(rate, channels, depth, samples, extra_chunks=extra)
    return payload, n_frames, rate


def rows(n: int = N):
    out = []
    for i in range(n):
        payload, n_frames, rate = build_wav(i)
        out.append(
            (
                i,
                "audio",
                "wav",
                bytearray(payload),
                -1,
                -1,
                n_frames * 1000 // rate,
            )
        )
    return out


def main() -> None:
    spark = get_spark("make_wav_fixture", cpus=2, shuffle_partitions=2)
    spark.createDataFrame(rows(), MEDIA_SCHEMA).coalesce(1).write.mode(
        "overwrite"
    ).parquet(OUT)
    print(f"wrote {N} rows to {OUT}")


if __name__ == "__main__":
    main()
