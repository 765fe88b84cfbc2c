"""Generate the committed REAL-AVI fixture parquet.

One-shot tool (output committed so the DuckDB oracle reads a stable
absolute path): 48 genuine uncompressed-RGB AVI payloads produced by
the stdlib encoder (go_mapreduce_spark/functions/avi.py) — RIFF
containers with hdrl/avih/strh/strf headers, '00db' BI_RGB frame
chunks (bottom-up padded BGR), and an idx1 index; every third file
carries a JUNK chunk to exercise the ancillary walk.

Uncompressed DIB frames round-trip bit-exactly (no quantization
anywhere), so every decoded pixel is pure ARITHMETIC on
(media_id, frame_idx) and the x418 oracle replays dimensions,
frame timing, and exact per-frame channel sums in SQL without
touching payload bytes:

    i        = media_id, 0..47
    width    = 4 + i % 9,  height = 3 + i % 5
    n_frames = 2 + i % 4
    rate     = [10, 24, 30][i % 3],  scale = 1
    frame t  = constant color
               r = ((i*37) % 251 + 7*t)  % 256
               g = ((i*53) % 199 + 11*t) % 256
               b = ((i*29) % 173 + 13*t) % 256
    JUNK chunk on i % 3 == 0

Run from the repo root:  python tools/make_avi_fixture.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from go_mapreduce_spark.functions.avi import encode_avi
from go_mapreduce_spark.operators.multimodal import MEDIA_SCHEMA
from go_mapreduce_spark.session import get_spark

OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "fixtures",
    "media_avi.parquet",
)
N = 48


def build_avi(i: int):
    w = 4 + i % 9
    h = 3 + i % 5
    n_frames = 2 + i % 4
    rate = (10, 24, 30)[i % 3]
    frames = []
    for t in range(n_frames):
        r = ((i * 37) % 251 + 7 * t) % 256
        g = ((i * 53) % 199 + 11 * t) % 256
        b = ((i * 29) % 173 + 13 * t) % 256
        frames.append(bytes([r, g, b] * (w * h)))
    payload = encode_avi(w, h, frames, rate=rate, scale=1, junk=(i % 3 == 0))
    duration_ms = n_frames * 1000 // rate
    return payload, w, h, duration_ms


def main() -> None:
    rows = []
    for i in range(N):
        payload, w, h, dur = build_avi(i)
        rows.append((i, "video", "avi", bytearray(payload), w, h, dur))
    spark = get_spark("make-avi-fixture")
    df = spark.createDataFrame(rows, MEDIA_SCHEMA).coalesce(1)
    df.write.mode("overwrite").parquet(OUT)
    print(f"wrote {OUT}: {df.count()} real AVI payloads")


if __name__ == "__main__":
    main()
