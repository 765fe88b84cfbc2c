"""Generate the committed REAL Motion-JPEG AVI fixture parquet.

One-shot tool (output committed so the DuckDB oracle reads a stable
absolute path): 48 genuine MJPG AVI payloads — RIFF containers with
hdrl/avih/strh('vids'/MJPG)/strf(biCompression='MJPG') headers, '00dc'
movi chunks each carrying one standalone baseline-JPEG byte stream
from the stdlib encoder (functions/jpeg.py), an idx1 index, and a JUNK
chunk on every third file.  This is the round-11 composition that
makes COMPRESSED video a real decode: container walk from
functions/avi.py, per-frame entropy decode from functions/jpeg.py.

Each frame stays inside the JPEG codec's EXACT subspace
(constant-per-block samples under unity quantization decode
bit-perfectly; the YCbCr->RGB transform is integer fixed-point), so
every decoded pixel is pure ARITHMETIC on (media_id, frame_idx) and
the x419 oracle replays dimensions, frame timing, and exact per-frame
channel sums in SQL without touching payload bytes:

    i        = media_id, 0..47;  t = frame index
    wb       = 1 + i % 3,  hb = 1 + i % 2          (block grid)
    width    = 8*wb - i % 5,  height = 8*hb - i % 3 (edge-crop dims)
    n_frames = 2 + i % 3
    rate     = [10, 24, 30][i % 3],  scale = 1
    color    = (i % 2 == 1) -> 3-component YCbCr, else grayscale
    v=(i*37)%251, v2=(i*53)%199, v3=(i*29)%173
    Y(bx,by,t)  = (v  + 17*bx + 29*by + 19*t) % 256
    Cb(bx,by,t) = (v2 + 11*bx         +  5*t) % 256
    Cr(bx,by,t) = (v3 +         7*by  +  3*t) % 256
    restart interval 2 on i % 7 == 0;  JUNK chunk on i % 3 == 0

Run from the repo root:  python tools/make_mjpeg_fixture.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from go_mapreduce_spark.functions.avi import encode_avi_mjpeg
from go_mapreduce_spark.functions.jpeg import (
    const_block_coeffs,
    encode_jpeg_from_coeffs,
)
from go_mapreduce_spark.operators.multimodal import MEDIA_SCHEMA
from go_mapreduce_spark.session import get_spark

OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "fixtures",
    "media_mjpeg.parquet",
)
N = 48


def build_frame_jpeg(i: int, t: int) -> bytes:
    wb = 1 + i % 3
    hb = 1 + i % 2
    width = 8 * wb - i % 5
    height = 8 * hb - i % 3
    v = (i * 37) % 251
    y_blocks = [
        [(v + 17 * bx + 29 * by + 19 * t) % 256 for bx in range(wb)]
        for by in range(hb)
    ]
    comps = [const_block_coeffs(y_blocks)]
    if i % 2 == 1:
        cb = [
            [((i * 53) % 199 + 11 * bx + 5 * t) % 256 for bx in range(wb)]
            for by in range(hb)
        ]
        cr = [
            [((i * 29) % 173 + 7 * by + 3 * t) % 256 for bx in range(wb)]
            for by in range(hb)
        ]
        comps += [const_block_coeffs(cb), const_block_coeffs(cr)]
    return encode_jpeg_from_coeffs(
        width, height, comps, restart_interval=(2 if i % 7 == 0 else 0)
    )


def build_mjpeg_avi(i: int):
    width = 8 * (1 + i % 3) - i % 5
    height = 8 * (1 + i % 2) - i % 3
    n_frames = 2 + i % 3
    rate = (10, 24, 30)[i % 3]
    jpegs = [build_frame_jpeg(i, t) for t in range(n_frames)]
    payload = encode_avi_mjpeg(
        width, height, jpegs, rate=rate, scale=1, junk=(i % 3 == 0)
    )
    duration_ms = n_frames * 1000 // rate
    return payload, width, height, duration_ms


def main() -> None:
    rows = []
    for i in range(N):
        payload, w, h, dur = build_mjpeg_avi(i)
        rows.append((i, "video", "avi", bytearray(payload), w, h, dur))
    spark = get_spark("make-mjpeg-fixture")
    df = spark.createDataFrame(rows, MEDIA_SCHEMA).coalesce(1)
    df.write.mode("overwrite").parquet(OUT)
    print(f"wrote {OUT}: {df.count()} real MJPG-AVI payloads")


if __name__ == "__main__":
    main()
