"""Generate the committed REAL-JPEG fixture parquet.

One-shot tool (output committed so the DuckDB oracle reads a stable
absolute path): 48 genuine baseline-JPEG payloads produced by the
stdlib encoder (go_mapreduce_spark/functions/jpeg.py) — spec-
compliant SOI/APP0/DQT/SOF0/DHT/(DRI)/SOS streams with canonical
Huffman entropy coding, unity quantization tables, 4:4:4 sampling.

JPEG is lossy in general, but an image whose 8×8 blocks are each a
CONSTANT sample decodes BIT-EXACTLY (DC-only blocks; jpeg.py module
docstring proves the round trip), and the decoder's YCbCr→RGB is
integer fixed-point — so every decoded pixel is pure ARITHMETIC on
media_id and the x417 oracle recomputes dimensions and exact
per-channel sums in SQL without touching payload bytes:

    i        = media_id, 0..47
    wb       = 1 + i % 3,  hb = 1 + i % 2          (block grid)
    width    = 8*wb − i % 5,  height = 8*hb − i % 3 (edge-crop dims)
    color    = (i % 2 == 1)  → 3-component YCbCr, else grayscale
    v        = (i*37) % 251
    Y(bx,by)  = (v + 17*bx + 29*by) % 256
    Cb(bx,by) = ((i*53) % 199 + 11*bx) % 256
    Cr(bx,by) = ((i*29) % 173 + 7*by) % 256
    COM on i % 3 == 0;  DRI (restart interval 2) on i % 7 == 0

Run from the repo root:  python tools/make_jpeg_fixture.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from go_mapreduce_spark.functions.jpeg import (
    const_block_coeffs,
    encode_jpeg_from_coeffs,
)
from go_mapreduce_spark.operators.multimodal import MEDIA_SCHEMA
from go_mapreduce_spark.session import get_spark

OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "fixtures",
    "media_jpeg.parquet",
)
N = 48


def build_jpeg(i: int) -> tuple[bytes, int, int]:
    wb = 1 + i % 3
    hb = 1 + i % 2
    width = 8 * wb - i % 5
    height = 8 * hb - i % 3
    v = (i * 37) % 251
    y_blocks = [
        [(v + 17 * bx + 29 * by) % 256 for bx in range(wb)] for by in range(hb)
    ]
    comps = [const_block_coeffs(y_blocks)]
    if i % 2 == 1:
        cb_blocks = [
            [((i * 53) % 199 + 11 * bx) % 256 for bx in range(wb)]
            for by in range(hb)
        ]
        cr_blocks = [
            [((i * 29) % 173 + 7 * by) % 256 for bx in range(wb)]
            for by in range(hb)
        ]
        comps += [const_block_coeffs(cb_blocks), const_block_coeffs(cr_blocks)]
    return (
        encode_jpeg_from_coeffs(
            width,
            height,
            comps,
            comment=(f"gms fixture {i}".encode() if i % 3 == 0 else None),
            restart_interval=(2 if i % 7 == 0 else 0),
        ),
        width,
        height,
    )


def main() -> None:
    rows = []
    for i in range(N):
        payload, w, h = build_jpeg(i)
        rows.append((i, "image", "jpeg", bytearray(payload), w, h, -1))
    spark = get_spark("make-jpeg-fixture")
    df = spark.createDataFrame(rows, MEDIA_SCHEMA).coalesce(1)
    df.write.mode("overwrite").parquet(OUT)
    print(f"wrote {OUT}: {df.count()} real JPEG payloads")


if __name__ == "__main__":
    main()
