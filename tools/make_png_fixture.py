"""Generate the committed REAL-PNG fixture parquet.

One-shot tool (output committed so the DuckDB oracle reads a stable
absolute path): 48 genuine PNG payloads produced by the stdlib
encoder (go_mapreduce_spark/functions/png.py), covering all five
supported color types with every scanline filter type exercised
(the encoder cycles ``y % 5``).

Every image parameter is pure ARITHMETIC on media_id, so the x414
oracle recomputes the expected decode results (dimensions, channels,
mean luma) from first principles in SQL without ever touching the
payload bytes — the strongest cross-check available for a codec:

    i          = media_id, 0..N-1
    width      = 4 + i % 13
    height     = 3 + i % 7
    v          = (i * 37) % 251        (base intensity)
    color type = [0, 2, 3, 4, 6][i % 5]
    pixel(x,y) = horizontal ramp p(x) = (v + 3*x) % 256, rows equal:
        gray / gray+alpha : sample = p(x)           (alpha = 255)
        RGB / RGBA        : (p(x), (p(x)+85)%256, (p(x)+170)%256)
        palette           : index p(x) % 16 into a GRAY palette
                            g_j = (v + 5*j) % 256  → luma = g exactly

Run from the repo root:  python tools/make_png_fixture.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from go_mapreduce_spark.functions.png import encode_png
from go_mapreduce_spark.operators.multimodal import MEDIA_SCHEMA
from go_mapreduce_spark.session import get_spark

OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "fixtures",
    "media_png.parquet",
)
N = 48
COLOR_TYPES = (0, 2, 3, 4, 6)


def build_png(i: int) -> tuple[bytes, int, int]:
    w = 4 + i % 13
    h = 3 + i % 7
    v = (i * 37) % 251
    ct = COLOR_TYPES[i % 5]
    ramp = [(v + 3 * x) % 256 for x in range(w)]
    row = bytearray()
    palette = b""
    for x in range(w):
        p = ramp[x]
        if ct == 0:
            row.append(p)
        elif ct == 2:
            row += bytes((p, (p + 85) % 256, (p + 170) % 256))
        elif ct == 3:
            row.append(p % 16)
        elif ct == 4:
            row += bytes((p, 255))
        else:  # 6
            row += bytes((p, (p + 85) % 256, (p + 170) % 256, 255))
    if ct == 3:
        palette = b"".join(
            bytes(((v + 5 * j) % 256,) * 3) for j in range(16)
        )
    return encode_png(w, h, ct, bytes(row) * h, palette=palette), w, h


def rows(n: int = N):
    out = []
    for i in range(n):
        payload, w, h = build_png(i)
        out.append((i, "image", "png", bytearray(payload), w, h, -1))
    return out


def main() -> None:
    spark = get_spark("make_png_fixture", cpus=2, shuffle_partitions=2)
    spark.createDataFrame(rows(), MEDIA_SCHEMA).coalesce(1).write.mode(
        "overwrite"
    ).parquet(OUT)
    print(f"wrote {N} rows to {OUT}")


if __name__ == "__main__":
    main()
