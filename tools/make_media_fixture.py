"""Generate the committed multimodal fixture parquet.

One-shot tool (the output is committed so the DuckDB oracle can read
a stable absolute path): 64 deterministic media rows in MEDIA_SCHEMA.

Payload bytes are printable ASCII (hex-digest repeats) ON PURPOSE:
they still travel as ``binary``/BLOB end-to-end, but DuckDB's sha256
accepts only VARCHAR, so the oracle hashes ``CAST(payload AS
VARCHAR)`` — byte-identical to the raw payload only when every byte
is printable ASCII (non-printable bytes would be \\xHH-escaped by the
cast).  The Spark side treats the payload as opaque bytes throughout.

Run from the repo root:  python tools/make_media_fixture.py
"""

from __future__ import annotations

import hashlib
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from go_mapreduce_spark.operators.multimodal import MEDIA_SCHEMA
from go_mapreduce_spark.session import get_spark

OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "fixtures", "media.parquet")
N = 64


def rows(n: int = N):
    out = []
    for i in range(n):
        kind = ("image", "audio", "video")[i % 3]
        fmt = {"image": "png", "audio": "wav", "video": "mp4"}[kind]
        payload = (hashlib.sha256(f"media:{i}".encode()).hexdigest() * (2 + i % 5)).encode("ascii")
        out.append(
            (
                i,
                kind,
                fmt,
                bytearray(payload),
                64 + i if kind == "image" else -1,
                48 + i if kind == "image" else -1,
                (i + 1) * 3000 if kind == "video" else -1,
            )
        )
    return out


def main() -> None:
    spark = get_spark("make_media_fixture", cpus=2, shuffle_partitions=2)
    spark.createDataFrame(rows(), MEDIA_SCHEMA).coalesce(1).write.mode("overwrite").parquet(OUT)
    print(f"wrote {N} rows to {OUT}")


if __name__ == "__main__":
    main()
