"""Generate the committed media-DEDUP fixture parquet.

Same schema and printable-ASCII payload convention as
make_media_fixture.py (see that file's oracle rationale), but with
CONTENT DUPLICATES by construction: 64 base rows plus 24 re-uploads —
media_id 1000+i carries the same payload bytes as base row ``i % 16``
(so 16 payloads appear 2–3 times).  Exact content dedup (x122) needs
duplicate groups to find; the primary fixture is dup-free on purpose
(x35's decode oracle wants one row per id).

Run from the repo root:  python tools/make_media_dup_fixture.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from go_mapreduce_spark.operators.multimodal import MEDIA_SCHEMA
from go_mapreduce_spark.session import get_spark
from tools.make_media_fixture import rows

OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "fixtures",
    "media_dup.parquet",
)
N_DUPS = 24


def dup_rows():
    base = rows()
    out = list(base)
    for i in range(N_DUPS):
        src = base[i % 16]
        out.append((1000 + i, src[1], src[2], src[3], src[4], src[5], src[6]))
    return out


def main() -> None:
    spark = get_spark("make_media_dup_fixture", cpus=2, shuffle_partitions=2)
    spark.createDataFrame(dup_rows(), MEDIA_SCHEMA).coalesce(1).write.mode(
        "overwrite"
    ).parquet(OUT)
    print(f"wrote {len(dup_rows())} rows to {OUT}")


if __name__ == "__main__":
    main()
