"""Interleaved A/B for x320 (round-12 verdict ask #4): PERM_CHUNKS
8 (current) vs 2 vs 1 corpus passes for the 64-replicate conditional
aggregate, and chunks=1 with spark.sql.codegen.maxFields raised so the
130-buffer aggregate stays in whole-stage codegen (the recorded reason
for chunking was codegen falling over at >100 fields).

Chunking never changes the math (each replicate's decimal sums are
computed from the same labels regardless of which pass carries them),
so identity is asserted before timing.  Per-row hash work differs:
chunks=8 computes 8 sha256/row total (each chunk re-derives one), while
chunks<=4 computes the minimal 4.
"""
import hashlib
import sys
import time

sys.path.insert(0, "/root/repo")

import go_mapreduce_spark.operators.stats as stats  # noqa: E402
from go_mapreduce_spark.session import get_spark  # noqa: E402

N = 3


def rows_hash(df):
    cols = df.columns
    rows = df.collect()
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted("|".join(str(r[i]) for i in order) for r in rows)
    return hashlib.sha256("\n".join(lines).encode()).hexdigest(), len(rows)


def build(spark, sf, chunks, max_fields=None):
    old = stats.PERM_CHUNKS
    stats.PERM_CHUNKS = chunks
    if max_fields is not None:
        spark.conf.set("spark.sql.codegen.maxFields", str(max_fields))
    try:
        return stats.x320_permutation_test(spark, sf)
    finally:
        stats.PERM_CHUNKS = old


def run(spark, sf, chunks, label, max_fields=None):
    spark.sparkContext.setJobDescription(f"ab_x320:{label}")
    t0 = time.monotonic()
    df = build(spark, sf, chunks, max_fields)
    df.write.format("noop").mode("overwrite").save()
    wall = time.monotonic() - t0
    if max_fields is not None:
        spark.conf.unset("spark.sql.codegen.maxFields")
    spark.catalog.clearCache()
    spark.sparkContext.setJobDescription(None)
    return wall


def main():
    SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("ab-x320")
    ref = rows_hash(build(spark, "/root/testdata/sf0.01", 8))
    for c in (2, 1):
        h = rows_hash(build(spark, "/root/testdata/sf0.01", c))
        assert h == ref, (c, h, ref)
    print("identical at sf0.01 for chunks in {8,2,1}:", ref, flush=True)

    arms = [
        ("c8_current", dict(chunks=8)),
        ("c2", dict(chunks=2)),
        ("c1", dict(chunks=1)),
        ("c1_maxfields300", dict(chunks=1, max_fields=300)),
    ]
    for label, kw in arms:
        run(spark, SF, label=f"warmup_{label}", **kw)
    walls = {label: [] for label, _ in arms}
    for i in range(N):
        for label, kw in arms:
            walls[label].append(run(spark, SF, label=f"{label}_{i}", **kw))
    for label, w in walls.items():
        print(label, [round(x, 3) for x in w], "min", round(min(w), 3))
    spark.stop()


if __name__ == "__main__":
    main()
