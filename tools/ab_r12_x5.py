"""Interleaved min-of-N A/B for x5_dedup_simhash: old (wide bits
array through exchanges, verify after distinct) vs new (packed sig,
verify before distinct).  Both timed through the noop sink in one
session, alternating reps."""
import sys
import time

sys.path.insert(0, "/root/repo")
from pyspark.sql import functions as F  # noqa: E402

from go_mapreduce_spark.operators.dedup import (  # noqa: E402
    simhash_signatures,
    x5_dedup_simhash,
)
from go_mapreduce_spark.operators.scale import spread_for_fanout  # noqa: E402
from go_mapreduce_spark.session import get_spark  # noqa: E402
from go_mapreduce_spark.sources.registry import load_table  # noqa: E402

SF = "/root/testdata/sf0.1"
N = 3


def x5_old(spark, sf_dir, max_hamming=3):
    docs = spread_for_fanout(load_table(spark, sf_dir, "documents"))
    sigs = simhash_signatures(docs).persist()
    chunks = sigs.select(
        "doc_id",
        "bits",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("chunk"),
                        sum(
                            (F.col("bits")[c * 16 + j] * F.lit(1 << j) for j in range(16)),
                            F.lit(0),
                        ).alias("key"),
                    )
                    for c in range(4)
                ]
            )
        ).alias("cb"),
    ).select("doc_id", "bits", "cb.chunk", "cb.key")
    a = chunks.alias("a")
    b = chunks.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.chunk") == F.col("b.chunk"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.bits").alias("bits_a"),
            F.col("b.bits").alias("bits_b"),
        )
        .distinct()
    )
    hamming = F.aggregate(
        F.zip_with(F.col("bits_a"), F.col("bits_b"), lambda x, y: F.abs(x - y)),
        F.lit(0),
        lambda acc, v: acc + v,
    )
    return (
        cand.withColumn("hamming", hamming)
        .filter(F.col("hamming") <= max_hamming)
        .select("doc_a", "doc_b", "hamming")
        .orderBy("doc_a", "doc_b")
    )


def run(spark, fn, label):
    spark.sparkContext.setJobDescription(f"ab_x5:{label}")
    t0 = time.monotonic()
    df = fn(spark, SF)
    df.write.format("noop").mode("overwrite").save()
    wall = time.monotonic() - t0
    spark.catalog.clearCache()
    spark.sparkContext.setJobDescription(None)
    return wall


def main():
    spark = get_spark("ab-x5")
    # warmup both once (JIT, codegen caches)
    run(spark, x5_old, "warmup_old")
    run(spark, x5_dedup_simhash, "warmup_new")
    old_w, new_w = [], []
    for i in range(N):
        old_w.append(run(spark, x5_old, f"old_{i}"))
        new_w.append(run(spark, x5_dedup_simhash, f"new_{i}"))
    print("old walls", [round(w, 3) for w in old_w], "min", round(min(old_w), 3))
    print("new walls", [round(w, 3) for w in new_w], "min", round(min(new_w), 3))
    spark.stop()


if __name__ == "__main__":
    main()
