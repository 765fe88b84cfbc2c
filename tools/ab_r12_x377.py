"""Interleaved min-of-N A/B for x377_kcenter_coreset: old (per-element
F.lit Column construction, in-plan literal-array norms) vs new (one
F.expr SQL string per round, pick norms folded to double literals in
Python — bit-identical IEEE sequence).  Verifies both return identical
rows before timing."""
import math
import sys
import time

sys.path.insert(0, "/root/repo")
from pyspark.sql import functions as F  # noqa: E402

from go_mapreduce_spark.functions.vectors import cosine_similarity  # noqa: E402
from go_mapreduce_spark.operators.scale import iterative_plan_confs  # noqa: E402
from go_mapreduce_spark.operators.similarity import (  # noqa: E402
    KCENTER_K,
    KCENTER_SEED_SENTINEL,
    x377_kcenter_coreset,
)
from go_mapreduce_spark.session import get_spark  # noqa: E402
from go_mapreduce_spark.sources.registry import load_table  # noqa: E402

SF = "/root/testdata/sf0.1"
N = 3


def x377_old(spark, sf_dir, k=KCENTER_K):
    emb = (
        load_table(spark, sf_dir, "embeddings")
        .select("vec_id", "embedding")
        .persist()
    )

    def lit_vec(vals):
        return F.array(*[F.lit(float(v)) for v in vals])

    with iterative_plan_confs(spark, 4):
        seed = emb.orderBy("vec_id").limit(1).collect()[0]
        picks = [(1, int(seed.vec_id), KCENTER_SEED_SENTINEL, seed.embedding)]
        for rank in range(2, k + 1):
            dmin = F.least(
                *[
                    F.lit(1.0)
                    - cosine_similarity(F.col("embedding"), lit_vec(vec))
                    for _, _, _, vec in picks
                ]
            ) if len(picks) > 1 else (
                F.lit(1.0)
                - cosine_similarity(F.col("embedding"), lit_vec(picks[0][3]))
            )
            far = (
                emb.withColumn("d", dmin)
                .orderBy(F.col("d").desc(), F.col("vec_id").asc())
                .limit(1)
                .collect()[0]
            )
            picks.append((rank, int(far.vec_id), float(far.d), far.embedding))
    emb.unpersist()
    return spark.createDataFrame(
        [(r, v, d) for r, v, d, _ in picks],
        "sel_rank int, vec_id bigint, d_raw double",
    ).select("sel_rank", "vec_id", F.round("d_raw", 6).alias("d_min")).orderBy(
        "sel_rank"
    )


EMB_NORM_SQL = (
    "sqrt(aggregate(embedding, 0.0D, (acc, v) -> "
    "acc + CAST(v AS DOUBLE) * CAST(v AS DOUBLE)))"
)


def _term_sql(vec):
    vals = [float(v) for v in vec]
    arr = "array(" + ", ".join(f"{v!r}D" for v in vals) + ")"
    acc = 0.0
    for v in vals:
        acc += v * v
    nv = math.sqrt(acc)
    dot = (
        f"aggregate(zip_with(embedding, {arr}, (x, y) -> "
        "CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), 0.0D, (acc, v) -> acc + v)"
    )
    return f"1.0D - {dot} / ({EMB_NORM_SQL} * {nv!r}D)"


def x377_new(spark, sf_dir, k=KCENTER_K):
    emb = (
        load_table(spark, sf_dir, "embeddings")
        .select("vec_id", "embedding")
        .persist()
    )
    with iterative_plan_confs(spark, 4):
        seed = emb.orderBy("vec_id").limit(1).collect()[0]
        picks = [(1, int(seed.vec_id), KCENTER_SEED_SENTINEL, seed.embedding)]
        for rank in range(2, k + 1):
            terms = [_term_sql(vec) for _, _, _, vec in picks]
            dmin_sql = (
                "least(" + ", ".join(terms) + ")" if len(terms) > 1 else terms[0]
            )
            far = (
                emb.withColumn("d", F.expr(dmin_sql))
                .orderBy(F.col("d").desc(), F.col("vec_id").asc())
                .limit(1)
                .collect()[0]
            )
            picks.append((rank, int(far.vec_id), float(far.d), far.embedding))
    emb.unpersist()
    return spark.createDataFrame(
        [(r, v, d) for r, v, d, _ in picks],
        "sel_rank int, vec_id bigint, d_raw double",
    ).select("sel_rank", "vec_id", F.round("d_raw", 6).alias("d_min")).orderBy(
        "sel_rank"
    )


def run(spark, fn, label):
    spark.sparkContext.setJobDescription(f"ab_x377:{label}")
    t0 = time.monotonic()
    df = fn(spark, SF)
    df.write.format("noop").mode("overwrite").save()
    wall = time.monotonic() - t0
    spark.catalog.clearCache()
    spark.sparkContext.setJobDescription(None)
    return wall


def main():
    spark = get_spark("ab-x377")
    # verify identity first (full precision via collect of d_min + d_raw path)
    for sf in ("/root/testdata/sf0.01", SF):
        global SF_CUR
        ro = [tuple(r) for r in x377_old(spark, sf).collect()]
        rn = [tuple(r) for r in x377_new(spark, sf).collect()]
        assert ro == rn, (sf, ro, rn)
        print("identical rows at", sf, ro[:2], "...")
    run(spark, x377_old, "warmup_old")
    run(spark, x377_new, "warmup_new")
    old_w, new_w = [], []
    for i in range(N):
        old_w.append(run(spark, x377_old, f"old_{i}"))
        new_w.append(run(spark, x377_new, f"new_{i}"))
    print("old walls", [round(w, 3) for w in old_w], "min", round(min(old_w), 3))
    print("new walls", [round(w, 3) for w in new_w], "min", round(min(new_w), 3))
    spark.stop()


if __name__ == "__main__":
    main()
