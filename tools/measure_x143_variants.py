"""Round-13 probe: decompose the x143/x378 per-round cost and A/B the
candidate restructurings of the dangling-PageRank loop, same-session
interleaved min-of-N through the noop sink (guide §1).

Variants (all arithmetically identical — decimal sums are exact and
associative, expressions unchanged):

  A  current pagerank_dangling (separate dangling agg per round,
     checkpoint every round)
  B  single-pass round: ranks ⟕ ed_deg with a NULL-target dangling
     bucket feeds ONE groupBy; the dangling row is re-aggregated to a
     guaranteed-1-row relation (ranks referenced ONCE per round)
  C  B with checkpoint_every=2 (round fusion; the agg double-reference
     sits above the shuffle, so ReuseExchange dedupes execution)
  D  B with checkpoint_every=3

Prints per-variant min-of-3 wall + job/stage counts and verifies
results are BIT-identical to A before timing.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, functions as F

from go_mapreduce_spark.operators.graph import (
    _DEC,
    PR_DAMPING,
    PR_ITERS,
    SUPPLIER_NODE_OFFSET,
    pagerank_dangling,
)
from go_mapreduce_spark.operators.scale import (
    iterative_plan_confs,
    iterative_shuffle_partitions,
)
from go_mapreduce_spark.session import get_spark
from go_mapreduce_spark.sources.registry import load_table

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def edges_x143(spark):
    li = load_table(spark, SF_DIR, "lineitem")
    orders = load_table(spark, SF_DIR, "orders")
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .select(
            F.col("o_custkey").alias("u"),
            (F.col("l_suppkey") + SUPPLIER_NODE_OFFSET).alias("v"),
        )
        .distinct()
    )


def pagerank_dangling_b(
    edges: DataFrame,
    damping: float = PR_DAMPING,
    n_iter: int = PR_ITERS,
    checkpoint_every: int = 1,
) -> DataFrame:
    """Variant B/C/D: one left-join pass per round produces both the
    per-target contributions AND the dangling bucket (target NULL), so
    the iterated relation is referenced exactly once per round."""
    ed = edges.select("u", "v").distinct().persist()
    m = ed.count()
    parts = iterative_shuffle_partitions(m, cpu_bound=True)
    spark = edges.sparkSession
    with iterative_plan_confs(spark, parts):
        outd = ed.groupBy("u").agg(F.count(F.lit(1)).alias("deg"))
        ed_deg = ed.join(outd, "u").repartition(parts, "u").persist()
        nodes = (
            ed.select(F.col("u").alias("node"))
            .union(ed.select(F.col("v").alias("node")))
            .distinct()
            .persist()
        )
        n = nodes.count()
        teleport = (1.0 - damping) / n
        out_nodes = outd.select(F.col("u").alias("node"))
        nodes_f = nodes.join(
            out_nodes.withColumn("_o", F.lit(1)), "node", "left"
        ).select("node", F.col("_o").isNull().alias("is_dangling")).persist()
        ranks = nodes_f.withColumn("rank", F.lit(1.0 / n))
        for i in range(n_iter):
            j = ranks.withColumnRenamed("node", "u").join(ed_deg, "u", "left")
            pooled = j.select(
                F.col("v").alias("tgt"),
                F.when(
                    F.col("v").isNull(), F.col("rank").cast(_DEC)
                ).otherwise((F.col("rank") / F.col("deg")).cast(_DEC)).alias(
                    "val"
                ),
            )
            agg = pooled.groupBy("tgt").agg(
                F.sum("val").alias("sv")
            )
            summed = agg.filter(F.col("tgt").isNotNull()).select(
                F.col("tgt").alias("node"), F.col("sv").cast("double").alias("s")
            )
            dangling = agg.filter(F.col("tgt").isNull()).agg(
                F.coalesce(F.sum("sv").cast("double"), F.lit(0.0)).alias("dm")
            )
            ranks = (
                nodes_f.join(summed, "node", "left")
                .crossJoin(F.broadcast(dangling))
                .select(
                    "node",
                    "is_dangling",
                    (
                        F.lit(teleport)
                        + F.lit(damping)
                        * (
                            F.coalesce("s", F.lit(0.0))
                            + F.col("dm") / F.lit(float(n))
                        )
                    ).alias("rank"),
                )
            )
            last = i + 1 == n_iter
            if (i + 1) % checkpoint_every == 0 or last:
                ranks = ranks.localCheckpoint(eager=last)
        ranks = ranks.select("node", "rank")
        ed_deg.unpersist()
        nodes.unpersist()
        nodes_f.unpersist()
    ed.unpersist()
    return ranks


def finish(out):
    return out.select("node", F.round("rank", 6).alias("rank")).orderBy("node")


def main():
    spark = get_spark("x143probe")
    sc = spark.sparkContext
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    variants = {
        "A_current": lambda: pagerank_dangling(edges_x143(spark)),
        "B_onepass_cp1": lambda: pagerank_dangling_b(
            edges_x143(spark), checkpoint_every=1
        ),
        "C_onepass_cp2": lambda: pagerank_dangling_b(
            edges_x143(spark), checkpoint_every=2
        ),
        "D_onepass_cp3": lambda: pagerank_dangling_b(
            edges_x143(spark), checkpoint_every=3
        ),
    }

    # result identity first (exact doubles, pre-round): A vs each
    ref = {
        r["node"]: r["rank"] for r in pagerank_dangling(edges_x143(spark)).collect()
    }
    for name, fn in list(variants.items())[1:]:
        got = {r["node"]: r["rank"] for r in fn().collect()}
        same = got == ref
        print(f"identity {name}: {'OK' if same else 'MISMATCH'}", flush=True)
        if not same:
            diff = [
                (k, ref[k], got.get(k))
                for k in list(ref)
                if got.get(k) != ref[k]
            ][:5]
            print("  first diffs:", diff, flush=True)
            del variants[name]

    walls = {name: [] for name in variants}
    jobs = {}
    for rep in range(3):
        for name, fn in variants.items():
            os.sync()
            j0 = len(sc.statusTracker().getJobIdsForGroup(None) or [])
            sc.setJobDescription(f"{name} rep{rep}")
            t0 = time.perf_counter()
            finish(fn()).write.format("noop").mode("overwrite").save()
            walls[name].append(round(time.perf_counter() - t0, 3))
            sc.setJobDescription(None)
            spark.catalog.clearCache()
    for name in variants:
        print(
            f"{name}: min={min(walls[name])} walls={walls[name]}", flush=True
        )


if __name__ == "__main__":
    main()
