"""Measure the per-round fixed cost ("stage-scheduling floor") of the
iterative-loop family — round-10 verdict ask #4 for round 11.

SCALE.md claims x143/x378 sit at a ~0.5 s/round floor that is
scheduling, not data.  This tool turns the claim into a measurement:

- **Marginal round cost on REAL data**: run the x143/x378 loop bodies
  on the sf0.1 purchase graph at n_iter=10 and n_iter=20 in ONE
  session, interleaved, min-of-3 each.  The slope
  ``(W20 - W10) / 10`` is the true per-round cost with setup
  (scan/distinct/persist/count) differenced out.
- **No-op round cost**: the same loops on a 2-edge graph — identical
  per-round plan shape (same joins, same decimal aggregates, same
  lazy localCheckpoint, same 4 shuffle partitions: both graphs floor
  at iterative_shuffle_partitions = 4), near-zero data.  Its slope is
  the pure fixed cost of scheduling one round's stages.

If slope(real) ≈ slope(noop), rounds are scheduling-bound and the
floor claim stands (the remaining lever would be fusing rounds, which
breaks the chained-CTE oracle replay).  If slope(real) is materially
higher, data still costs and there is headroom.

Usage:  python tools/measure_loop_floor.py  [sf_dir]
Writes BENCH_FLOOR.json and prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
REPS = 3
ITERS = (10, 20)


def purchase_edges(spark, sf_dir):
    from go_mapreduce_spark.operators.graph import SUPPLIER_NODE_OFFSET
    from go_mapreduce_spark.sources.registry import load_table

    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .select(
            F.col("o_custkey").alias("u"),
            (F.col("l_suppkey") + SUPPLIER_NODE_OFFSET).alias("v"),
        )
        .distinct()
    )


def tiny_edges(spark):
    return spark.createDataFrame([(1, 2), (2, 3)], "u bigint, v bigint")


def main() -> None:
    from go_mapreduce_spark.operators.graph import pagerank_dangling, ppr_seeded
    from go_mapreduce_spark.session import get_spark

    spark = get_spark("loop-floor")
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    def run(tag: str, fn) -> float:
        t0 = time.perf_counter()
        fn().write.format("noop").mode("overwrite").save()
        w = round(time.perf_counter() - t0, 3)
        spark.catalog.clearCache()
        return w

    variants = {}
    for loop_name, loop in (("x143", pagerank_dangling), ("x378", ppr_seeded)):
        for data_name in ("real", "noop"):
            for n_iter in ITERS:
                def make(loop=loop, data_name=data_name, n_iter=n_iter):
                    edges = (
                        purchase_edges(spark, SF_DIR)
                        if data_name == "real"
                        else tiny_edges(spark)
                    )
                    if loop is ppr_seeded:
                        seeds = (
                            edges.select(F.col("u").alias("node")).limit(200)
                            if data_name == "noop"
                            else purchase_seeds(spark)
                        )
                        out = loop(edges, seeds, n_iter=n_iter)
                    else:
                        out = loop(edges, n_iter=n_iter)
                    return out.select("node", F.round("rank", 6).alias("rank"))
                variants[(loop_name, data_name, n_iter)] = make

    def purchase_seeds(spark=spark):
        from go_mapreduce_spark.operators.graph import PPR_SEED_NATION
        from go_mapreduce_spark.sources.registry import load_table

        return (
            load_table(spark, SF_DIR, "customer")
            .filter(F.col("c_nationkey") == PPR_SEED_NATION)
            .select(F.col("c_custkey").alias("node"))
        )

    # warmup every variant once (JIT/codegen/scan caches), then
    # interleave reps: variant order inside each rep, reps outermost —
    # host drift lands evenly across variants (bench-drift discipline)
    keys = list(variants)
    for k in keys:
        variants[k]().write.format("noop").mode("overwrite").save()
        spark.catalog.clearCache()
    walls: dict = {k: [] for k in keys}
    for _ in range(REPS):
        for k in keys:
            walls[k].append(run(k, variants[k]))

    out = {"sf_dir": SF_DIR, "reps": REPS, "runs": {}, "slopes": {}}
    for k in keys:
        out["runs"]["/".join(map(str, k))] = walls[k]
    for loop_name in ("x143", "x378"):
        for data_name in ("real", "noop"):
            lo = min(walls[(loop_name, data_name, ITERS[0])])
            hi = min(walls[(loop_name, data_name, ITERS[1])])
            slope = round((hi - lo) / (ITERS[1] - ITERS[0]), 4)
            out["slopes"][f"{loop_name}/{data_name}"] = {
                "w10": lo,
                "w20": hi,
                "sec_per_round": slope,
            }
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "BENCH_FLOOR.json",
    )
    json.dump(out, open(path, "w"), indent=1)
    print(json.dumps(out["slopes"]))
    spark.stop()


if __name__ == "__main__":
    main()
