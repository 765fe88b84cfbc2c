"""Decompose x253's sf1 exponent (round-11 verdict ask #4).

x253_naive_bayes_langid is the registry's worst sf1 exponent (0.545,
BENCH_SF1.json) and ~3 s in bench.  Its plan has three cost centers:

  A. train      — gram explode + groupBy(g, lang) count (corpus pass 1)
  B1. gram join — gram re-explode + join vs the vocab-sized model,
                  reduced with a GLOBAL count (isolates the join's
                  data volume from the wide aggregate that follows)
  B2. overlap   — the same join followed by the per-(doc_id,
                  model_lang) SUM aggregate (the query's real
                  ``overlap`` CTE; B2 − B1 ≈ the aggregate's width
                  cost)
  C. full       — the declared query end-to-end

The question the exponent split answers: does x253 scale on the gram
JOIN (data volume → partition-sizing levers apply) or on the per-doc
AGGREGATE (key width → spread/skew levers apply)?  Cells are
interleaved sf0.1 → sf1 within each rep (drift lands on both scale
factors; see MEMORY bench-session-drift) and min-of-N per cell.

Usage: python tools/measure_x253_split.py [sf01_dir] [sf1_dir] [reps]
Writes one JSON line; paste the table into SCALE.md.
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

SF01 = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
SF1 = sys.argv[2] if len(sys.argv) > 2 else "/tmp/gms_sf1"
REPS = int(sys.argv[3]) if len(sys.argv) > 3 else 3


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from go_mapreduce_spark.operators.scale import spread_for_fanout
    from go_mapreduce_spark.sources.registry import load_table

    return (
        spread_for_fanout(load_table(spark, sf_dir, "documents"))
        .select("doc_id", "lang", F.lower("text").alias("t"))
        .filter(F.length("t") >= 2)
    )


def _grams(docs: DataFrame, with_doc: bool) -> DataFrame:
    cols = ["doc_id"] if with_doc else ["lang"]
    return docs.select(
        *cols,
        F.explode(
            F.expr("transform(sequence(1, length(t) - 1), i -> substring(t, i, 2))")
        ).alias("g"),
    )


def main() -> None:
    from go_mapreduce_spark.queries import QUERIES
    from go_mapreduce_spark.session import get_spark

    spark = get_spark("measure-x253-split")
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    def calib() -> float:
        best = None
        for _ in range(3):
            t0 = time.perf_counter()
            spark.range(400_000_000).selectExpr("sum(id * 3 + 1)").collect()
            c = time.perf_counter() - t0
            best = c if best is None else min(best, c)
        return round(best, 3)

    calib_sec = calib()

    # pre-built per-sf model (persisted, like the query's counts view)
    models: dict[str, DataFrame] = {}
    for d in (SF01, SF1):
        m = (
            _grams(_docs(spark, d), with_doc=False)
            .groupBy("g", F.col("lang").alias("model_lang"))
            .agg(F.count(F.lit(1)).alias("c"))
            .persist()
        )
        m.count()
        models[d] = m

    def stage_train(d: str) -> None:
        _grams(_docs(spark, d), with_doc=False).groupBy(
            "g", F.col("lang").alias("model_lang")
        ).agg(F.count(F.lit(1)).alias("c")).selectExpr(
            "count(1) AS n"
        ).collect()

    def stage_join_only(d: str) -> None:
        dg = _grams(_docs(spark, d), with_doc=True)
        dg.join(models[d], "g").selectExpr("count(1) AS n").collect()

    def stage_overlap(d: str) -> None:
        dg = _grams(_docs(spark, d), with_doc=True)
        (
            dg.join(models[d], "g")
            .groupBy("doc_id", "model_lang")
            .agg(F.sum(F.log(F.col("c") + 1)).alias("log_match"))
            .selectExpr("count(1) AS n")
            .collect()
        )

    def stage_full(d: str) -> None:
        QUERIES["x253_naive_bayes_langid"](spark, d).collect()

    stages = {
        "A_train": stage_train,
        "B1_gram_join_global_count": stage_join_only,
        "B2_overlap_per_doc_agg": stage_overlap,
        "C_full_query": stage_full,
    }
    walls: dict[str, dict[str, float]] = {s: {} for s in stages}
    for rep in range(REPS):
        for sname, fn in stages.items():
            for d in (SF01, SF1):
                t0 = time.perf_counter()
                fn(d)
                w = round(time.perf_counter() - t0, 3)
                key = "sf0.1" if d == SF01 else "sf1"
                walls[sname][key] = min(walls[sname].get(key, w), w)
        print(f"rep {rep + 1}/{REPS} done: "
              + ", ".join(f"{s}={walls[s]}" for s in stages), file=sys.stderr)

    calib_end = calib()
    out = {
        "purpose": "x253 sf1-exponent decomposition (round-11 verdict ask #4)",
        "reps_min_of": REPS,
        "interleaved": "sf0.1/sf1 within each rep, stages round-robin",
        "calib_sec": calib_sec,
        "calib_sec_end": calib_end,
        "stages": {
            s: {
                **w,
                "ratio": round(w["sf1"] / w["sf0.1"], 3),
                "exponent": round(math.log10(w["sf1"] / w["sf0.1"]), 3),
            }
            for s, w in walls.items()
        },
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
