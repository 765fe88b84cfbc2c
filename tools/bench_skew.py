"""Opt-in skew-stress bench: the hot paths under injected key skew.

The regular bench fixtures are near-uniform, so the skew defenses
(posting caps in x6/x27, single-shuffle windows + AQE in x80/x123)
were never exercised at bench scale — this tool injects the skew the
round-3 verdict asked for and records whether walls stay bounded:

- events: ONE user rewritten onto ~20% of all rows (hash-chosen rows,
  deterministic) — stresses the user_id shuffle in x80 sessionize and
  x123 first-touch.
- documents: one shared 3-token phrase appended to ~20% of docs — a
  posting (shingle) hot key covering 20% of the corpus, stressing the
  x6/x27 inverted-index self-join (the ``max_df`` posting cap is the
  designed defense: a hot shingle is evidence-free for dedup and gets
  dropped, bounding candidate pairs).

Usage::

    python tools/bench_skew.py [sf_dir] [n_runs]

Writes BENCH_SKEW.json at the repo root: per query the uniform wall,
skewed wall, and ratio (gate: ratio ≤ 2 — skew must degrade, not
explode).  Prints one compact JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
    "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
)
N_RUNS = int(sys.argv[2]) if len(sys.argv) > 2 else 2
HOT_USER = 1
HOT_FRACTION_MOD = 5  # 1-in-5 rows → 20%
HOT_PHRASE = " skewstress alpha omega"

SKEW_QUERIES = ["x6_dedup_ngram_jaccard", "x27_dedup_clusters", "x80_sessionize", "x123_first_touch"]


def build_skew_dir(spark, sf_dir: str) -> str:
    """Materialize the skewed twin fixture (events + documents only —
    the four stressed queries read nothing else)."""
    import tempfile

    from pyspark.sql import functions as F

    from go_mapreduce_spark.sources.registry import load_table

    tag = os.path.basename(os.path.normpath(sf_dir))
    out = os.path.join(tempfile.gettempdir(), f"gms_skew_{tag}")
    marker = os.path.join(out, "_BUILT")
    if os.path.isfile(marker):
        return out
    os.makedirs(out, exist_ok=True)

    ev = load_table(spark, sf_dir, "events")
    skew_ev = ev.withColumn(
        "user_id",
        F.when(
            F.pmod(F.xxhash64(F.col("event_id")), F.lit(HOT_FRACTION_MOD)) == 0,
            F.lit(HOT_USER).cast("long"),
        ).otherwise(F.col("user_id")),
    )
    skew_ev.write.mode("overwrite").parquet(os.path.join(out, "events.parquet"))

    docs = load_table(spark, sf_dir, "documents")
    skew_docs = docs.withColumn(
        "text",
        F.when(
            F.pmod(F.xxhash64(F.col("doc_id")), F.lit(HOT_FRACTION_MOD)) == 0,
            F.concat(F.col("text"), F.lit(HOT_PHRASE)),
        ).otherwise(F.col("text")),
    )
    skew_docs.write.mode("overwrite").parquet(os.path.join(out, "documents.parquet"))
    with open(marker, "w") as f:
        f.write("ok\n")
    return out


def main() -> int:
    from go_mapreduce_spark.queries import QUERIES
    from go_mapreduce_spark.session import get_spark

    spark = get_spark("bench-skew")
    skew_dir = build_skew_dir(spark, SF_DIR)

    results: dict[str, dict] = {}
    worst = 0.0
    for name in SKEW_QUERIES:
        fn = QUERIES[name]
        walls = {}
        for label, d in (("uniform", SF_DIR), ("skewed", skew_dir)):
            best = None
            for _ in range(N_RUNS):
                t0 = time.perf_counter()
                fn(spark, d).collect()
                w = time.perf_counter() - t0
                best = w if best is None else min(best, w)
            walls[label] = round(best, 3)
            spark.catalog.clearCache()
        ratio = round(walls["skewed"] / walls["uniform"], 3)
        worst = max(worst, ratio)
        results[name] = {**walls, "ratio": ratio}
        print(f"  {name}: uniform={walls['uniform']}s skewed={walls['skewed']}s ratio={ratio}", file=sys.stderr)

    out = {
        "metric": "skew_stress_ratio_max",
        "value": worst,
        "unit": "x",
        "sf": SF_DIR,
        "hot_fraction": 1.0 / HOT_FRACTION_MOD,
        "queries": results,
        "gate": "ratio <= 2.0",
        "pass": worst <= 2.0,
    }
    with open(os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "BENCH_SKEW.json"), "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps({k: out[k] for k in ("metric", "value", "unit", "sf", "pass")}))
    return 0 if worst <= 2.0 else 1


if __name__ == "__main__":
    raise SystemExit(main())
