"""Synthesize a larger scale-factor fixture by key-shifted replication
of /root/testdata/sf0.1 — for SCALING measurements only (BENCH_SF1),
never for correctness oracles (the driver's generator is authoritative
and read-only; this tool writes outside /root/testdata).

Design: each of the N copies shifts every scaled primary/foreign key
by copy_idx * OFFSET so join fan-outs, group cardinalities, and key
distributions grow linearly, exactly as a real SF increase would.
region/nation are contract-bounded and copied once.  Two content
perturbations keep the DATA linear where naive replication would not:

- documents.text applies a BIJECTIVE per-copy token mapping (every
  word gets the copy's letter suffix): identical cross-copy texts
  would otherwise form 10-cliques in every near-dup pair graph (45x
  pair blowup — superlinear for data reasons, which would corrupt
  the plan-scaling measurement).  A bijection preserves the
  within-copy Jaccard structure EXACTLY (every copy contributes the
  same 256 planted pairs) while making cross-copy shingle sets
  exactly disjoint.  Two earlier designs measurably failed: salt
  tokens with digits dissolve in the [a-z]+ tokenizer, and positional
  insertion/replacement breaks within-copy near-dups whenever the
  pair's lengths differ (373 pairs instead of 2560).
- embeddings.embedding is rotated by copy_idx positions (norms and
  within-copy geometry preserved; cross-copy near-identity broken).

Usage: python tools/make_scale_fixture.py [out_dir] [n_copies]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from go_mapreduce_spark.session import get_spark

SRC = "/root/testdata/sf0.1"
OFFSET = 10_000_000  # far above any sf0.1 key

KEY_COLS = {
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}


def main() -> None:
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/gms_sf1"
    n_copies = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    spark = get_spark("make_scale_fixture")
    os.makedirs(out, exist_ok=True)
    for t in ("region", "nation"):
        spark.read.parquet(f"{SRC}/{t}.parquet").write.mode("overwrite").parquet(
            f"{out}/{t}.parquet"
        )
    for t, keys in KEY_COLS.items():
        base = spark.read.parquet(f"{SRC}/{t}.parquet")
        copies = []
        for i in range(n_copies):
            c = base
            for k in keys:
                c = c.withColumn(k, (F.col(k) + F.lit(i * OFFSET)).cast("bigint"))
            if t == "documents" and i > 0:
                words = F.split(F.col("text"), " ")
                # pure-letter suffix: the dedup tokenizer splits on
                # [^a-z]+, so a digit would dissolve the tag into
                # copy-INDEPENDENT fragments
                tag = F.lit("q" + "abcdefghij"[i])
                c = c.withColumn(
                    "text",
                    F.concat_ws(
                        " ",
                        F.transform(words, lambda w: F.concat(w, tag)),
                    ),
                ).withColumn("n_chars", F.length("text"))
            if t == "embeddings" and i > 0:
                c = c.withColumn(
                    "embedding",
                    F.concat(
                        F.slice(F.col("embedding"), i + 1, 64 - i),
                        F.slice(F.col("embedding"), 1, i),
                    ),
                )
            copies.append(c)
        df = copies[0]
        for c in copies[1:]:
            df = df.unionByName(c)
        df.write.mode("overwrite").parquet(f"{out}/{t}.parquet")
        print(t, "rows:", spark.read.parquet(f"{out}/{t}.parquet").count())
    spark.stop()


if __name__ == "__main__":
    main()
