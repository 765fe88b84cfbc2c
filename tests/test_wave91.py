"""Wave-91 property tests: distinct-IVM equals recompute bit-for-bit,
hard negatives are genuinely cross-label and boundary-tight."""

from __future__ import annotations

from pyspark.sql import functions as F

from go_mapreduce_spark import lakehouse as LH
from go_mapreduce_spark.operators import similarity as S
from go_mapreduce_spark.sources.registry import load_table


def test_x401_ivm_equals_recompute(spark, sf_dir):
    got = {
        r.c_mktsegment: r.n_distinct_customers
        for r in LH.x401_distinct_ivm(spark, sf_dir).collect()
    }
    orders = load_table(spark, sf_dir, "orders")
    k = F.col("o_orderkey")
    facts_v2 = orders.filter((k % 4 < 3) & (k % 16 != 2)).unionByName(
        orders.filter(k % 4 == 3)
    )
    dim = load_table(spark, sf_dir, "customer")
    want = {
        r.c_mktsegment: r.n
        for r in facts_v2.join(
            dim, F.col("o_custkey") == F.col("c_custkey")
        )
        .groupBy("c_mktsegment")
        .agg(F.count_distinct("o_custkey").alias("n"))
        .collect()
    }
    assert got == want


def test_x402_hard_negative_laws(spark, sf_dir):
    rows = S.x402_hard_negatives(spark, sf_dir).collect()
    emb = load_table(spark, sf_dir, "embeddings")
    labels = {r.vec_id: r.label for r in emb.filter(F.col("vec_id") <= 5).collect()}
    by_q = {}
    for r in rows:
        by_q.setdefault(r.query_id, []).append(r)
        # every negative really has a different label than its query
        assert r.negative_label != labels[r.query_id]
    for q, rs in by_q.items():
        assert len(rs) == S.HARDNEG_K
        sims = [r.similarity for r in rs]
        assert sims == sorted(sims, reverse=True)
    # hard negatives are at most as similar as the overall top-1
    # (which may share the label) — cross-check against x3
    top = {}
    for r in S.x3_knn_cosine(spark, sf_dir).collect():
        if r.query_id in by_q:
            top[r.query_id] = max(top.get(r.query_id, -2.0), r.similarity)
    for q, rs in by_q.items():
        assert rs[0].similarity <= top[q] + 1e-9
