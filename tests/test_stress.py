"""10× scale stress (opt-in: SPARK_GRAFT_STRESS=1): core aggregates and
joins over lineitem replicated 10× (~6M rows at sf0.1 input) — proves
the plans execute beyond fixture scale and stay partition-invariant.

Not part of the default suite (wall-clock); run manually:
    SPARK_GRAFT_STRESS=1 python -m pytest tests/test_stress.py -q
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from go_mapreduce_spark.functions.numeric import dsum
from go_mapreduce_spark.sources.registry import load_table

pytestmark = pytest.mark.skipif(
    not os.environ.get("SPARK_GRAFT_STRESS"), reason="set SPARK_GRAFT_STRESS=1"
)

STRESS_SF_DIR = os.environ.get("SPARK_GRAFT_STRESS_SF_DIR", "/root/testdata/sf0.1")
REPLICAS = 10


def _replicated_lineitem(spark):
    li = load_table(spark, STRESS_SF_DIR, "lineitem")
    replicas = spark.range(REPLICAS).select(F.col("id").alias("_r"))
    return li.crossJoin(F.broadcast(replicas))


def test_grouped_agg_10x(spark):
    li = _replicated_lineitem(spark)
    base = load_table(spark, STRESS_SF_DIR, "lineitem")
    got = {
        (r.l_returnflag, r.l_linestatus): (r.n, r.s)
        for r in li.groupBy("l_returnflag", "l_linestatus")
        .agg(F.count(F.lit(1)).alias("n"), dsum(F.col("l_quantity"), "s"))
        .collect()
    }
    want = {
        (r.l_returnflag, r.l_linestatus): (r.n * REPLICAS, r.s * REPLICAS)
        for r in base.groupBy("l_returnflag", "l_linestatus")
        .agg(F.count(F.lit(1)).alias("n"), dsum(F.col("l_quantity"), "s"))
        .collect()
    }
    # decimal sums make the 10x identity EXACT, not approximate
    assert got == want


def test_join_agg_10x(spark):
    li = _replicated_lineitem(spark)
    orders = load_table(spark, STRESS_SF_DIR, "orders").select("o_orderkey")
    n = li.join(orders, li.l_orderkey == orders.o_orderkey).count()
    base = load_table(spark, STRESS_SF_DIR, "lineitem")
    n_base = base.join(orders, base.l_orderkey == orders.o_orderkey).count()
    assert n == n_base * REPLICAS


def test_wordcount_10x(spark):
    from go_mapreduce_spark.functions.tokenize import word_counts

    docs = load_table(spark, STRESS_SF_DIR, "documents").select("text")
    replicas = spark.range(REPLICAS).select(F.col("id").alias("_r"))
    big = docs.crossJoin(F.broadcast(replicas)).select("text")
    got = {r.word: r.cnt for r in word_counts(big).collect()}
    want = {r.word: r.cnt * REPLICAS for r in word_counts(docs).collect()}
    assert got == want
