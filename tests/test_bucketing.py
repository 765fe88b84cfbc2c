"""Bucketed co-located join: same-key same-count buckets join with
zero shuffle — the write-time partitioning strategy for 100 TB fact
tables."""

from __future__ import annotations

import re

import pytest
from pyspark.sql import functions as F

from go_mapreduce_spark.sources.registry import load_table
from go_mapreduce_spark.sources.sinks import write_bucketed


@pytest.fixture(scope="module")
def bucketed_tables(spark, sf_dir, tmp_path_factory):
    d = tmp_path_factory.mktemp("bucketed")
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_quantity", "l_extendedprice"
    )
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    write_bucketed(li, "li_b", "l_orderkey", 8, path=str(d / "li"), sort_by="l_orderkey")
    write_bucketed(orders, "orders_b", "o_orderkey", 8, path=str(d / "orders"), sort_by="o_orderkey")
    yield "li_b", "orders_b"
    spark.sql("DROP TABLE IF EXISTS li_b")
    spark.sql("DROP TABLE IF EXISTS orders_b")


def _executed_join_plan(spark, bucketed_tables):
    li_t, o_t = bucketed_tables
    # disable broadcast so the join strategy question is real
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = spark.table(li_t).join(
            spark.table(o_t), F.col("l_orderkey") == F.col("o_orderkey")
        )
        joined.collect()
        plan = joined._jdf.queryExecution().executedPlan().toString()
        return joined, plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_bucketed_join_has_no_shuffle(spark, bucketed_tables):
    _joined, plan = _executed_join_plan(spark, bucketed_tables)
    assert "SortMergeJoin" in plan
    assert "Exchange" not in plan, f"bucketed join must not shuffle:\n{plan}"


def test_bucketed_join_correct(spark, sf_dir, bucketed_tables):
    joined, _plan = _executed_join_plan(spark, bucketed_tables)
    n_bucketed = joined.count()
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    n_plain = li.join(orders, li.l_orderkey == orders.o_orderkey).count()
    assert n_bucketed == n_plain
