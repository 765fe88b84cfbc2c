"""Plan-shape contract tests: the physical plans that make the 100 TB
design real — pushdown reaches the scan, dims broadcast, top-k avoids
full sorts (SURVEY.md §4 / project scale rules)."""

from __future__ import annotations

import pytest

from go_mapreduce_spark.operators import relational as R
from go_mapreduce_spark.plans.explain import (
    count_nodes,
    formatted_plan,
    has_broadcast_hash_join,
    has_take_ordered,
    pushed_filters,
    scan_read_schema,
    wholestage_codegen_ids,
)


def test_q3_filters_pushed_to_scan(spark, sf_dir):
    df = R.q3_filter_agg(spark, sf_dir)
    pf = " ".join(pushed_filters(df))
    assert "l_discount" in pf and "l_quantity" in pf


def test_q3_column_pruning(spark, sf_dir):
    schemas = scan_read_schema(R.q3_filter_agg(spark, sf_dir))
    assert schemas, "expected a parquet scan"
    # only the three needed columns of lineitem's 11 are read
    for s in schemas:
        assert "l_extendedprice" in s and "l_shipdate" not in s and "l_orderkey" not in s


def test_q4_broadcasts_dimension(spark, sf_dir):
    assert has_broadcast_hash_join(R.q4_broadcast_join(spark, sf_dir))


def test_q5_all_dim_joins_broadcast(spark, sf_dir):
    df = R.q5_multiway_join(spark, sf_dir)
    assert count_nodes(df, "BroadcastHashJoin") == 4
    assert "SortMergeJoin" not in formatted_plan(df)


def test_q7_topk_avoids_global_sort(spark, sf_dir):
    assert has_take_ordered(R.q7_topk(spark, sf_dir))


def test_q2_uses_partial_aggregation(spark, sf_dir):
    plan = formatted_plan(R.q2_grouped_agg(spark, sf_dir))
    assert "HashAggregate" in plan
    # partial + final pairs → at least two HashAggregate nodes
    assert plan.count("HashAggregate") >= 2


def test_wordcount_stays_in_codegen(spark, sf_dir):
    from go_mapreduce_spark.operators.wordcount import q1_word_count

    df = q1_word_count(spark, sf_dir)
    assert wholestage_codegen_ids(df), "expected WholeStageCodegen spans"
    plan = formatted_plan(df)
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
