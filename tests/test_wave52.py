"""Wave-52 tests: GROUP BY ALL key derivation, IDENTIFIER binding
safety."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def test_x287_matches_explicit_grouping(spark, sf_dir):
    from go_mapreduce_spark.operators import relational_ext as RX
    from go_mapreduce_spark.sources.registry import load_table

    got = [tuple(r) for r in RX.x287_group_by_all(spark, sf_dir).collect()]
    want = [
        tuple(r)
        for r in load_table(spark, sf_dir, "orders")
        .groupBy("o_orderstatus", "o_orderpriority")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_orders"),
            F.round(
                F.sum(F.col("o_totalprice").cast("decimal(38,6)")).cast("double"),
                4,
            ).alias("total_price"),
        )
        .orderBy("o_orderstatus", "o_orderpriority", "n_orders", "total_price")
        .collect()
    ]
    assert got == want


def test_x288_identifier_rejects_injection(spark, sf_dir):
    """A hostile parameter can only ever be an identifier — splicing
    SQL through it must fail to parse/resolve, not execute."""
    from go_mapreduce_spark.sources.registry import load_table

    load_table(spark, sf_dir, "orders").createOrReplaceTempView("_x288_orders")
    with pytest.raises(Exception):
        spark.sql(
            "SELECT IDENTIFIER(:dim) FROM _x288_orders LIMIT 1",
            args={"dim": "o_orderstatus FROM _x288_orders; DROP VIEW _x288_orders --"},
        ).collect()
    # the view survives the attempt
    assert spark.sql("SELECT COUNT(*) FROM _x288_orders").collect()[0][0] > 0
