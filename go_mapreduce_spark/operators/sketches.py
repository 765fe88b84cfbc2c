"""Sketch-based approximate aggregation (HLL++, quantile sketches).

At 100 TB, exact count-distinct and exact percentiles are often the
single most expensive aggregates in a pipeline (full shuffle of every
distinct value).  Sketches make them single-pass, fixed-memory, and
mergeable — the right default for monitoring-grade answers.

No DuckDB oracle by design: sketch estimates are
implementation-specific.  Tests assert relative-error bounds against
the exact answers instead (the contract a sketch actually makes).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from go_mapreduce_spark.sources.registry import load_table


def x25_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL++ distinct users per event type (rsd 1%) next to the group
    count — single pass, ~1.5 KB of sketch state per group vs a full
    shuffle of (type, user) pairs for the exact variant (q6)."""
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy("event_type")
        .agg(
            F.approx_count_distinct("user_id", rsd=0.01).alias("approx_users"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .orderBy("event_type")
    )


def x26_approx_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greenwald-Khanna quantile sketch: p50/p90/p99 of order totals
    per order status (accuracy 1/10000)."""
    orders = load_table(spark, sf_dir, "orders")
    pct = F.percentile_approx(
        "o_totalprice", [0.5, 0.9, 0.99], accuracy=10000
    ).alias("p")
    return (
        orders.groupBy("o_orderstatus")
        .agg(pct)
        .select(
            "o_orderstatus",
            F.round(F.col("p")[0], 6).alias("p50"),
            F.round(F.col("p")[1], 6).alias("p90"),
            F.round(F.col("p")[2], 6).alias("p99"),
        )
        .orderBy("o_orderstatus")
    )
