"""Change-data-capture surface: join-based MERGE (upsert) and SCD
type-2 validity intervals.

The reference's Merge step is a k-way sorted-file concatenation with
last-write-wins on duplicate keys (reference mapreduce/merge.go —
"XXX use a heap" note included); these operators are the relational
generalization a warehouse user actually asks for: apply a changeset
to a dimension snapshot, and reconstruct attribute history as
validity intervals.

Scale notes:
- MERGE without a transactional table format (Delta/Iceberg) is a
  FULL OUTER join on the key: both sides shuffle-hash-partition by
  key, matched rows update, source-only rows insert, target-only
  rows carry forward.  That is exactly the plan a MERGE INTO compiles
  to underneath; on a real lakehouse you'd add file-level pruning of
  untouched partitions, which is storage-layer, not plan-layer.
  A full outer join cannot broadcast — key-partitioned exchange is
  the correct (and only) 100 TB shape, and AQE splits skewed keys.
- SCD2 is one ``lead`` window per entity: intervals derive from the
  (entity, ts) ordering, one in-partition sort per entity group —
  the same cost envelope as sessionization (x12).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from go_mapreduce_spark.functions.numeric import dsum
from go_mapreduce_spark.sources.registry import load_table


def merge_upsert(
    target: DataFrame,
    source: DataFrame,
    key: str,
    update_cols: dict[str, Column] | None = None,
) -> DataFrame:
    """Generic join-based MERGE: returns the post-merge relation with
    an ``action`` column ('update' / 'insert' / 'keep').

    ``target`` and ``source`` must share ``key``; all non-key columns
    are resolved via the caller's expressions over the joined row
    (target columns and source columns both visible).
    """
    t = target.withColumn("_in_t", F.lit(True))
    s = source.withColumn("_in_s", F.lit(True))
    joined = t.join(s, key, "full_outer")
    action = (
        F.when(F.col("_in_t").isNull(), F.lit("insert"))
        .when(F.col("_in_s").isNull(), F.lit("keep"))
        .otherwise(F.lit("update"))
    )
    out = joined.withColumn("action", action)
    for name, expr in (update_cols or {}).items():
        out = out.withColumn(name, expr)
    return out.drop("_in_t", "_in_s")


def x54_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Upsert an order-derived changeset into a customer-dimension
    snapshot.

    Target: customers with even custkey (the stale snapshot).
    Source: per-customer order count + total (the changeset).
    Matched rows get balance += order total ('update'); source-only
    customers are inserted with balance = order total ('insert');
    untouched snapshot rows carry forward ('keep').
    """
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    target = cust.filter(F.pmod(F.col("c_custkey"), F.lit(2)) == 0).select(
        F.col("c_custkey").alias("cust_key"), "c_acctbal"
    )
    source = orders.groupBy(F.col("o_custkey").alias("cust_key")).agg(
        F.count(F.lit(1)).alias("n_orders"),
        dsum(F.col("o_totalprice"), "delta"),
    )
    merged = merge_upsert(
        target,
        source,
        "cust_key",
        update_cols={
            "balance": F.round(
                F.when(F.col("action") == "insert", F.col("delta"))
                .when(F.col("action") == "keep", F.col("c_acctbal"))
                .otherwise(F.col("c_acctbal") + F.col("delta")),
                6,
            )
        },
    )
    return merged.select(
        "cust_key",
        "action",
        "balance",
        F.coalesce("n_orders", F.lit(0)).cast("bigint").alias("n_orders"),
    ).orderBy("cust_key")


def scd2_intervals(
    df: DataFrame, entity_col: str, ts_col: str, tiebreak_col: str
) -> DataFrame:
    """Attribute-change rows → SCD2 validity intervals per entity:
    valid_from = change ts, valid_to = next change ts (NULL while
    current), is_current on the open interval."""
    w = Window.partitionBy(entity_col).orderBy(ts_col, tiebreak_col)
    return df.select(
        "*",
        F.col(ts_col).alias("valid_from"),
        F.lead(ts_col).over(w).alias("valid_to"),
    ).withColumn("is_current", F.col("valid_to").isNull())


def x55_scd2_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD2 history of per-user ``value`` from the events stream:
    each event opens an interval that the user's next event closes."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_id", "ts", "value"
    )
    out = scd2_intervals(ev, "user_id", "ts", "event_id")
    return out.select(
        "user_id", "event_id", "value", "valid_from", "valid_to", "is_current"
    ).orderBy("user_id", "valid_from", "event_id")


def x129_pit_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time (PIT) join: enrich each purchase with the user's
    state value as of JUST BEFORE the purchase — the interval from the
    x55 SCD2 history with ``valid_from < ts <= coalesce(valid_to, ∞)``.

    The warehouse query SCD2 histories exist to answer ("what did the
    dimension say when the fact happened"), and the batch twin of the
    x16 as-of join: here containment is against materialized validity
    intervals instead of a rank-over-candidates.  The join is
    equi-keyed on user_id FIRST — the interval predicate only filters
    within a user's own history, so cost is bounded by per-user
    history length, never cross-user.  First-ever purchases (no prior
    interval) keep a NULL prior_value via the left join.

    Zero-width intervals (same-ts events) can't match ``valid_from <
    ts <= valid_to`` — the tie-broken earlier event's interval closes
    at the same instant it opens, so exactly one interval matches any
    purchase: row count is purchase count, join fan-out 1.
    """
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_id", "ts", "value", "event_type"
    )
    hist = scd2_intervals(
        ev.select("user_id", "event_id", "ts", "value"),
        "user_id",
        "ts",
        "event_id",
    ).select(
        F.col("user_id").alias("h_user"),
        F.col("value").alias("prior_value"),
        "valid_from",
        "valid_to",
    )
    purchases = ev.filter(F.col("event_type") == "purchase")
    return (
        purchases.join(
            hist,
            (F.col("user_id") == F.col("h_user"))
            & (F.col("valid_from") < F.col("ts"))
            & (
                F.col("valid_to").isNull() | (F.col("ts") <= F.col("valid_to"))
            ),
            "left",
        )
        .select(
            "user_id",
            "event_id",
            F.col("value").alias("purchase_value"),
            F.round("prior_value", 6).alias("prior_value"),
        )
        .orderBy("user_id", "event_id")
    )
