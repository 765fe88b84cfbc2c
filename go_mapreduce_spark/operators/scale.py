"""Scale hardening utilities (SURVEY.md §7.2 M5): skew mitigation,
partitioning control, sketch-based approximation.

These are the knobs the reference fundamentally lacked — its reducer
built an unbounded in-memory table per key
(mapreduce/mapreduce.go:180-202), so one hot key OOM'd the worker.
Spark + AQE already split skewed *shuffle partitions*; salting goes
further by splitting a single hot KEY across reducers.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    salt: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Skew-resistant equi-join: salt the (large, skewed) left side
    into ``salt`` sub-keys and replicate the right side once per salt.

    Turns one hot-key reducer into ``salt`` balanced ones at the cost
    of a ``salt``× blow-up of the right side — use when the right side
    is small-ish but too big/too hot for a plain broadcast, or under
    AQE-off constraints.  (With AQE skew-join on, prefer letting AQE
    split partitions; salting is the deterministic fallback and the
    only option when a SINGLE key exceeds one executor.)
    """
    lsalt = left.withColumn("_salt", F.pmod(F.xxhash64(F.monotonically_increasing_id()), F.lit(salt)))
    rsalt = right.join(
        F.broadcast(
            left.sparkSession.range(salt).select(F.col("id").cast("int").alias("_salt"))
        ),
        how="cross",
    )
    out = lsalt.join(rsalt, on=[key, "_salt"], how=how)
    return out.drop("_salt")


def repartition_for_join(df: DataFrame, key: str, n: int | None = None) -> DataFrame:
    """Pre-shuffle on the join key so several downstream joins/aggs on
    the same key reuse one exchange (Catalyst reuses compatible
    hash-partitionings instead of re-shuffling per operator)."""
    return df.repartition(n, F.col(key)) if n else df.repartition(F.col(key))


def key_histogram(df: DataFrame, key: str, top: int = 20) -> DataFrame:
    """Hot-key inspection: top keys by row count plus their share —
    the diagnostic that decides broadcast vs salt vs AQE."""
    total = df.count()
    return (
        df.groupBy(key)
        .agg(F.count(F.lit(1)).alias("n_rows"))
        .withColumn("share", F.round(F.col("n_rows") / F.lit(float(total)), 6))
        .orderBy(F.col("n_rows").desc(), F.col(key).asc())
        .limit(top)
    )
