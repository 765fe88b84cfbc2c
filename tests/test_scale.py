"""Scale utilities: salted join correctness under skew, sketch error
bounds, partitioning helpers."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from go_mapreduce_spark.operators.scale import key_histogram, repartition_for_join, salted_join
from go_mapreduce_spark.operators.sketches import x25_approx_distinct, x26_approx_quantiles
from go_mapreduce_spark.sources.registry import load_table


@pytest.fixture(scope="module")
def skewed(spark):
    """1 hot key with 5k rows + 100 cold keys with 10 each."""
    hot = spark.range(5000).select(F.lit(0).alias("k"), F.col("id").alias("payload"))
    cold = (
        spark.range(1000)
        .select((F.col("id") % 100 + 1).alias("k"), F.col("id").alias("payload"))
    )
    left = hot.union(cold)
    right = spark.range(101).select(
        F.col("id").alias("k"), F.concat(F.lit("dim_"), F.col("id")).alias("name")
    )
    return left, right


def test_salted_join_matches_plain_join(spark, skewed):
    left, right = skewed
    plain = left.join(right, "k").groupBy("k").count()
    salted = salted_join(left, right, "k", salt=8).groupBy("k").count()
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def test_salted_join_left_outer(spark, skewed):
    left, right = skewed
    right_missing = right.filter(F.col("k") != 0)  # drop the hot key's dim row
    plain = left.join(right_missing, "k", "left").filter(F.col("name").isNull())
    salted = salted_join(left, right_missing, "k", salt=4, how="left").filter(
        F.col("name").isNull()
    )
    assert plain.count() == salted.count() == 5000


def test_salt_assignment_is_partitioning_invariant(spark, skewed):
    """The salt derives from row content only, so the per-row salt —
    not just the join result — is identical at any partitioning
    (what a task retry or speculative duplicate would see)."""
    left, _ = skewed

    def salts(df):
        s = df.withColumn(
            "_salt",
            F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]), F.lit(8)),
        )
        return sorted((r.k, r.payload, r._salt) for r in s.collect())

    a = salts(left.repartition(1))
    b = salts(left.repartition(13))
    assert a == b
    # and the hot key's distinct rows actually spread across salts
    hot_salts = {s for k, _p, s in a if k == 0}
    assert len(hot_salts) == 8


def test_key_histogram_flags_hot_key(spark, skewed):
    left, _ = skewed
    top = key_histogram(left, "k", top=3).collect()
    assert top[0].k == 0 and top[0].share > 0.8


def test_repartition_reuses_partitioning(spark, skewed):
    left, _ = skewed
    df = repartition_for_join(left, "k", 16)
    assert df.rdd.getNumPartitions() == 16


def test_approx_distinct_error_bound(spark, sf_dir):
    approx = {r.event_type: r.approx_users for r in x25_approx_distinct(spark, sf_dir).collect()}
    ev = load_table(spark, sf_dir, "events")
    exact = {
        r.event_type: r.u
        for r in ev.groupBy("event_type").agg(F.countDistinct("user_id").alias("u")).collect()
    }
    for et, e in exact.items():
        rel_err = abs(approx[et] - e) / e
        assert rel_err < 0.05, f"{et}: rel err {rel_err:.3f}"


def test_approx_quantiles_bounds(spark, sf_dir):
    from go_mapreduce_spark.operators.sketches import approx_quantile_estimates

    rows = approx_quantile_estimates(spark, sf_dir).collect()
    orders = load_table(spark, sf_dir, "orders")
    for r in rows:
        vals = sorted(
            x.o_totalprice
            for x in orders.filter(F.col("o_orderstatus") == r.o_orderstatus).collect()
        )
        assert vals[0] <= r.p50 <= vals[-1]
        assert r.p50 <= r.p90 <= r.p99 <= vals[-1]
        # p50 within the central half of the data
        lo, hi = vals[int(0.25 * len(vals))], vals[min(int(0.75 * len(vals)), len(vals) - 1)]
        assert lo <= r.p50 <= hi


def test_approx_quantiles_contract_flags(spark, sf_dir):
    """x26's declared surface is the rank-error contract itself: one
    row per (status, p), every flag TRUE on healthy data — the same
    flags the DuckDB bound oracle pins."""
    rows = x26_approx_quantiles(spark, sf_dir).collect()
    assert len(rows) == 9  # 3 statuses x 3 quantiles
    assert all(r.rank_err_ok for r in rows), rows
    assert {r.p for r in rows} == {0.5, 0.9, 0.99}


def test_approx_quantiles_flag_catches_broken_sketch(spark, sf_dir):
    """The contract check has power: re-ranking a WRONG estimate
    (p50's value claimed as p99) must flip the flag."""
    from go_mapreduce_spark.operators.sketches import QUANTILE_ACCURACY

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderstatus", "o_totalprice"
    )
    # claim the true median is the 99th percentile
    grid = (
        orders.groupBy("o_orderstatus")
        .agg(
            F.percentile_approx(
                "o_totalprice", 0.5, accuracy=QUANTILE_ACCURACY
            ).alias("est")
        )
        .select("o_orderstatus", F.lit(0.99).alias("p"), "est")
    )
    eps = 1.0 / QUANTILE_ACCURACY
    ranked = (
        orders.join(F.broadcast(grid), "o_orderstatus")
        .groupBy("o_orderstatus", "p")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.count(F.when(F.col("o_totalprice") < F.col("est"), 1)).alias("n_less"),
            F.count(F.when(F.col("o_totalprice") <= F.col("est"), 1)).alias("n_leq"),
        )
    )
    slop = F.lit(eps) * F.col("n") + F.lit(1.5)
    target = F.col("p") * F.col("n")
    flags = ranked.select(
        (
            ((F.col("n_less") + 1) <= target + slop)
            & (F.col("n_leq") >= target - slop)
        ).alias("ok")
    ).collect()
    assert all(not r.ok for r in flags), flags


def test_spread_for_fanout_guard_contract(spark):
    """The spread helper must repartition an under-split relation to
    the session's shuffle-partition count, be a NO-OP on an input
    that already has enough partitions (the 100 TB case — no shuffle
    added where it matters), and never change aggregate results
    (partition-invariant decimal discipline)."""
    from go_mapreduce_spark.functions.numeric import dsum_expr
    from go_mapreduce_spark.operators.scale import spread_for_fanout

    n_parts = int(spark.conf.get("spark.sql.shuffle.partitions"))
    narrow = spark.range(0, 10_000).coalesce(1)
    spread = spread_for_fanout(narrow)
    assert narrow.rdd.getNumPartitions() == 1
    assert spread.rdd.getNumPartitions() == n_parts
    wide = spark.range(0, 10_000).repartition(n_parts + 3)
    assert spread_for_fanout(wide) is wide  # no-op, not a new plan
    agg = lambda df: df.selectExpr("cast(id as double) as x").agg(
        dsum_expr("x * x", "ss")
    ).collect()[0].ss
    assert agg(narrow) == agg(spread)


def test_iterative_plan_confs_contract(spark):
    """iterative_plan_confs must pin shuffle partitions AND disable
    AQE inside the context, restore BOTH on exit (including on
    error), and nest cleanly with an outer pinned context."""
    from go_mapreduce_spark.operators.scale import iterative_plan_confs

    prev_parts = spark.conf.get("spark.sql.shuffle.partitions")
    prev_aqe = spark.conf.get("spark.sql.adaptive.enabled")
    with iterative_plan_confs(spark, 3):
        assert spark.conf.get("spark.sql.shuffle.partitions") == "3"
        assert spark.conf.get("spark.sql.adaptive.enabled") == "false"
    assert spark.conf.get("spark.sql.shuffle.partitions") == prev_parts
    assert spark.conf.get("spark.sql.adaptive.enabled") == prev_aqe
    # restoration on error
    try:
        with iterative_plan_confs(spark, 5):
            raise RuntimeError("boom")
    except RuntimeError:
        pass
    assert spark.conf.get("spark.sql.shuffle.partitions") == prev_parts
    assert spark.conf.get("spark.sql.adaptive.enabled") == prev_aqe


def test_lazy_localcheckpoint_cuts_lineage_and_matches_eager(spark):
    """The lazy in-loop / eager final checkpoint cadence the graph
    loops rely on: eager=False must already return an RDD-backed
    plan (lineage cut at call time) and produce identical results to
    the eager path."""
    from pyspark.sql import functions as F

    df = spark.range(1000).select(
        F.col("id"), (F.col("id") % 7).alias("k")
    )
    lazy = df.localCheckpoint(eager=False)
    # RDD-backed logical plan: the optimized plan must not contain
    # the original Range source anymore
    plan = lazy._jdf.queryExecution().optimizedPlan().toString()
    assert "Range" not in plan
    a = sorted(lazy.groupBy("k").count().collect())
    b = sorted(df.localCheckpoint().groupBy("k").count().collect())
    assert a == b


def test_iterative_shuffle_partitions_regimes(spark):
    """Pin the three partition regimes at the measured break-evens
    (round 11, BENCH_FLOOR.json + interleaved sf0.1/sf0.01 A/Bs):
    fixture graphs floor at 4; cpu_bound mid-size graphs get
    ~n/75k up to default parallelism; huge graphs get n/4M
    regardless of cpu_bound.  Frontier loops (no cpu_bound) must be
    unaffected by the middle regime at every size below 4M rows."""
    from go_mapreduce_spark.operators.scale import iterative_shuffle_partitions as f

    cores = spark.sparkContext.defaultParallelism
    # frontier rule: flat at 4 until the 4M-per-partition regime
    assert f(100) == 4
    assert f(600_000) == 4
    assert f(3_999_999) == 4
    assert f(40_000_000) == 10
    # cpu_bound: same floor, core-capped middle regime, same top
    assert f(100, cpu_bound=True) == 4
    assert f(60_000, cpu_bound=True) == 4
    assert f(600_000, cpu_bound=True) == min(8, max(4, cores))
    assert f(10_000_000_000, cpu_bound=True) == 2500
