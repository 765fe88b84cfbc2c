"""Event-sequence analytics: conversion funnels and retention
cohorts over the ``events`` stream.

The product-analytics query family (funnel → conversion, cohort →
retention): both are pure relational plans — per-user minima and a
day-grid aggregation — with none of the per-user imperative scanning
a naive implementation reaches for.

Scale notes:
- The funnel is three per-user min-aggregates chained by time bounds:
  each stage is a key-partitioned partial+final aggregate over only
  that stage's event type (filter pushed to the scan), then an equi
  join on user_id — never a per-user sorted replay of the full
  stream.  Stage relations shrink monotonically (conversion < 100%),
  so later joins are cheaper, and AQE re-plans them as broadcasts
  once a stage drops under the threshold.
- Retention dedups to one row per (user, active-day) FIRST — the
  smallest relation that answers the question — then joins the
  per-user cohort day and aggregates onto the (cohort, offset) grid:
  shuffle volume is bounded by user-days, not raw events.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from go_mapreduce_spark.sources.registry import load_table

FUNNEL_STAGES = ("view", "click", "purchase")


def x62_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered conversion funnel view → click → purchase: per user,
    the first view, the first click at-or-after it, the first
    purchase at-or-after that click, and the stage count reached
    (1, 2, or 3).  Users with no view are outside the funnel."""
    ev = load_table(spark, sf_dir, "events").select("user_id", "event_type", "ts")

    def first_at_or_after(event_type: str, lower: DataFrame, lower_col: str, out: str) -> DataFrame:
        return (
            ev.filter(F.col("event_type") == event_type)
            .join(lower, "user_id")
            .filter(F.col("ts") >= F.col(lower_col))
            .groupBy("user_id")
            .agg(F.min("ts").alias(out))
        )

    views = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("first_view"))
    )
    clicks = first_at_or_after("click", views, "first_view", "first_click")
    purchases = first_at_or_after("purchase", clicks, "first_click", "first_purchase")
    stage = (
        F.lit(1)
        + F.when(F.col("first_click").isNotNull(), 1).otherwise(0)
        + F.when(F.col("first_purchase").isNotNull(), 1).otherwise(0)
    )
    return (
        views.join(clicks, "user_id", "left")
        .join(purchases, "user_id", "left")
        .select(
            "user_id",
            "first_view",
            "first_click",
            "first_purchase",
            stage.cast("bigint").alias("funnel_stage"),
        )
        .orderBy("user_id")
    )


def x63_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-cohort retention grid: users bucketed by first-active day;
    for each (cohort_day, day_offset), the count of cohort users
    active that day.  Offset 0 row = cohort size."""
    ev = load_table(spark, sf_dir, "events")
    user_days = ev.select(
        "user_id", F.date_trunc("day", F.col("ts")).alias("d")
    ).distinct()
    cohort = user_days.groupBy("user_id").agg(F.min("d").alias("cohort_day"))
    return (
        user_days.join(cohort, "user_id")
        .groupBy(
            "cohort_day",
            F.datediff(F.col("d"), F.col("cohort_day")).cast("bigint").alias("day_offset"),
        )
        .agg(F.count(F.lit(1)).alias("n_users"))
        .orderBy("cohort_day", "day_offset")
    )


def x75_event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user event-type transition counts (the Markov-chain
    estimate behind next-action models): events ordered by (ts,
    event_id) within each user; every adjacent (prev_type → type)
    step counted corpus-wide.

    One lag window per user partition + one partial-aggregated count
    — sessionization's cost envelope.  The (ts, event_id) composite
    order makes the lag deterministic under timestamp ties.
    """
    from pyspark.sql.window import Window

    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    steps = ev.select(
        "user_id",
        F.lag("event_type").over(w).alias("from_type"),
        F.col("event_type").alias("to_type"),
    ).filter(F.col("from_type").isNotNull())
    return (
        steps.groupBy("from_type", "to_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("from_type", "to_type")
    )


def x82_chi2_independence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-square independence audit of the (lang, source) contingency
    table — the corpus-balance check a curation pipeline runs before
    mixing (is language independent of provenance?).

    One partial+final count over the scan collapses 100 TB to a
    |langs| x |sources| cell table (~100 rows); the marginal totals
    are unpartitioned window sums over THAT relation, which is
    constant-size by construction — the single-partition window is a
    deliberate post-aggregation choice, not a scan-scale shuffle.
    Expected counts and contributions are computed per-cell in double
    with a fixed operation order ((row * col) / grand, then
    (n-e)^2/e) so both engines produce identical bits.
    """
    from pyspark.sql.window import Window

    docs = load_table(spark, sf_dir, "documents")
    cells = docs.groupBy("lang", "source").agg(F.count(F.lit(1)).alias("n"))
    all_w = Window.partitionBy()
    scored = cells.select(
        "lang",
        "source",
        "n",
        (
            F.sum("n").over(Window.partitionBy("lang")).cast("double")
            * F.sum("n").over(Window.partitionBy("source")).cast("double")
            / F.sum("n").over(all_w).cast("double")
        ).alias("expected"),
    )
    return scored.select(
        "lang",
        "source",
        "n",
        F.round("expected", 6).alias("expected"),
        F.round(
            (F.col("n") - F.col("expected"))
            * (F.col("n") - F.col("expected"))
            / F.col("expected"),
            6,
        ).alias("chi2_contrib"),
    ).orderBy("lang", "source")


IQR_FENCE = 1.5


def x83_iqr_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type Tukey-fence outlier census: exact interpolated
    quartiles, fences at q1/q3 -/+ 1.5*IQR, count of values outside.

    Two key-partitioned aggregates over the same scan: quartiles per
    type (exact ``percentile`` — a per-group sort of that group's
    values only), then a broadcast join of the ~4-row fence table
    back onto the events for the outlier count.  The fence arithmetic
    runs in double with one fixed operation order on both engines, so
    boundary comparisons are bit-identical.
    """
    ev = load_table(spark, sf_dir, "events")
    fences = ev.groupBy("event_type").agg(
        F.percentile("value", 0.25).alias("q1"),
        F.percentile("value", 0.75).alias("q3"),
    )
    joined = ev.join(F.broadcast(fences), "event_type")
    lo = F.col("q1") - F.lit(IQR_FENCE) * (F.col("q3") - F.col("q1"))
    hi = F.col("q3") + F.lit(IQR_FENCE) * (F.col("q3") - F.col("q1"))
    return (
        joined.groupBy("event_type")
        .agg(
            F.first("q1").alias("q1d"),
            F.first("q3").alias("q3d"),
            F.sum(
                F.when((F.col("value") < lo) | (F.col("value") > hi), 1).otherwise(0)
            ).alias("n_outliers"),
            F.count(F.lit(1)).alias("n_total"),
        )
        .select(
            "event_type",
            F.round("q1d", 6).alias("q1"),
            F.round("q3d", 6).alias("q3"),
            F.col("n_outliers").cast("bigint").alias("n_outliers"),
            "n_total",
        )
        .orderBy("event_type")
    )


HIST_BIN_WIDTH = 25_000.0


def x86_price_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-width histogram of order totals: fixed-width bins so the
    bin id is a pure row function (floor(price / width)) — one
    partial+final aggregate at scan speed, no global min/max pass and
    no sampled rangepartitioning like Spark's own `histogram_numeric`
    (whose bins are nondeterministic across runs).

    floor() on double is IEEE-exact and identical across engines, so
    bin membership never flips at 1000x the data.
    """
    orders = load_table(spark, sf_dir, "orders")
    bin_id = F.floor(F.col("o_totalprice") / F.lit(HIST_BIN_WIDTH)).cast("bigint")
    return (
        orders.groupBy(bin_id.alias("bin_id"))
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.min("o_totalprice"), 6).alias("min_price"),
            F.round(F.max("o_totalprice"), 6).alias("max_price"),
        )
        .orderBy("bin_id")
    )


BASKET_MIN_SUPPORT = 3


def x87_basket_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frequent part pairs (market-basket co-occurrence, the support
    count behind association rules): parts appearing together in at
    least BASKET_MIN_SUPPORT orders.

    Distinct (order, part) first — repeat lines of the same part
    collapse before any pairing — then a self-equi-join on the order
    key with part_a < part_b.  Baskets are bounded (~7 items/order in
    TPC-H-shaped data) so the per-order fan-out is =< items² — a
    constant — and both join sides are the SAME shuffle output, so
    the exchange is reused, never duplicated.  The pair count is
    partial-aggregated map-side; min-support prunes before the
    declared sort.
    """
    li = load_table(spark, sf_dir, "lineitem")
    basket = li.select("l_orderkey", "l_partkey").distinct()
    a = basket.alias("a")
    b = basket.alias("b")
    pairs = a.join(
        b,
        (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
        & (F.col("a.l_partkey") < F.col("b.l_partkey")),
    )
    return (
        pairs.groupBy(
            F.col("a.l_partkey").alias("part_a"),
            F.col("b.l_partkey").alias("part_b"),
        )
        .agg(F.count(F.lit(1)).alias("support"))
        .filter(F.col("support") >= BASKET_MIN_SUPPORT)
        .orderBy("part_a", "part_b")
    )


def x88_key_skew_spectrum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Key-frequency spectrum of orders-per-customer (the degree
    distribution a skew audit reads before choosing a join
    strategy): how many customers placed exactly k orders.

    Two nested distributed aggregates — counts per key, then keys per
    count — with NO driver-side percentile over the key relation:
    the spectrum stays fully partitioned however many keys exist,
    which is the difference between this and an exact-quantile
    summary at 100 TB.
    """
    orders = load_table(spark, sf_dir, "orders")
    per_key = orders.groupBy("o_custkey").agg(F.count(F.lit(1)).alias("n_orders"))
    return (
        per_key.groupBy("n_orders")
        .agg(F.count(F.lit(1)).alias("n_customers"))
        .orderBy("n_orders")
    )


def x94_measure_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson correlations among lineitem's numeric measures in ONE
    scan-bound aggregate — the moment-sums formulation, not Spark's
    built-in ``corr`` (whose streaming-update float accumulation is
    partition-order-dependent and engine-specific).

    All nine moment sums (Σx, Σx², Σxy per pair) go through exact
    decimal, so they are bit-identical at any parallelism; each
    correlation is then one fixed-order double expression over those
    exact sums.  One partial+final aggregate, constant output.
    """
    from go_mapreduce_spark.operators.scale import spread_for_fanout

    # project to the three measures, then spread: nine decimal(38,6)
    # partial sums are BigDecimal-backed (~10² a long add) and an
    # under-split scan runs them all in ONE task (the x394 pathology;
    # spread is a no-op on any real multi-split corpus)
    base = load_table(spark, sf_dir, "lineitem")
    li = spread_for_fanout(
        base.select("l_quantity", "l_extendedprice", "l_discount"),
        probe=base,  # projection keeps the scan split; base probe is memo-cached
    )
    d = "decimal(38,6)"
    sums = li.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        *[
            F.sum(F.expr(e).cast(d)).cast("double").alias(a)
            for e, a in [
                ("l_quantity", "sq"),
                ("l_extendedprice", "sp"),
                ("l_discount", "sd"),
                ("l_quantity * l_quantity", "sqq"),
                ("l_extendedprice * l_extendedprice", "spp"),
                ("l_discount * l_discount", "sdd"),
                ("l_quantity * l_extendedprice", "sqp"),
                ("l_quantity * l_discount", "sqd"),
                ("l_extendedprice * l_discount", "spd"),
            ]
        ],
    )

    def corr(sxy: str, sx: str, sy: str, sxx: str, syy: str):
        return F.round(
            (F.col("n") * F.col(sxy) - F.col(sx) * F.col(sy))
            / (
                F.sqrt(F.col("n") * F.col(sxx) - F.col(sx) * F.col(sx))
                * F.sqrt(F.col("n") * F.col(syy) - F.col(sy) * F.col(sy))
            ),
            6,
        )

    return sums.select(
        F.col("n").cast("bigint").alias("n_rows"),
        corr("sqp", "sq", "sp", "sqq", "spp").alias("corr_qty_price"),
        corr("sqd", "sq", "sd", "sqq", "sdd").alias("corr_qty_disc"),
        corr("spd", "sp", "sd", "spp", "sdd").alias("corr_price_disc"),
    )


def x99_cumulative_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily new-user counts and the running total of distinct users
    ever seen — the growth-accounting formulation of "cumulative
    count distinct", which has no direct windowed-distinct SQL shape.

    Rewrites the impossible running COUNT(DISTINCT) as min-per-user
    (each user's first active day: one key-partitioned aggregate)
    followed by a cumulative sum over the tiny day grid — shuffle
    volume is |users| rows then |days| rows, never event-scale.
    Days with zero new users don't appear (no event creates them);
    the running total is still correct on the days that do.
    """
    from pyspark.sql.window import Window

    ev = load_table(spark, sf_dir, "events")
    first_day = ev.groupBy("user_id").agg(
        F.date_trunc("day", F.min("ts")).alias("day")
    )
    daily = first_day.groupBy("day").agg(F.count(F.lit(1)).alias("n_new"))
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return (
        daily.select(
            "day",
            "n_new",
            F.sum("n_new").over(w).alias("cum_users"),
        )
        .orderBy("day")
    )


def x103_rolling_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily order revenue with a 7-day trailing moving average and a
    running maximum — the bounded-frame window family (``ROWS BETWEEN
    k PRECEDING``) that x99's unbounded running total doesn't cover.

    Exactness discipline: the daily revenue is an exact decimal sum
    (functions/numeric.py), and both window aggregates run over the
    *decimal* column — decimal addition is associative, so the moving
    average is identical at any partitioning; the single double
    division happens last.

    Scale: one partial+final aggregate onto the day grid (≈ thousands
    of rows at any corpus size), then one window pass over that tiny
    relation — window cost is bounded by the calendar, not the data.
    """
    from pyspark.sql.window import Window

    orders = load_table(spark, sf_dir, "orders")
    daily = (
        orders.groupBy(F.date_trunc("day", F.col("o_orderdate")).alias("day"))
        .agg(F.sum(F.col("o_totalprice").cast("decimal(38,6)")).alias("rev_dec"))
    )
    w7 = Window.orderBy("day").rowsBetween(-6, 0)
    wmax = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    return (
        daily.select(
            "day",
            F.col("rev_dec").cast("double").alias("revenue"),
            F.round(
                F.sum("rev_dec").over(w7).cast("double") / F.count(F.lit(1)).over(w7),
                6,
            ).alias("ma7"),
            F.max("rev_dec").over(wmax).cast("double").alias("cum_max"),
        )
        .orderBy("day")
    )


def x104_regr_by_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped least-squares fit: slope / intercept / R² of
    extendedprice regressed on quantity, per return flag — the
    ``REGR_SLOPE`` family computed from exact decimal moment sums.

    Built-in ``regr_*`` aggregates sum doubles in partition order
    (non-deterministic across runs); instead the five moments
    (Σx, Σy, Σx², Σxy, Σy²) go through decimal — associative, so any
    partitioning yields bit-identical moments — and the closed-form
    solve happens once per group in double.

    Scale: one partial+final aggregate, five decimal sums wide; the
    solve is per-group constant work.  This is the map-side-combine
    shape regardless of group cardinality.
    """
    li = load_table(spark, sf_dir, "lineitem")
    d = lambda c: F.col(c).cast("decimal(38,6)")  # noqa: E731
    m = (
        li.groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).cast("double").alias("n"),
            F.sum(d("l_quantity")).cast("double").alias("sx"),
            F.sum(d("l_extendedprice")).cast("double").alias("sy"),
            F.sum((F.col("l_quantity") * F.col("l_quantity")).cast("decimal(38,6)")).cast("double").alias("sxx"),
            F.sum((F.col("l_quantity") * F.col("l_extendedprice")).cast("decimal(38,6)")).cast("double").alias("sxy"),
            F.sum((F.col("l_extendedprice") * F.col("l_extendedprice")).cast("decimal(38,6)")).cast("double").alias("syy"),
        )
    )
    slope = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")) / (
        F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    )
    intercept = (F.col("sy") - slope * F.col("sx")) / F.col("n")
    r2 = (
        (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy"))
        * (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy"))
    ) / (
        (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx"))
        * (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy"))
    )
    return (
        m.select(
            "l_returnflag",
            F.col("n").cast("bigint").alias("n_rows"),
            F.round(slope, 6).alias("slope"),
            F.round(intercept, 6).alias("intercept"),
            F.round(r2, 6).alias("r2"),
        )
        .orderBy("l_returnflag")
    )


# Columns profiled by x106 (name, is_numeric).  Timestamps are left
# out on purpose: engines disagree on timestamp→string rendering.
PROFILE_COLS = (
    ("o_orderkey", True),
    ("o_custkey", True),
    ("o_orderstatus", False),
    ("o_totalprice", True),
    ("o_orderpriority", False),
)


def x106_column_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-pass data-profiling report over ``orders``: per column the
    null count, exact distinct count, and min / max (rendered as
    strings so heterogeneous columns share one output schema).

    The profile every ingestion pipeline runs before trusting a new
    drop of data.  The five exact ``count_distinct``s make Catalyst
    plan the whole agg through its Expand-based multi-distinct rewrite
    (each input row fans out once per distinct column, tagged with a
    group id) — one logical pass, not five scans — and the null/min/
    max metrics ride the same aggregate.  A constant-width ``stack``
    then unpivots to (column, metric) rows.  min/max are computed on
    the native type and cast to string after (casting first would
    compare "10" < "9" lexically).

    Scale: scan-bound map-side combine; the only caveat at 100 TB is
    the exact count_distinct on a high-cardinality key, which shuffles
    that column's values — swap in approx_count_distinct (x25's HLL)
    when a ±2% answer is acceptable.
    """
    from go_mapreduce_spark.operators.scale import spread_for_fanout

    # the multi-distinct Expand fans every row out ×(1 + n_cols):
    # spread an under-split scan before the expand and carry only the
    # profiled columns through the shuffle (no-op at real scale;
    # null/NDV/min/max are partition-invariant — the x386 discipline)
    base = load_table(spark, sf_dir, "orders")
    orders = spread_for_fanout(
        base.select(*[name for name, _num in PROFILE_COLS]),
        probe=base,  # projection keeps the scan split; base probe is memo-cached
    )
    aggs = []
    for name, _num in PROFILE_COLS:
        c = F.col(name)
        aggs += [
            F.sum(F.when(c.isNull(), 1).otherwise(0)).alias(f"{name}__nulls"),
            F.count_distinct(c).alias(f"{name}__distinct"),
            F.min(c).cast("string").alias(f"{name}__min"),
            F.max(c).cast("string").alias(f"{name}__max"),
        ]
    wide = orders.agg(*aggs)
    stack_args = ", ".join(
        f"'{name}', {name}__nulls, {name}__distinct, {name}__min, {name}__max"
        for name, _num in PROFILE_COLS
    )
    return wide.selectExpr(
        f"stack({len(PROFILE_COLS)}, {stack_args}) "
        "as (column_name, n_nulls, n_distinct, min_str, max_str)"
    ).orderBy("column_name")


# x108 anomaly contract: trailing window size (rows), minimum history
# before a row is judged, and the z-score flag threshold.
ANOMALY_WINDOW = 20
ANOMALY_MIN_N = 10
ANOMALY_Z = 3.0


def x108_rolling_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user rolling anomaly flags: an event is anomalous when its
    value exceeds mean + 3σ of the user's trailing 20 events
    (excluding itself), given ≥ 10 events of history.

    The streaming-monitoring primitive (fraud / abuse / sensor
    spikes) expressed as one bounded-frame window pass: mean and
    variance come from trailing Σx and Σx² — both exact decimal sums,
    so the flag set is partition-invariant — with the variance solved
    in double once per row.  Frame order is (ts, event_id): the
    event_id tiebreak makes ROWS frames deterministic under equal
    timestamps on any engine.

    Scale: one shuffle on user_id, per-user in-partition sort, O(1)
    state per row (Spark evaluates trailing-frame sums incrementally).
    Hot users cost a longer in-partition run, never a cross-partition
    explosion; the same plan is the availableNow backfill shape for a
    streaming deployment (cf. streaming/events.py).
    """
    from pyspark.sql.window import Window

    ev = load_table(spark, sf_dir, "events").select("event_id", "user_id", "ts", "value")
    frame = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-ANOMALY_WINDOW, -1)
    )
    d = F.col("value").cast("decimal(38,6)")
    d2 = (F.col("value") * F.col("value")).cast("decimal(38,6)")
    n = F.count(F.lit(1)).over(frame)
    sx = F.sum(d).over(frame).cast("double")
    sxx = F.sum(d2).over(frame).cast("double")
    mean = sx / n
    var = (sxx - sx * sx / n) / (n - 1)
    std = F.sqrt(F.greatest(var, F.lit(0.0)))
    return (
        ev.select(
            "event_id",
            "user_id",
            "value",
            n.cast("bigint").alias("n_hist"),
            F.round(mean, 6).alias("mean_prev"),
            F.round(std, 6).alias("std_prev"),
        )
        .filter(
            (F.col("n_hist") >= ANOMALY_MIN_N)
            & (F.col("value") > F.col("mean_prev") + ANOMALY_Z * F.col("std_prev"))
        )
        .orderBy("event_id")
    )


def x123_first_touch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-touch attribution: credit each user's total purchase
    revenue to the user's FIRST event type (by ts, event_id
    tie-break), then aggregate per channel — n_users, attributed
    revenue, and revenue per user.

    The standard marketing-attribution rollup.  One window pass to
    pick the first touch (partitioned by user — no global sort), one
    conditional aggregate for per-user purchase revenue riding the
    same user-partitioned shuffle, then a small per-channel aggregate.
    """
    from pyspark.sql.window import Window

    from go_mapreduce_spark.functions.numeric import dsum

    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    per_user = (
        ev.withColumn("rn", F.row_number().over(w))
        .groupBy("user_id")
        .agg(
            F.max(F.when(F.col("rn") == 1, F.col("event_type"))).alias("channel"),
            dsum(
                F.when(F.col("event_type") == "purchase", F.col("value")).otherwise(
                    F.lit(0.0)
                ),
                "revenue",
            ),
        )
    )
    return (
        per_user.groupBy("channel")
        .agg(
            F.count(F.lit(1)).alias("n_users"),
            F.round(F.sum("revenue"), 4).alias("revenue"),
        )
        .select(
            "channel",
            "n_users",
            "revenue",
            F.round(F.col("revenue") / F.col("n_users"), 6).alias("revenue_per_user"),
        )
        .orderBy("channel")
    )


CONVERSION_WINDOW_HOURS = 24


def x132_conversion_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-bound conversion: of signups in each hour-of-day, how many
    users purchased within ``CONVERSION_WINDOW_HOURS`` hours of THAT
    signup — n_signups, n_converted, conversion rate per signup hour.

    The windowed-funnel refinement of x62 (which is order-only): a
    conversion must land inside the window anchored at the signup
    event.  The existence probe is an equi-join on user_id with the
    time band as a join filter, aggregated back to one row per signup
    before the rollup — per-user bounded, no cross-user pairs, and no
    row explosion survives the per-signup DISTINCT.
    """
    ev = load_table(spark, sf_dir, "events")
    signups = ev.filter(F.col("event_type") == "signup").select(
        "user_id", F.col("event_id").alias("signup_id"), F.col("ts").alias("s_ts")
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("ts").alias("p_ts")
    )
    probed = (
        signups.join(
            purchases,
            (signups.user_id == purchases.user_id)
            & (F.col("p_ts") > F.col("s_ts"))
            & (
                F.col("p_ts")
                <= F.col("s_ts") + F.expr(f"INTERVAL {CONVERSION_WINDOW_HOURS} HOURS")
            ),
            "left",
        )
        .groupBy("signup_id", "s_ts")
        .agg(F.max(F.col("p_ts").isNotNull().cast("int")).alias("converted"))
    )
    return (
        probed.groupBy(F.hour("s_ts").alias("signup_hour"))
        .agg(
            F.count(F.lit(1)).alias("n_signups"),
            F.sum("converted").alias("n_converted"),
        )
        .select(
            "signup_hour",
            "n_signups",
            "n_converted",
            F.round(F.col("n_converted") / F.col("n_signups"), 6).alias("rate"),
        )
        .orderBy("signup_hour")
    )


PATH_TOP_N = 20


def x136_event_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-``PATH_TOP_N`` 3-step per-user event-type paths (the
    path-mining rollup behind funnel discovery — x75 is the 2-step
    Markov matrix; this is the order-3 generalization).

    Two ``lead`` windows over one (user, ts, event_id) sort produce
    both successors in a single in-partition pass — the user shuffle
    is shared, no self-joins; path strings aggregate into at most
    |event_types|³ keys.
    """
    from pyspark.sql.window import Window

    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    paths = (
        ev.select(
            "event_type",
            F.lead("event_type", 1).over(w).alias("e2"),
            F.lead("event_type", 2).over(w).alias("e3"),
        )
        .filter(F.col("e3").isNotNull())
        .select(
            F.concat_ws(">", "event_type", "e2", "e3").alias("path")
        )
    )
    return (
        paths.groupBy("path")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.col("cnt").desc(), F.col("path").asc())
        .limit(PATH_TOP_N)
    )


WINSOR_LO, WINSOR_HI = 0.05, 0.95


def x139_winsorize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winsorized per-type value stats: clip each event's value at its
    type's exact [p5, p95] and report mean before/after plus the
    clipped-row count — the standard heavy-tail taming step before
    training on metric columns.

    Exact grouped percentiles (one aggregate) broadcast back onto the
    events via the type key — a 5-row join, so the second pass is
    scan-bound; the whole op is two passes by necessity (the clip
    bounds are data-dependent).
    """
    ev = load_table(spark, sf_dir, "events")
    bounds = ev.groupBy("event_type").agg(
        F.percentile("value", WINSOR_LO).alias("lo"),
        F.percentile("value", WINSOR_HI).alias("hi"),
    )
    clipped = ev.join(F.broadcast(bounds), "event_type").select(
        "event_type",
        "value",
        F.least(F.greatest(F.col("value"), F.col("lo")), F.col("hi")).alias("w"),
        ((F.col("value") < F.col("lo")) | (F.col("value") > F.col("hi")))
        .cast("int")
        .alias("was_clipped"),
    )
    return (
        clipped.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.avg("value"), 6).alias("mean_raw"),
            F.round(F.avg("w"), 6).alias("mean_winsorized"),
            F.sum("was_clipped").alias("n_clipped"),
        )
        .orderBy("event_type")
    )


MAD_SCALE = 1.4826  # normal-consistency constant
ROBUST_Z_CUT = 3.5


def x140_robust_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust outlier census per event type: median/MAD z-scores
    (``|x - med| / (1.4826·MAD) > 3.5``) — the estimator that, unlike
    the x108 mean/stddev z-score, does not let outliers mask
    themselves by inflating the scale.

    Two exact grouped medians by necessity (MAD is a median OF
    deviations from a median); both group keys are the 5 event types,
    so each pass is one scan + a tiny aggregate, with the intermediate
    bounds broadcast.
    """
    ev = load_table(spark, sf_dir, "events")
    med = ev.groupBy("event_type").agg(F.percentile("value", 0.5).alias("med"))
    dev = ev.join(F.broadcast(med), "event_type").select(
        "event_type", "value", "med", F.abs(F.col("value") - F.col("med")).alias("ad")
    )
    mad = dev.groupBy("event_type").agg(F.percentile("ad", 0.5).alias("mad"))
    return (
        dev.join(F.broadcast(mad), "event_type")
        .select(
            "event_type",
            "med",
            "mad",
            (
                F.abs(F.col("value") - F.col("med"))
                > F.lit(ROBUST_Z_CUT) * F.lit(MAD_SCALE) * F.col("mad")
            )
            .cast("int")
            .alias("is_out"),
        )
        .groupBy("event_type")
        .agg(
            F.round(F.min("med"), 6).alias("median"),
            F.round(F.min("mad"), 6).alias("mad"),
            F.sum("is_out").alias("n_outliers"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .orderBy("event_type")
    )


def x144_monthly_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar revenue report: per ship month, gross revenue
    (``Σ extendedprice·(1-discount)``, decimal-exact) and
    month-over-month growth.

    The MoM comparison is an EQUI-JOIN of the month relation against
    itself shifted by one month (``add_months``) — never a ``lag``
    over an unpartitioned window: the month relation is small today,
    but a calendar join states the semantics without a single-task
    stage at ANY cardinality, and the first month falls out naturally
    as a null from the left join.  One fact-table scan, one
    metadata-sized self-join.
    """
    from go_mapreduce_spark.functions.numeric import dsum_expr

    li = load_table(spark, sf_dir, "lineitem")
    monthly = li.groupBy(
        F.trunc(F.col("l_shipdate"), "month").alias("month")
    ).agg(dsum_expr("l_extendedprice * (1 - l_discount)", "rev"))
    prev = monthly.select(
        F.add_months(F.col("month"), 1).alias("month"),
        F.col("rev").alias("prev_rev"),
    )
    return (
        monthly.join(prev, "month", "left")
        .select(
            "month",
            F.round("rev", 4).alias("revenue"),
            F.round(
                (F.col("rev") - F.col("prev_rev")) / F.col("prev_rev"), 6
            ).alias("mom_growth"),
        )
        .orderBy("month")
    )


def x148_multitouch_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Position-based (U-shaped) marketing attribution: each user's
    FIRST purchase distributes its value over the user's preceding
    view/click touches — 40% to the first touch, 40% to the last,
    20% split evenly across the middles (n=1 → 100%, n=2 → 50/50).
    Output: attributed value and touch count per (touch type,
    position class).

    The first-/last-/middle credit split is the industry-standard
    compromise between first-touch (x123) and last-touch bias; the
    whole computation is two user-partitioned windows (touch rank +
    touch count) over the pre-purchase touch set — one shuffle on
    user_id, no self-joins, scale-safe by partitioning.  Weight
    arithmetic is plain IEEE doubles (identical both engines); only
    the final sums go through decimal.
    """
    from go_mapreduce_spark.functions.numeric import dsum

    ev = load_table(spark, sf_dir, "events")
    first_purchase = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(
            F.min(F.struct("ts", "event_id", "value")).alias("fp"),
        )
        .select(
            "user_id",
            F.col("fp.ts").alias("p_ts"),
            F.col("fp.value").alias("p_value"),
        )
    )
    touches = (
        ev.filter(F.col("event_type").isin("view", "click"))
        .join(first_purchase, "user_id")
        .filter(F.col("ts") < F.col("p_ts"))
        .select("user_id", "event_type", "ts", "event_id", "p_value")
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wn = Window.partitionBy("user_id")
    ranked = touches.withColumn("rn", F.row_number().over(w)).withColumn(
        "n", F.count(F.lit(1)).over(wn)
    )
    weight = (
        F.when(F.col("n") == 1, F.lit(1.0))
        .when(F.col("n") == 2, F.lit(0.5))
        .when(F.col("rn") == 1, F.lit(0.4))
        .when(F.col("rn") == F.col("n"), F.lit(0.4))
        .otherwise(F.lit(0.2) / (F.col("n") - 2))
    )
    position = (
        F.when(F.col("rn") == 1, F.lit("first"))
        .when(F.col("rn") == F.col("n"), F.lit("last"))
        .otherwise(F.lit("middle"))
    )
    return (
        ranked.select(
            "event_type",
            position.alias("position"),
            (weight * F.col("p_value")).alias("attr"),
        )
        .groupBy("event_type", "position")
        .agg(
            F.count(F.lit(1)).alias("n_touches"),
            F.round(dsum(F.col("attr"), "sv"), 4).alias("attributed_value"),
        )
        .orderBy("event_type", "position")
    )


# ---------------------------------------------------------------------------
# x188: time-weighted average value (TWAP) per user
# ---------------------------------------------------------------------------


def x188_time_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user time-weighted average of ``value`` over the user's
    event span — the TWAP/step-integral primitive (each value holds
    until the next observation), the correct aggregate for
    irregularly-sampled series where plain ``avg`` over-weights
    bursts.

    One user-keyed shuffle: ``lead(ts)`` supplies each step's
    duration; the integral accumulates value(DECIMAL) x duration(µs
    BIGINT) exactly, and the only divisions happen once per user on
    the final pair of scalars.  Users with a single event have no
    span and are excluded (matches the oracle's HAVING).
    """
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    stepped = ev.select(
        "user_id",
        F.unix_micros(F.col("ts")).alias("t_us"),
        F.unix_micros(F.lead("ts").over(w)).alias("t_next_us"),
        F.col("value").cast("decimal(38,6)").alias("v"),
    )
    return (
        stepped.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(
                F.when(
                    F.col("t_next_us").isNotNull(),
                    F.col("v") * (F.col("t_next_us") - F.col("t_us")),
                )
            ).alias("area"),
            (F.max("t_us") - F.min("t_us")).alias("span_us"),
        )
        .filter(F.col("span_us") > 0)
        .select(
            "user_id",
            F.col("n_events").cast("bigint").alias("n_events"),
            F.round(F.col("span_us") / F.lit(1e6), 6).alias("span_seconds"),
            F.round(
                F.col("area").cast("double") / F.col("span_us").cast("double"),
                6,
            ).alias("twap"),
        )
        .orderBy("user_id")
    )


# ---------------------------------------------------------------------------
# x189: revenue concentration — exact Gini coefficient
# ---------------------------------------------------------------------------


def x189_revenue_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact Gini coefficient of per-customer order revenue — the
    concentration audit behind every "whales vs long tail" question
    (and, in corpus terms, the inequality of per-source token mass).

    Gini = 2·Σ(i·x_i) / (n·Σx_i) − (n+1)/n over revenues sorted
    ascending; ties contribute identically under any permutation, so
    the (rev, custkey) tie-break is for rank determinism only.  The
    global rank comes from the range-bucketed exact-rank machinery
    (``layout._global_row_number``) — sketch split points +
    partitioned row_number + literal offsets — so NOTHING funnels
    through a single window task (the x127-class fix applied at
    design time).  Σ(i·x_i) multiplies BIGINT rank into DECIMAL
    revenue and sums exactly; the two final divisions are scalar.
    """
    from go_mapreduce_spark.operators.layout import _global_row_number

    orders = load_table(spark, sf_dir, "orders")
    rev = orders.groupBy("o_custkey").agg(
        F.sum(F.col("o_totalprice").cast("decimal(38,6)")).alias("rev")
    )
    ranked, n = _global_row_number(
        rev,
        ["rev", "o_custkey"],
        F.col("rev").cast("double"),
        rn="rnk",
    )
    agg = ranked.agg(
        F.sum(F.col("rnk") * F.col("rev")).alias("weighted"),
        F.sum("rev").alias("total"),
    )
    return agg.select(
        F.lit(n).cast("bigint").alias("n_customers"),
        F.round(F.col("total").cast("double"), 4).alias("total_revenue"),
        F.round(
            F.lit(2.0)
            * F.col("weighted").cast("double")
            / (F.lit(float(n)) * F.col("total").cast("double"))
            - F.lit(float(n + 1)) / F.lit(float(n)),
            6,
        ).alias("gini"),
    )


# ---------------------------------------------------------------------------
# x190: peak concurrency via hierarchical (two-level) prefix-max
# ---------------------------------------------------------------------------

PEAK_SESSION_MINUTES = 30
PEAK_N_BUCKETS = 32


def x190_peak_concurrency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Peak concurrent sessions per event type — each event opens a
    half-open interval ``[ts, ts + 30 min)``; the answer is the max
    of the sweep-line running sum over +1/−1 boundary deltas, plus
    the first instant the peak is reached.

    A running sum is inherently sequential, but it DECOMPOSES: this
    plan range-buckets the deltas on time (approx_percentile split
    points — same machinery as layout's exact rank), computes each
    bucket's (net sum, max prefix, first argmax) independently under
    a partitioned window, then combines across each type's ≤ 32
    bucket summaries: global max = max over buckets of
    (prefix-offset + local max).  No window task ever sees more than
    ~1/32 of one type's deltas — the x127-class single-partition
    funnel is avoided BY DESIGN, which is the whole point: at 100 TB
    "max concurrency" is exactly the query people write as one
    giant unpartitioned running sum.

    Tie semantics: at equal timestamps the −1 sorts before the +1
    (delta ascending), so a session ending exactly when another
    starts never counts as overlap — and within a block of equal
    (t, delta) rows the attained prefix set is permutation-invariant
    (all steps are the same sign), so peak and first-peak time are
    deterministic.  Split points land whole (t, delta)-blocks in one
    bucket (strictly-below comparison), preserving the total order.
    """
    ev = load_table(spark, sf_dir, "events")
    half = F.expr(f"INTERVAL {PEAK_SESSION_MINUTES} MINUTES")
    d = ev.select(
        "event_type", F.col("ts").alias("t"), F.lit(1).alias("delta")
    ).unionAll(
        ev.select(
            "event_type",
            (F.col("ts") + half).alias("t"),
            F.lit(-1).alias("delta"),
        )
    )
    d = d.select("event_type", "t", "delta", F.unix_micros("t").alias("t_us"))

    fracs = [i / PEAK_N_BUCKETS for i in range(1, PEAK_N_BUCKETS)]
    row = d.select(
        F.percentile_approx("t_us", F.lit(fracs), F.lit(10_000)).alias("bs")
    ).first()
    bounds = sorted(set(row["bs"] or []))
    bucket = F.lit(0)
    for v in bounds:
        bucket = bucket + (F.col("t_us") > F.lit(v)).cast("int")

    part = ["event_type", "_rb"]
    w_run = (
        Window.partitionBy(*part)
        .orderBy("t", "delta")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    with_run = d.withColumn("_rb", bucket).withColumn(
        "run", F.sum("delta").over(w_run)
    )
    w_part = Window.partitionBy(*part)
    with_lmax = with_run.withColumn("lmax", F.max("run").over(w_part))
    buckets = with_lmax.groupBy(*part).agg(
        F.sum("delta").alias("s"),
        F.max("run").alias("lmax"),
        F.min(F.when(F.col("run") == F.col("lmax"), F.col("t"))).alias(
            "first_t"
        ),
        F.sum(F.when(F.col("delta") > 0, 1).otherwise(0)).alias("n_open"),
    )
    w_off = (
        Window.partitionBy("event_type")
        .orderBy("_rb")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    combined = buckets.select(
        "event_type",
        "n_open",
        (F.sum("s").over(w_off) - F.col("s") + F.col("lmax")).alias("cand"),
        "first_t",
    )
    w_type = Window.partitionBy("event_type")
    final = combined.withColumn("mx", F.max("cand").over(w_type))
    return (
        final.groupBy("event_type")
        .agg(
            F.max("cand").cast("int").alias("peak_concurrency"),
            F.min(
                F.when(F.col("cand") == F.col("mx"), F.col("first_t"))
            ).alias("first_peak_ts"),
            F.sum("n_open").cast("bigint").alias("n_sessions"),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# x216: in-row sequence-pattern match (MATCH_RECOGNIZE-lite)
# ---------------------------------------------------------------------------

FUNNEL_PATTERN = ("click", "view", "purchase")


def x216_sequence_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered subsequence matching per user: does the user's event
    stream contain click → view → purchase IN ORDER (other events
    may interleave)?  The MATCH_RECOGNIZE-class question answered
    with array machinery Spark actually has: collect each user's
    time-ordered type sequence in-row (sort_array over
    (ts, event_id, type) structs — collect_list order is
    partition-dependent, the sort is what makes it deterministic),
    then run the greedy two-pointer automaton as an ordered fold:
    state = pattern progress, advanced when the current element
    matches the next pattern symbol.  Greedy-leftmost is optimal for
    subsequence containment, so the fold IS the matcher, and both
    engines fold in index order — exactly replayable.

    One user-keyed shuffle; per-row work is O(events-per-user).  The
    output reports progress (0..3) so partial funnels are visible,
    not just the binary match.
    """
    ev = load_table(spark, sf_dir, "events")
    seq = ev.groupBy("user_id").agg(
        F.transform(
            F.sort_array(
                F.collect_list(
                    F.struct("ts", "event_id", F.col("event_type").alias("t"))
                )
            ),
            lambda s: s["t"],
        ).alias("seq")
    )
    pat = F.array(*[F.lit(p) for p in FUNNEL_PATTERN])
    progress = F.aggregate(
        F.col("seq"),
        F.lit(0),
        lambda acc, t: F.when(
            (acc < F.size(pat)) & (t == F.element_at(pat, acc + 1)), acc + 1
        ).otherwise(acc),
    )
    return seq.select(
        "user_id",
        F.size("seq").cast("bigint").alias("n_events"),
        progress.cast("int").alias("funnel_progress"),
        (progress == F.size(pat)).alias("matched"),
    ).orderBy("user_id")


# ---------------------------------------------------------------------------
# x217: longest same-type streak per user (run-length encoding)
# ---------------------------------------------------------------------------


def x217_longest_streak(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Run-length structure of each user's event stream: the longest
    consecutive run of a single event type, and which type it was —
    the engagement-pattern signal (doom-scrolling vs mixed sessions),
    and the classic gaps-and-islands shape applied to VALUE changes
    instead of time gaps (x80's sessionizer cuts on time, this cuts
    on ``type != lag(type)``).

    One user shuffle serves the lag window, the running island id,
    and the final aggregates; ties on streak length resolve to the
    earliest island (min island id) so the reported type is
    deterministic.
    """
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    marked = ev.select(
        "user_id",
        "event_type",
        "ts",
        "event_id",
        F.when(
            F.lag("event_type").over(w).isNull()
            | (F.lag("event_type").over(w) != F.col("event_type")),
            1,
        )
        .otherwise(0)
        .alias("new_run"),
    ).withColumn("island", F.sum("new_run").over(run))
    islands = marked.groupBy("user_id", "island").agg(
        F.count(F.lit(1)).alias("len"),
        F.min("event_type").alias("t"),  # constant within an island
    )
    w2 = Window.partitionBy("user_id").orderBy(
        F.col("len").desc(), F.col("island").asc()
    )
    return (
        islands.withColumn("rn", F.row_number().over(w2))
        .filter(F.col("rn") == 1)
        .select(
            "user_id",
            F.col("len").cast("bigint").alias("longest_streak"),
            F.col("t").alias("streak_type"),
        )
        .orderBy("user_id")
    )


# ---------------------------------------------------------------------------
# x218: inter-event latency spectrum (exact log2 buckets)
# ---------------------------------------------------------------------------


def x218_latency_spectrum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution of inter-event gaps per event type on a
    power-of-two (log2) scale — the latency-histogram idiom, with
    the bucket computed EXACTLY as the bit length of the gap in
    microseconds (``length(conv(gap, 10, 2))`` ≡ floor(log2)+1 —
    pure integer/string ops, no float log whose last-ulp behavior
    differs across engines).  Zero gaps (same-µs events) land in
    bucket 0.

    One user-keyed window for the lag, then a map-side-combinable
    (type, bucket) aggregate — the histogram is ≤ types × 64 rows
    at any scale.
    """
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gaps = ev.select(
        "event_type",
        (
            F.unix_micros("ts") - F.unix_micros(F.lag("ts").over(w))
        ).alias("gap_us"),
    ).filter(F.col("gap_us").isNotNull())
    bucket = F.when(F.col("gap_us") <= 0, F.lit(0)).otherwise(
        F.length(F.conv(F.col("gap_us").cast("string"), 10, 2))
    )
    return (
        gaps.select("event_type", bucket.cast("int").alias("log2_bucket"))
        .groupBy("event_type", "log2_bucket")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_gaps"))
        .orderBy("event_type", "log2_bucket")
    )


# ---------------------------------------------------------------------------
# x219: exact weighted median per group
# ---------------------------------------------------------------------------


# weighted-median price-range splits: bounds every window task to
# ~N/(groups × WM_N_SPLITS) rows; at 100 TB raise like layout.RN_SPLITS
WM_N_SPLITS = 32


def x219_weighted_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact quantity-weighted median price per (returnflag,
    linestatus): the smallest price whose cumulative quantity weight
    reaches half the group's total — the inventory-weighted "typical
    price" plain median misstates when line sizes vary.

    The classic lower weighted median (2·cumw ≥ W), computed with the
    range-bucket + literal-offset discipline (`layout._global_row_number`,
    x223): the (returnflag, linestatus) group key has ≤ 6 values — a
    window partitioned on it alone funnels ~N/6 of the fact table
    through one task, which does NOT survive a 100× scale-up.  Instead:

    1. one sketch aggregate yields ``WM_N_SPLITS - 1`` global price
       splits (ties share a bucket, so bucketing is monotone in the
       per-group sort order);
    2. one grouped decimal aggregate gives per-(group, bucket) weight
       sums — a ≤ groups×splits collect (schema-bounded: flag×status
       is 3×2) from which Python derives, EXACTLY (decimal.Decimal
       end-to-end), each group's total W, its crossing bucket (the
       first whose cumulative weight reaches W/2), and the weight
       offset before it;
    3. the scan re-filters to crossing buckets only (~N/splits of the
       data), the running weight sum runs PARTITIONED by
       (group, bucket) — every window task bucket-sized — and the
       pick is a map-side-combinable min(struct) aggregate, no
       second window at all.
    """
    li = load_table(spark, sf_dir, "lineitem")
    g = ["l_returnflag", "l_linestatus"]
    order_cols = ["l_extendedprice", "l_orderkey", "l_linenumber"]
    key = F.col("l_extendedprice").cast("double")
    fracs = [i / WM_N_SPLITS for i in range(1, WM_N_SPLITS)]
    row = li.select(
        F.percentile_approx(key, F.lit(fracs), F.lit(10_000)).alias("bs")
    ).first()
    bounds = sorted(set(row["bs"] or []))
    bucket = F.lit(0)
    for v in bounds:
        bucket = bucket + (key > F.lit(v)).cast("int")

    gk = F.concat_ws("|", *g)
    per = (
        li.groupBy(gk.alias("_gk"), bucket.alias("_rb"))
        .agg(F.sum(F.col("l_quantity").cast("decimal(38,6)")).alias("s"))
        .collect()
    )  # ≤ 6 groups × WM_N_SPLITS buckets — schema-bounded collect
    sums: dict[str, dict[int, object]] = {}
    for r in per:
        sums.setdefault(r["_gk"], {})[r["_rb"]] = r["s"]
    cb_py: dict[str, int] = {}
    off_py: dict[str, object] = {}
    w_py: dict[str, object] = {}
    for gkey, by_rb in sums.items():
        W = sum(by_rb.values())  # exact: decimal.Decimal + int start
        w_py[gkey] = W
        acc = 0
        for rb in sorted(by_rb):
            nxt = acc + by_rb[rb]
            if 2 * nxt >= W:
                cb_py[gkey], off_py[gkey] = rb, acc
                break
            acc = nxt

    def _lit_map(d: dict, cast: str):
        # decimals re-enter as string literals so no precision is lost
        return F.create_map(
            *[c for k in sorted(d) for c in (F.lit(k), F.lit(str(d[k])).cast(cast))]
        )

    cb_m = _lit_map(cb_py, "int")
    off_m = _lit_map(off_py, "decimal(38,6)")
    w_m = _lit_map(w_py, "decimal(38,6)")
    run = (
        Window.partitionBy(*g, "_rb")
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cand = (
        li.withColumn("_gk", gk)
        .withColumn("_rb", bucket)
        .filter(F.col("_rb") == F.element_at(cb_m, F.col("_gk")))
        .withColumn(
            "cumw",
            F.element_at(off_m, F.col("_gk"))
            + F.sum(F.col("l_quantity").cast("decimal(38,6)")).over(run),
        )
        .withColumn("W", F.element_at(w_m, F.col("_gk")))
    )
    hit = cand.filter(F.lit(2) * F.col("cumw") >= F.col("W"))
    return (
        hit.groupBy(*g)
        .agg(F.min(F.struct(*order_cols)).alias("m"), F.min("W").alias("W"))
        .select(
            *g,
            F.round(F.col("m.l_extendedprice"), 4).alias("weighted_median_price"),
            F.col("W").cast("double").alias("total_weight"),
        )
        .orderBy(*g)
    )


# ---------------------------------------------------------------------------
# x220: month-over-month waterfall decomposition
# ---------------------------------------------------------------------------


def x220_revenue_waterfall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Waterfall decomposition of month-over-month revenue change:
    per (month, market segment) — the segment's revenue, its delta
    vs the previous month, and its SHARE of the total monthly change
    — the report that turns "revenue moved X" into "because segment
    S contributed Y of it".

    Two exactly-keyed passes: one (month, segment) decimal aggregate
    (map-side combinable), then a lag window PARTITIONED by segment
    over the month-level relation (cardinality = months × segments —
    metadata-sized forever) plus a month-total window for the share.
    Deltas stay decimal end-to-end; the share is one double division
    with a zero-total guard.
    """
    orders = load_table(spark, sf_dir, "orders")
    # customer is data-sized (one row per customer) — no broadcast
    # hint: a forced broadcast would collect it to the driver and OOM
    # at scale (the x138 standard); AQE picks broadcast at fixture
    # scale on its own and shuffled-hash beyond the threshold
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    monthly = (
        orders.join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .groupBy(
            F.to_date(F.date_trunc("month", "o_orderdate")).alias("month"),
            F.col("c_mktsegment").alias("segment"),
        )
        .agg(
            F.sum(F.col("o_totalprice").cast("decimal(38,6)")).alias("rev")
        )
    )
    w = Window.partitionBy("segment").orderBy("month")
    with_delta = monthly.withColumn(
        "delta", F.col("rev") - F.lag("rev").over(w)
    )
    wm = Window.partitionBy("month")
    return (
        with_delta.withColumn(
            "month_delta", F.sum("delta").over(wm)
        )
        .filter(F.col("delta").isNotNull())
        .select(
            "month",
            "segment",
            F.round(F.col("rev").cast("double"), 4).alias("revenue"),
            F.round(F.col("delta").cast("double"), 4).alias("delta"),
            F.round(
                F.when(
                    F.col("month_delta") != 0,
                    F.col("delta").cast("double")
                    / F.col("month_delta").cast("double"),
                ),
                6,
            ).alias("share_of_change"),
        )
        .orderBy("month", "segment")
    )


# ---------------------------------------------------------------------------
# x221b/x222: user survival curve (activity-span retention)
# ---------------------------------------------------------------------------


def x222_survival_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Activity-span survival curve: for each day offset k, the
    fraction of users whose first→last event span reaches at least k
    days — the retention-decay summary behind every "day-N
    retention" metric, computed EXACTLY from two per-user scalars.

    Shape: one user aggregate (min/max ts → span days), collapse to
    a span histogram (≤ observation-window days — bounded), then a
    reversed cumulative sum over that metadata-sized relation gives
    survivors-at-k in one ordered sweep.  Division happens once per
    output row; everything upstream is integer.
    """
    ev = load_table(spark, sf_dir, "events")
    spans = ev.groupBy("user_id").agg(
        F.datediff(
            F.to_date(F.max("ts")), F.to_date(F.min("ts"))
        ).alias("span_days")
    )
    hist = spans.groupBy("span_days").agg(F.count(F.lit(1)).alias("c"))
    w = (
        Window.orderBy(F.col("span_days").desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    tot = Window.partitionBy()
    return (
        hist.select(
            F.col("span_days").cast("int").alias("day_k"),
            F.sum("c").over(w).cast("bigint").alias("surviving_users"),
            F.sum("c").over(tot).alias("n_users"),
        )
        .select(
            "day_k",
            "surviving_users",
            F.round(
                F.col("surviving_users") / F.col("n_users").cast("double"), 6
            ).alias("survival"),
        )
        .orderBy("day_k")
    )


# ---------------------------------------------------------------------------
# x223: ABC (Pareto-class) customer classification via bucketed
# global cumulative share
# ---------------------------------------------------------------------------

ABC_A = 0.5   # top classes by cumulative revenue share
ABC_B = 0.8
ABC_N_BUCKETS = 32


def x223_abc_classification(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ABC customer classification: customers sorted by revenue
    DESCENDING, classed A while the running revenue share is ≤ 50%,
    B to 80%, C after — the Pareto question ("how few whales carry
    half the revenue") answered EXACTLY with no single-task stage.

    The global ordered cumulative sum — the x127-class trap when
    written as one unpartitioned window — decomposes exactly like
    the exact-rank machinery, applied to SUMS: range-bucket on the
    sort key (approx_percentile split points, whole tie-blocks per
    bucket), per-bucket DECIMAL revenue totals fold back as literal
    offsets (≤ 32 scalars through the driver, the same class as the
    rank offsets), and each row's cumulative revenue = its bucket's
    offset + a PARTITIONED running decimal sum.  Decimal offsets
    re-enter as string literals so no precision is lost in transit.
    Class boundaries compare decimal·total exactly; the declared
    output is the 3-row class summary.
    """
    orders = load_table(spark, sf_dir, "orders")
    rev = orders.groupBy("o_custkey").agg(
        F.sum(F.col("o_totalprice").cast("decimal(38,6)")).alias("rev")
    )
    key = (-F.col("rev")).cast("double")
    fracs = [i / ABC_N_BUCKETS for i in range(1, ABC_N_BUCKETS)]
    row = rev.select(
        F.percentile_approx(key, F.lit(fracs), F.lit(10_000)).alias("bs")
    ).first()
    bounds = sorted(set(row["bs"] or []))
    bucket = F.lit(0)
    for v in bounds:
        bucket = bucket + (key > F.lit(v)).cast("int")
    b = rev.withColumn("_rb", bucket)
    per_bucket = {
        r["_rb"]: r["s"]
        for r in b.groupBy("_rb").agg(F.sum("rev").alias("s")).collect()
    }
    total = sum(per_bucket.values())
    offsets, acc = {}, 0
    for rb in sorted(per_bucket):
        offsets[rb] = acc
        acc += per_bucket[rb]
    off_map = F.create_map(
        *[
            c
            for rb in sorted(offsets)
            for c in (
                F.lit(rb).cast("int"),
                F.lit(str(offsets[rb])).cast("decimal(38,6)"),
            )
        ]
    )
    w = (
        Window.partitionBy("_rb")
        .orderBy(F.col("rev").desc(), F.col("o_custkey").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # boundary compares stay EXACT by clearing the fractions:
    # cum <= 0.5*T  <=>  2*cum <= T ; cum <= 0.8*T  <=>  5*cum <= 4*T
    # (decimal x small-int preserves scale; decimal x decimal would
    # round at the scale limit and could flip a knife-edge row)
    T = F.lit(str(total)).cast("decimal(38,6)")
    classed = b.withColumn(
        "cum", F.element_at(off_map, F.col("_rb")) + F.sum("rev").over(w)
    ).withColumn(
        "cls",
        F.when(F.col("cum") * 2 <= T, "A")
        .when(F.col("cum") * 5 <= T * 4, "B")
        .otherwise("C"),
    )
    return (
        classed.groupBy("cls")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_customers"),
            F.round(F.sum("rev").cast("double"), 4).alias("class_revenue"),
            F.round(
                F.sum("rev").cast("double") / F.lit(float(total)), 6
            ).alias("revenue_share"),
        )
        .orderBy("cls")
    )


# ---------------------------------------------------------------------------
# x226 — multi-touch conversion attribution (wave 34)
# ---------------------------------------------------------------------------


def x226_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-touch attribution per touch event type: for every user
    who purchased, the view/click touches STRICTLY before their first
    purchase split one unit of conversion credit two ways — LINEAR
    (1/n each) and U-SHAPED (40% first touch, 40% last, 20% spread
    over the middle; degenerate paths get 100% / 50-50) — the two
    standard marketing-attribution baselines.

    Shape: one per-user min-aggregate for the conversion instant
    (filter pushed to the scan), an equi join back to touches, ONE
    user-partitioned window pass for (rank, count), then a map-side
    combinable per-type aggregate.  No per-user replay, no skew
    beyond the user key the sessionize family already stresses.
    Credit sums are exact integer ratios summed as doubles and
    rounded to 6 — both engines agree at that precision.
    """
    ev = load_table(spark, sf_dir, "events")
    first_purchase = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(F.min("ts").alias("p_ts"))
    )
    touches = (
        ev.filter(F.col("event_type").isin("view", "click"))
        .join(first_purchase, "user_id")
        .filter(F.col("ts") < F.col("p_ts"))
        .select("user_id", "event_type", "ts", "event_id")
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wn = Window.partitionBy("user_id")
    ranked = touches.select(
        "event_type",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(wn).alias("n"),
    )
    ushape = (
        F.when(F.col("n") == 1, F.lit(1.0))
        .when(F.col("n") == 2, F.lit(0.5))
        .when((F.col("rn") == 1) | (F.col("rn") == F.col("n")), F.lit(0.4))
        .otherwise(F.lit(0.2) / (F.col("n") - 2))
    )
    return (
        ranked.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_touches"),
            F.round(F.sum(F.lit(1.0) / F.col("n")), 6).alias("linear_credit"),
            F.round(F.sum(ushape), 6).alias("ushaped_credit"),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# x230 — session transition matrix (wave 34)
# ---------------------------------------------------------------------------


def x230_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix of user behavior: counts
    and conditional probabilities of consecutive event-type pairs in
    each user's timeline (ordered by ts, event_id) — the "what do
    users do after X" table behind every journey analysis.

    One user-partitioned lag window (the x80 shuffle, same skew
    posture), then a (from, to) aggregate whose output is bounded by
    |event_type|² — metadata-sized forever.  The row probability
    divides two exact counts once per OUTPUT row.
    """
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = (
        ev.select(
            F.lag("event_type").over(w).alias("from_type"),
            F.col("event_type").alias("to_type"),
        )
        .filter(F.col("from_type").isNotNull())
        .groupBy("from_type", "to_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    wt = Window.partitionBy("from_type")
    return (
        pairs.select(
            "from_type",
            "to_type",
            F.col("n").cast("bigint").alias("n_transitions"),
            F.round(
                F.col("n") / F.sum("n").over(wt).cast("double"), 6
            ).alias("prob"),
        )
        .orderBy("from_type", "to_type")
    )


# ---------------------------------------------------------------------------
# x232 — bounded-lookback EWMA (wave 35)
# ---------------------------------------------------------------------------

EWMA_ALPHA_POW = 0.5  # dyadic decay: every weight is exact in binary
EWMA_LOOKBACK = 8


def x232_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per (user, event type): the exponentially weighted moving
    average of ``value`` over the user's LAST ``EWMA_LOOKBACK`` events
    of that type (decay ½ per step, normalized by the realized weight
    mass — pandas' ``adjust=True`` convention) — the smoothed
    "current level" signal behind rate limiting and anomaly baselines.

    A naive EWMA is a sequential recurrence; the bounded-lookback form
    is CLOSED: weight of the i-th most recent event is 0.5^i, so one
    user-keyed window (reverse row_number), a ≤ lookback filter, and a
    map-side-combinable weighted aggregate compute it exactly — no
    recursion, no per-user replay.  The ½ decay makes every weight a
    dyadic rational: POWER(0.5, i) is EXACT in IEEE double on every
    engine, so the only float rounding is the final ≤ 8-term sum.
    """
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id", "event_type").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    recent = ev.select(
        "user_id",
        "event_type",
        "value",
        F.row_number().over(w).alias("rix"),
    ).filter(F.col("rix") <= EWMA_LOOKBACK)
    wgt = F.pow(F.lit(EWMA_ALPHA_POW), F.col("rix") - 1)
    return (
        recent.groupBy("user_id", "event_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_used"),
            F.round(
                F.sum(F.col("value") * wgt) / F.sum(wgt), 6
            ).alias("ewma"),
        )
        .orderBy("user_id", "event_type")
    )


# ---------------------------------------------------------------------------
# x234 — time-weighted average (wave 35)
# ---------------------------------------------------------------------------


def x234_time_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per user: the TIME-weighted average of ``value`` — each event's
    value holds until the user's next event, weighted by that holding
    duration (microseconds) — the correct "average level" for
    irregular telemetry, where the plain mean over-counts bursts.

    One user-keyed lead window (the sessionize shuffle), then exact
    DECIMAL value×duration products summed map-side: micros × value
    exceeds double's 2^53 integer range on long-lived users, so the
    numerator must NOT be a float sum.  The single division happens
    once per output row.  Users with one event (no holding interval)
    are excluded — their TWA is undefined.
    """
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    held = ev.select(
        "user_id",
        F.col("value").cast("decimal(38,6)").alias("v"),
        (
            F.unix_micros(F.lead("ts").over(w)) - F.unix_micros("ts")
        ).alias("dur_us"),
    ).filter(F.col("dur_us").isNotNull())
    return (
        held.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_intervals"),
            F.sum("dur_us").cast("bigint").alias("span_us"),
            F.round(
                (
                    F.sum(F.col("v") * F.col("dur_us"))
                    / F.sum("dur_us").cast("decimal(38,6)")
                ).cast("double"),
                6,
            ).alias("twa_value"),
        )
        .orderBy("user_id")
    )


# ---------------------------------------------------------------------------
# x239 — SCD Type-2 dimension historization (wave 36)
# ---------------------------------------------------------------------------


def x239_scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slowly-Changing-Dimension Type 2 build: treat each user's event
    stream as a change feed of their "current activity state" (the
    event type) and emit the versioned dimension — one row per state
    RUN with valid_from / valid_to / version / is_current — the
    standard warehouse historization every dimension load performs.

    Gaps-and-islands under the hood: consecutive same-type events
    collapse into one validity interval (lag window + cumulative
    change counter), so the output is one row per CHANGE, not per
    event.  One user-keyed shuffle serves the lag, the run id, and
    the interval aggregate; valid_to is the next run's valid_from
    (open interval for the current row) via one more lead on the
    collapsed (metadata-per-user) relation.
    """
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    marked = ev.select(
        "user_id",
        "event_type",
        "ts",
        "event_id",
        F.when(
            F.lag("event_type").over(w).isNull()
            | (F.lag("event_type").over(w) != F.col("event_type")),
            1,
        )
        .otherwise(0)
        .alias("chg"),
    ).withColumn(
        "run",
        F.sum("chg").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    runs = marked.groupBy("user_id", "run").agg(
        F.min("event_type").alias("state"),  # constant within a run
        F.min("ts").alias("valid_from"),
    )
    w2 = Window.partitionBy("user_id").orderBy("run")
    return (
        runs.select(
            "user_id",
            F.col("run").cast("bigint").alias("version"),
            "state",
            "valid_from",
            F.lead("valid_from").over(w2).alias("valid_to"),
        )
        .withColumn("is_current", F.col("valid_to").isNull())
        .orderBy("user_id", "version")
    )


# ---------------------------------------------------------------------------
# x240 — time-bounded conversion funnel (wave 36)
# ---------------------------------------------------------------------------

FUNNEL_CLICK_WINDOW_H = 24
FUNNEL_PURCHASE_WINDOW_H = 72


def x240_timed_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-bounded funnel: view → click within 24 h → purchase
    within 72 h of that click; reports per-stage user counts and
    conversion rates.  The bounded variant is what product analytics
    actually runs — an unbounded funnel (x62) credits conversions
    months later.

    Same scale shape as x62: per-stage min-aggregates chained by
    equi joins on user_id, each stage relation shrinking; the time
    bounds are plain filters on the joined pair, never an interval
    join.  Rates divide two exact counts at output time.
    """
    ev = load_table(spark, sf_dir, "events").select("user_id", "event_type", "ts")
    views = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("view_ts"))
    )
    clicks = (
        ev.filter(F.col("event_type") == "click")
        .join(views, "user_id")
        .filter(
            (F.col("ts") >= F.col("view_ts"))
            & (
                F.unix_micros("ts") - F.unix_micros("view_ts")
                <= FUNNEL_CLICK_WINDOW_H * 3_600_000_000
            )
        )
        .groupBy("user_id")
        .agg(F.min("ts").alias("click_ts"))
    )
    purchases = (
        ev.filter(F.col("event_type") == "purchase")
        .join(clicks, "user_id")
        .filter(
            (F.col("ts") >= F.col("click_ts"))
            & (
                F.unix_micros("ts") - F.unix_micros("click_ts")
                <= FUNNEL_PURCHASE_WINDOW_H * 3_600_000_000
            )
        )
        .groupBy("user_id")
        .agg(F.min("ts").alias("purchase_ts"))
    )
    n1 = views.agg(F.count(F.lit(1)).alias("n")).select(
        F.lit(1).alias("stage"), F.lit("view").alias("name"), "n"
    )
    n2 = clicks.agg(F.count(F.lit(1)).alias("n")).select(
        F.lit(2).alias("stage"), F.lit("click_24h").alias("name"), "n"
    )
    n3 = purchases.agg(F.count(F.lit(1)).alias("n")).select(
        F.lit(3).alias("stage"), F.lit("purchase_72h").alias("name"), "n"
    )
    funnel = n1.unionAll(n2).unionAll(n3)
    w = Window.orderBy("stage")  # 3-row relation: safe BY CONSTRUCTION
    return funnel.select(
        "stage",
        "name",
        F.col("n").cast("bigint").alias("n_users"),
        F.round(
            F.col("n") / F.first("n").over(
                w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
            ).cast("double"),
            6,
        ).alias("rate_vs_stage1"),
    ).orderBy("stage")


# ---------------------------------------------------------------------------
# x247 — RFM customer segmentation (wave 38)
# ---------------------------------------------------------------------------

RFM_TILES = 5


def _ntile_from_rank(rn: F.Column, n: int, k: int) -> F.Column:
    """ANSI ``NTILE(k)`` reconstructed from an exact 1-based rank and
    the known total ``n`` — the first ``n % k`` tiles get
    ``n//k + 1`` rows (the standard remainder rule), so the result is
    bit-identical to the oracle's ``NTILE`` without the unpartitioned
    window ``F.ntile`` would plan."""
    q, rem = divmod(n, k)
    head = rem * (q + 1)
    return F.when(
        F.lit(rem > 0) & (rn <= F.lit(head)),
        F.floor((rn - 1) / F.lit(q + 1)) + 1,
    ).otherwise(F.lit(rem) + F.floor((rn - F.lit(head) - 1) / F.lit(max(q, 1))) + 1)


def x247_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM segmentation: every customer with orders scored into
    quintiles on Recency (last order date), Frequency (order count),
    and Monetary (decimal revenue sum), then the segment grid
    reported with customer counts and average spend — the classic
    CRM cut (5 = most recent / most frequent / highest spend).

    Exact quintiles need exact global ranks; each of the three
    orderings runs the range-bucketed ``layout._global_row_number``
    over the customer-sized aggregate (the fact table is touched
    once), and the NTILE remainder rule is reconstructed from the
    rank in closed form, so no unpartitioned window exists anywhere.
    Output is the ≤125-cell segment grid.
    """
    from go_mapreduce_spark.functions.numeric import dsum
    from go_mapreduce_spark.operators.layout import _global_row_number

    orders = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderdate", "o_totalprice"
    )
    rfm = orders.groupBy("o_custkey").agg(
        F.max(F.to_date("o_orderdate")).alias("last_day"),
        F.count(F.lit(1)).alias("freq"),
        dsum(F.col("o_totalprice"), "monetary"),
    )
    # each _global_row_number runs TWO plan-build probes (split-point
    # sketch + bucket counts) against its input; chained lazily, the
    # 3rd ranking's probes replayed the fact scan and both upstream
    # windows — 6 probe jobs of growing depth, 2.6 s of the 3.3 s
    # wall at sf0.1.  Materialize the customer-sized aggregate once
    # (the x319/x324 bounded-relation discipline) and again after
    # each ranking, so every probe reads a checkpointed relation.
    rfm = rfm.localCheckpoint()
    ranked, n = _global_row_number(
        rfm, ["last_day", "o_custkey"], F.unix_date(F.col("last_day")), rn="rn_r"
    )
    ranked, _ = _global_row_number(
        ranked.localCheckpoint(), ["freq", "o_custkey"], F.col("freq"), rn="rn_f"
    )
    ranked, _ = _global_row_number(
        ranked.localCheckpoint(),
        ["monetary", "o_custkey"],
        F.col("monetary"),
        rn="rn_m",
    )
    scored = ranked.select(
        "monetary",
        _ntile_from_rank(F.col("rn_r"), n, RFM_TILES).cast("int").alias("r_score"),
        _ntile_from_rank(F.col("rn_f"), n, RFM_TILES).cast("int").alias("f_score"),
        _ntile_from_rank(F.col("rn_m"), n, RFM_TILES).cast("int").alias("m_score"),
    )
    return (
        scored.groupBy("r_score", "f_score", "m_score")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_customers"),
            F.round(
                dsum(F.col("monetary"), "s") / F.count(F.lit(1)), 6
            ).alias("avg_monetary"),
        )
        .orderBy("r_score", "f_score", "m_score")
    )


# ---------------------------------------------------------------------------
# x248 — merged-interval activity coverage (wave 38)
# ---------------------------------------------------------------------------

COVERAGE_TTL_S = 300


def x248_interval_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user activity coverage: each event opens a
    ``COVERAGE_TTL_S``-second activity interval; overlapping
    intervals merge, and the report is each user's merged-island
    count and total covered microseconds — the union-of-intervals
    primitive behind uptime, ad-exposure, and presence metrics
    (x190's sweep counts concurrency; this measures the union).

    Classic gaps-and-islands: a running ``max(end)`` over the
    user-ordered stream marks island starts (strictly-after
    comparison, so touching intervals merge), a cumulative flag sum
    numbers islands, and per-island coverage is ``max(end) −
    min(start)``.  All windows partition on user_id (unbounded
    cardinality); timestamps stay in exact integer microseconds.
    """
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", F.unix_micros("ts").alias("s"), "event_id"
    )
    iv = ev.withColumn("e", F.col("s") + COVERAGE_TTL_S * 1_000_000)
    w = Window.partitionBy("user_id").orderBy("s", "event_id")
    flagged = iv.withColumn(
        "new_island",
        (
            F.col("s")
            > F.coalesce(
                F.max("e").over(w.rowsBetween(Window.unboundedPreceding, -1)),
                F.lit(-(1 << 62)),
            )
        ).cast("int"),
    ).withColumn(
        "island",
        F.sum("new_island").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    islands = flagged.groupBy("user_id", "island").agg(
        (F.max("e") - F.min("s")).alias("covered_us")
    )
    return (
        islands.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_islands"),
            F.sum("covered_us").cast("bigint").alias("covered_us"),
        )
        .orderBy("user_id")
    )


# ---------------------------------------------------------------------------
# x256 — cohort LTV curves (wave 40)
# ---------------------------------------------------------------------------

LTV_MAX_OFFSET = 5


def x256_cohort_ltv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customer-lifetime-value curves by acquisition cohort: customers
    cohort on their first order month, and each cohort reports
    cumulative revenue per cohort customer at month offsets
    0..``LTV_MAX_OFFSET`` — the payback-period curve (x63's retention
    counts, upgraded to money).

    Two fact passes collapse to customer- then month-granularity:
    first-order month per customer (one keyed aggregate), then
    revenue onto the (cohort, offset) grid; the cumulative sum runs
    on that grid — safe BY CONSTRUCTION (cardinality = months ×
    offsets, ~500 rows for a century).  Month offsets use exact
    integer year/month arithmetic, not float months_between.
    """
    from go_mapreduce_spark.functions.numeric import dsum

    orders = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderdate", "o_totalprice"
    )
    firsts = orders.groupBy("o_custkey").agg(
        F.min(F.trunc("o_orderdate", "month")).alias("cohort_month")
    )
    cohort_sizes = firsts.groupBy("cohort_month").agg(
        F.count(F.lit(1)).alias("n_customers")
    )
    offset = (
        (F.year(F.col("o_orderdate")) - F.year(F.col("cohort_month"))) * 12
        + (F.month(F.col("o_orderdate")) - F.month(F.col("cohort_month")))
    )
    from go_mapreduce_spark.functions.numeric import DECIMAL_T

    grid = (
        orders.join(firsts, "o_custkey")
        .withColumn("offset", offset)
        .filter(F.col("offset") <= LTV_MAX_OFFSET)
        .groupBy("cohort_month", "offset")
        # stay in exact decimal through the cumulative sum so the
        # running total is order- and engine-independent
        .agg(F.sum(F.col("o_totalprice").cast(DECIMAL_T)).alias("rev"))
    )
    w = Window.partitionBy("cohort_month").orderBy("offset")
    return (
        grid.withColumn(
            "cum_rev",
            F.sum("rev").over(w.rowsBetween(Window.unboundedPreceding, 0)),
        )
        .join(cohort_sizes, "cohort_month")
        .select(
            "cohort_month",
            "offset",
            F.col("n_customers").cast("bigint").alias("n_customers"),
            F.round(
                F.col("cum_rev").cast("double") / F.col("n_customers"), 6
            ).alias("ltv_per_customer"),
        )
        .orderBy("cohort_month", "offset")
    )


# ---------------------------------------------------------------------------
# x257 — day-of-week seasonal decomposition (wave 40)
# ---------------------------------------------------------------------------


def x257_dow_seasonality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiplicative day-of-week decomposition of daily order
    revenue: per ISO weekday, the seasonal index (day mean ÷ grand
    mean) and the dispersion of the deseasonalized series — the
    "is Monday really slower, and how noisy is the rest?" screen
    that pairs with x245's ACF.

    The fact reduces to the daily series first; indices come from
    two metadata-sized aggregates, and the deseasonalized residual
    std needs only per-dow decimal sums of x and x² (no second pass
    over deseasonalized rows).  ISO weekday (Mon=1) is computed as
    ``weekday()+1`` / ``isodow()`` so both engines agree on the week
    origin.
    """
    from go_mapreduce_spark.functions.numeric import dsum, dsum_expr

    daily = (
        load_table(spark, sf_dir, "orders")
        .groupBy(F.to_date("o_orderdate").alias("d"))
        .agg(dsum(F.col("o_totalprice"), "rev"))
        .withColumn("dow", F.weekday("d") + 1)
    )
    grand = daily.agg(
        (dsum(F.col("rev"), "s") / F.count(F.lit(1))).alias("grand_mean")
    )
    per_dow = (
        daily.crossJoin(F.broadcast(grand))  # 1-row grand mean
        .groupBy("dow")
        .agg(
            F.count(F.lit(1)).alias("n_days"),
            (dsum(F.col("rev"), "s") / F.count(F.lit(1))).alias("dow_mean"),
            F.first("grand_mean").alias("grand_mean"),
            # sufficient statistics of the deseasonalized values
            # x/idx, accumulated as Σx and Σx² per dow (idx is a
            # per-dow constant, so it factors out of both sums)
            dsum_expr("rev * rev", "ss"),
        )
    )
    idx = F.col("dow_mean") / F.col("grand_mean")
    # deseason x = rev/idx: mean = grand_mean by construction;
    # var = (Σx²/n − mean²) with Σx² = ss/idx²  (population variance)
    var = (F.col("ss") / (idx * idx) / F.col("n_days")) - (
        F.col("grand_mean") * F.col("grand_mean")
    )
    return per_dow.select(
        "dow",
        F.col("n_days").cast("bigint").alias("n_days"),
        F.round(F.col("dow_mean"), 4).alias("dow_mean"),
        F.round(idx, 6).alias("seasonal_index"),
        F.round(F.sqrt(F.greatest(var, F.lit(0.0))), 4).alias("deseason_std"),
    ).orderBy("dow")


# ---------------------------------------------------------------------------
# x279 — item-item co-occurrence recommendations (wave 49)
# ---------------------------------------------------------------------------

RECS_TOP_K = 3
RECS_MIN_SUPPORT = 3


def x279_item_recommendations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Item-to-item collaborative filtering ("customers who bought X
    also bought Y"): cosine similarity over order co-occurrence
    counts — pair support normalized by each part's own basket
    frequency — with the top-``RECS_TOP_K`` recommendations per part
    (Linden et al., the Amazon item-item scheme).

    Reuses x87's bounded-basket self-join for pair supports (baskets
    are ~7 items, so fan-out is a constant per order); symmetrizes,
    joins per-part frequencies, and ranks per part in a
    part-partitioned window (unbounded key).  Only pairs at
    ``RECS_MIN_SUPPORT``+ qualify — the cold-start guard that also
    caps the pair relation's size.
    """
    li = load_table(spark, sf_dir, "lineitem")
    basket = li.select("l_orderkey", "l_partkey").distinct()
    freq = basket.groupBy(F.col("l_partkey").alias("p")).agg(
        F.count(F.lit(1)).alias("n")
    )
    a, b = basket.alias("a"), basket.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .groupBy(
            F.col("a.l_partkey").alias("pa"), F.col("b.l_partkey").alias("pb")
        )
        .agg(F.count(F.lit(1)).alias("support"))
        .filter(F.col("support") >= RECS_MIN_SUPPORT)
    )
    sym = pairs.select("pa", "pb", "support").unionAll(
        pairs.select(
            F.col("pb").alias("pa"), F.col("pa").alias("pb"), "support"
        )
    )
    scored = (
        sym.join(freq.select(F.col("p").alias("pa"), F.col("n").alias("na")), "pa")
        .join(freq.select(F.col("p").alias("pb"), F.col("n").alias("nb")), "pb")
        .select(
            "pa",
            "pb",
            "support",
            (F.col("support") / F.sqrt(F.col("na") * F.col("nb"))).alias("cos"),
        )
    )
    w = Window.partitionBy("pa").orderBy(
        F.col("cos").desc(), F.col("pb")
    )
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= RECS_TOP_K)
        .select(
            F.col("pa").alias("part"),
            F.col("rk").cast("int").alias("rk"),
            F.col("pb").alias("rec_part"),
            F.col("support").cast("bigint").alias("support"),
            F.round("cos", 6).alias("cosine"),
        )
        .orderBy("part", "rk")
    )


# ---------------------------------------------------------------------------
# x281 — association rules with confidence and lift (wave 50)
# ---------------------------------------------------------------------------

RULES_MIN_SUPPORT = 3
RULES_TOP_N = 30


def x281_association_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Association rules (A,B)→C over order baskets at the BRAND
    level, scored with support, confidence supp(ABC)/supp(AB) and
    lift conf/P(C) — the Apriori output market-basket analysis
    actually ships (x87 stops at raw-part pair supports; rules need
    the triple level, and raw part keys are too sparse for rules at
    ANY scale: the key space grows with the data, so triple supports
    collapse to 1 — brands are a bounded vocabulary, so support
    grows WITH data, the shape real catalogs have).

    Bounded by construction: baskets are ≤ |brands| items, so the
    ordered triple fan-out per order is a constant, and the
    min-support filter prunes pairs BEFORE the triple join probes
    them (the Apriori monotonicity trick: no superset of an
    infrequent pair can be frequent).  Top-N by (lift, rule keys)
    is a deterministic TakeOrderedAndProject.
    """
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    basket = (
        # part scales with SF (data-sized): AQE decides the join (x138)
        li.join(part, li.l_partkey == part.p_partkey)
        .select("l_orderkey", F.col("p_brand").alias("l_partkey"))
        .distinct()
    )
    # measured dead end (r12): checkpointing basket for its 5
    # downstream references REGRESSED 2.77→3.54 s at sf0.1 — the
    # branches share exchanges via ReuseExchange, so the eager
    # materialization only added cost.  Left as the lazy plan.
    n_orders = basket.select("l_orderkey").distinct().agg(
        F.count(F.lit(1)).alias("n_orders")
    )
    item = basket.groupBy(F.col("l_partkey").alias("c")).agg(
        F.count(F.lit(1)).alias("supp_c")
    )
    a, b = basket.alias("a"), basket.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .groupBy(
            F.col("a.l_orderkey").alias("ok"),
            F.col("a.l_partkey").alias("pa"),
            F.col("b.l_partkey").alias("pb"),
        )
        .agg(F.lit(1).alias("_one"))
    )
    pair_supp = (
        pairs.groupBy("pa", "pb")
        .agg(F.count(F.lit(1)).alias("supp_ab"))
        .filter(F.col("supp_ab") >= RULES_MIN_SUPPORT)
    )
    # Apriori prune: only frequent pairs probe for a third item
    triples = (
        pairs.join(pair_supp, ["pa", "pb"])
        .join(
            basket.alias("c"),
            (F.col("ok") == F.col("c.l_orderkey"))
            & (F.col("c.l_partkey") != F.col("pa"))
            & (F.col("c.l_partkey") != F.col("pb")),
        )
        .groupBy("pa", "pb", F.col("c.l_partkey").alias("pc"), "supp_ab")
        .agg(F.count(F.lit(1)).alias("supp_abc"))
        .filter(F.col("supp_abc") >= RULES_MIN_SUPPORT)
    )
    scored = (
        triples.join(item, triples.pc == item.c)
        .crossJoin(F.broadcast(n_orders))
        .select(
            "pa",
            "pb",
            "pc",
            F.col("supp_abc").cast("bigint").alias("support"),
            F.round(F.col("supp_abc") / F.col("supp_ab"), 6).alias("confidence"),
            F.round(
                (F.col("supp_abc") / F.col("supp_ab"))
                / (F.col("supp_c") / F.col("n_orders")),
                6,
            ).alias("lift"),
        )
    )
    return scored.orderBy(
        F.col("lift").desc(), "pa", "pb", "pc"
    ).limit(RULES_TOP_N)


# ---------------------------------------------------------------------------
# x283 — degree assortativity (wave 50)
# ---------------------------------------------------------------------------


def x283_degree_assortativity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree assortativity of the near-dup graph: the Pearson
    correlation of endpoint degrees over edges (Newman 2002) — do
    highly-duplicated docs link to other hubs (assortative, r>0,
    template families) or to leaves (disassortative, r<0,
    hub-and-spoke boilerplate)?

    Degrees are one grouped count; the statistic needs only five
    decimal sums over the directed edge relation (both orientations,
    the standard undirected treatment), all map-side combinable —
    the same sufficient-statistics discipline as x243/x258.
    """
    from go_mapreduce_spark.functions.numeric import dsum_expr
    from go_mapreduce_spark.operators.dedup import shared_pair_graph

    pairs = shared_pair_graph(spark, sf_dir)
    edges = pairs.select(F.col("doc_a").alias("u"), F.col("doc_b").alias("v")).union(
        pairs.select(F.col("doc_b").alias("u"), F.col("doc_a").alias("v"))
    )
    deg = edges.groupBy("u").agg(F.count(F.lit(1)).alias("d"))
    du = deg.select(F.col("u").alias("_u"), F.col("d").alias("du"))
    dv = deg.select(F.col("u").alias("_v"), F.col("d").alias("dv"))
    ed = edges.join(du, edges.u == F.col("_u")).join(dv, edges.v == F.col("_v"))
    s = ed.agg(
        F.count(F.lit(1)).alias("m"),
        dsum_expr("du", "sx"),
        dsum_expr("dv", "sy"),
        dsum_expr("du * du", "sxx"),
        dsum_expr("dv * dv", "syy"),
        dsum_expr("du * dv", "sxy"),
    )
    m = F.col("m").cast("double")
    cov = m * F.col("sxy") - F.col("sx") * F.col("sy")
    vx = m * F.col("sxx") - F.col("sx") * F.col("sx")
    vy = m * F.col("syy") - F.col("sy") * F.col("sy")
    return s.select(
        (F.col("m") / 2).cast("bigint").alias("n_edges"),
        F.round(cov / F.sqrt(vx * vy), 6).alias("assortativity"),
    )


# ---------------------------------------------------------------------------
# x285 — conversion latency percentiles (wave 51)
# ---------------------------------------------------------------------------


def x285_conversion_latency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-to-convert distribution: per user, the latency from first
    view to the first click at-or-after it, summarized as exact
    p50/p90/p99 (plus mean) — the "how long does conversion take"
    companion to x62's how-many funnel.

    The x62 stage shape (per-user min-aggregates chained by an equi
    join + bound filter) reduces the stream to one latency scalar per
    converting user; the percentile aggregate runs on that
    user-sized relation in exact integer microseconds, divided to
    seconds only at the output edge.
    """
    from go_mapreduce_spark.functions.numeric import dsum

    ev = load_table(spark, sf_dir, "events").select("user_id", "event_type", "ts")
    views = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min(F.unix_micros("ts")).alias("view_us"))
    )
    clicks = (
        ev.filter(F.col("event_type") == "click")
        .select("user_id", F.unix_micros("ts").alias("click_us"))
        .join(views, "user_id")
        .filter(F.col("click_us") >= F.col("view_us"))
        .groupBy("user_id")
        .agg((F.min("click_us") - F.min("view_us")).alias("lat_us"))
    )
    return clicks.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_converting_users"),
        F.round(F.expr("percentile(lat_us, 0.5)") / 1e6, 4).alias("p50_s"),
        F.round(F.expr("percentile(lat_us, 0.9)") / 1e6, 4).alias("p90_s"),
        F.round(F.expr("percentile(lat_us, 0.99)") / 1e6, 4).alias("p99_s"),
        F.round(dsum(F.col("lat_us") / 1e6, "m") / F.count(F.lit(1)), 4).alias(
            "mean_s"
        ),
    )


# ---------------------------------------------------------------------------
# x310 — per-stream daily trend OLS with R² (wave 60)
# ---------------------------------------------------------------------------


def x310_group_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type OLS trend of daily total value: slope,
    intercept, and R² over the day series — the per-stream "is this
    metric drifting?" screen (x262's single-series regression, run
    for every stream at once; a flat R² ≈ 0 stream is stationary,
    a high-R² nonzero slope is a drift alert).

    The fact table reduces to one decimal-summed row per (type, day);
    the five OLS sufficient statistics per type come from ONE more
    grouped aggregate over that calendar-bounded relation, and the
    closed-form fit is a projection — no window, no collect.
    """
    from go_mapreduce_spark.functions.numeric import dsum_expr

    ev = load_table(spark, sf_dir, "events").select(
        "event_type",
        F.datediff(F.to_date("ts"), F.lit("1970-01-01")).alias("d"),
        "value",
    )
    daily = ev.groupBy("event_type", "d").agg(dsum_expr("value", "y"))
    suff = daily.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_days"),
        dsum_expr("d", "sx"),
        dsum_expr("y", "sy"),
        dsum_expr("d * y", "sxy"),
        dsum_expr("d * d", "sxx"),
        dsum_expr("y * y", "syy"),
    )
    n = F.col("n_days").cast("double")
    vxy = F.col("sxy") - F.col("sx") * F.col("sy") / n
    vxx = F.col("sxx") - F.col("sx") * F.col("sx") / n
    vyy = F.col("syy") - F.col("sy") * F.col("sy") / n
    slope = vxy / vxx
    return suff.select(
        "event_type",
        "n_days",
        F.round(slope, 6).alias("slope"),
        F.round((F.col("sy") - slope * F.col("sx")) / n, 6).alias("intercept"),
        F.round(vxy * vxy / (vxx * vyy), 6).alias("r2"),
    ).orderBy("event_type")


# ---------------------------------------------------------------------------
# wave 61 (round 6): cohort LTV, behavioral trigrams, Markov stationary dist
# ---------------------------------------------------------------------------

LTV_MAX_AGE_DAYS = 13  # report the first two weeks of each cohort


def x312_cohort_ltv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative lifetime value per acquisition cohort: users are
    grouped by first-event day, and each cohort's cumulative per-user
    value is tracked over its first ``LTV_MAX_AGE_DAYS + 1`` days of
    age — x63's retention grid with money on it, the payback-curve
    query every growth team runs.

    The fact table reduces to (cohort_day, age_day) decimal value
    cells; the cumulative sum runs per cohort over the age axis —
    a ≤14-row partition by construction.  Cohort sizes enter by key.
    Day arithmetic is integer days since epoch in both engines.
    """
    from go_mapreduce_spark.functions.numeric import dsum_expr

    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        F.datediff(F.to_date("ts"), F.lit("1970-01-01")).alias("d"),
        "value",
    )
    first = ev.groupBy("user_id").agg(F.min("d").alias("cohort_day"))
    sized = first.groupBy("cohort_day").agg(
        F.count(F.lit(1)).alias("cohort_users")
    )
    cells = (
        ev.join(first, "user_id")
        .select(
            "cohort_day",
            (F.col("d") - F.col("cohort_day")).alias("age_day"),
            "value",
        )
        .filter(F.col("age_day") <= LTV_MAX_AGE_DAYS)
        .groupBy("cohort_day", "age_day")
        .agg(dsum_expr("value", "day_value"))
    )
    w = Window.partitionBy("cohort_day").orderBy("age_day")
    cum = cells.withColumn(
        "cum_value",
        F.sum(F.col("day_value").cast("decimal(38,6)")).over(w).cast("double"),
    )
    return (
        cum.join(sized, "cohort_day")
        .select(
            F.col("cohort_day").cast("bigint").alias("cohort_day"),
            F.col("age_day").cast("bigint").alias("age_day"),
            F.col("cohort_users").cast("bigint").alias("cohort_users"),
            F.round("cum_value", 4).alias("cum_value"),
            F.round(
                F.col("cum_value") / F.col("cohort_users").cast("double"), 6
            ).alias("ltv_per_user"),
        )
        .orderBy("cohort_day", "age_day")
    )


TRIGRAM_TOP_N = 15


def x313_behavior_trigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top behavioral trigrams: the most frequent 3-step event-type
    sequences across all user journeys (x75's bigram transitions
    extended one step — the pattern-mining query behind "what do
    users actually do before converting?").

    One window per user partition computes both leads in a single
    WindowExec pass ((ts, event_id) composite order, deterministic
    under ties); the count is map-side combined and the top-N is a
    TakeOrdered, never a global sort.
    """
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    tri = ev.select(
        F.col("event_type").alias("e1"),
        F.lead("event_type", 1).over(w).alias("e2"),
        F.lead("event_type", 2).over(w).alias("e3"),
    ).filter(F.col("e3").isNotNull())
    return (
        tri.groupBy("e1", "e2", "e3")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
        .orderBy(F.col("n").desc(), "e1", "e2", "e3")
        .limit(TRIGRAM_TOP_N)
    )


MARKOV_ROUNDS = 12


def x314_markov_stationary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stationary distribution of the user-behavior Markov chain:
    x75's transition counts row-normalized into P, then π·P iterated
    ``MARKOV_ROUNDS`` times from uniform — "where do user journeys
    spend their time in steady state?", the long-run complement of
    the one-step transition matrix.

    The chain lives on |event types| states, so after the one
    corpus-sized lag+count pass EVERYTHING iterates on a k-row vector
    joined against a k²-row matrix — fixed rounds, in-plan, decimal
    sums per round (the x59/x292 discipline), no convergence collect.
    """
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    steps = ev.select(
        "user_id",
        F.lag("event_type").over(w).alias("a"),
        F.col("event_type").alias("b"),
    ).filter(F.col("a").isNotNull())
    counts = steps.groupBy("a", "b").agg(F.count(F.lit(1)).alias("n"))
    row_tot = counts.groupBy("a").agg(F.sum("n").alias("na"))
    pmat = (
        counts.join(row_tot, "a")
        .select("a", "b", (F.col("n") / F.col("na").cast("double")).alias("p"))
        # materialize the k²-bounded matrix once (the x319 HITS
        # discipline): the corpus-sized lag+count pass otherwise sits
        # un-materialized under the states.count() probe AND inside
        # all MARKOV_ROUNDS in-plan joins — Catalyst re-analyzes the
        # corpus subtree per round and the count() replays it
        .localCheckpoint()
    )
    states = pmat.select(F.col("a").alias("s")).distinct()
    k = states.count()  # bounded: |event types|
    pi = states.withColumn("pi", F.lit(1.0 / k))
    for _ in range(MARKOV_ROUNDS):
        pi = (
            pmat.join(pi.withColumnRenamed("s", "a"), "a")
            .groupBy(F.col("b").alias("s"))
            .agg(
                F.sum((F.col("pi") * F.col("p")).cast("decimal(38,18)"))
                .cast("double")
                .alias("pi")
            )
        )
    return pi.select("s", F.round("pi", 6).alias("pi")).orderBy("s")


# ---------------------------------------------------------------------------
# x322 — decision-stump training: best Gini split per feature (wave 63)
# ---------------------------------------------------------------------------

STUMP_FEATURES = ("l_discount", "l_quantity")


def x322_decision_stump(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train a depth-1 decision tree ("stump") predicting whether a
    line item is returned (``l_returnflag = 'R'``): for every feature
    and every candidate threshold, the weighted Gini impurity of the
    ≤t / >t split, and the argmin per feature — the inner loop of
    every distributed tree learner (XGBoost/LightGBM histogram
    builders do exactly this per node).

    The x311 discipline: NO per-row sort — one pass reduces the fact
    table to a per-(feature, distinct-value) count relation carrying
    (rows, positives); a cumulative window over that value-
    cardinality-sized relation yields every split's left/right
    sufficient statistics at once, and the Gini argmin is a bounded
    row_number.  Split scores are exact integer-count arithmetic
    evaluated in one pinned double expression, so the argmin is
    bit-identical across engines and partitionings.
    """
    from pyspark.sql.window import Window

    li = load_table(spark, sf_dir, "lineitem")
    feats = None
    for f in STUMP_FEATURES:
        part = li.select(
            F.lit(f).alias("feature"),
            F.col(f).cast("double").alias("v"),
            (F.col("l_returnflag") == "R").cast("bigint").alias("pos"),
        )
        feats = part if feats is None else feats.unionAll(part)
    pv = feats.groupBy("feature", "v").agg(
        F.count(F.lit(1)).alias("c"), F.sum("pos").alias("p1")
    )
    wv = Window.partitionBy("feature").orderBy("v")
    cum = pv.select(
        "feature",
        "v",
        F.sum("c").over(wv).alias("cc"),
        F.sum("p1").over(wv).alias("cp"),
    )
    tot = pv.groupBy("feature").agg(
        F.sum("c").alias("n"), F.sum("p1").alias("n1")
    )
    p_le = F.col("cp").cast("double") / F.col("cc")
    p_gt = (F.col("n1") - F.col("cp")).cast("double") / (
        F.col("n") - F.col("cc")
    )
    gini_split = (
        F.col("cc") * (2.0 * p_le * (1.0 - p_le))
        + (F.col("n") - F.col("cc")) * (2.0 * p_gt * (1.0 - p_gt))
    ) / F.col("n").cast("double")
    p_root = F.col("n1").cast("double") / F.col("n")
    scored = (
        cum.join(F.broadcast(tot), "feature")
        .filter(F.col("cc") < F.col("n"))
        .select(
            "feature",
            "v",
            "cc",
            "n",
            "n1",
            gini_split.alias("gini_split"),
            (2.0 * p_root * (1.0 - p_root)).alias("gini_root"),
            p_le.alias("p_le"),
            p_gt.alias("p_gt"),
        )
    )
    wbest = Window.partitionBy("feature").orderBy("gini_split", "v")
    return (
        scored.withColumn("rk", F.row_number().over(wbest))
        .filter(F.col("rk") == 1)
        .select(
            "feature",
            F.round("v", 6).alias("threshold"),
            F.round("gini_root", 6).alias("gini_root"),
            F.round("gini_split", 6).alias("gini_split"),
            F.col("cc").cast("bigint").alias("n_le"),
            (F.col("n") - F.col("cc")).cast("bigint").alias("n_gt"),
            F.round("p_le", 6).alias("return_rate_le"),
            F.round("p_gt", 6).alias("return_rate_gt"),
        )
        .orderBy("feature")
    )


# ---------------------------------------------------------------------------
# x331 — smoothed target encoding (wave 66)
# ---------------------------------------------------------------------------

TE_SMOOTHING = 100.0
TE_TARGET_PRIORITY = "1-URGENT"


def x331_target_encoding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Smoothed target (mean) encoding of two categorical features
    against the urgent-order rate — the leakage-prone feature-
    engineering op every tabular-ML pipeline runs at full data scale:
    encoded = (Σy + m·prior)/(n + m), the Bayesian shrinkage that
    keeps rare categories from memorizing their few labels.

    One fact pass per feature (a 2-way union, both map-side
    combined), a bounded per-category relation, and the global prior
    as a 1-row broadcast — the same sufficient-statistic discipline
    as x322's stump: no row ever carries its encoding; the bounded
    encoder table is the OUTPUT, to be broadcast-joined back by the
    consumer.
    """
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment"
    )
    base = orders.join(cust, orders.o_custkey == cust.c_custkey).select(
        F.col("c_mktsegment").alias("seg"),
        F.year("o_orderdate").cast("string").alias("yr"),
        (F.col("o_orderpriority") == TE_TARGET_PRIORITY)
        .cast("bigint")
        .alias("y"),
    )
    feats = base.select(
        F.lit("c_mktsegment").alias("feature"),
        F.col("seg").alias("category"),
        "y",
    ).unionAll(
        base.select(
            F.lit("order_year").alias("feature"),
            F.col("yr").alias("category"),
            "y",
        )
    )
    prior = base.agg(
        (F.sum("y") / F.count(F.lit(1)).cast("double")).alias("prior")
    )
    per = feats.groupBy("feature", "category").agg(
        F.count(F.lit(1)).alias("n"), F.sum("y").alias("sum_y")
    )
    return (
        per.crossJoin(F.broadcast(prior))
        .select(
            "feature",
            "category",
            F.col("n").cast("bigint").alias("n"),
            F.col("sum_y").cast("bigint").alias("sum_y"),
            F.round(F.col("sum_y") / F.col("n").cast("double"), 6).alias(
                "raw_rate"
            ),
            F.round(F.col("prior"), 6).alias("prior"),
            F.round(
                (F.col("sum_y") + F.lit(TE_SMOOTHING) * F.col("prior"))
                / (F.col("n") + F.lit(TE_SMOOTHING)),
                6,
            ).alias("encoded"),
        )
        .orderBy("feature", "category")
    )


# ---------------------------------------------------------------------------
# x338 — Lorenz concentration curve by customer decile (wave 68)
# ---------------------------------------------------------------------------

LORENZ_DECILES = 10


def x338_lorenz_deciles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Lorenz curve behind x189's Gini number: cumulative revenue
    share held by the bottom d/10 of customers, for each decile — the
    actionable form of the concentration audit ("the bottom 50% of
    customers carry 18% of revenue"), and in corpus terms the
    per-source token-mass curve that decides mixture weights.

    NO unpartitioned window anywhere (the x219 lesson): prefix sums
    over the distinct-revenue relation run through the range-bucketed
    ``layout._global_running_sum`` (sketch split points → bucketed
    windows → literal offset maps), with revenue carried as EXACT
    integer cents (2-dp prices decimal-summed, so ×100 is integral)
    — bigint prefix sums never drift, and the decile read-off is
    pure integer interval-overlap arithmetic: full cents below the
    boundary plus pro-rata rows at the boundary value.  The oracle
    replays plain SQL windows; the bucketing is output-invariant.
    """
    from go_mapreduce_spark.functions.numeric import dsum_expr
    from go_mapreduce_spark.operators.layout import _global_running_sum

    orders = load_table(spark, sf_dir, "orders")
    per_cust = orders.groupBy("o_custkey").agg(
        dsum_expr("o_totalprice", "rev")
    )
    per_val = (
        per_cust.groupBy("rev")
        .agg(F.count(F.lit(1)).alias("c"))
        .withColumn(
            "rcent",
            F.floor(F.col("rev") * 100.0 + 0.5).cast("bigint"),
        )
        .withColumn("rc", F.col("rcent") * F.col("c"))
    )
    cum = _global_running_sum(
        per_val, ["rev"], F.col("rev"), {"c": "cumc", "rc": "cumrc"}
    )
    tot = per_val.agg(
        F.sum("c").alias("n"), F.sum("rc").alias("total_cents")
    )
    grid = None
    for d in range(1, LORENZ_DECILES + 1):
        row = orders.sparkSession.range(1).select(F.lit(d).alias("decile"))
        grid = row if grid is None else grid.unionAll(row)
    picks = (
        cum.crossJoin(F.broadcast(tot))
        .crossJoin(F.broadcast(grid))
        .withColumn(
            "pos",
            F.ceil(
                F.col("decile") * F.col("n") / F.lit(LORENZ_DECILES)
            ).cast("bigint"),
        )
        .filter(
            (F.col("cumc") >= F.col("pos"))
            & (F.col("cumc") - F.col("c") < F.col("pos"))
        )
        .withColumn(
            "cents_at_pos",
            F.col("cumrc")
            - F.col("rcent") * (F.col("cumc") - F.col("pos")),
        )
    )
    return picks.select(
        F.col("decile").cast("bigint").alias("decile"),
        F.col("pos").cast("bigint").alias("n_customers"),
        F.round(F.col("cents_at_pos") / 100.0, 4).alias("cum_revenue"),
        F.round(
            F.col("cents_at_pos").cast("double") / F.col("total_cents"), 6
        ).alias("cum_share"),
    ).orderBy("decile")


# ---------------------------------------------------------------------------
# x394 — Pearson correlation matrix in one pass (wave 88)
# ---------------------------------------------------------------------------

CORR_COLS = ("l_quantity", "l_extendedprice", "l_discount", "l_tax")


def x394_correlation_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full Pearson correlation matrix over lineitem's four numeric
    measures from ONE corpus pass: 4 sums + 4 squares + 6 cross
    products + a count, all decimal-exact, then every pairwise r is
    scalar algebra on the checkpointed 1-row result (the x386
    fan-out discipline).  The feature-screening step every modeling
    pipeline runs first — and the wide-aggregate shape that computes
    d² statistics in a single scan instead of d² scans.
    """
    from go_mapreduce_spark.functions.numeric import dsum_expr
    from go_mapreduce_spark.sources.registry import load_table

    from go_mapreduce_spark.operators.scale import spread_for_fanout

    cols = list(CORR_COLS)
    # 15 decimal(38,6) sums per row is BigDecimal-bound: spread an
    # under-split scan before the partial agg (NO-OP at real scale;
    # decimal sums are partition-invariant, hash unchanged)
    base = load_table(spark, sf_dir, "lineitem")
    li = spread_for_fanout(
        base.select(*cols),
        probe=base,  # projection keeps the scan split; base probe is memo-cached
    )
    aggs = [F.count(F.lit(1)).cast("bigint").alias("_n")]
    for c in cols:
        aggs.append(dsum_expr(c, f"s_{c}"))
        aggs.append(dsum_expr(f"{c} * {c}", f"ss_{c}"))
    for i, a in enumerate(cols):
        for b in cols[i + 1 :]:
            aggs.append(dsum_expr(f"{a} * {b}", f"sx_{a}_{b}"))
    wide = li.agg(*aggs).localCheckpoint()
    n = F.col("_n").cast("double")
    out = None
    for i, a in enumerate(cols):
        for b in cols[i + 1 :]:
            r = (
                n * F.col(f"sx_{a}_{b}") - F.col(f"s_{a}") * F.col(f"s_{b}")
            ) / F.sqrt(
                (n * F.col(f"ss_{a}") - F.col(f"s_{a}") * F.col(f"s_{a}"))
                * (n * F.col(f"ss_{b}") - F.col(f"s_{b}") * F.col(f"s_{b}"))
            )
            row = wide.select(
                F.lit(a).alias("col_a"),
                F.lit(b).alias("col_b"),
                F.round(r, 6).alias("pearson_r"),
            )
            out = row if out is None else out.unionByName(row)
    return out.orderBy("col_a", "col_b")


# ---------------------------------------------------------------------------
# x395 — cohort retention triangle (wave 88)
# ---------------------------------------------------------------------------

RETENTION_MAX_AGE_WEEKS = 8


def x395_retention_triangle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention triangle over the event stream: users
    grouped by first-activity week, retention = fraction of the
    cohort active again at week offset 1..8 — the table every
    engagement dashboard opens with (x312 prices the cohorts; this
    tracks whether they come back).

    Weeks are pure integer arithmetic on epoch days (no engine WEEK
    function), the cohort assignment is one min-aggregate per user,
    and the triangle is a (user-week distinct) → (cohort, age) count —
    two shuffles total, both on keys that grow with users, not
    events.
    """
    from go_mapreduce_spark.sources.registry import load_table

    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        F.floor(
            F.datediff(F.to_date("ts"), F.lit("1970-01-01")) / 7
        ).alias("wk"),
    )
    user_weeks = ev.distinct()
    cohorts = user_weeks.groupBy("user_id").agg(F.min("wk").alias("cw"))
    sizes = cohorts.groupBy("cw").agg(
        F.count(F.lit(1)).cast("bigint").alias("cohort_size")
    )
    aged = (
        user_weeks.join(cohorts, "user_id")
        .select("cw", (F.col("wk") - F.col("cw")).alias("age"))
        .filter(
            (F.col("age") >= 1) & (F.col("age") <= RETENTION_MAX_AGE_WEEKS)
        )
        .groupBy("cw", "age")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_active"))
    )
    return (
        aged.join(sizes, "cw")
        .select(
            F.col("cw").cast("bigint").alias("cohort_week"),
            F.col("age").cast("bigint").alias("age_weeks"),
            "n_active",
            "cohort_size",
            F.round(
                F.col("n_active") / F.col("cohort_size").cast("double"), 6
            ).alias("retention"),
        )
        .orderBy("cohort_week", "age_weeks")
    )


# ---------------------------------------------------------------------------
# x396 — SCD2 point-in-time lookup (wave 89)
# ---------------------------------------------------------------------------


def x396_scd2_pit_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time lookup against the x239 SCD2 dimension: for each
    user, resolve the state that was valid at the user's mid-history
    probe instant (midnight of the median activity date — date-level
    arithmetic, no sub-second precision games).  This is the AS OF
    join every warehouse fact load performs against a versioned
    dimension; x239 builds the history, this query proves it resolves.

    One interval-membership join per user (equi on user_id + range on
    validity) — the dimension side is one row per state CHANGE, so the
    probe join is metadata-sized per user regardless of event volume.
    """
    ev = load_table(spark, sf_dir, "events")
    probes = ev.groupBy("user_id").agg(
        F.min(F.to_date("ts")).alias("d0"),
        F.max(F.to_date("ts")).alias("d1"),
    ).select(
        "user_id",
        F.date_add(
            F.col("d0"),
            F.floor(F.datediff(F.col("d1"), F.col("d0")) / 2).cast("int"),
        )
        .cast("timestamp")
        .alias("probe_ts"),
    )
    dim = x239_scd2_history(spark, sf_dir)
    return (
        dim.join(probes, "user_id")
        .filter(
            (F.col("valid_from") <= F.col("probe_ts"))
            & (
                F.col("valid_to").isNull()
                | (F.col("probe_ts") < F.col("valid_to"))
            )
        )
        .select(
            "user_id",
            "probe_ts",
            F.col("state").alias("state_at_probe"),
            "version",
        )
        .orderBy("user_id")
    )


# ---------------------------------------------------------------------------
# x397 — fixed-effects meta-analysis across regions (wave 89)
# ---------------------------------------------------------------------------


def x397_meta_analysis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inverse-variance fixed-effects meta-analysis: each region
    contributes a Welch-style URGENT-vs-LOW mean-order-value effect
    with its own variance (x243's per-arm sufficient statistics, per
    region), and the pooled estimate weights by precision.  Cochran's
    Q and I² quantify cross-region heterogeneity — the "is this
    effect the same everywhere?" readout a multi-market experiment
    reports.

    One joined corpus pass → (region × arm) sufficient statistics
    (bounded), then pooling is scalar algebra on the ≤5-row relation.
    """
    from go_mapreduce_spark.functions.numeric import DECIMAL_T, dsum_expr
    from go_mapreduce_spark.sources.registry import load_table

    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority").isin("1-URGENT", "5-LOW")
    )
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey"
    )
    nation = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_regionkey"
    )
    rows = (
        orders.join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .select(
            F.col("n_regionkey").alias("region"),
            (F.col("o_orderpriority") == "1-URGENT").alias("is_a"),
            F.col("o_totalprice").alias("y"),
        )
    )
    per = rows.groupBy("region").agg(
        F.count(F.when(F.col("is_a"), 1)).alias("n_a"),
        dsum_expr("CASE WHEN is_a THEN y END", "s_a"),
        dsum_expr("CASE WHEN is_a THEN y * y END", "ss_a"),
        F.count(F.when(~F.col("is_a"), 1)).alias("n_b"),
        dsum_expr("CASE WHEN NOT is_a THEN y END", "s_b"),
        dsum_expr("CASE WHEN NOT is_a THEN y * y END", "ss_b"),
    )
    na, nb = F.col("n_a").cast("double"), F.col("n_b").cast("double")
    ma, mb = F.col("s_a") / na, F.col("s_b") / nb
    va = (F.col("ss_a") - F.col("s_a") * F.col("s_a") / na) / (na - 1.0)
    vb = (F.col("ss_b") - F.col("s_b") * F.col("s_b") / nb) / (nb - 1.0)
    # a region only contributes if both arms can estimate a variance
    # (n ≥ 2 each) — pinned convention, mirrored in the oracle
    eff = per.filter((F.col("n_a") >= 2) & (F.col("n_b") >= 2)).select(
        "region",
        (ma - mb).alias("e"),
        (va / na + vb / nb).alias("v"),
    )
    # inverse-variance weights are ~1e-9 here: scale-6 decimal would
    # quantize them to zero, so the (bounded, ≤5-row) pooling sums go
    # through DECIMAL(38,30) — order-independent AND precise
    meta_dec = "decimal(38,30)"
    agg = eff.agg(
        F.count(F.lit(1)).cast("bigint").alias("k_regions"),
        F.sum((1.0 / F.col("v")).cast(meta_dec)).cast("double").alias("sw"),
        F.sum((F.col("e") / F.col("v")).cast(meta_dec))
        .cast("double")
        .alias("swe"),
        F.sum((F.col("e") * F.col("e") / F.col("v")).cast(meta_dec))
        .cast("double")
        .alias("swee"),
    )
    pooled = F.col("swe") / F.col("sw")
    q = F.col("swee") - F.col("swe") * F.col("swe") / F.col("sw")
    km1 = (F.col("k_regions") - 1).cast("double")
    i2 = F.greatest(F.lit(0.0), (q - km1) / q)
    return agg.select(
        "k_regions",
        F.round(pooled, 6).alias("pooled_effect"),
        F.round(F.sqrt(1.0 / F.col("sw")), 6).alias("pooled_se"),
        F.round(q, 6).alias("q_stat"),
        F.round(i2, 6).alias("i2"),
    )


# ---------------------------------------------------------------------------
# x403 — Shapley channel attribution (wave 92)
# ---------------------------------------------------------------------------

SHAPLEY_CHANNELS = ("click", "signup", "view")
# Shapley coalition weights for n=3, indexed by |S| ∈ {0,1,2}
# (pinned literals: |S|!·(n−|S|−1)!/n! = 2/6, 1/6, 2/6)
SHAPLEY_W = (1.0 / 3.0, 1.0 / 6.0, 1.0 / 3.0)


def x403_shapley_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-driven Shapley attribution of conversions (purchase
    events) to the three exposure channels: the game's characteristic
    function v(S) is the conversion rate of users whose exposure set
    is EXACTLY S (v ≡ 0 for unobserved sets — pinned), and each
    channel's credit is the exact 3-player Shapley value.  x226's
    linear/U-shaped rules split credit by position; Shapley is the
    order-free axiom-clean split marketing actually argues about.

    One corpus pass → per-user exposure bitmask + conversion flag →
    an ≤8-row mask relation pivoted to a single row of v values; the
    24 marginal contributions are scalar expressions on it.
    Efficiency (Σφ = v(grand) − v(∅)) is pytest-pinned.
    """
    ev = load_table(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(
        *[
            F.max((F.col("event_type") == c).cast("int")).alias(f"c{i}")
            for i, c in enumerate(SHAPLEY_CHANNELS)
        ],
        F.max((F.col("event_type") == "purchase").cast("int")).alias("conv"),
    )
    masked = per_user.select(
        (
            F.col("c0") + 2 * F.col("c1") + 4 * F.col("c2")
        ).alias("mask"),
        "conv",
    )
    cells = masked.groupBy("mask").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("conv").alias("k"),
    )
    # one row of v(S) for all 8 subsets; unobserved sets pin v = 0
    vrow = cells.agg(
        *[
            F.coalesce(
                F.max(
                    F.when(
                        F.col("mask") == m,
                        F.col("k") / F.col("n").cast("double"),
                    )
                ),
                F.lit(0.0),
            ).alias(f"v{m}")
            for m in range(8)
        ]
    ).localCheckpoint()
    out = None
    for i, c in enumerate(SHAPLEY_CHANNELS):
        bit = 1 << i
        phi = F.lit(0.0)
        for s in range(8):
            if s & bit:
                continue
            size = bin(s).count("1")
            phi = phi + F.lit(SHAPLEY_W[size]) * (
                F.col(f"v{s | bit}") - F.col(f"v{s}")
            )
        row = vrow.select(
            F.lit(c).alias("channel"),
            F.round(phi, 6).alias("shapley_credit"),
        )
        out = row if out is None else out.unionByName(row)
    return out.orderBy("channel")
