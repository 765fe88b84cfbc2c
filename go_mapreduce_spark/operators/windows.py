"""Event-time window aggregation (batch semantics, streaming-shared).

These are the batch versions of the M4 streaming slice: the same
tumbling/session window logic runs under Structured Streaming in
``go_mapreduce_spark.streaming`` — Spark's ``window()`` /
``session_window()`` expressions are identical in both modes, so the
batch queries here double as the oracle-checkable ground truth for
the streaming tests (batch-equivalence, SURVEY.md §7.2 M4).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from go_mapreduce_spark.functions.numeric import dsum
from go_mapreduce_spark.sources.registry import load_table


def x11_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-hour tumbling windows per event_type: count + exact sum.

    ``window()`` is a pure projection (floor of the timestamp) — the
    only shuffle is the groupBy, keyed on (hour, type): uniformly
    distributed, no skew at any scale.
    """
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.window("ts", "1 hour").alias("w"), F.col("event_type")
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            dsum(F.col("value"), "total_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "total_value",
        )
        .orderBy("window_start", "event_type")
    )


def x24_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-hour windows sliding every 30 minutes, per event_type.

    ``window(ts, '1 hour', '30 minutes')`` expands each event into its
    2 covering windows (Expand node — cost × windows-per-event, known
    and bounded) before a single grouped aggregate.
    """
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.window("ts", "1 hour", "30 minutes").alias("w"), F.col("event_type")
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            dsum(F.col("value"), "total_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "total_value",
        )
        .orderBy("window_start", "event_type")
    )


def x51_gapfill_ffill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series resampling: per event_type, a DENSE hourly grid
    from that type's first to last hour — empty hours appear with
    n_events = 0 and the last seen hourly total carried forward
    (the gap-fill + LOCF pair every hypertable/rollup engine ships).

    Plan shape: the spine is sequence()+explode off the per-type
    min/max (one tiny aggregate — n_types rows), left-joined to the
    hourly aggregate on (type, hour), then one ordered window for the
    forward fill.  Nothing here scales with the GAP count except the
    spine itself — empty hours never touch the events table.
    """
    ev = load_table(spark, sf_dir, "events")
    hourly = (
        ev.groupBy(F.date_trunc("hour", "ts").alias("h"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            dsum(F.col("value"), "total_value"),
        )
    )
    spine = (
        hourly.groupBy("event_type")
        .agg(F.min("h").alias("h0"), F.max("h").alias("h1"))
        .select(
            "event_type",
            F.explode(F.sequence("h0", "h1", F.expr("INTERVAL 1 HOUR"))).alias("h"),
        )
    )
    from pyspark.sql.window import Window

    w = Window.partitionBy("event_type").orderBy("h").rowsBetween(
        Window.unboundedPreceding, 0
    )
    return (
        spine.join(hourly, ["event_type", "h"], "left")
        .select(
            "event_type",
            F.col("h").alias("hour"),
            F.coalesce("n_events", F.lit(0)).cast("bigint").alias("n_events"),
            F.last("total_value", ignorenulls=True).over(w).alias("filled_value"),
        )
        .orderBy("event_type", "hour")
    )


def x12_session_window(spark: SparkSession, sf_dir: str, gap: str = "10 minutes") -> DataFrame:
    """Per-user session windows with a 10-minute inactivity gap.

    ``session_window`` merges events whose timestamp falls strictly
    before the previous event's (ts + gap); the window end is
    last_ts + gap.  The oracle mirrors this with a gaps-and-islands
    formulation (new session when ts - lag(ts) >= gap).
    """
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.session_window("ts", gap).alias("w"), F.col("user_id"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            dsum(F.col("value"), "total_value"),
        )
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
            "total_value",
        )
        .orderBy("user_id", "session_start")
    )


def x77_multi_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style multi-granularity continuous aggregate: per
    event_type counts + exact sums at hour, day, AND week granularity
    in ONE scan — grouping on (granularity, bucket) after a 3-way
    granularity explode.

    At 100 TB this is how rollup tables are built: one pass emitting
    every granularity (3× row fan-out before the partial aggregate,
    which immediately collapses it map-side), not three scans.  Week
    buckets pin to Monday 00:00 (date_trunc('week') in both engines).
    """
    ev = load_table(spark, sf_dir, "events")
    buckets = ev.select(
        "event_type",
        "value",
        F.explode(
            F.array(
                F.struct(F.lit("hour").alias("gran"), F.date_trunc("hour", "ts").alias("bucket")),
                F.struct(F.lit("day").alias("gran"), F.date_trunc("day", "ts").alias("bucket")),
                F.struct(F.lit("week").alias("gran"), F.date_trunc("week", "ts").alias("bucket")),
            )
        ).alias("g"),
    )
    return (
        buckets.groupBy(
            F.col("g.gran").alias("gran"),
            F.col("g.bucket").alias("bucket"),
            "event_type",
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            dsum(F.col("value"), "total_value"),
        )
        .orderBy("gran", "bucket", "event_type")
    )


SESSION_GAP_SECONDS = 30 * 60


def x80_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch sessionization: split each user's event stream into
    sessions at >30-minute inactivity gaps (the lag + cumulative-sum
    formulation), then summarize each session.

    This is the exact-oracle batch twin of x12's gap-semantics
    session_window: one lag window and one running sum, both over the
    same (user_id)/(ts, event_id) partition-order — a single shuffle
    on user_id serves both window passes and the final group-by,
    because groupBy(user_id, session_idx) is partition-compatible
    with the window's hash partitioning.  The composite (ts,
    event_id) order makes lag deterministic under timestamp ties;
    duration is computed in integer microseconds (no float drift).
    """
    from pyspark.sql.window import Window

    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    gap_us = SESSION_GAP_SECONDS * 1_000_000
    flagged = ev.select(
        "user_id",
        "ts",
        "event_id",
        F.when(
            F.lag("ts").over(w).isNull()
            | (
                F.unix_micros(F.col("ts")) - F.unix_micros(F.lag("ts").over(w))
                > F.lit(gap_us)
            ),
            F.lit(1),
        )
        .otherwise(F.lit(0))
        .alias("is_new"),
    )
    sessions = flagged.select(
        "user_id",
        "ts",
        F.sum("is_new").over(run).alias("session_idx"),
    )
    return (
        sessions.groupBy("user_id", "session_idx")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
        )
        .select(
            "user_id",
            F.col("session_idx").cast("bigint").alias("session_idx"),
            "n_events",
            "session_start",
            "session_end",
            (F.unix_micros(F.col("session_end")) - F.unix_micros(F.col("session_start")))
            .alias("duration_us"),
        )
        .orderBy("user_id", "session_idx")
    )


RANGE_WINDOW_MS = 3_600_000  # 1 hour, in epoch-milliseconds


def x110_time_range_rolling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user rolling 1-hour event count and value sum — RANGE
    frames over a physical time axis, where x103/x108's ROWS frames
    count rows.  "How much did this user do in the trailing hour" is
    the rate-limiting / velocity-check primitive.

    The frame is anchored on epoch-milliseconds (``unix_millis`` ≡
    DuckDB ``epoch_ms``: both truncate the µs fixture timestamps the
    same way), bounds inclusive, and RANGE frames include peer rows —
    so equal-timestamp events see identical frames and the result is
    deterministic without any tiebreak column.  The value sum is an
    exact decimal window sum (partition-invariant, cf.
    functions/numeric.py).

    Scale: one exchange on user_id + one in-partition sort by time;
    Spark maintains the sliding frame incrementally (two pointers),
    so per-row cost is amortized O(1) however wide the hour is.
    """
    from pyspark.sql.window import Window

    ev = load_table(spark, sf_dir, "events").select("event_id", "user_id", "ts", "value")
    ms = F.unix_millis(F.col("ts"))
    frame = (
        Window.partitionBy("user_id")
        .orderBy(ms.alias("ms"))
        .rangeBetween(-RANGE_WINDOW_MS, 0)
    )
    return (
        ev.select(
            "event_id",
            "user_id",
            F.count(F.lit(1)).over(frame).cast("bigint").alias("n_1h"),
            F.sum(F.col("value").cast("decimal(38,6)")).over(frame)
            .cast("double")
            .alias("sum_1h"),
        )
        .orderBy("event_id")
    )


# ---------------------------------------------------------------------------
# x198: window-function completeness (first/nth_value, cume_dist)
# ---------------------------------------------------------------------------


def x198_window_completeness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The remaining ANSI window functions in one customer-partitioned
    pass: first order, second order (``nth_value``), each order's
    ``cume_dist`` within the customer's history, and the partition
    count — completing the surface next to x8/x58's
    row_number/rank/lag/ntile family.

    Frames are EXPLICIT (rows unbounded-to-unbounded for first/nth):
    the default frame stops at CURRENT ROW, which silently turns
    nth_value(2) into NULL for each customer's first row — the
    classic cross-engine gotcha, pinned here by spelling the frame
    out identically in both engines.  One customer-keyed shuffle
    serves all four functions (a single Window operator in the
    plan).
    """
    from go_mapreduce_spark.sources.registry import load_table

    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    wfull = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return (
        orders.select(
            "o_custkey",
            "o_orderkey",
            F.first_value("o_orderkey").over(wfull).alias("first_order"),
            F.nth_value("o_orderkey", 2).over(wfull).alias("second_order"),
            F.round(F.cume_dist().over(w), 6).alias("cume_dist"),
            F.count(F.lit(1)).over(wfull).cast("bigint").alias("n_orders"),
        )
        .orderBy("o_custkey", "o_orderkey")
    )


# ---------------------------------------------------------------------------
# x211: linear-interpolation gap fill (the LOCF twin for continuous
# signals)
# ---------------------------------------------------------------------------


def x211_gapfill_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly resampling with LINEAR interpolation: per event type,
    the dense hourly grid (x51's spine) where empty hours take the
    straight line between the surrounding observed hourly means —
    the right fill for continuous signals (sensor readings, prices),
    where LOCF's step function (x51) systematically lags trends.

    Same plan as x51 plus one backward-looking and one forward-
    looking window (both PARTITIONED by type): previous/next
    observed value and timestamp via ``last/first(ignorenulls)``.
    The interpolation weight is an exact integer µs ratio evaluated
    in one double expression — identical IEEE sequence in the
    oracle.  Grid points outside the observed range keep NULL
    (extrapolation is a modelling choice, not a fill).
    """
    from go_mapreduce_spark.sources.registry import load_table

    ev = load_table(spark, sf_dir, "events")
    hourly = ev.groupBy(
        F.date_trunc("hour", "ts").alias("h"), "event_type"
    ).agg(
        F.round(
            F.sum(F.col("value").cast("decimal(38,6)")).cast("double")
            / F.count(F.lit(1)),
            6,
        ).alias("mean_value")
    )
    spine = (
        hourly.groupBy("event_type")
        .agg(F.min("h").alias("h0"), F.max("h").alias("h1"))
        .select(
            "event_type",
            F.explode(
                F.sequence("h0", "h1", F.expr("INTERVAL 1 HOUR"))
            ).alias("h"),
        )
    )
    g = spine.join(hourly, ["event_type", "h"], "left")
    wb = Window.partitionBy("event_type").orderBy("h").rowsBetween(
        Window.unboundedPreceding, 0
    )
    wf = Window.partitionBy("event_type").orderBy("h").rowsBetween(
        0, Window.unboundedFollowing
    )
    obs_t = F.when(F.col("mean_value").isNotNull(), F.col("h"))
    g = g.select(
        "event_type",
        "h",
        "mean_value",
        F.last("mean_value", ignorenulls=True).over(wb).alias("pv"),
        F.unix_micros(F.last(obs_t, ignorenulls=True).over(wb)).alias("pt"),
        F.first("mean_value", ignorenulls=True).over(wf).alias("nv"),
        F.unix_micros(F.first(obs_t, ignorenulls=True).over(wf)).alias("nt"),
    )
    t = F.unix_micros("h")
    interp = F.when(F.col("mean_value").isNotNull(), F.col("mean_value")).otherwise(
        F.when(
            F.col("pv").isNotNull() & F.col("nv").isNotNull(),
            F.col("pv")
            + (F.col("nv") - F.col("pv"))
            * ((t - F.col("pt")).cast("double") / (F.col("nt") - F.col("pt")).cast("double")),
        )
    )
    return g.select(
        "event_type",
        F.col("h").alias("hour"),
        (F.col("mean_value").isNotNull()).alias("observed"),
        F.round(interp, 6).alias("filled_value"),
    ).orderBy("event_type", "hour")
