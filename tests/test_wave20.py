"""Property tests for wave 20: hierarchical sweep-line peak
concurrency (x190) and the ORC roundtrip (x191)."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F


def test_peak_concurrency_matches_bruteforce_sweep(spark, sf_dir):
    """Replay the sweep line sequentially in Python — the two-level
    bucket decomposition must reproduce the exact peak AND the first
    instant it is reached, per event type."""
    from go_mapreduce_spark.operators.analytics import (
        PEAK_SESSION_MINUTES,
        x190_peak_concurrency,
    )
    from go_mapreduce_spark.sources.registry import load_table

    ev = load_table(spark, sf_dir, "events").select("event_type", "ts").collect()
    deltas: dict[str, list] = {}
    gap = datetime.timedelta(minutes=PEAK_SESSION_MINUTES)
    for r in ev:
        deltas.setdefault(r.event_type, []).append((r.ts, 1))
        deltas[r.event_type].append((r.ts + gap, -1))
    expected = {}
    for et, ds in deltas.items():
        ds.sort()  # (t, delta): -1 before +1 at equal t
        run = mx = 0
        first = None
        for t, dl in ds:
            run += dl
            if run > mx:
                mx, first = run, t
        expected[et] = (mx, first, len(ds) // 2)
    got = {
        r.event_type: (r.peak_concurrency, r.first_peak_ts, r.n_sessions)
        for r in x190_peak_concurrency(spark, sf_dir).collect()
    }
    assert got == expected


def test_peak_concurrency_no_unpartitioned_window(spark, sf_dir):
    """Every Window in the optimized plan must carry a partition spec
    — the decomposition exists precisely to avoid the single-task
    global running sum."""
    from go_mapreduce_spark.operators.analytics import x190_peak_concurrency

    plan = (
        x190_peak_concurrency(spark, sf_dir)
        ._jdf.queryExecution()
        .optimizedPlan()
        .toString()
    )
    for line in plan.splitlines():
        if "windowspecdefinition(" in line.lower():
            # a global window renders as windowspecdefinition(<sort>...
            # a partitioned one as windowspecdefinition(<col>, ... with
            # the partition columns before the sort spec; all our specs
            # partition by event_type (+ bucket)
            assert "event_type" in line, line


def test_orc_roundtrip_equals_direct_aggregate(spark, sf_dir):
    """The ORC write→read cycle must be value-lossless: the roundtrip
    aggregate equals the same aggregate computed straight off the
    parquet source."""
    from go_mapreduce_spark.functions.numeric import dsum
    from go_mapreduce_spark.sources.registry import load_table
    from go_mapreduce_spark.sources.sinks import x191_orc_roundtrip

    direct = {
        (r.l_returnflag, r.l_linestatus): r
        for r in load_table(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.round(dsum(F.col("l_quantity"), "sq"), 4).alias("sum_qty"),
            F.round(dsum(F.col("l_extendedprice"), "sp"), 4).alias("sum_price"),
            F.min("l_orderkey").alias("min_orderkey"),
            F.max("l_shipdate").alias("max_shipdate"),
        )
        .collect()
    }
    for r in x191_orc_roundtrip(spark, sf_dir).collect():
        d = direct[(r.l_returnflag, r.l_linestatus)]
        assert (r.n_rows, r.sum_qty, r.sum_price, r.min_orderkey, r.max_shipdate) == (
            d.n_rows,
            d.sum_qty,
            d.sum_price,
            d.min_orderkey,
            d.max_shipdate,
        )
