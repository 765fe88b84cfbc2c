"""Wave-70 property tests: streaming leaderboard equals the batch
rank over the finalized windows."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from go_mapreduce_spark.streaming import events as SE


def test_x343_stream_topk_matches_batch(spark, sf_dir):
    got = SE.x343_stream_window_topk(spark, sf_dir).collect()
    assert got
    # batch mirror: x11 tumbling counts + x36 finalization predicate
    from go_mapreduce_spark.operators.windows import x11_tumbling_window
    from go_mapreduce_spark.sources.registry import load_table

    ev = load_table(spark, sf_dir, "events")
    wm = ev.agg(
        (
            F.date_trunc("millisecond", F.max("ts"))
            - F.expr("INTERVAL 2 HOURS")
        ).alias("w")
    )
    batch = (
        x11_tumbling_window(spark, sf_dir)
        .crossJoin(F.broadcast(wm))
        .filter(
            F.col("window_start") + F.expr("INTERVAL 1 HOUR") <= F.col("w")
        )
    )
    w = Window.partitionBy("window_start").orderBy(
        F.col("n_events").desc(), "event_type"
    )
    want = (
        batch.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
        .select("window_start", "rk", "event_type", "n_events")
        .orderBy("window_start", "rk")
        .collect()
    )
    got_t = [(r.window_start, r.rk, r.event_type, r.n_events) for r in got]
    want_t = [(r.window_start, r.rk, r.event_type, r.n_events) for r in want]
    assert got_t == want_t
    for r in got:
        assert 1 <= r.rk <= 3
