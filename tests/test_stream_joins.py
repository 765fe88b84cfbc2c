"""Stream-stream join + streaming dedup tests."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from go_mapreduce_spark.sources.registry import load_table
from go_mapreduce_spark.streaming.events import (
    purchases_with_recent_click,
    read_event_stream,
    run_to_memory_sink,
    streaming_dedup,
)


@pytest.fixture(scope="module")
def stream_dir(spark, sf_dir, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("events_ssj"))
    load_table(spark, sf_dir, "events").repartition(4).write.mode("overwrite").parquet(d)
    return d


def test_stream_stream_join_equals_batch(spark, sf_dir, stream_dir):
    stream = read_event_stream(spark, stream_dir)
    run_to_memory_sink(
        purchases_with_recent_click(stream), "t_ssj", output_mode="append"
    )
    got = {
        (r.purchase_id, r.click_id)
        for r in spark.sql("select * from t_ssj").collect()
    }
    ev = load_table(spark, sf_dir, "events")
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id"), F.col("event_id").alias("purchase_id"), F.col("ts").alias("pts")
    )
    c = ev.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("cu"), F.col("event_id").alias("click_id"), F.col("ts").alias("cts")
    )
    want = {
        (r.purchase_id, r.click_id)
        for r in p.join(
            c,
            (F.col("user_id") == F.col("cu"))
            & (F.col("cts") <= F.col("pts"))
            & (F.col("cts") >= F.col("pts") - F.expr("INTERVAL 30 minutes")),
        ).collect()
    }
    assert got == want
    assert got, "expected purchase-click pairs within 30 minutes"


@pytest.mark.parametrize("sf", ["sf0.001", "sf0.01", "sf0.1"])
def test_x135_nulls_match_actual_watermark(spark, sf):
    """Guard for the outer-null finalization semantics: recompute the
    expected null-row set from the final global watermark Spark
    ACTUALLY reported in the query progress — NOT the fitted
    ``min-branch max − 1 h`` formula the oracle uses.  A Spark version
    bump or trigger-size change that shifts watermark advancement
    fails here with a clear set diff instead of silently diverging the
    oracle (formula bracketed empirically on pyspark 4.1.x; three sfs
    so a layout-dependent shift can't fit one fixture and slip by).

    Contract under test: an unmatched purchase emits a null-click row
    iff ``purchase_ts < final_watermark`` (a click matching it would
    have ``click_ts <= purchase_ts < wm`` — provably late); matched
    pairs are cutoff-free and equal the batch inner join.
    """
    import datetime as dt

    from go_mapreduce_spark.streaming import events as SE

    sf_dir = f"/root/testdata/{sf}"
    out = SE.x135_stream_left_join(spark, sf_dir)
    got_nulls = {
        r.purchase_id for r in out.where(F.col("click_id").isNull()).collect()
    }
    got_matched = {
        (r.purchase_id, r.click_id)
        for r in out.where(F.col("click_id").isNotNull()).collect()
    }
    wm_s = SE.REPLAY_FINAL_WATERMARK["x135"]
    assert wm_s, "replay must report a final watermark"
    wm = dt.datetime.strptime(wm_s, "%Y-%m-%dT%H:%M:%S.%fZ")

    ev = load_table(spark, sf_dir, "events")
    p = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("event_id").alias("purchase_id"), F.col("ts").alias("pts")
    )
    c = ev.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("cu"),
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("cts"),
    )
    cond = (
        (F.col("user_id") == F.col("cu"))
        & (F.col("cts") <= F.col("pts"))
        & (F.col("cts") >= F.col("pts") - F.expr("INTERVAL 30 minutes"))
    )
    want_nulls = {
        r.purchase_id
        for r in p.join(c, cond, "left_anti")
        .where(F.col("pts") < F.lit(wm))
        .collect()
    }
    want_matched = {
        (r.purchase_id, r.click_id) for r in p.join(c, cond, "inner").collect()
    }
    assert got_nulls == want_nulls
    assert got_matched == want_matched


def test_streaming_dedup_first_occurrence_wins(spark, tmp_path):
    """Planted duplicate texts inside the watermark horizon → one
    survivor each; uniques untouched."""
    import datetime as dt

    base = dt.datetime(2024, 1, 1, 0, 0, 0)
    rows = []
    for i in range(40):
        text = f"unique doc {i}"
        rows.append((i, base + dt.timedelta(minutes=i), text))
    # duplicates 2 minutes after their originals (inside 1h watermark)
    for i in range(10):
        rows.append((100 + i, base + dt.timedelta(minutes=i, seconds=120), f"unique doc {i}"))
    df = spark.createDataFrame(rows, "doc_id long, ts timestamp, text string")
    src = str(tmp_path / "docs_stream")
    df.coalesce(1).write.mode("overwrite").parquet(src)

    stream = (
        spark.readStream.schema("doc_id long, ts timestamp, text string").parquet(src)
    )
    run_to_memory_sink(streaming_dedup(stream), "t_dedup", output_mode="append")
    out = spark.sql("select * from t_dedup").collect()
    assert len(out) == 40, "exactly one survivor per distinct text"
    texts = [r.text for r in out]
    assert len(set(texts)) == 40
