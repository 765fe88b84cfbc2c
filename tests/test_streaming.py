"""Streaming batch-equivalence tests (SURVEY.md §7.2 M4): the events
table replayed through Structured Streaming must produce exactly the
batch window aggregates."""

from __future__ import annotations

import os
import shutil

import pytest
from pyspark.sql import functions as F

from go_mapreduce_spark.operators.windows import x11_tumbling_window, x12_session_window
from go_mapreduce_spark.sources.registry import load_table
from go_mapreduce_spark.streaming.events import (
    read_event_stream,
    run_to_memory_sink,
    session_aggregate,
    tumbling_counts,
)
from tests.conftest import canon_rows


@pytest.fixture(scope="module")
def stream_dir(spark, sf_dir, tmp_path_factory):
    """events re-written as µs-timestamp parquet in several files —
    a file-source stream that replays in multiple triggers."""
    d = str(tmp_path_factory.mktemp("events_stream"))
    ev = load_table(spark, sf_dir, "events")
    ev.repartition(4).write.mode("overwrite").parquet(d)
    return d


def test_tumbling_stream_equals_batch(spark, sf_dir, stream_dir):
    stream = read_event_stream(spark, stream_dir, max_files_per_trigger=1)
    run_to_memory_sink(tumbling_counts(stream), "t_tumbling", output_mode="complete")
    got = spark.sql("select * from t_tumbling")
    want = x11_tumbling_window(spark, sf_dir)
    assert canon_rows(got.columns, [tuple(r) for r in got.collect()]) == canon_rows(
        want.columns, [tuple(r) for r in want.collect()]
    )


def test_session_stream_equals_batch(spark, sf_dir, stream_dir):
    stream = read_event_stream(spark, stream_dir)
    run_to_memory_sink(session_aggregate(stream), "t_sessions", output_mode="complete")
    got = spark.sql("select * from t_sessions")
    want = x12_session_window(spark, sf_dir)
    assert canon_rows(got.columns, [tuple(r) for r in got.collect()]) == canon_rows(
        want.columns, [tuple(r) for r in want.collect()]
    )


def test_watermark_bounds_state(spark, stream_dir):
    """The streaming agg declares a watermark (state eviction contract)."""
    stream = read_event_stream(spark, stream_dir)
    agg = tumbling_counts(stream, watermark="2 hours")
    assert agg.isStreaming
