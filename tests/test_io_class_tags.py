"""The bench I/O-class tag set must track the LIVE registry (round-10
advice): a stream/lakehouse query registered after the tag block in
queries.py must still be tagged, so the set is computed at use time."""

from __future__ import annotations

import go_mapreduce_spark.queries as Q


def test_io_set_is_computed_at_use_time():
    def fake(spark, sf_dir):  # pragma: no cover - never called
        raise AssertionError

    fake.__module__ = "go_mapreduce_spark.streaming.events"
    name = "x999_fake_late_registered_stream"
    assert name not in Q.io_tmp_state_queries()
    Q.QUERIES[name] = fake
    try:
        assert name in Q.io_tmp_state_queries()
        # the module attribute resolves lazily to the same live scan
        assert name in Q.IO_TMP_STATE_QUERIES
    finally:
        del Q.QUERIES[name]
    assert name not in Q.io_tmp_state_queries()


def test_explicit_iterative_tags_present():
    s = Q.io_tmp_state_queries()
    for n in ("x143_pagerank_dangling", "x378_personalized_pagerank",
              "x416_stream_media_decode"):
        assert n in s
