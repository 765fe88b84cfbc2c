"""Wave 30: sequence-pattern match (x216), longest streaks (x217),
log2 latency spectrum (x218)."""

from __future__ import annotations

from pyspark.sql import functions as F


def _ordered_events(spark, sf_dir):
    from go_mapreduce_spark.sources.registry import load_table

    ev: dict = {}
    for r in (
        load_table(spark, sf_dir, "events")
        .select("user_id", "ts", "event_id", "event_type", F.unix_micros("ts").alias("us"))
        .collect()
    ):
        ev.setdefault(r.user_id, []).append((r.us, r.event_id, r.event_type))
    for v in ev.values():
        v.sort()
    return ev


def test_sequence_match_greedy_automaton(spark, sf_dir):
    from go_mapreduce_spark.operators.analytics import (
        FUNNEL_PATTERN,
        x216_sequence_match,
    )

    ev = _ordered_events(spark, sf_dir)
    for r in x216_sequence_match(spark, sf_dir).collect():
        types = [t for _, _, t in ev[r.user_id]]
        prog = 0
        for t in types:
            if prog < len(FUNNEL_PATTERN) and t == FUNNEL_PATTERN[prog]:
                prog += 1
        assert r.n_events == len(types)
        assert r.funnel_progress == prog
        assert r.matched == (prog == len(FUNNEL_PATTERN))


def test_longest_streak_python_replay(spark, sf_dir):
    from go_mapreduce_spark.operators.analytics import x217_longest_streak

    ev = _ordered_events(spark, sf_dir)
    for r in x217_longest_streak(spark, sf_dir).collect():
        types = [t for _, _, t in ev[r.user_id]]
        best_len, best_type, cur_len = 0, None, 0
        prev = None
        for t in types:
            cur_len = cur_len + 1 if t == prev else 1
            prev = t
            if cur_len > best_len:  # strict: earliest island wins ties
                best_len, best_type = cur_len, t
        assert (r.longest_streak, r.streak_type) == (best_len, best_type)


def test_latency_spectrum_conserves_gaps(spark, sf_dir):
    from go_mapreduce_spark.operators.analytics import x218_latency_spectrum

    ev = _ordered_events(spark, sf_dir)
    n_gaps = sum(len(v) - 1 for v in ev.values() if len(v) > 1)
    rows = x218_latency_spectrum(spark, sf_dir).collect()
    assert sum(r.n_gaps for r in rows) == n_gaps
    for r in rows:
        assert r.log2_bucket >= 0
    # spot-check bucket math: bit length of a known gap
    us, eid, _ = ev[list(ev)[0]][0]
    assert (1234).bit_length() == len(bin(1234)) - 2
