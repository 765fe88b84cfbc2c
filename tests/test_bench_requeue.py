"""Unit tests for bench.drift_requeue_pass (round-11 verdict ask #1).

The requeue branch fires exactly when a driver capture self-flags as
drift-polluted — i.e. during a run nobody is watching — so it must be
proven correct with fakes BEFORE it ever fires for real: selection
rule, min-of-3 commit, in-place timing repair, and every no-op guard.
No Spark involved.
"""

from __future__ import annotations

import pytest

import bench


def _prev(queries):
    return {"queries": queries, "calib_sec": 0.2}


@pytest.fixture
def delta_rule_only(monkeypatch):
    """Isolate the delta rule by disabling the top-cost union."""
    monkeypatch.setattr(bench, "TOP_COST_REQUEUE", 0)


def test_requeue_fires_and_repairs_timings(delta_rule_only):
    timings = {"a": 5.0, "b": 1.0, "c": 2.0}
    min_of = {"a": 3}
    queries = {"a": "fn_a", "b": "fn_b", "c": "fn_c"}
    runs = {"fn_a": iter([3.1, 2.05, 2.5]), "fn_c": iter([1.2, 1.15, 1.3])}
    calls = []

    def timed_run(fn):
        calls.append(fn)
        return next(runs[fn])

    rq = bench.drift_requeue_pass(
        _prev({"a": 2.0, "b": 0.9, "c": 1.0}),
        0.3,  # outside [0.7, 1.4] -> fires
        timings,
        min_of,
        queries,
        timed_run,
        lambda: 0.111,
    )
    # a (delta 3.0) and c (delta 1.0) requeue; b (delta 0.1) does not
    assert set(rq["queries"]) == {"a", "c"}
    assert calls.count("fn_a") == 3 and calls.count("fn_c") == 3
    assert rq["queries"]["a"] == {
        "prev": 2.0,
        "first_pass": 5.0,
        "steady_min3": 2.05,
    }
    # committed wall = min(first_pass, steady), repaired in place
    assert timings == {"a": 2.05, "b": 1.0, "c": 1.15}
    assert min_of["a"] == 3 and min_of["c"] == 3
    assert rq["calib_sec_post_requeue"] == 0.111
    # worst delta first
    assert list(rq["queries"]) == ["a", "c"]


def test_requeue_noops():
    timings = {"a": 5.0}
    boom = lambda fn: (_ for _ in ()).throw(AssertionError("must not run"))
    # no prev capture
    assert bench.drift_requeue_pass(
        None, 0.3, timings, {}, {"a": 1}, boom, lambda: 0
    ) is None
    # no calib probe
    assert bench.drift_requeue_pass(
        _prev({"a": 2.0}), None, timings, {}, {"a": 1}, boom, lambda: 0
    ) is None
    # drift inside the healthy band
    assert bench.drift_requeue_pass(
        _prev({"a": 2.0}), 1.0, timings, {}, {"a": 1}, boom, lambda: 0
    ) is None
    assert timings == {"a": 5.0}


def test_requeue_ignores_retired_and_new_queries(delta_rule_only):
    # prev-only names (retired) and timings-only names (new this
    # round) must both be skipped — only the common set requeues
    timings = {"new": 9.0, "common": 4.0}
    rq = bench.drift_requeue_pass(
        _prev({"retired": 0.1, "common": 1.0}),
        0.2,
        timings,
        {},
        {"new": "f_new", "common": "f_common"},
        lambda fn: 1.1,
        lambda: 0.1,
    )
    assert set(rq["queries"]) == {"common"}
    assert timings["new"] == 9.0


def test_requeue_includes_top_cost_even_without_positive_delta():
    """The delta rule is blind to queries inflated in BOTH captures
    (x247 in the round-12 live firing: 6.04 s vs a polluted prev of
    6.86 s — negative delta, 2.7 s steady never shipped).  The
    top-cost union must requeue them anyway, and new queries with no
    prev entry record prev=None instead of raising."""
    old = bench.TOP_COST_REQUEUE
    bench.TOP_COST_REQUEUE = 2
    try:
        timings = {"both_inflated": 6.0, "cheap": 0.2, "new_heavy": 5.0}
        rq = bench.drift_requeue_pass(
            _prev({"both_inflated": 6.8, "cheap": 0.2}),
            0.4,
            timings,
            {},
            {"both_inflated": "f1", "cheap": "f2", "new_heavy": "f3"},
            lambda fn: 2.7,
            lambda: 0.1,
        )
        # top-2 by wall = both_inflated (6.0) and new_heavy (5.0);
        # cheap is neither a delta suspect nor top-cost
        assert set(rq["queries"]) == {"both_inflated", "new_heavy"}
        assert timings["both_inflated"] == 2.7
        assert rq["queries"]["new_heavy"]["prev"] is None
        assert timings["cheap"] == 0.2
    finally:
        bench.TOP_COST_REQUEUE = old


def test_steady_only_total_substitutes_requeued_walls(delta_rule_only):
    """steady_only_total uses steady_min3 for requeued queries even when
    the committed wall kept the (lower) first pass, equals the plain sum
    with no requeue, and so stays methodology-comparable across captures
    regardless of whether the requeue fired (round-12 verdict ask #6)."""
    # no requeue: identical to the committed total
    assert bench.steady_only_total_of({"a": 1.5, "b": 2.0}, None) == 3.5
    timings = {"a": 5.0, "b": 1.0}
    rq = bench.drift_requeue_pass(
        _prev({"a": 2.0, "b": 0.9}),
        0.3,
        timings,
        {},
        {"a": "f_a", "b": "f_b"},
        lambda fn: 4.2,  # steady SLOWER than nothing useful: min keeps 4.2
        lambda: 0.1,
    )
    # committed: min(5.0, 4.2) = 4.2; steady-only also 4.2 here
    assert timings == {"a": 4.2, "b": 1.0}
    assert bench.steady_only_total_of(timings, rq) == 5.2
    # force the asymmetric case: committed keeps first_pass, steady higher
    rq["queries"]["a"]["steady_min3"] = 6.0
    assert bench.steady_only_total_of(timings, rq) == 7.0


def test_requeue_never_raises_a_committed_wall(delta_rule_only):
    # steady slower than first pass (host got WORSE): keep first pass
    timings = {"a": 2.0}
    rq = bench.drift_requeue_pass(
        _prev({"a": 1.0}),
        0.2,
        timings,
        {},
        {"a": "f"},
        lambda fn: 7.0,
        lambda: 0.1,
    )
    assert timings["a"] == 2.0
    assert rq["queries"]["a"]["steady_min3"] == 7.0
