"""Wave-75 property tests: Heaps monotone growth + sane exponent,
repetition-audit accounting, Mann-Kendall pair-count bound."""

from __future__ import annotations

from go_mapreduce_spark.operators import stats as ST
from go_mapreduce_spark.operators import text as T


def test_x357_heaps_growth(spark, sf_dir):
    rows = sorted(
        T.x357_heaps_law(spark, sf_dir).collect(), key=lambda r: r.bucket
    )
    assert 2 <= len(rows) <= T.HEAPS_BUCKETS
    ns = [r.n_tokens_cum for r in rows]
    vs = [r.vocab_cum for r in rows]
    # cumulative curves are nondecreasing and vocab <= tokens
    assert ns == sorted(ns) and vs == sorted(vs)
    assert all(v <= n for n, v in zip(ns, vs))
    # fit parameters are constant across rows and in Heaps range
    assert len({r.beta for r in rows}) == 1
    assert len({r.k_coef for r in rows}) == 1
    beta = rows[0].beta
    assert 0.0 < beta < 1.0 + 1e-9
    assert rows[0].k_coef > 0.0
    # the fitted curve roughly tracks the endpoints
    k, b = rows[0].k_coef, beta
    pred = k * ns[-1] ** b
    assert 0.2 < pred / vs[-1] < 5.0


def test_x358_repetition_accounting(spark, sf_dir):
    rows = T.x358_repetition_audit(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0 < r.n_distinct <= r.n_trigrams
        assert 1 <= r.max_repeat <= r.n_trigrams
        assert 0.0 <= r.dup_frac <= 1.0
        # all-distinct doc <=> zero duplicate fraction
        if r.n_distinct == r.n_trigrams:
            assert r.dup_frac == 0.0 and r.max_repeat == 1
        else:
            assert r.dup_frac > 0.0 and r.max_repeat >= 2
        assert r.flagged == (1 if r.dup_frac > T.REPETITION_THRESHOLD else 0)


def test_x359_mk_bounds(spark, sf_dir):
    r = ST.x359_mann_kendall(spark, sf_dir).collect()[0]
    n = r.n_days
    assert n > 10
    # |S| is bounded by the number of pairs
    assert abs(r.s_stat) <= n * (n - 1) // 2
    want_var = n * (n - 1) * (2 * n + 5) / 18.0
    assert abs(r.var_s - want_var) < 0.5
    # z sign matches S sign (continuity correction cannot flip it
    # past zero for |S| >= 1)
    if r.s_stat > 1:
        assert r.z_score > 0 and r.trend_sign == 1
    elif r.s_stat < -1:
        assert r.z_score < 0 and r.trend_sign == -1
