"""Wave-74 property tests: Good-Turing mass accounting, Chow F
nonnegativity, Pettitt argmax identity, Kaplan-Meier product-limit
recurrence."""

from __future__ import annotations

import math

from go_mapreduce_spark.operators import stats as ST
from go_mapreduce_spark.operators import text as T


def test_x353_good_turing_accounting(spark, sf_dir):
    rows = sorted(
        T.x353_good_turing(spark, sf_dir).collect(), key=lambda r: r.r
    )
    assert 0 < len(rows) <= T.GT_MAX_R
    # count classes are distinct positive counts, ascending
    rs = [r.r for r in rows]
    assert rs == sorted(rs) and rs[0] >= 1
    for r in rows:
        assert r.n_r > 0
        # r* = (r+1) N_{r+1} / N_r from the row's own reported pieces
        want = (r.r + 1.0) * r.n_r_next / r.n_r
        assert abs(r.r_star - want) < 1e-4
        assert 0.0 <= r.p0_unseen < 1.0
        assert r.p_gt >= 0.0
    # unseen mass is constant across rows
    p0 = {r.p0_unseen for r in rows}
    assert len(p0) == 1


def test_x354_chow_shape(spark, sf_dir):
    r = ST.x354_chow_test(spark, sf_dir).collect()[0]
    assert r.n_days == r.n_pre + r.n_post
    assert r.n_pre > 2 and r.n_post > 2
    # split fit can never be worse than pooled -> F >= 0
    assert r.ssr_pooled >= r.ssr_split - 1e-6
    assert r.f_stat >= 0.0
    assert r.ssr_split > 0.0


def test_x355_pettitt_identity(spark, sf_dir):
    r = ST.x355_pettitt_test(spark, sf_dir).collect()[0]
    assert r.k_stat == abs(r.u_stat)
    n = r.n_days
    # |U| is bounded by the exhaustive max over t of t*(n-t) pairs
    assert 0 <= r.k_stat <= n * n
    want_p = min(
        1.0, 2.0 * math.exp(-6.0 * r.k_stat**2 / (n**3 + n**2))
    )
    assert abs(r.p_approx - want_p) < 1e-4
    assert r.change_day is not None


def test_x356_km_recurrence(spark, sf_dir):
    rows = sorted(
        ST.x356_kaplan_meier(spark, sf_dir).collect(),
        key=lambda r: r.gap_days,
    )
    assert rows, "KM curve should have event times"
    # survival is a nonincreasing product of (1 - d/n) factors
    s_prev = 1.0
    # replay the product over EVENT rows only; censored-only gap rows
    # are absent from the output but only shrink n_at_risk between
    # events, which the reported n_at_risk already reflects
    prod = 1.0
    for r in rows:
        assert 0 < r.n_events <= r.n_at_risk
        assert r.n_censored >= 0
        assert r.survival <= s_prev + 1e-9
        s_prev = r.survival
        prod *= 1.0 - r.n_events / r.n_at_risk
    # the output curve is exactly the product over its own factors
    # UNLESS a censored-only event time carried a -1e6 guard (never
    # at these gaps); allow tiny decimal(38,12) carry rounding
    assert abs(rows[-1].survival - prod) < 1e-5
    # at-risk counts shrink monotonically along the curve
    risks = [r.n_at_risk for r in rows]
    assert risks == sorted(risks, reverse=True)
