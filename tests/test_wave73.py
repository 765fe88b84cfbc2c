"""Wave-73 property tests: χ² GOF identity, Jarque-Bera moments,
Grubbs extremeness, Durbin-Watson bounds, Ljung-Box monotonicity."""

from __future__ import annotations

import math

from go_mapreduce_spark.operators import stats as ST


def test_x348_chisq_identity(spark, sf_dir):
    rows = sorted(
        ST.x348_chisq_gof(spark, sf_dir).collect(), key=lambda r: r.dow
    )
    assert [r.dow for r in rows] == list(range(1, 8))
    n = sum(r.observed for r in rows)
    # expected is n/7 on every row
    for r in rows:
        assert abs(r.expected - n / 7.0) < 1e-4
        want = (r.observed - n / 7.0) ** 2 / (n / 7.0)
        assert abs(r.contrib - want) < 1e-4
    # the sufficient-statistic χ² equals the sum of contributions
    chi2 = rows[0].chi2_stat
    assert all(abs(r.chi2_stat - chi2) < 1e-9 for r in rows)
    assert abs(chi2 - sum(r.contrib for r in rows)) < 1e-3
    assert chi2 >= 0.0


def test_x349_jb_moments(spark, sf_dir):
    r = ST.x349_jarque_bera(spark, sf_dir).collect()[0]
    assert r.n > 0 and r.sd_value > 0
    # JB identity from its own reported S and K
    want = r.n / 6.0 * (r.skewness**2 + r.excess_kurtosis**2 / 4.0)
    assert abs(r.jb_stat - want) / max(want, 1.0) < 1e-3
    # order values live in a bounded band -> moments are sane
    assert 0 < r.mean_value < 1e7
    assert -2.5 < r.excess_kurtosis < 50.0
    assert -5.0 < r.skewness < 5.0


def test_x350_grubbs_is_extreme(spark, sf_dir):
    r = ST.x350_grubbs_test(spark, sf_dir).collect()[0]
    assert r.n_customers > 1 and r.sd_revenue > 0
    assert abs(
        r.g_stat - abs(r.suspect_revenue - r.mean_revenue) / r.sd_revenue
    ) < 1e-4
    # Grubbs' hard upper bound: G <= (n-1)/sqrt(n)
    assert r.g_stat <= (r.n_customers - 1) / math.sqrt(r.n_customers)
    assert r.g_stat > 0.0


def test_x351_dw_bounds(spark, sf_dir):
    r = ST.x351_durbin_watson(spark, sf_dir).collect()[0]
    assert r.n_days > 10
    # DW lives in [0, 4]; near 2 means no lag-1 autocorrelation
    assert 0.0 <= r.dw_stat <= 4.0


def test_x352_ljung_box_monotone(spark, sf_dir):
    rows = sorted(
        ST.x352_ljung_box(spark, sf_dir).collect(), key=lambda r: r.lag
    )
    assert [r.lag for r in rows] == list(range(1, ST.LJUNG_BOX_MAX_LAG + 1))
    # ACF is a correlation
    for r in rows:
        assert -1.0 - 1e-9 <= r.acf <= 1.0 + 1e-9
    # Q accumulates nonnegative terms -> nondecreasing in lag
    qs = [r.q_cum for r in rows]
    assert all(b >= a - 1e-9 for a, b in zip(qs, qs[1:]))
    assert qs[0] >= 0.0
