"""Wave-81 property tests: Mann-Whitney bounds + decision coherence,
McNemar discordant accounting, Kendall tau-b pair algebra, PR-AUC
identities."""

from __future__ import annotations

from go_mapreduce_spark.operators import stats as ST


def test_x372_u_bounds_and_decision(spark, sf_dir):
    r = ST.x372_mann_whitney(spark, sf_dir).collect()[0]
    assert r.n_a > 0 and r.n_b > 0
    # U counts (A,B) pairs won (ties half): 0 <= U <= n_a*n_b
    assert 0.0 <= r.u_stat <= r.n_a * r.n_b
    assert r.reject_5pct == (abs(r.z_score) > ST.MW_Z_CRIT_5)
    # priority is assigned independently of price in the fixtures:
    # the null should survive a 5% two-sided test
    assert not r.reject_5pct


def test_x373_discordant_accounting(spark, sf_dir):
    r = ST.x373_mcnemar_test(spark, sf_dir).collect()[0]
    assert r.b_disc >= 0 and r.c_disc >= 0
    assert r.b_disc + r.c_disc <= r.n_docs
    assert r.chi2_cc >= 0.0
    assert r.reject_5pct == (r.chi2_cc > ST.MCN_CHI2_CRIT_5)


def test_x374_pair_algebra(spark, sf_dir):
    r = ST.x374_kendall_tau_daily(spark, sf_dir).collect()[0]
    assert -1.0 <= r.tau_b <= 1.0
    # every pair is concordant, discordant, or tied in x and/or y
    assert r.conc + r.disc <= r.n0
    assert r.n0 > 0
    # busy days sell more in total: clearly positive concordance
    # (measured 0.48 at sf0.001, 0.9+ at sf0.01 where days are denser)
    assert r.tau_b > 0.3


def test_x375_ap_identities(spark, sf_dir):
    r = ST.x375_pr_auc(spark, sf_dir).collect()[0]
    assert 0.0 < r.avg_precision <= 1.0
    assert 0.0 < r.baseline < 1.0
    assert abs(r.lift - round(r.avg_precision - r.baseline, 6)) < 2e-6
    # a random scorer's AP ~= prevalence; order value vs status should
    # not be wildly anti-predictive
    assert r.avg_precision > 0.25 * r.baseline
