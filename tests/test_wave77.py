"""Wave-77 property tests: conformal coverage guarantee, energy
distance nonnegativity, PSI accounting, log-rank identity."""

from __future__ import annotations

import math

from go_mapreduce_spark.operators import stats as ST


def test_x363_conformal_coverage(spark, sf_dir):
    r = ST.x363_conformal_interval(spark, sf_dir).collect()[0]
    assert r.n_calib > 30 and r.n_eval > 30
    assert r.q_hat > 0.0
    assert r.target_coverage == 0.9
    # split conformal guarantees >= 1-alpha coverage in expectation;
    # allow generous sampling slack on the fixture but catch a broken
    # interval (e.g. q_hat off by 10x would score ~0 or ~1 trivially)
    assert 0.5 <= r.empirical_coverage <= 1.0


def test_x364_energy_nonneg(spark, sf_dir):
    r = ST.x364_energy_distance(spark, sf_dir).collect()[0]
    assert r.n_pre > 10 and r.n_post > 10
    # energy distance is nonnegative (allow rounding slack)
    assert r.energy_dist >= -1e-3
    # cross-sample mean distance dominates half the within sums
    assert r.mean_cross_dist > 0
    assert r.mean_within_pre > 0 and r.mean_within_post > 0
    want = 2 * r.mean_cross_dist - r.mean_within_pre - r.mean_within_post
    assert abs(r.energy_dist - want) < 5e-3


def test_x365_psi_accounting(spark, sf_dir):
    rows = sorted(
        ST.x365_psi_drift(spark, sf_dir).collect(), key=lambda r: r.bin
    )
    assert len(rows) >= 3
    psi = rows[0].psi
    assert len({r.psi for r in rows}) == 1
    # PSI equals the sum of its contributions and is nonnegative
    assert psi >= 0.0
    assert abs(psi - sum(r.contrib for r in rows)) < 1e-5
    for r in rows:
        assert r.n_baseline >= 0 and r.n_current >= 0
        assert r.n_baseline + r.n_current > 0
        # each (p-q)ln(p/q) term is individually nonnegative
        assert r.contrib >= -1e-12


def test_x366_logrank_identity(spark, sf_dir):
    r = ST.x366_logrank_test(spark, sf_dir).collect()[0]
    assert r.n_event_times > 0
    assert 0 <= r.o1
    assert r.e1 > 0 and r.var1 > 0
    want_z = (r.o1 - r.e1) / math.sqrt(r.var1)
    assert abs(r.z_score - want_z) < 1e-3
    # under near-identical synthetic behavior the z should be modest
    assert abs(r.z_score) < 20.0
