"""Wave-72 property tests: QTE vs global quartiles, MDE scaling,
posterior coherence."""

from __future__ import annotations

from go_mapreduce_spark.operators import stats as ST


def test_x345_qte_brackets_quartiles(spark, sf_dir):
    rows = sorted(
        ST.x345_quantile_treatment_effect(spark, sf_dir).collect(),
        key=lambda r: r.quantile,
    )
    assert [r.quantile for r in rows] == [0.25, 0.5, 0.75]
    for r in rows:
        assert abs(r.qte - (r.treatment_value - r.control_value)) < 5e-6
        # a null assignment: arm quantiles track each other; the gap
        # shrinks as ~1/√n, so at the tiny test fixture allow more
        assert abs(r.qte) / r.control_value < 0.15
    # quartiles are monotone within each arm
    t = [r.treatment_value for r in rows]
    c = [r.control_value for r in rows]
    assert t == sorted(t) and c == sorted(c)


def test_x346_mde_identities(spark, sf_dir):
    r = ST.x346_power_mde(spark, sf_dir).collect()[0]
    assert r.n_a > 0 and r.n_b > 0
    assert r.sd > 0
    zsum = ST.MDE_Z_ALPHA + ST.MDE_Z_BETA
    want = zsum * (r.sd**2 * (1 / r.n_a + 1 / r.n_b)) ** 0.5
    assert abs(r.mde_abs - want) / want < 1e-3
    assert abs(r.mde_rel - r.mde_abs / r.mean_value) < 1e-4
    # required n for a 5% lift is consistent with the MDE formula
    delta = ST.MDE_REL_TARGET * r.mean_value
    import math

    want_n = math.ceil(2 * zsum**2 * r.sd**2 / delta**2)
    assert abs(r.n_per_arm_for_5pct - want_n) <= 1


def test_x347_posterior_coherence(spark, sf_dir):
    rows = ST.x347_bandit_posteriors(spark, sf_dir).collect()
    assert len(rows) == 5
    means = [r.post_mean for r in sorted(rows, key=lambda r: r.post_rank)]
    assert means == sorted(means, reverse=True)
    for r in rows:
        assert 0.0 < r.ci_lo <= r.post_mean <= r.ci_hi < 1.0
        want = (r.n_success + 1) / (r.n + 2)
        assert abs(r.post_mean - want) < 5e-6
