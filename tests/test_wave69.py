"""Wave-69 property tests: CUPED adjustment identities, DiD cell
algebra, IPS estimator relationships."""

from __future__ import annotations

from go_mapreduce_spark.operators import stats as ST


def test_x340_cuped_identities(spark, sf_dir):
    rows = {r.arm: r for r in ST.x340_cuped_adjustment(spark, sf_dir).collect()}
    assert set(rows) == {"treatment", "control"}
    t, c = rows["treatment"], rows["control"]
    assert t.theta == c.theta  # pooled theta
    assert 0.0 <= t.var_ratio <= 1.0 + 1e-6
    # the adjustment is exactly mean_post - theta*(mean_pre - pooled pre mean):
    # pooled pre mean recovered from the two arms' weighted means
    n = t.n_customers + c.n_customers
    pooled_pre = (
        t.mean_pre * t.n_customers + c.mean_pre * c.n_customers
    ) / n
    for r in (t, c):
        want = r.mean_post - r.theta * (r.mean_pre - pooled_pre)
        assert abs(r.adjusted_mean - want) < 1e-2  # rounding of inputs
    # adjustment preserves the overall weighted mean (CUPED is unbiased)
    raw = (t.mean_post * t.n_customers + c.mean_post * c.n_customers) / n
    adj = (
        t.adjusted_mean * t.n_customers + c.adjusted_mean * c.n_customers
    ) / n
    assert abs(raw - adj) < 1e-2


def test_x341_did_cell_algebra(spark, sf_dir):
    r = ST.x341_diff_in_diff(spark, sf_dir).collect()[0]
    want = (r.treated_post - r.treated_pre) - (r.control_post - r.control_pre)
    assert abs(r.did - want) < 5e-6
    assert r.se > 0
    assert abs(r.t_stat - r.did / r.se) < 1e-3
    for v in (r.treated_pre, r.treated_post, r.control_pre, r.control_post):
        assert v is not None and v > 0


def test_x342_ips_relationships(spark, sf_dir):
    r = ST.x342_ips_estimator(spark, sf_dir).collect()[0]
    assert r.n_customers > 0
    assert 0 < r.effective_n <= r.n_customers + 1e-6
    # clipping can only lower a nonnegative-reward estimate
    assert r.v_clipped <= r.v_ips + 1e-6
    assert r.v_ips >= 0 and r.v_snips >= 0
