"""Wave-83 property tests: CV-ridge fold exactness, seasonal-index
normalization, isotonic fit laws."""

from __future__ import annotations

from go_mapreduce_spark.operators import stats as ST


def test_x379_folds_and_holdout(spark, sf_dir):
    rows = sorted(
        ST.x379_cv_ridge(spark, sf_dir).collect(), key=lambda r: r.fold
    )
    assert [r.fold for r in rows] == list(range(ST.CV_FOLDS))
    assert all(r.n_test > 0 for r in rows)
    # hash folds are roughly balanced (no fold > 2x another)
    sizes = [r.n_test for r in rows]
    assert max(sizes) < 2 * min(sizes)
    # the structural signal survives every held-out fold
    assert all(r.r2_holdout > 0.8 for r in rows)


def test_x380_index_centers_on_one(spark, sf_dir):
    rows = ST.x380_seasonal_decomposition(spark, sf_dir).collect()
    assert 1 <= len(rows) <= 7
    assert all(0 <= r.dow <= 6 for r in rows)
    assert all(r.n_days > 0 for r in rows)
    # multiplicative indices hover around 1 (orders are not strongly
    # weekday-seasonal in the fixtures, but trend division must not
    # blow the scale)
    for r in rows:
        assert 0.2 < r.seasonal_index < 5.0


def test_x381_isotonic_laws(spark, sf_dir):
    rows = sorted(
        ST.x381_isotonic_regression(spark, sf_dir).collect(),
        key=lambda r: r.d,
    )
    assert len(rows) > 100
    fits = [r.isotonic_fit for r in rows]
    # monotone non-decreasing
    for a, b in zip(fits, fits[1:]):
        assert b >= a - 1e-9
    # the fit lives inside the observed range
    ys = [r.daily_mean for r in rows]
    assert min(ys) - 1e-6 <= fits[0] and fits[-1] <= max(ys) + 1e-6
    # isotonic regression preserves the (weighted) mean on constant
    # weights only; here weights differ per day, so assert the fit is
    # the best monotone envelope at the ends: f_1 = min prefix means
    # is <= y_1's running means... keep the testable core: residuals
    # are not all one-signed (the fit crosses the data)
    resid = [y - f for y, f in zip(ys, fits)]
    assert any(r > 0 for r in resid) and any(r < 0 for r in resid)
