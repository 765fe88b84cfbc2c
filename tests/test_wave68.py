"""Wave-68 property tests: overlap symmetry/bounds, Lorenz convexity
and Gini consistency, dispersion identities."""

from __future__ import annotations

from go_mapreduce_spark.operators import analytics as AN
from go_mapreduce_spark.operators import stats as ST
from go_mapreduce_spark.operators import text as T


def test_x337_overlap_bounds(spark, sf_dir):
    rows = T.x337_cross_lang_overlap(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.lang_a < r.lang_b
        assert 0 < r.shared_trigrams <= min(r.n_a, r.n_b)
        assert 0.0 < r.containment_a <= 1.0
        assert 0.0 < r.containment_b <= 1.0
        # jaccard is dominated by either containment
        assert r.jaccard <= min(r.containment_a, r.containment_b) + 1e-9


def test_x338_lorenz_curve_shape(spark, sf_dir):
    rows = sorted(
        AN.x338_lorenz_deciles(spark, sf_dir).collect(), key=lambda r: r.decile
    )
    assert len(rows) == AN.LORENZ_DECILES
    shares = [r.cum_share for r in rows]
    # monotone, ends at 1, and convex (below the diagonal)
    assert shares == sorted(shares)
    assert abs(shares[-1] - 1.0) < 1e-6
    for r in rows[:-1]:
        assert r.cum_share <= r.decile / AN.LORENZ_DECILES + 1e-9
    # Gini from the trapezoid rule over the curve matches x189 loosely
    g189 = AN.x189_revenue_gini(spark, sf_dir).collect()[0].gini
    xs = [0.0] + [r.decile / AN.LORENZ_DECILES for r in rows]
    ys = [0.0] + shares
    auc = sum(
        (xs[i + 1] - xs[i]) * (ys[i + 1] + ys[i]) / 2.0
        for i in range(len(xs) - 1)
    )
    g_curve = 1.0 - 2.0 * auc
    assert abs(g_curve - g189) < 0.05  # decile discretization error


def test_x339_dispersion_identities(spark, sf_dir):
    r = ST.x339_overdispersion(spark, sf_dir).collect()[0]
    assert r.n_users > 1
    assert r.mean_events > 0
    assert r.var_events >= 0
    assert abs(r.dispersion_index - r.var_events / r.mean_events) < 5e-6
    if r.nb_size_r is not None:
        assert r.var_events > r.mean_events
        want = r.mean_events**2 / (r.var_events - r.mean_events)
        assert abs(r.nb_size_r - want) < max(5e-6, abs(want) * 1e-4)
