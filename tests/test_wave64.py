"""Wave-64 property tests: closeness bounds, effect-size identities,
proper-scoring-rule relationships, coverage-curve monotonicity."""

from __future__ import annotations

import math

from go_mapreduce_spark.operators import graph as G
from go_mapreduce_spark.operators import stats as ST
from go_mapreduce_spark.operators import text as T


def test_x324_closeness_bounds(spark, sf_dir):
    rows = G.x324_closeness_centrality(spark, sf_dir).collect()
    assert rows
    n = len(rows)
    for r in rows:
        assert 0 <= r.n_reachable <= n - 1
        assert 0.0 <= r.closeness <= 1.0 + 1e-9
        # a node reaching r others in >=1 hops has sum_dist >= r
        assert r.sum_dist >= r.n_reachable
        if r.n_reachable == 0:
            assert r.closeness == 0.0


def test_x325_effect_size_identities(spark, sf_dir):
    rows = ST.x325_effect_sizes(spark, sf_dir).collect()
    n_groups = 5  # order priorities
    assert len(rows) == n_groups * (n_groups - 1) // 2
    for r in rows:
        # Hedges' g is a shrink of d toward zero, same sign
        assert abs(r.hedges_g) <= abs(r.cohens_d) + 1e-9
        assert r.hedges_g * r.cohens_d >= 0 or abs(r.cohens_d) < 1e-9
        # lrr sign agrees with the mean difference
        if abs(r.mean_diff) > 1e-6:
            assert (r.log_response_ratio > 0) == (r.mean_diff > 0)
        # order priority is independent of order value: effects are small
        assert abs(r.cohens_d) < 0.5


def test_x326_scoring_rules(spark, sf_dir):
    r = ST.x326_calibration_metrics(spark, sf_dir).collect()[0]
    base_rate = r.n_pos / r.n
    # log-loss of any predictor is at least the entropy-bound 0,
    # and a non-degenerate one beats neither bound trivially
    assert r.log_loss > 0.0
    assert 0.0 < r.brier < 0.25 + 1e-6 or base_rate in (0.0, 1.0)
    assert 0.0 <= r.ece <= 1.0
    # log-loss >= 2 * brier (refinement of Pinsker-type bound holds
    # loosely; just pin the gross ordering log_loss > brier here)
    assert r.log_loss > r.brier


def test_x327_coverage_monotone(spark, sf_dir):
    rows = T.x327_ngram_coverage_curve(spark, sf_dir).collect()
    assert rows
    per_src: dict[str, list] = {}
    for r in rows:
        assert 1 <= r.decile <= T.COVERAGE_DECILES
        assert r.new_trigrams > 0
        per_src.setdefault(r.source, []).append(r)
    for src, rs in per_src.items():
        rs = sorted(rs, key=lambda r: r.decile)
        cum = 0
        for r in rs:
            cum += r.new_trigrams
            assert r.cum_trigrams == cum
        assert math.isclose(rs[-1].coverage, 1.0, abs_tol=1e-6)
        # coverage fractions are monotone in decile
        covs = [r.coverage for r in rs]
        assert covs == sorted(covs)
