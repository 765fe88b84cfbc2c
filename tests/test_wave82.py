"""Wave-82 property tests: ridge shrinkage + fit quality, k-center
greedy monotonicity, personalized-PageRank mass/locality."""

from __future__ import annotations

from go_mapreduce_spark.operators import graph as G
from go_mapreduce_spark.operators import similarity as S
from go_mapreduce_spark.operators import stats as ST


def test_x376_fit_and_shrinkage(spark, sf_dir):
    r = ST.x376_ridge_regression(spark, sf_dir).collect()[0]
    assert r.n > 0
    # document length is structurally explained by its token/alpha
    # counts: strong fit, positive feature weights
    assert r.coef_tokens > 0 or r.coef_alpha > 0
    assert 0.8 < r.r2 <= 1.0
    # ridge property: a huge penalty shrinks the slopes toward zero
    orig = ST.RIDGE_LAMBDA
    try:
        ST.RIDGE_LAMBDA = 1e12
        heavy = ST.x376_ridge_regression(spark, sf_dir).collect()[0]
    finally:
        ST.RIDGE_LAMBDA = orig
    assert abs(heavy.coef_tokens) < max(abs(r.coef_tokens) / 100, 1e-4)
    assert abs(heavy.coef_alpha) < max(abs(r.coef_alpha) / 100, 1e-4)


def test_x377_greedy_coverage_monotone(spark, sf_dir):
    rows = sorted(
        S.x377_kcenter_coreset(spark, sf_dir).collect(),
        key=lambda r: r.sel_rank,
    )
    assert [r.sel_rank for r in rows] == list(range(1, S.KCENTER_K + 1))
    assert len({r.vec_id for r in rows}) == S.KCENTER_K
    assert rows[0].d_min == S.KCENTER_SEED_SENTINEL
    # greedy max-min coverage radius is non-increasing in the rank
    ds = [r.d_min for r in rows[1:]]
    for a, b in zip(ds, ds[1:]):
        assert b <= a + 1e-9
    assert all(0.0 <= d <= 2.0 for d in ds)


def test_x378_ppr_mass_and_locality(spark, sf_dir):
    rows = G.x378_personalized_pagerank(spark, sf_dir).collect()
    assert 0 < len(rows) <= 25
    ranks = [r.rank for r in rows]
    assert ranks == sorted(ranks, reverse=True)
    # nodes outside the seed community legitimately hold ~0 mass; the
    # head of the ranking must still be strictly positive
    assert all(r >= 0 for r in ranks)
    assert ranks[0] > 0
    # top-25 can hold at most the whole unit of teleport mass
    assert sum(ranks) <= 1.0 + 1e-6
    # personalization concentrates: the top node must beat the uniform
    # share of a graph this size by a wide margin
    n_nodes = (
        G.x143_pagerank_dangling(spark, sf_dir).count()
    )
    assert ranks[0] > 3.0 / n_nodes
