"""Wave-63 property tests: HITS fixpoint invariants, permutation-test
p-value identity, kappa bounds, stump gain, reservoir determinism."""

from __future__ import annotations

from go_mapreduce_spark.operators import analytics as AN
from go_mapreduce_spark.operators import curation as C
from go_mapreduce_spark.operators import graph as G
from go_mapreduce_spark.operators import stats as ST


def test_x319_hits_l1_and_nonneg(spark, sf_dir):
    rows = G.x319_hits_scores(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.hub >= 0.0 and r.authority >= 0.0
    # both score vectors are L1-normalized fixpoints
    assert abs(sum(r.hub for r in rows) - 1.0) < 1e-4
    assert abs(sum(r.authority for r in rows) - 1.0) < 1e-4
    # mutual reinforcement concentrates mass but never goes negative;
    # at tiny SF a nation can be exporter-only (authority 0) or
    # importer-only (hub 0), so only demand SOME mass on each side
    assert any(r.hub > 0 for r in rows)
    assert any(r.authority > 0 for r in rows)


def test_x320_pvalue_identity_and_bounds(spark, sf_dir):
    r = ST.x320_permutation_test(spark, sf_dir).collect()[0]
    assert r.n_replicates == ST.PERM_B
    assert 0 <= r.n_extreme <= r.n_replicates
    assert abs(r.p_value - (r.n_extreme + 1) / (ST.PERM_B + 1)) < 1e-6
    assert 0.0 < r.p_value <= 1.0
    # shipmode is assigned independently of price in the fixtures:
    # the null should NOT be rejected at the add-one floor
    assert r.p_value > 1.0 / (ST.PERM_B + 1)


def test_x321_kappa_identity(spark, sf_dir):
    r = ST.x321_cohens_kappa(spark, sf_dir).collect()[0]
    assert 0 < r.agree_n <= r.n_docs
    assert 0.0 <= r.p_observed <= 1.0
    assert 0.0 < r.p_expected < 1.0
    got = (r.p_observed - r.p_expected) / (1 - r.p_expected)
    assert abs(r.kappa - got) < 5e-6
    # the two policies both track document size: agreement beats chance
    assert r.kappa > 0.0


def test_x322_stump_split_improves_on_root(spark, sf_dir):
    rows = AN.x322_decision_stump(spark, sf_dir).collect()
    assert {r.feature for r in rows} == set(AN.STUMP_FEATURES)
    for r in rows:
        assert 0.0 <= r.gini_split <= r.gini_root + 1e-9 <= 0.5 + 1e-9
        assert r.n_le > 0 and r.n_gt > 0
        assert 0.0 <= r.return_rate_le <= 1.0
        assert 0.0 <= r.return_rate_gt <= 1.0


def test_x323_reservoir_shape_and_determinism(spark, sf_dir):
    a = C.x323_weighted_reservoir(spark, sf_dir).collect()
    b = C.x323_weighted_reservoir(spark, sf_dir).collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]
    per_src = {}
    for r in a:
        per_src.setdefault(r.source, []).append(r)
    for src, rows in per_src.items():
        assert len(rows) <= C.WRES_K
        keys = [r.wkey for r in sorted(rows, key=lambda r: r.rk)]
        assert keys == sorted(keys, reverse=True)
        assert all(k < 0 for k in keys)  # ln(u)/w with u in (0,1)
