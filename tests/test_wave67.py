"""Wave-67 property tests: anisotropy bounds (Jensen), Hill estimator
identities, ANOVA decomposition."""

from __future__ import annotations

from go_mapreduce_spark.operators import clustering as CL
from go_mapreduce_spark.operators import stats as ST


def test_x334_anisotropy_jensen_bound(spark, sf_dir):
    rows = CL.x334_embedding_anisotropy(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.n_vectors > 0
        assert r.avg_norm > 0
        # triangle inequality: ||mean|| <= mean of norms
        assert r.mean_norm <= r.avg_norm + 1e-6
        assert 0.0 <= r.anisotropy <= 1.0 + 1e-6


def test_x335_hill_identities(spark, sf_dir):
    r = ST.x335_hill_tail_index(spark, sf_dir).collect()[0]
    assert 0 < r.n_tail <= r.n_users
    assert r.xmin == ST.HILL_XMIN
    # a tail index must be > 1 for the mean to exist; Hill always is
    assert r.alpha_hill > 1.0
    assert abs(r.alpha_se - (r.alpha_hill - 1.0) / r.n_tail**0.5) < 5e-6


def test_x336_anova_decomposition(spark, sf_dir):
    from go_mapreduce_spark.sources.registry import load_table

    r = ST.x336_anova_f(spark, sf_dir).collect()[0]
    assert r.k_groups >= 2
    assert r.ss_between >= -1e-6
    assert r.ss_within > 0
    assert r.f_stat >= 0
    # SS_total check against a direct variance computation
    vals = [
        row.value
        for row in load_table(spark, sf_dir, "events")
        .select("value")
        .collect()
    ]
    mean = sum(vals) / len(vals)
    ss_total = sum((v - mean) ** 2 for v in vals)
    rel = abs((r.ss_between + r.ss_within) - ss_total) / ss_total
    assert rel < 1e-6
