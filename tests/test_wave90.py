"""Wave-90 property tests: Neyman beats proportional on design
variance, robust-location laws, dedup-dividend accounting."""

from __future__ import annotations

from go_mapreduce_spark.operators import curation as C
from go_mapreduce_spark.operators import dedup as D
from go_mapreduce_spark.operators import stats as ST


def test_x398_allocation_laws(spark, sf_dir):
    rows = C.x398_neyman_allocation(spark, sf_dir).collect()
    assert rows
    tot_ney = sum(r.n_neyman for r in rows)
    tot_prop = sum(r.n_proportional for r in rows)
    # rounding keeps both allocations within one unit per stratum
    assert abs(tot_ney - C.NEYMAN_BUDGET) <= len(rows)
    assert abs(tot_prop - C.NEYMAN_BUDGET) <= len(rows)
    for r in rows:
        assert r.s_h > 0 and r.n_rows > 0
    # Neyman design variance <= proportional design variance
    # (sum N_h^2 S_h^2 / n_h comparison on the realized allocations)
    v_ney = sum(
        (r.n_rows * r.s_h) ** 2 / r.n_neyman for r in rows if r.n_neyman > 0
    )
    v_prop = sum(
        (r.n_rows * r.s_h) ** 2 / r.n_proportional
        for r in rows
        if r.n_proportional > 0
    )
    assert v_ney <= v_prop * 1.01  # integer rounding tolerance


def test_x399_robust_laws(spark, sf_dir):
    r = ST.x399_robust_location(spark, sf_dir).collect()[0]
    assert r.n > 0
    assert r.mad > 0
    assert abs(r.mad_scaled - r.mad * ST.MAD_CONSISTENCY) < 2e-6
    # at most ~a few percent of a unimodal distribution sits beyond
    # 3 robust sigmas
    assert r.n_robust_outliers < 0.1 * r.n


def test_x400_dividend_accounting(spark, sf_dir):
    r = D.x400_dedup_dividend(spark, sf_dir).collect()[0]
    from go_mapreduce_spark.sources.registry import load_table

    n_docs = load_table(spark, sf_dir, "documents").count()
    assert r.n_unique_texts + r.n_redundant_docs == n_docs
    assert 0 <= r.chars_saved <= r.chars_total
    assert 0.0 <= r.savings_frac < 1.0
    assert r.n_dup_groups <= r.n_redundant_docs
