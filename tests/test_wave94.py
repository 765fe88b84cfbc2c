"""Wave-94 property tests: BY ⊆ BH rejection nesting, fanout-audit
distribution laws."""

from __future__ import annotations

from go_mapreduce_spark.operators import stats as ST


def test_x407_by_nested_in_bh(spark, sf_dir):
    rows = ST.x407_fdr_by(spark, sf_dir).collect()
    assert len(rows) == ST.FDR_M_TESTS
    for r in rows:
        # BY is strictly more conservative: anything BY rejects, BH
        # rejects too
        if r.rejected_by:
            assert r.rejected_bh
    # thresholds really carry the harmonic penalty
    for i in range(1, ST.FDR_M_TESTS + 1):
        assert ST.BY_Z_THRESHOLDS[i] > ST.FDR_Z_THRESHOLDS[i]
    # agreement with x296's BH flags on the same data
    bh = {r.n_name: r.rejected for r in ST.x296_fdr_bh(spark, sf_dir).collect()}
    for r in rows:
        assert r.rejected_bh == bh[r.n_name]


def test_x408_fanout_laws(spark, sf_dir):
    r = ST.x408_fanout_audit(spark, sf_dir).collect()[0]
    assert r.n_keys > 0
    assert 1 <= r.min_fanout <= r.p50_fanout <= r.p99_fanout <= r.max_fanout
    assert r.min_fanout <= r.mean_fanout <= r.max_fanout
    assert r.hot_key_ratio >= 1.0
    # TPC-H-ish lineitem: 1-7 lines per order, no degenerate hot key
    assert r.max_fanout < 100
