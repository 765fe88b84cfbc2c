"""Wave-66 property tests: target-encoding shrinkage, Bloom advisor
math, quartile ordering."""

from __future__ import annotations

from go_mapreduce_spark.operators import analytics as AN
from go_mapreduce_spark.operators import curation as C
from go_mapreduce_spark.operators import stats as ST


def test_x331_encoding_shrinks_toward_prior(spark, sf_dir):
    rows = AN.x331_target_encoding(spark, sf_dir).collect()
    assert {r.feature for r in rows} == {"c_mktsegment", "order_year"}
    for r in rows:
        lo, hi = sorted((r.raw_rate, r.prior))
        assert lo - 1e-6 <= r.encoded <= hi + 1e-6
        # shrinkage weight matches m/(n+m) exactly
        m = AN.TE_SMOOTHING
        want = (r.sum_y + m * r.prior) / (r.n + m)
        assert abs(r.encoded - want) < 5e-6


def test_x332_bloom_advisor_math(spark, sf_dir):
    rows = C.x332_bloom_fpr_advisor(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.k_hashes >= 1
        assert 0.0 <= r.expected_fpr <= 1.0
        assert r.undersized == (r.expected_fpr > C.BLOOM_FPR_TARGET)
    # with a fixed bit budget and optimal k, more keys can never
    # give a better filter
    by_n = sorted(rows, key=lambda r: r.n_keys)
    assert by_n[-1].expected_fpr >= by_n[0].expected_fpr - 1e-9


def test_x333_quartiles_ordered_and_members(spark, sf_dir):
    from go_mapreduce_spark.sources.registry import load_table

    rows = ST.x333_grouped_quartiles(spark, sf_dir).collect()
    assert len(rows) == 5
    vals = {
        g: sorted(
            r.o_totalprice
            for r in load_table(spark, sf_dir, "orders")
            .select("o_orderpriority", "o_totalprice")
            .collect()
            if r.o_orderpriority == g
        )
        for g in {r.o_orderpriority for r in rows}
    }
    import math

    for r in rows:
        assert r.p25 <= r.p50 <= r.p75
        vs = vals[r.o_orderpriority]
        assert r.n == len(vs)
        # type-1 order statistics: the exact element at ceil(q*n)
        for q, got in ((0.25, r.p25), (0.5, r.p50), (0.75, r.p75)):
            want = vs[math.ceil(q * len(vs)) - 1]
            assert abs(got - round(want, 6)) < 1e-9
