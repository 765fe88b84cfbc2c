"""Wave-62 property tests: Holm vs BH dominance, LSH S-curve shape,
Simpson identities, modularity bounds."""

from __future__ import annotations

from pyspark.sql import functions as F

from go_mapreduce_spark.operators import dedup as D
from go_mapreduce_spark.operators import graph as G
from go_mapreduce_spark.operators import stats as ST
from go_mapreduce_spark.operators import text as T


def test_x315_holm_is_stricter_than_bh(spark, sf_dir):
    holm = {r.n_name: r.rejected for r in ST.x315_holm_bonferroni(spark, sf_dir).collect()}
    bh = {r.n_name: r.rejected for r in ST.x296_fdr_bh(spark, sf_dir).collect()}
    # FWER control rejects a subset of what FDR control rejects
    for name, rej in holm.items():
        if rej:
            assert bh[name], f"Holm rejected {name} but BH did not"
    # thresholds are decreasing in rank for BH... increasing for Holm
    ts = [ST.HOLM_Z_THRESHOLDS[i] for i in range(1, ST.FDR_M_TESTS + 1)]
    assert ts == sorted(ts, reverse=True)


def test_x316_scurve_monotone_and_bounded(spark, sf_dir):
    rows = D.x316_lsh_band_advisor(spark, sf_dir).collect()
    assert rows
    recalls = [(r.jaccard_bin, r.expected_recall) for r in rows]
    for _, er in recalls:
        assert -1e-9 <= er <= 1.0 + 1e-9
    # the S-curve is monotone in similarity
    vals = [er for _, er in sorted(recalls)]
    assert vals == sorted(vals)
    # a jaccard=1.0 pair is always caught
    top = [r for r in rows if r.jaccard_bin >= 0.999]
    for r in top:
        assert r.expected_recall > 0.999999


def test_x317_simpson_identities(spark, sf_dir):
    for r in T.x317_simpson_diversity(spark, sf_dir).collect():
        assert 0.0 < r.simpson_d <= 1.0
        assert abs(r.diversity - (1.0 - r.simpson_d)) < 2e-6
        # effective vocab is at most the real vocab, at least 1
        assert 1.0 - 1e-9 <= r.effective_vocab <= r.vocab + 1e-6


def test_x318_modularity_bounds_and_edge_conservation(spark, sf_dir):
    r = G.x318_modularity(spark, sf_dir).collect()[0]
    assert -0.5 - 1e-9 <= r.modularity <= 1.0 + 1e-9
    assert 0 <= r.edges_within <= r.edges_total
    # LP on a near-dup graph: communities ARE the dense parts
    assert r.modularity > 0.2
