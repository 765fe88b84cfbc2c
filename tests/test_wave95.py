"""Wave-95 (round 8): x382 SemDeDup scale posture — data-proportional
cluster count + deterministic sub-split cap (the round-7 verdict's #1
ask: the within-cluster pair join must be bounded by the data, not by
a compile-time k=8)."""

from __future__ import annotations

from pyspark.sql import functions as F

from go_mapreduce_spark.operators import clustering as CL
from go_mapreduce_spark.operators import dedup as D


def test_semdedup_k_is_data_proportional():
    # floor at the historical k=8 so fixture hashes are unchanged
    assert CL.semdedup_k(0) == CL.KMEANS_K
    assert CL.semdedup_k(500) == CL.KMEANS_K
    assert CL.semdedup_k(8 * CL.TARGET_CLUSTER_ROWS) == CL.KMEANS_K
    # above the floor, mean cluster size is pinned: k = ceil(n/target)
    assert CL.semdedup_k(2000) == -(-2000 // CL.TARGET_CLUSTER_ROWS)
    n = 10**9
    k = CL.semdedup_k(n)
    assert k == -(-n // CL.TARGET_CLUSTER_ROWS)
    # the pair bound that kills the O(N²/8): mean cluster² × k ≈ N·target
    assert (n / k) <= CL.TARGET_CLUSTER_ROWS + 1


def test_x382_explicit_k_grows_clusters_and_shrinks_pairs(spark, sf_dir):
    base = D.x382_semdedup(spark, sf_dir, k=CL.KMEANS_K).collect()
    wide = D.x382_semdedup(spark, sf_dir, k=4 * CL.KMEANS_K).collect()
    assert len(base) == CL.KMEANS_K
    assert len(wide) > len(base)
    for rows in (base, wide):
        for r in rows:
            assert r.n_kept + r.n_dropped == r.n_vectors
            assert r.n_kept >= 1
    # same corpus either way
    assert sum(r.n_vectors for r in base) == sum(r.n_vectors for r in wide)
    # a finer quantizer can only REMOVE candidate pairs
    assert sum(r.n_dropped for r in wide) <= sum(r.n_dropped for r in base)


def test_x382_sub_split_cap_bounds_a_dominant_cluster(spark, sf_dir, monkeypatch):
    # k=1 forces EVERY vector into one cluster — the adversarial-skew
    # worst case.  With the cap monkeypatched below the corpus size the
    # sub-split must engage; semantics: capping only removes candidate
    # pairs, and accounting still closes.
    uncapped = D.x382_semdedup(spark, sf_dir, k=1).collect()
    assert len(uncapped) == 1
    n = uncapped[0].n_vectors
    cap = max(2, n // 10)
    monkeypatch.setattr(D, "SEMDEDUP_CLUSTER_CAP", cap)
    capped = D.x382_semdedup(spark, sf_dir, k=1).collect()
    assert len(capped) == 1
    assert capped[0].n_vectors == n
    assert capped[0].n_kept + capped[0].n_dropped == n
    assert capped[0].n_dropped <= uncapped[0].n_dropped
    # every sub-bucket keeps its smallest id → at least ceil(n/cap) kept
    assert capped[0].n_kept >= -(-n // cap)


def test_x382_default_k_matches_semdedup_k(spark, sf_dir):
    from go_mapreduce_spark.sources.registry import load_table

    n = load_table(spark, sf_dir, "embeddings").count()
    rows = D.x382_semdedup(spark, sf_dir).collect()
    # one output row per NON-EMPTY cluster; never more than k
    assert len(rows) <= CL.semdedup_k(n)
    assert sum(r.n_vectors for r in rows) == n


def test_x409_aipw_estimates(spark, sf_dir):
    from go_mapreduce_spark.operators import stats as ST

    r = ST.x409_doubly_robust(spark, sf_dir).collect()[0]
    assert r.n > 0
    # all three estimators positive on an all-positive reward corpus
    assert r.v_dm > 0 and r.v_ips > 0 and r.v_aipw > 0
    # AIPW is DM plus a correction — it must land in the same decade
    assert 0.1 < r.v_aipw / r.v_dm < 10


def test_ppr_seeded_rejects_empty_seed_set(spark):
    import pytest

    from go_mapreduce_spark.operators.graph import ppr_seeded

    edges = spark.createDataFrame([(1, 2), (2, 3)], "u int, v int")
    seeds = spark.createDataFrame([(99,)], "node int")  # not in graph
    with pytest.raises(ValueError, match="no seed node"):
        ppr_seeded(edges, seeds, n_iter=1)
