"""Similarity-search tests: ANN recall vs brute force (SURVEY.md §5.2.4)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from go_mapreduce_spark.operators.similarity import ann_lsh_topk, brute_force_topk
from go_mapreduce_spark.sources.registry import load_table


def _queries(emb, n=10):
    return emb.filter(F.col("vec_id") < n).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qe")
    )


def test_brute_force_topk_shape_and_selfexclusion(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    out = brute_force_topk(emb, _queries(emb), k=5).collect()
    assert len(out) == 10 * 5
    assert all(r.neighbor_id != r.query_id for r in out)
    # per-query similarities are non-increasing
    by_q = {}
    for r in sorted(out, key=lambda r: (r.query_id, -r.similarity)):
        by_q.setdefault(r.query_id, []).append(r.similarity)
    for sims in by_q.values():
        assert sims == sorted(sims, reverse=True)


def _clustered_embeddings(spark, n_clusters=20, per_cluster=25, dim=64):
    """Synthetic corpus with real neighbor structure: tight clusters
    (intra-cluster cosine ≳ 0.9) — the regime ANN exists for.  LSH on
    isotropic random vectors has provably poor recall (sign-agreement
    p ≈ 0.6 ⇒ 1-(1-p^8)^8 ≈ 0.15); that is a property of the data,
    not a bug, so recall bounds are asserted on clustered data."""
    import random

    rng = random.Random(7)
    rows = []
    vid = 0
    for c in range(n_clusters):
        center = [rng.gauss(0, 1) for _ in range(dim)]
        cn = sum(x * x for x in center) ** 0.5
        center = [x / cn for x in center]
        for _ in range(per_cluster):
            # σ=0.05 over 64 dims → noise norm ≈ 0.4 vs unit center →
            # intra-cluster cosine ≈ 0.93 (σ=0.15 gave cosine ≈ 0.5:
            # noise norm scales with √dim and swamps the center)
            noise = [rng.gauss(0, 0.05) for _ in range(dim)]
            v = [a + b for a, b in zip(center, noise)]
            rows.append((vid, [float(x) for x in v], c))
            vid += 1
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>, label int")


def test_ann_lsh_recall_vs_brute_force(spark):
    emb = _clustered_embeddings(spark)
    q = _queries(emb, 20)
    truth = {
        (r.query_id, r.neighbor_id)
        for r in brute_force_topk(emb, q, k=5).collect()
    }
    approx = {
        (r.query_id, r.neighbor_id)
        for r in ann_lsh_topk(emb, q, k=5).collect()
    }
    recall = len(approx & truth) / len(truth)
    assert recall >= 0.8, f"ANN recall {recall:.2f} below bound"


def test_ann_lsh_is_deterministic(spark, sf_dir):
    emb = load_table(spark, sf_dir, "embeddings")
    q = _queries(emb, 5)
    a = sorted(map(tuple, ann_lsh_topk(emb, q, k=5).collect()))
    b = sorted(map(tuple, ann_lsh_topk(emb, q, k=5).collect()))
    assert a == b


def test_ann_ivf_recall_vs_brute_force(spark):
    from go_mapreduce_spark.operators.similarity import ann_ivf_topk

    emb = _clustered_embeddings(spark)
    q = _queries(emb, 20)
    truth = {
        (r.query_id, r.neighbor_id)
        for r in brute_force_topk(emb, q, k=5).collect()
    }
    approx = {
        (r.query_id, r.neighbor_id)
        for r in ann_ivf_topk(emb, q, k=5).collect()
    }
    recall = len(approx & truth) / len(truth)
    assert recall >= 0.8, f"IVF recall {recall:.2f} below bound"


@pytest.mark.parametrize(
    "sf",
    ["/root/testdata/sf0.001", "/root/testdata/sf0.01"],
)
def test_ivf_clustered_recall_gate(spark, sf):
    """The shipped ANN's recall story as a test, not a bench
    footnote: the trained quantizer on the clustered view of the
    FIXTURE embeddings (x41b's corpus) must reach ≥ 0.9 recall vs
    exact brute force at both committed scale factors."""
    import os

    from go_mapreduce_spark.operators.similarity import (
        ann_ivf_topk,
        clustered_embeddings_view,
    )

    if not os.path.isdir(sf):
        pytest.skip(f"{sf} not generated")
    emb = clustered_embeddings_view(load_table(spark, sf, "embeddings"))
    q = _queries(emb, 20)
    truth = {
        (r.query_id, r.neighbor_id)
        for r in brute_force_topk(emb, q, k=5).collect()
    }
    approx = {
        (r.query_id, r.neighbor_id)
        for r in ann_ivf_topk(emb, q, k=5).collect()
    }
    recall = len(approx & truth) / len(truth)
    assert recall >= 0.9, f"clustered IVF recall {recall:.2f} below gate"


def test_x41b_registry_entry_shape(spark, sf_dir):
    from go_mapreduce_spark.operators.similarity import x41b_ivf_clustered

    rows = x41b_ivf_clustered(spark, sf_dir).collect()
    assert len(rows) == 10 * 5
    assert all(r.neighbor_id != r.query_id for r in rows)


def test_ann_ivf_is_deterministic(spark, sf_dir):
    from go_mapreduce_spark.operators.similarity import ann_ivf_topk

    emb = load_table(spark, sf_dir, "embeddings")
    q = _queries(emb, 5)
    a = sorted(map(tuple, ann_ivf_topk(emb, q, k=5).collect()))
    b = sorted(map(tuple, ann_ivf_topk(emb, q, k=5).collect()))
    assert a == b


def test_ann_ivf_isotropic_recall_floor(spark, sf_dir):
    """IVF's contract is clustered corpora (0.8 floor above); on the
    near-isotropic fixture the expected recall of ANY cell-partitioned
    index is the probed candidate fraction (candidates are already
    exact-scored, so candidate generation is the binding constraint).
    Pin recall at 0.8x that bound so a quantizer regression that drops
    BELOW the information-theoretic baseline still fails, without
    pretending IVF can beat it on data it is not meant for."""
    from go_mapreduce_spark.operators.similarity import (
        IVF_CELLS,
        IVF_PROBE,
        ann_ivf_topk,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    q = _queries(emb, 20)
    truth = {
        (r.query_id, r.neighbor_id)
        for r in brute_force_topk(emb, q, k=5).collect()
    }
    approx = {
        (r.query_id, r.neighbor_id)
        for r in ann_ivf_topk(emb, q, k=5).collect()
    }
    recall = len(approx & truth) / len(truth)
    floor = 0.8 * IVF_PROBE / IVF_CELLS
    assert recall >= floor, f"IVF isotropic recall {recall:.2f} below {floor:.2f}"
