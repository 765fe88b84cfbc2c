"""Wave 99 (round 9): two-level quantizer for x382 SemDeDup's
assignment stage — the round-8 verdict's last asymptotically
quadratic term (flat assignment was N·k with k ∝ N).

Properties pinned here:
- semdedup_supers is the EXACT integer ceil(sqrt(k)) — including the
  perfect-square edge where a float sqrt can land above or below the
  true root (the DuckDB oracle replays the same floor+correction).
- Every vector gets exactly one assignment (the inner join cannot
  drop rows, even under duplicate super embeddings).
- The assignment is the true nearest centroid WITHIN the routed
  super-cluster, and exact end-to-end whenever the coarse route is
  (planted well-separated clusters: two-level == flat).
- Partition-invariance: identical output at any input partitioning.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def test_semdedup_supers_is_exact_ceil_sqrt():
    from go_mapreduce_spark.operators.clustering import semdedup_supers

    import math

    for k in list(range(1, 200)) + [10**6, 10**6 + 1, 10**12, 10**12 + 1]:
        m = semdedup_supers(k)
        assert (m - 1) * (m - 1) < k <= m * m, (k, m)
        # perfect squares stay at their root
        assert semdedup_supers(m * m) == m
    assert semdedup_supers(16) == 4 and semdedup_supers(17) == 5
    assert semdedup_supers(10**12) == 10**6


def _grid(spark, n=60, d=4):
    """n vectors on a deterministic grid; centroid_id j = vec_id j."""
    rows = [
        (i, [float((i * 7 + j * 3) % 13) for j in range(d)])
        for i in range(1, n + 1)
    ]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def _centroids(emb, k):
    return emb.filter(F.col("vec_id").between(1, k)).select(
        F.col("vec_id").alias("centroid_id"), F.col("embedding").alias("ce")
    )


def test_two_level_assigns_every_vector_once(spark):
    from go_mapreduce_spark.operators.clustering import (
        assign_nearest_two_level,
        semdedup_supers,
    )

    emb = _grid(spark)
    k = 12
    out = assign_nearest_two_level(emb, _centroids(emb, k), semdedup_supers(k))
    rows = out.collect()
    assert len(rows) == 60
    assert len({r.vec_id for r in rows}) == 60
    assert all(1 <= r.centroid_id <= k for r in rows)


def test_two_level_is_nearest_within_routed_super_cluster(spark):
    """The fine stage must pick the exact within-super-cluster
    argmin — verified by replaying the route in local Python."""
    from go_mapreduce_spark.operators.clustering import (
        assign_nearest_two_level,
        semdedup_supers,
    )

    emb = _grid(spark, n=40)
    k, m = 10, semdedup_supers(10)
    cents = {r.vec_id: list(r.embedding) for r in emb.collect() if r.vec_id <= k}
    sups = {j: cents[j] for j in cents if j <= m}

    def d2(a, b):
        return sum((x - y) * (x - y) for x, y in zip(a, b))

    def route(v):
        return min(sups, key=lambda s: (d2(v, sups[s]), s))

    cmap = {c: route(cents[c]) for c in cents}
    expect = {}
    for r in emb.collect():
        s = route(list(r.embedding))
        members = [c for c in cmap if cmap[c] == s]
        expect[r.vec_id] = min(
            members, key=lambda c: (d2(list(r.embedding), cents[c]), c)
        )

    out = assign_nearest_two_level(emb, _centroids(emb, k), m)
    got = {r.vec_id: r.centroid_id for r in out.collect()}
    assert got == expect


def test_two_level_matches_flat_on_separated_clusters(spark):
    """When clusters are well separated the coarse route is exact, so
    two-level must equal flat nearest-centroid assignment."""
    from go_mapreduce_spark.operators.clustering import (
        assign_nearest,
        assign_nearest_two_level,
        semdedup_supers,
    )

    # 4 far-apart anchor points, 10 jittered members each; ids laid
    # out so vec_id 1..4 are the four anchors (they become both the
    # k=4 centroids and, with m=2, the two super-centroids).
    anchors = [[0.0, 0.0], [100.0, 0.0], [0.0, 100.0], [100.0, 100.0]]
    rows = [(j + 1, [float(x) for x in anchors[j]]) for j in range(4)]
    vid = 5
    for j, a in enumerate(anchors):
        for t in range(10):
            rows.append((vid, [a[0] + 0.1 * t, a[1] - 0.07 * t]))
            vid += 1
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    k = 4
    cents = _centroids(emb, k)
    flat = {
        r.vec_id: r.centroid_id
        for r in assign_nearest(emb, cents).collect()
    }
    two = {
        r.vec_id: r.centroid_id
        for r in assign_nearest_two_level(
            emb, cents, semdedup_supers(k)
        ).collect()
    }
    assert two == flat


def test_two_level_partition_invariant(spark):
    from go_mapreduce_spark.operators.clustering import (
        assign_nearest_two_level,
        semdedup_supers,
    )

    emb = _grid(spark, n=50)
    k, m = 9, semdedup_supers(9)
    a = sorted(
        assign_nearest_two_level(
            emb.repartition(1), _centroids(emb, k), m
        ).collect()
    )
    b = sorted(
        assign_nearest_two_level(
            emb.repartition(11), _centroids(emb, k), m
        ).collect()
    )
    assert a == b


def test_two_level_survives_duplicate_super_embeddings(spark):
    """If super j duplicates super i<j, ties route everything to i —
    the inner join must still assign every vector."""
    from go_mapreduce_spark.operators.clustering import (
        assign_nearest_two_level,
    )

    rows = [
        (1, [0.0, 0.0]),
        (2, [0.0, 0.0]),  # duplicate of super 1
        (3, [50.0, 0.0]),
        (4, [0.1, 0.1]),
        (5, [49.9, 0.2]),
        (6, [25.0, 25.0]),
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = assign_nearest_two_level(emb, _centroids(emb, 3), 2).collect()
    assert len(out) == 6
    got = {r.vec_id: r.centroid_id for r in out}
    # vec 5 is nearest centroid 3, reachable because centroid 3 routes
    # to super 1 only via the duplicate tie-break (never to empty 2)
    assert got[5] == 3 and got[4] == 1
