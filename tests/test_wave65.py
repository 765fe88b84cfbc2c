"""Wave-65 property tests: Laplace-mechanism invariants, SRM chi²
identity, survivorship policy correctness."""

from __future__ import annotations

from go_mapreduce_spark.operators import curation as C
from go_mapreduce_spark.operators import dedup as D
from go_mapreduce_spark.operators import stats as ST


def test_x328_dp_mechanism(spark, sf_dir):
    rows = C.x328_dp_noisy_counts(spark, sf_dir).collect()
    assert len(rows) == 25  # one released cell per nation
    for r in rows:
        assert abs(r.noisy_n - (r.true_n + r.noise)) < 2e-6
        # Laplace(b=1/eps) tail: |noise| beyond 20b has p < 1e-8
        assert abs(r.noise) < 20.0 / C.DP_EPSILON
    # the draw is a pure function of the cell key: re-run is identical
    again = C.x328_dp_noisy_counts(spark, sf_dir).collect()
    assert [tuple(r) for r in rows] == [tuple(r) for r in again]
    # noise is not degenerate: not all draws on one side of zero
    signs = {r.noise > 0 for r in rows}
    assert signs == {True, False}


def test_x329_srm_identity(spark, sf_dir):
    r = ST.x329_srm_check(spark, sf_dir).collect()[0]
    assert r.n_a + r.n_b == r.n
    e = r.n / 2.0
    chi2 = (r.n_a - e) ** 2 / e + (r.n_b - e) ** 2 / e
    assert abs(r.chi2 - chi2) < 1e-4
    # a content-hash 50/50 split of the fixture must NOT trip SRM
    assert not r.srm_detected


def test_x330_survivor_policy(spark, sf_dir):
    from go_mapreduce_spark.operators.text import x9_quality_score

    surv = D.x330_cluster_survivor(spark, sf_dir).collect()
    assert surv
    clusters = {
        r.doc_id: r.cluster_id
        for r in D.x27_dedup_clusters(spark, sf_dir).collect()
    }
    quality = {
        r.doc_id: r.quality for r in x9_quality_score(spark, sf_dir).collect()
    }
    by_cluster: dict[int, list[int]] = {}
    for doc, cl in clusters.items():
        by_cluster.setdefault(cl, []).append(doc)
    assert len(surv) == len(by_cluster)
    for r in surv:
        members = by_cluster[r.cluster_id]
        assert r.n_members == len(members)
        assert r.n_dropped == len(members) - 1
        best = max(quality[d] for d in members)
        assert abs(r.survivor_quality - best) < 1e-9
        assert quality[r.survivor_doc_id] == r.survivor_quality
        assert abs(r.worst_quality - min(quality[d] for d in members)) < 1e-9
