"""Wave-36 property tests: silhouette vs pairwise ground truth, SCD2
interval integrity, funnel monotonicity, PMI sanity."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_x238_matches_pairwise_silhouette(spark, sf_dir):
    """The sufficient-statistics silhouette must equal the O(N²)
    pairwise definition (squared-euclidean variant) computed directly
    on the collected vectors."""
    from go_mapreduce_spark.operators import clustering as CL
    from go_mapreduce_spark.sources.registry import load_table

    got = {
        r.label: (r.n_vectors, r.mean_silhouette)
        for r in CL.x238_silhouette(spark, sf_dir).collect()
    }
    rows = load_table(spark, sf_dir, "embeddings").collect()
    vecs = [(r.vec_id, r.label, [float(x) for x in r.embedding]) for r in rows]
    by_label: dict[int, list[list[float]]] = {}
    for _, lab, v in vecs:
        by_label.setdefault(lab, []).append(v)

    def sq(a, b):
        return sum((x - y) ** 2 for x, y in zip(a, b))

    sums: dict[int, list[float]] = {}
    for _, lab, v in vecs:
        a_members = by_label[lab]
        if len(a_members) > 1:
            a = sum(sq(v, u) for u in a_members) / (len(a_members) - 1)
        else:
            a = None
        b = min(
            sum(sq(v, u) for u in mem) / len(mem)
            for other, mem in by_label.items()
            if other != lab
        )
        s = 0.0 if a is None else (b - a) / max(a, b)
        sums.setdefault(lab, []).append(s)
    for lab, ss in sums.items():
        n, mean_s = got[lab]
        assert n == len(ss)
        assert abs(mean_s - sum(ss) / len(ss)) < 1e-4, lab


def test_x239_scd2_intervals_are_sound(spark, sf_dir):
    """Versions are contiguous from 1, exactly one open (current) row
    per user, intervals are ordered and non-overlapping, and adjacent
    runs never share a state (else they'd be one run)."""
    from go_mapreduce_spark.operators import analytics as AN

    rows = AN.x239_scd2_history(spark, sf_dir).collect()
    assert rows
    by_user: dict[int, list] = {}
    for r in rows:
        by_user.setdefault(r.user_id, []).append(r)
    for user, rs in by_user.items():
        rs.sort(key=lambda r: r.version)
        assert [r.version for r in rs] == list(range(1, len(rs) + 1))
        assert sum(1 for r in rs if r.is_current) == 1
        assert rs[-1].is_current and rs[-1].valid_to is None
        for a, b in zip(rs, rs[1:]):
            assert a.valid_to == b.valid_from
            assert a.valid_from <= a.valid_to
            assert a.state != b.state, f"user {user}: unmerged run"


def test_x240_funnel_is_monotone(spark, sf_dir):
    from go_mapreduce_spark.operators import analytics as AN

    rows = sorted(
        AN.x240_timed_funnel(spark, sf_dir).collect(), key=lambda r: r.stage
    )
    assert [r.stage for r in rows] == [1, 2, 3]
    ns = [r.n_users for r in rows]
    assert ns[0] >= ns[1] >= ns[2] >= 0
    assert rows[0].rate_vs_stage1 == 1.0
    assert all(0.0 <= r.rate_vs_stage1 <= 1.0 for r in rows)
    # the bounded funnel can never beat the unbounded one stage-wise
    unbounded = AN.x62_funnel(spark, sf_dir)
    n_stage3 = unbounded.filter(F.col("funnel_stage") >= 3).count()
    assert ns[2] <= n_stage3


def test_x241_pmi_sanity(spark, sf_dir):
    """PMI rows come from the x74 relation (count floor respected),
    values are finite, and the list is rank-ordered."""
    from go_mapreduce_spark.operators import text as T

    rows = T.x241_pmi_pairs(spark, sf_dir).collect()
    assert rows
    assert all(r.n_cooc >= T.SKIPGRAM_MIN_COUNT for r in rows)
    pmis = [r.pmi for r in rows]
    assert pmis == sorted(pmis, reverse=True)
    assert all(abs(p) < 50 for p in pmis)
