"""Wave-56 tests: MMR selection semantics — greedy optimality per
step and the diversity/relevance trade-off."""

from __future__ import annotations


def test_x297_each_pick_is_stepwise_argmax(spark, sf_dir):
    """Re-derive every greedy step in Python from the corpus and the
    picked prefix: pick i must maximize λ·rel − (1−λ)·max_sim over
    the remaining candidates (ties to smallest vec_id)."""
    from go_mapreduce_spark.operators import similarity as S
    from go_mapreduce_spark.sources.registry import load_table

    rows = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "embedding"
    ).collect()
    vecs = {r.vec_id: [float(x) for x in r.embedding] for r in rows}
    d = len(next(iter(vecs.values())))
    cent = [sum(v[i] for v in vecs.values()) / len(vecs) for i in range(d)]

    def cos(a, b):
        dot = sum(x * y for x, y in zip(a, b))
        na = sum(x * x for x in a) ** 0.5
        nb = sum(y * y for y in b) ** 0.5
        return dot / (na * nb)

    rel = {vid: cos(v, cent) for vid, v in vecs.items()}
    got = S.x297_mmr_selection(spark, sf_dir).collect()
    assert [r.pick for r in got] == list(range(1, S.MMR_K + 1))
    lam = S.MMR_LAMBDA
    picked = []
    for r in got:
        if not picked:
            best = max(rel, key=lambda vid: (rel[vid], -vid))
            assert r.vec_id == best
            assert abs(r.rel - round(rel[best], 6)) < 1e-5
        else:
            scores = {
                vid: lam * rel[vid]
                - (1 - lam) * max(cos(vecs[vid], vecs[p]) for p in picked)
                for vid in vecs
                if vid not in picked
            }
            best = max(scores, key=lambda vid: (scores[vid], -vid))
            assert r.vec_id == best
            assert abs(r.mmr_score - scores[best]) < 1e-5
            assert -1.0 - 1e-9 <= r.max_sim <= 1.0 + 1e-9
        picked.append(r.vec_id)
    # diversity property: no picked pair is more similar than the
    # most-similar pair overall (sanity that we didn't pick a clone
    # cluster) — and picks are distinct
    assert len(set(picked)) == S.MMR_K
