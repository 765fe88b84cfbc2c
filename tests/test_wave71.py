"""Wave-71 property tests: kNN eval probe accounting and majority
semantics on a planted corpus."""

from __future__ import annotations

from go_mapreduce_spark.operators import similarity as S


def test_x344_probe_accounting(spark, sf_dir):
    rows = S.x344_knn_eval(spark, sf_dir).collect()
    assert rows
    total = sum(r.n_probes for r in rows)
    assert total == S.KNN_EVAL_PROBES
    for r in rows:
        assert 0 <= r.n_correct <= r.n_probes
        assert abs(r.accuracy - r.n_correct / r.n_probes) < 1e-6


def test_x344_majority_on_planted_clusters(spark):
    # 3 tight clusters, one probe each: kNN must recover every label
    import random

    rng = random.Random(11)
    rows = []
    vid = 0
    for label in range(3):
        center = [rng.gauss(0, 1) for _ in range(8)]
        for _ in range(10):
            vec = [c + rng.gauss(0, 0.01) for c in center]
            rows.append((vid, [float(x) for x in vec], label))
            vid += 1
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label long")
    probes = emb.filter("vec_id % 10 = 0").selectExpr(
        "vec_id as query_id", "embedding as qe"
    )
    train = emb.filter("vec_id % 10 != 0")
    topk = S.brute_force_topk(train, probes, k=5)
    import pyspark.sql.functions as F

    got = (
        topk.join(
            train.selectExpr("vec_id as neighbor_id", "label as nb_label"),
            "neighbor_id",
        )
        .groupBy("query_id")
        .agg(F.mode("nb_label").alias("pred"))
        .collect()
    )
    for r in got:
        assert r.pred == r.query_id // 10
