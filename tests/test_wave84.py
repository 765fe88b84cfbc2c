"""Wave-84 property tests: SemDeDup keep/drop accounting + planted
near-dups, fertility sanity, Mahalanobis outlier-rate calibration."""

from __future__ import annotations

from pyspark.sql import functions as F

from go_mapreduce_spark.operators import clustering as CL
from go_mapreduce_spark.operators import curation as C
from go_mapreduce_spark.operators import dedup as D


def test_x382_accounting_and_planted_dup(spark, sf_dir):
    rows = D.x382_semdedup(spark, sf_dir).collect()
    assert 0 < len(rows) <= CL.KMEANS_K
    for r in rows:
        assert r.n_kept + r.n_dropped == r.n_vectors
        assert r.n_kept >= 1  # the smallest id in a cluster never drops
    # planted near-dup: a copy of an existing vector must be dropped
    # (same cluster, cosine 1 with a smaller id)
    from go_mapreduce_spark.sources.registry import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    base_total = sum(r.n_vectors for r in rows)
    donor = emb.orderBy("vec_id").limit(1).collect()[0]
    planted = emb.unionByName(
        spark.createDataFrame(
            [(10_000_000, donor.embedding, donor.label)],
            emb.select("vec_id", "embedding", "label").schema,
        ).select(*emb.columns),
        allowMissingColumns=True,
    )
    # re-run the operator body against the planted corpus via the
    # same public pieces
    from go_mapreduce_spark.functions.vectors import cosine_similarity

    cents = planted.filter(F.col("vec_id").between(1, CL.KMEANS_K)).select(
        F.col("vec_id").alias("centroid_id"), F.col("embedding").alias("ce")
    )
    assign = CL.assign_nearest(planted, cents).select("vec_id", "centroid_id")
    vecs = assign.join(planted.select("vec_id", "embedding"), "vec_id")
    a = vecs.select(
        F.col("centroid_id").alias("c"),
        F.col("vec_id").alias("ia"),
        F.col("embedding").alias("va"),
    )
    b = vecs.select(
        F.col("centroid_id").alias("c"),
        F.col("vec_id").alias("ib"),
        F.col("embedding").alias("vb"),
    )
    dropped = (
        a.join(b, "c")
        .filter(F.col("ia") < F.col("ib"))
        .filter(
            cosine_similarity(F.col("va"), F.col("vb")) >= F.lit(D.SEMDEDUP_TAU)
        )
        .select("ib")
        .distinct()
    )
    assert dropped.filter(F.col("ib") == 10_000_000).count() == 1
    assert base_total == emb.count()


def test_x383_fertility_sanity(spark, sf_dir):
    rows = C.x383_tokenizer_fertility(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.n_docs > 0 and r.total_bpe > 0
        # a BPE-ish split never produces fewer tokens than words
        assert r.fertility >= 1.0
        # tokens are at least 1 char and shorter than ~20 chars
        assert 1.0 <= r.chars_per_token < 20.0


def test_x384_outlier_rate_calibration(spark, sf_dir):
    rows = CL.x384_embedding_outliers(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 0 <= r.n_outliers <= r.n_vectors
        assert r.max_z2 > 0
        # fixture embeddings are near-Gaussian per label: the 99% cut
        # should flag a few percent at most, never a mass
        assert r.outlier_rate < 0.10
