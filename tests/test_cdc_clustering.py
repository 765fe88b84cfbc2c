"""Targeted semantics tests for the CDC (merge/SCD2), clustering, and
curation-wave-3 operators — properties the oracle differential can't
see (tie-breaks, empty clusters, action partitioning, planted
contamination)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


# ---------------------------------------------------------------------------
# merge_upsert
# ---------------------------------------------------------------------------


def test_merge_covers_all_three_actions(spark):
    from go_mapreduce_spark.operators.cdc import merge_upsert

    target = spark.createDataFrame(
        [(1, 10.0), (2, 20.0)], "k bigint, bal double"
    )
    source = spark.createDataFrame(
        [(2, 5.0), (3, 7.0)], "k bigint, delta double"
    )
    out = merge_upsert(
        target,
        source,
        "k",
        update_cols={
            "bal": F.when(F.col("action") == "insert", F.col("delta"))
            .when(F.col("action") == "keep", F.col("bal"))
            .otherwise(F.col("bal") + F.col("delta"))
        },
    )
    rows = {r.k: (r.action, r.bal) for r in out.collect()}
    assert rows == {1: ("keep", 10.0), 2: ("update", 25.0), 3: ("insert", 7.0)}


def test_x54_actions_partition_the_keyspace(spark, sf_dir):
    """Every output key appears once; actions match the target/source
    membership exactly."""
    from go_mapreduce_spark.queries import QUERIES

    out = QUERIES["x54_merge_upsert"](spark, sf_dir)
    rows = out.collect()
    keys = [r.cust_key for r in rows]
    assert len(keys) == len(set(keys)), "merge output must be keyed"
    for r in rows:
        if r.action == "insert":
            assert r.cust_key % 2 == 1 and r.n_orders > 0
        elif r.action == "keep":
            assert r.cust_key % 2 == 0 and r.n_orders == 0
        else:
            assert r.cust_key % 2 == 0 and r.n_orders > 0


# ---------------------------------------------------------------------------
# SCD2
# ---------------------------------------------------------------------------


def test_scd2_intervals_tile_the_timeline(spark, sf_dir):
    """Per entity: exactly one open (current) interval; closed
    intervals chain valid_to == next valid_from with no overlap."""
    from go_mapreduce_spark.queries import QUERIES

    out = QUERIES["x55_scd2_intervals"](spark, sf_dir)
    by_user: dict[int, list] = {}
    for r in out.collect():
        by_user.setdefault(r.user_id, []).append(r)
    assert by_user
    for rows in by_user.values():
        # declared order is (valid_from, event_id) within user
        assert sum(1 for r in rows if r.is_current) == 1
        assert rows[-1].is_current and rows[-1].valid_to is None
        for a, b in zip(rows, rows[1:]):
            assert a.valid_to == b.valid_from


# ---------------------------------------------------------------------------
# k-means
# ---------------------------------------------------------------------------


def _clustered_embeddings(spark, n_clusters=5, per_cluster=40, dim=16, spread=0.05):
    import random

    rng = random.Random(11)
    rows = []
    vid = 0
    for c in range(n_clusters):
        center = [rng.gauss(0, 1) for _ in range(dim)]
        for _ in range(per_cluster):
            rows.append(
                (vid, c, [float(x + rng.gauss(0, spread)) for x in center])
            )
            vid += 1
    return spark.createDataFrame(
        rows, "vec_id long, true_cluster int, embedding array<float>"
    )


def test_kmeans_recovers_planted_clusters(spark):
    from go_mapreduce_spark.operators.clustering import kmeans_fit

    df = _clustered_embeddings(spark)
    cents, assign = kmeans_fit(df, k=5, max_iter=15)
    joined = assign.join(df.select("vec_id", "true_cluster"), "vec_id")
    # purity: majority-label fraction per assigned cluster
    maj = (
        joined.groupBy("centroid_id", "true_cluster")
        .count()
        .groupBy("centroid_id")
        .agg(F.max("count").alias("maj"), F.sum("count").alias("tot"))
        .collect()
    )
    frac = sum(r.maj for r in maj) / sum(r.tot for r in maj)
    assert frac >= 0.95, f"cluster purity {frac}"


def test_kmeans_centroids_partition_invariant(spark):
    """Exact-decimal mean sums: training is bit-identical at any
    input partitioning."""
    from go_mapreduce_spark.operators.clustering import kmeans_fit

    df = _clustered_embeddings(spark, n_clusters=3, per_cluster=20)
    c1, _ = kmeans_fit(df.repartition(1), k=3, max_iter=4)
    c2, _ = kmeans_fit(df.repartition(7), k=3, max_iter=4)
    assert c1 == c2


def test_assign_nearest_breaks_ties_to_lower_centroid(spark):
    from go_mapreduce_spark.operators.clustering import assign_nearest

    corpus = spark.createDataFrame(
        [(1, [0.0, 0.0])], "vec_id long, embedding array<float>"
    )
    cents = spark.createDataFrame(
        [(7, [1.0, 0.0]), (3, [0.0, 1.0]), (9, [0.0, -1.0])],
        "centroid_id int, ce array<double>",
    )
    row = assign_nearest(corpus, cents).collect()[0]
    assert row.centroid_id == 3 and row.d2 == pytest.approx(1.0)


# ---------------------------------------------------------------------------
# decontamination + token budget
# ---------------------------------------------------------------------------


def test_decontaminate_flags_planted_copy(spark, tmp_path):
    """A train doc that copies a holdout doc verbatim must score
    contamination 1.0; an unrelated doc must score 0."""
    from go_mapreduce_spark.operators.curation import x52_decontaminate

    bench_text = "the quick brown fox jumps over the lazy dog again and again"
    rows = [
        (10, "en", bench_text),                       # holdout (id % 10 == 0)
        (11, "en", bench_text),                       # verbatim copy → 1.0
        (12, "en", "completely different words about spark and parquet files"),
    ]
    spark.createDataFrame(rows, "doc_id long, lang string, text string") \
        .write.parquet(str(tmp_path / "documents.parquet"))
    out = {r.doc_id: r for r in x52_decontaminate(spark, str(tmp_path)).collect()}
    assert set(out) == {11, 12}
    assert out[11].contamination == pytest.approx(1.0) and out[11].flagged
    assert out[12].contamination == 0.0 and not out[12].flagged


def test_token_budget_stops_after_crossing(spark, sf_dir):
    """Per language: admitted docs are a doc_id-ordered prefix, the
    budget is exhausted only by the last admitted doc."""
    from go_mapreduce_spark.operators.curation import MIX_TOKEN_BUDGET
    from go_mapreduce_spark.queries import QUERIES

    out = QUERIES["x53_token_budget_mix"](spark, sf_dir)
    by_lang: dict[str, list] = {}
    for r in out.collect():
        by_lang.setdefault(r.lang, []).append(r)
    assert by_lang
    for rows in by_lang.values():
        for a, b in zip(rows, rows[1:]):
            assert b.cum_before == a.cum_before + a.n_tokens
        for r in rows:
            assert r.cum_before < MIX_TOKEN_BUDGET
