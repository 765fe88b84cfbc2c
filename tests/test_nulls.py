"""Null/edge-input robustness: the fixtures are null-free, but a real
corpus is not — operators must not throw or silently drop rows on
null text/values (ANSI mode is ON in Spark 4, so unguarded nulls and
division edge cases fail loudly; these tests pin the guarded
behavior)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from go_mapreduce_spark.functions.tokenize import word_counts
from go_mapreduce_spark.operators.dedup import doc_shingles, simhash_signatures
from go_mapreduce_spark.functions.vectors import cosine_similarity


def test_word_counts_null_text(spark):
    df = spark.createDataFrame(
        [(1, "hello world"), (2, None), (3, "")], "doc_id long, text string"
    )
    out = {r.word: r.cnt for r in word_counts(df).collect()}
    assert out == {"hello": 1, "world": 1}


def test_shingles_null_text(spark):
    df = spark.createDataFrame(
        [(1, None), (2, "one two three four")], "doc_id long, text string"
    )
    got = doc_shingles(df).groupBy("doc_id").count().collect()
    assert {r.doc_id for r in got} == {2}


def test_simhash_null_text(spark):
    df = spark.createDataFrame(
        [(1, None), (2, "alpha beta gamma")], "doc_id long, text string"
    )
    sigs = simhash_signatures(df).collect()
    assert {r.doc_id for r in sigs} == {2}


def test_cosine_null_embedding_yields_null(spark):
    df = spark.createDataFrame(
        [(1, [1.0, 0.0], [1.0, 0.0]), (2, None, [1.0, 0.0])],
        "id long, a array<double>, b array<double>",
    )
    rows = {r.id: r.s for r in df.select("id", cosine_similarity(F.col("a"), F.col("b")).alias("s")).collect()}
    assert abs(rows[1] - 1.0) < 1e-12
    assert rows[2] is None  # null in → null out, no crash


def test_groupby_null_keys_form_a_group(spark):
    df = spark.createDataFrame(
        [(None, 1.0), (None, 2.0), ("a", 3.0)], "k string, v double"
    )
    out = {r.k: r.s for r in df.groupBy("k").agg(F.sum("v").alias("s")).collect()}
    assert out[None] == 3.0 and out["a"] == 3.0


def test_curation_ops_on_null_and_empty_text(spark, tmp_path):
    """BPE counting, repetition scoring, and PII audit must survive
    null/empty text without throwing (ANSI mode) and without emitting
    surprise values for present docs."""
    import os

    from go_mapreduce_spark.operators import curation as C

    d = str(tmp_path / "docs")
    spark.createDataFrame(
        [(1, "alice@example.com called 1234567 twice", "en"),
         (2, None, "en"),
         (3, "", "en"),
         (4, "plain words only here now", "en")],
        "doc_id long, text string, lang string",
    ).write.mode("overwrite").parquet(os.path.join(d, "documents.parquet"))

    bpe = {r.doc_id: (r.n_bpe_tokens, r.n_ws_tokens)
           for r in C.x39_bpe_token_count(spark, d).collect()}
    assert bpe[4][1] == 5 and bpe[4][0] >= 5
    assert 1 in bpe  # email doc tokenizes without error

    rep = {r.doc_id: r.dup_frac for r in C.x49_repetition_score(spark, d).collect()}
    assert rep[4] == 0.0
    assert rep.get(2, 0.0) == 0.0 and rep.get(3, 0.0) == 0.0  # null/empty → 0 by contract

    pii = {r.doc_id: (r.n_emails, r.n_longnums, r.chars_removed)
           for r in C.x50_redact_pii(spark, d).collect()}
    assert pii[1][0] == 1 and pii[1][1] == 1 and pii[1][2] > 0
    assert pii[4] == (0, 0, 0)


def test_wave3_curation_ops_on_null_and_empty_text(spark, tmp_path):
    """Decontamination, token budgeting, and chunking on null/empty
    text: no throw (ANSI), documented per-op contracts — x52 keeps
    degenerate train docs with zeroes, x60 drops token-less docs,
    x53 passes a null token count through (cumsum treats it as 0)."""
    import os

    from go_mapreduce_spark.operators import curation as C

    d = str(tmp_path / "docs")
    spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog", "en"),
         (2, None, "en"),
         (3, "", "en"),
         (10, "benchmark holdout text lives here today", "en")],
        "doc_id long, text string, lang string",
    ).write.mode("overwrite").parquet(os.path.join(d, "documents.parquet"))

    dec = {r.doc_id: (r.n_shingles, r.contamination, r.flagged)
           for r in C.x52_decontaminate(spark, d).collect()}
    assert set(dec) == {1, 2, 3}  # holdout doc 10 excluded, degenerates kept
    assert dec[2] == (0, 0.0, False) and dec[3] == (0, 0.0, False)
    assert dec[1][0] > 0

    mix = {r.doc_id: r.n_tokens for r in C.x53_token_budget_mix(spark, d).collect()}
    assert mix[2] is None and mix[3] == 0  # null text → null count, empty → 0

    chunks = {r.doc_id for r in C.x60_chunk_documents(spark, d).collect()}
    assert chunks == {1, 10}  # token-less docs produce no chunks


def test_assign_nearest_null_embedding(spark):
    """Null vector → null distance, no crash; valid vectors assign."""
    from go_mapreduce_spark.operators.clustering import assign_nearest

    corpus = spark.createDataFrame(
        [(1, [0.0, 0.0]), (2, None)], "vec_id long, embedding array<float>"
    )
    cents = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [0.0, 3.0])], "centroid_id int, ce array<double>"
    )
    got = {r.vec_id: (r.centroid_id, r.d2) for r in assign_nearest(corpus, cents).collect()}
    assert got[1] == (0, 1.0)
    assert got[2][1] is None


def test_scd2_null_timestamp_rows_survive(spark):
    """A null change-ts row must not crash interval derivation (it
    sorts first in its entity's history under Spark's NULLS FIRST)."""
    import datetime

    from go_mapreduce_spark.operators.cdc import scd2_intervals

    t0 = datetime.datetime(2024, 1, 1, 12, 0, 0)
    df = spark.createDataFrame(
        [(1, 100, None, 1.0), (1, 101, t0, 2.0)],
        "user_id long, event_id long, ts timestamp, value double",
    )
    rows = scd2_intervals(df, "user_id", "ts", "event_id").orderBy("event_id").collect()
    assert rows[0].valid_to == t0 and rows[1].is_current


def test_round3_text_ops_on_null_and_empty_text(spark, tmp_path):
    """x66/x70/x73/x74 on null/empty text: no throw, null-text docs
    contribute no tokens (explode of a null/empty array emits no
    rows) and therefore no pairs/ngrams/scores."""
    import os

    from go_mapreduce_spark.operators import text as T

    d = str(tmp_path / "docs")
    spark.createDataFrame(
        [(1, "alpha beta gamma alpha beta gamma alpha beta gamma", "en"),
         (2, None, "en"),
         (3, "", "en"),
         (4, "alpha beta gamma alpha beta gamma alpha beta gamma", "en")],
        "doc_id long, text string, lang string",
    ).write.mode("overwrite").parquet(os.path.join(d, "documents.parquet"))

    sim = T.x66_tfidf_cosine(spark, d).collect()
    assert {(r.doc_a, r.doc_b) for r in sim} <= {(1, 4)}

    lm = T.x70_trigram_lm(spark, d).collect()
    assert all(r.c3 >= T.TRIGRAM_MIN_COUNT for r in lm)

    bm = T.x73_bm25(spark, d).collect()
    assert {r.doc_id for r in bm} == {1, 4}  # token-less docs emit no terms

    sg = T.x74_skipgram_cooc(spark, d).collect()
    assert all(r.n >= T.SKIPGRAM_MIN_COUNT for r in sg)
    assert {("alpha", "beta"), ("beta", "gamma")} <= {(r.w_left, r.w_right) for r in sg}


def test_grouped_mode_and_unpivot_null_inputs(spark, tmp_path):
    """x67-style mode with a null group key forms its own group; x68
    unpivot carries null measure values through to the aggregate
    guard (dsum skips nulls)."""
    from pyspark.sql.window import Window

    df = spark.createDataFrame(
        [(None, "click"), (None, "click"), (None, "view"), (7, "view")],
        "user_id bigint, event_type string",
    )
    counts = df.groupBy("user_id", "event_type").agg(F.count(F.lit(1)).alias("n"))
    w = Window.partitionBy("user_id").orderBy(F.col("n").desc(), F.col("event_type").asc())
    out = {
        r.user_id: r.event_type
        for r in counts.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .collect()
    }
    assert out[None] == "click" and out[7] == "view"

    from go_mapreduce_spark.functions.numeric import dsum

    m = spark.createDataFrame(
        [("A", 1.0, None), ("A", 2.0, 5.0)], "k string, m1 double, m2 double"
    ).unpivot(ids=["k"], values=["m1", "m2"], variableColumnName="measure", valueColumnName="val")
    agg = {
        (r.k, r.measure): (r.n, r.s)
        for r in m.groupBy("k", "measure")
        .agg(F.count(F.lit(1)).alias("n"), dsum(F.col("val"), "s"))
        .collect()
    }
    assert agg[("A", "m1")] == (2, 3.0)
    assert agg[("A", "m2")][0] == 2 and agg[("A", "m2")][1] == 5.0


def test_wave4_text_ops_on_null_and_empty_text(spark, tmp_path):
    """x81 entropy, x84 sorted-neighborhood, x91 perplexity on
    null/empty text: token-less docs drop out cleanly (no throw, no
    phantom rows); null-normalized docs block together without
    crashing levenshtein."""
    import os

    from go_mapreduce_spark.operators import dedup as D
    from go_mapreduce_spark.operators import text as T

    d = str(tmp_path / "docs")
    spark.createDataFrame(
        [(1, "alpha beta gamma delta", "en", "s", 22),
         (2, None, "en", "s", 0),
         (3, "", "en", "s", 0),
         (4, "alpha beta gamma delta", "en", "s", 22),
         (5, "12345 67890", "en", "s", 11)],  # digits-only -> zero tokens
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.mode("overwrite").parquet(os.path.join(d, "documents.parquet"))

    ent = {r.doc_id for r in T.x81_token_entropy(spark, d).collect()}
    assert ent == {1, 4}

    ppl = {r.doc_id: r for r in T.x91_doc_perplexity(spark, d).collect()}
    assert set(ppl) == {1, 4}
    assert all(r.cross_entropy == 0.0 for r in ppl.values())  # twin docs

    # null text normalizes to null norm; empty/digits to '' — the
    # window over block must not throw and the twins must pair at 0
    pairs = D.x84_sorted_neighborhood(spark, d).collect()
    assert {(p.doc_id_a, p.doc_id_b, p.dist) for p in pairs} >= {(1, 4, 0)}


def test_wave4_analytics_on_null_values(spark, tmp_path):
    """x83 fences and x94 moments on null event values / measures:
    aggregates skip nulls, comparisons don't throw under ANSI."""
    import os

    from go_mapreduce_spark.operators import analytics as AN

    d = str(tmp_path / "ev")
    spark.createDataFrame(
        [(1, "2024-01-01 00:00:00", 1, "a", 1.0, "{}"),
         (2, "2024-01-01 00:00:01", 1, "a", None, "{}"),
         (3, "2024-01-01 00:00:02", 1, "a", 100.0, "{}"),
         (4, "2024-01-01 00:00:03", 1, "a", 2.0, "{}")],
        "event_id long, ts string, user_id long, event_type string, value double, props string",
    ).withColumn("ts", F.col("ts").cast("timestamp")).write.mode(
        "overwrite"
    ).parquet(os.path.join(d, "events.parquet"))

    out = AN.x83_iqr_outliers(spark, d).collect()
    assert len(out) == 1
    # null value is neither an outlier nor inside — but IS counted in n_total
    assert out[0].n_total == 4
    assert out[0].n_outliers in (0, 1)
