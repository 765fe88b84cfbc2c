"""Text-analysis unit tests: tokenizer parity cases, empty/edge
inputs, deterministic lang-id tie-breaks."""

from __future__ import annotations

from pyspark.sql import functions as F

from go_mapreduce_spark.functions.tokenize import tokens, word_counts
from go_mapreduce_spark.operators.dedup import lower_tokens


def _toks(spark, text, fn=tokens):
    df = spark.createDataFrame([(text,)], "text string")
    return df.select(fn(F.col("text")).alias("t")).collect()[0].t


def test_tokenizer_reference_semantics(spark):
    """wc.go:14-26 — split on non-letter runs, keep case, drop empties."""
    assert _toks(spark, "Hello, world! HELLO") == ["Hello", "world", "HELLO"]
    assert _toks(spark, "a1b2c") == ["a", "b", "c"]
    assert _toks(spark, "...") == []
    assert _toks(spark, "") == []
    assert _toks(spark, "don't stop") == ["don", "t", "stop"]


def test_lower_tokens_casefold(spark):
    assert _toks(spark, "Hello WORLD", lower_tokens) == ["hello", "world"]


def test_word_counts_case_sensitive(spark):
    df = spark.createDataFrame([("the The THE the",)], "text string")
    out = {r.word: r.cnt for r in word_counts(df).collect()}
    assert out == {"the": 2, "The": 1, "THE": 1}


def test_word_counts_empty_corpus(spark):
    df = spark.createDataFrame([("...",), ("",)], "text string")
    assert word_counts(df).count() == 0


def test_tfidf_cosine_properties(spark, sf_dir):
    """x66 invariants: canonical pair orientation, cosine in (0, 1],
    and near-dup pairs (x6 jaccard >= 0.8) score near-perfect TF-IDF
    cosine (shared rare vocabulary dominates both vectors)."""
    from go_mapreduce_spark.operators.dedup import x6_dedup_ngram_jaccard
    from go_mapreduce_spark.operators.text import x66_tfidf_cosine

    rows = x66_tfidf_cosine(spark, sf_dir).collect()
    assert rows, "fixture corpus must produce at least one similar pair"
    for r in rows:
        assert r.doc_a < r.doc_b
        assert 0.0 < r.cosine <= 1.0 + 1e-9
    # near-dup pairs are covered only when they share df-capped RARE
    # tokens (the cap strips template vocabulary at fixture scale) —
    # but any covered pair must score near-perfect cosine
    sim = {(r.doc_a, r.doc_b): r.cosine for r in rows}
    neardups = x6_dedup_ngram_jaccard(spark, sf_dir, 0.8).collect()
    assert neardups
    covered = [
        sim[(nd.doc_a, nd.doc_b)] for nd in neardups if (nd.doc_a, nd.doc_b) in sim
    ]
    assert covered, "some near-dup pair must survive the df cap"
    assert min(covered) > 0.9


def test_trigram_lm_is_consistent(spark, sf_dir):
    """c3 <= c2, p = c3/c2, and the visible probability mass per
    context never exceeds 1 (rows under min-count are hidden)."""
    from go_mapreduce_spark.operators.text import x70_trigram_lm

    rows = x70_trigram_lm(spark, sf_dir).collect()
    assert rows
    mass: dict[str, float] = {}
    for r in rows:
        assert 0 < r.c3 <= r.c2
        assert abs(r.p - r.c3 / r.c2) < 5e-7  # p is round(·, 6)
        mass[r.ctx] = mass.get(r.ctx, 0.0) + r.p
    assert max(mass.values()) <= 1.0 + 1e-9
