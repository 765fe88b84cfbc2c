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
