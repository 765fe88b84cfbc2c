"""Tokenization — the reference's word-count Map semantics, JVM-side.

The reference tokenizer splits text on maximal runs of non-letters
(``unicode.IsLetter``), case-sensitive, and emits ``(word, "1")``
(reference wc.go:14-26).  Fixtures are ASCII (FIXTURES.md), so the
portable pin is ``[A-Za-z]+`` runs — identical semantics in Go,
Java regex (Spark) and DuckDB's regex engine.

Everything here is built-in-function composition (split/explode/
filter): it stays inside WholeStageCodegen, no Python in the hot
path.  At 100 TB this is the difference between a tokenize that runs
at scan speed and one bottlenecked on Python serialization.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Split on non-letter runs; pinned to ASCII letters for cross-engine parity.
NON_LETTER_RE = "[^A-Za-z]+"


def tokens(text: Column) -> Column:
    """Array of tokens of a text column (empty tokens removed).

    ``split`` on a leading delimiter yields a leading empty string and
    a trailing one for a trailing delimiter; ``filter(len>0)`` drops
    both, matching the reference's skip of empty fields
    (wc.go:19-25).
    """
    return F.filter(F.split(text, NON_LETTER_RE), lambda t: F.length(t) > 0)


def explode_tokens(df: DataFrame, text_col: str = "text", out_col: str = "token") -> DataFrame:
    """One row per token — the Map phase of word count (R2+R13)."""
    return df.select(F.explode(tokens(F.col(text_col))).alias(out_col))


def word_counts(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Reference word count (R13+R14): token -> case-sensitive count.

    ``groupBy().count()`` gives map-side partial aggregation
    automatically — unlike the reference, which ships every
    ``(word,"1")`` pair through its JSON shuffle
    (mapreduce/mapreduce.go:151-167).
    """
    return (
        explode_tokens(df, text_col, "word")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
