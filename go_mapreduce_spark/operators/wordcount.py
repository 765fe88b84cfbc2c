"""Q1 / X2 — the reference-parity word-count queries.

Q1 is the exact semantics of the reference's example app
(reference wc.go:14-38 driven by RunSequential,
mapreduce/mapreduce.go:289-301): tokenize ``documents.text`` on
non-letter runs, case-sensitive count per token, globally ordered by
word — the sorted-TSV Merge output (mapreduce/mapreduce.go:260-263)
re-expressed as ``orderBy("word")``.

Scale notes: groupBy(word).count() partial-aggregates map-side, so
the shuffle volume is (distinct words × partitions), not total
tokens — the single biggest structural win over the reference, which
ships every (word,"1") pair.  The final orderBy is a range-partitioned
sort (sampled boundaries), i.e. the merge-sort its own TODO asks for
(mapreduce/mapreduce.go:228).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from go_mapreduce_spark.functions.tokenize import word_counts
from go_mapreduce_spark.sources.registry import load_table


def q1_word_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(word, cnt) for every token of documents.text, ordered by word."""
    docs = load_table(spark, sf_dir, "documents").select("text")
    return word_counts(docs).orderBy("word")


def x2_top_tokens(spark: SparkSession, sf_dir: str, k: int = 20) -> DataFrame:
    """Top-k tokens by (cnt desc, word asc) — text-analysis headline.

    Spark plans orderBy().limit(k) as TakeOrderedAndProject: each
    partition keeps a k-element heap and the driver merges — no global
    sort, no full shuffle.  At 100 TB this is the only sane top-k.
    """
    docs = load_table(spark, sf_dir, "documents").select("text")
    return (
        word_counts(docs)
        .orderBy(F.col("cnt").desc(), F.col("word").asc())
        .limit(k)
    )
