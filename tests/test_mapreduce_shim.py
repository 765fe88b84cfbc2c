"""Reference-parity tests for the MapReduce shim (SURVEY.md §5.2.2).

The corpus is documents.text materialized as a plain-text file (one
doc per line, ordered by doc_id) — driving the shim exactly as
RunSequential drives the reference (FIXTURES.md 'Reference-parity
input')."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from go_mapreduce_spark.mapreduce import (
    run_map_reduce,
    wc_map,
    wc_reduce,
    word_count,
    word_count_df,
    write_merged_tsv,
)
from go_mapreduce_spark.operators.wordcount import q1_word_count
from go_mapreduce_spark.sources.registry import load_table


@pytest.fixture(scope="module")
def corpus_file(spark, sf_dir, tmp_path_factory):
    path = tmp_path_factory.mktemp("corpus") / "documents.txt"
    rows = (
        load_table(spark, sf_dir, "documents")
        .orderBy("doc_id")
        .select("text")
        .collect()
    )
    path.write_text("\n".join(r.text for r in rows) + "\n")
    return str(path)


def test_wordcount_shim_matches_dataframe_engine(spark, sf_dir, corpus_file):
    """RDD shim (reference semantics) == DataFrame word count (Q1)."""
    shim = {(r.word, r.cnt) for r in word_count_df(spark, corpus_file).collect()}
    df = {(r.word, r.cnt) for r in q1_word_count(spark, sf_dir).collect()}
    assert shim == df


def test_shim_output_globally_sorted(spark, corpus_file):
    """Merge parity: output must be globally key-sorted
    (mapreduce.go:250-254)."""
    keys = [k for k, _ in word_count(spark, corpus_file).collect()]
    assert keys == sorted(keys)


def test_shim_respects_partition_counts(spark, corpus_file):
    out = word_count(spark, corpus_file, n_map=4, n_reduce=2)
    # nReduce reducers before the merge sort (Job.NReduce parity)
    assert out.getNumPartitions() >= 1  # sortByKey repartitions by range
    counts = dict(out.collect())
    assert sum(int(v) for v in counts.values()) > 0


def test_shim_tsv_sink(spark, corpus_file, tmp_path):
    out_dir = str(tmp_path / "mrtmp_out")
    write_merged_tsv(word_count(spark, corpus_file), out_dir)
    files = [f for f in os.listdir(out_dir) if f.startswith("part-")]
    assert len(files) == 1, "Merge writes a single output file"
    lines = open(os.path.join(out_dir, files[0])).read().splitlines()
    assert all("\t" in ln for ln in lines)
    keys = [ln.split("\t")[0] for ln in lines]
    assert keys == sorted(keys)


def test_custom_map_reduce_fns(spark, corpus_file):
    """The shim is generic: a different (Map, Reduce) pair — per-letter
    counts with max-length values."""

    def m(text):
        for w in text.split():
            yield (w[0], str(len(w)))

    def r(key, values):
        return str(max(int(v) for v in values))

    result = dict(run_map_reduce(spark, corpus_file, m, r, n_map=3, n_reduce=2).collect())
    assert result  # non-empty
    assert all(int(v) > 0 for v in result.values())


def test_empty_input(spark, tmp_path):
    p = tmp_path / "empty.txt"
    p.write_text("")
    assert word_count(spark, str(p), n_map=2, n_reduce=2).collect() == []
