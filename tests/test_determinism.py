"""Determinism properties behind the oracle gate:

1. Tokenizer parity fuzz: Spark split/filter == DuckDB
   regexp_split_to_array == Python re on adversarial ASCII inputs.
2. Partition-count invariance: decimal-sum aggregates produce
   IDENTICAL bits at any parallelism (the property plain double sums
   lack, and the reason functions/numeric.py exists).
"""

from __future__ import annotations

import os
import random
import re
import string

import duckdb
import pytest
from pyspark.sql import functions as F

from go_mapreduce_spark.functions.tokenize import tokens
from go_mapreduce_spark.operators.relational import q2_grouped_agg, q5_multiway_join
from tests.conftest import canon_rows


def _fuzz_corpus(n=300):
    rng = random.Random(20240813)
    alphabet = string.ascii_letters + string.digits + string.punctuation + " \t"
    docs = []
    for i in range(n):
        length = rng.randrange(0, 80)
        docs.append((i, "".join(rng.choice(alphabet) for _ in range(length))))
    # adversarial edges
    docs += [
        (n, ""), (n + 1, "abc"), (n + 2, "   "), (n + 3, "a" * 500),
        (n + 4, "!!!"), (n + 5, "a!b!c!"), (n + 6, "!leading"), (n + 7, "trailing!"),
    ]
    return docs


def test_tokenizer_three_way_parity(spark):
    docs = _fuzz_corpus()
    sdf = spark.createDataFrame(docs, "doc_id long, text string")
    spark_toks = {
        r.doc_id: r.t
        for r in sdf.select("doc_id", tokens(F.col("text")).alias("t")).collect()
    }
    con = duckdb.connect()
    con.execute("CREATE TABLE d(doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO d VALUES (?, ?)", docs)
    duck_toks = {
        k: v
        for k, v in con.execute(
            "SELECT doc_id, list_filter(regexp_split_to_array(text, '[^A-Za-z]+'),"
            " t -> len(t) > 0) FROM d"
        ).fetchall()
    }
    py_toks = {i: [t for t in re.split(r"[^A-Za-z]+", s) if t] for i, s in docs}
    assert spark_toks == py_toks
    assert duck_toks == py_toks


@pytest.mark.parametrize("parts", [1, 7, 32])
def test_aggregates_invariant_to_partitioning(spark, sf_dir, parts):
    old = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", str(parts))
    try:
        q2 = q2_grouped_agg(spark, sf_dir)
        rows2 = canon_rows(q2.columns, [tuple(r) for r in q2.collect()])
        q5 = q5_multiway_join(spark, sf_dir)
        rows5 = canon_rows(q5.columns, [tuple(r) for r in q5.collect()])
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)
    # compare against the module-level reference run (default partitions)
    ref2 = q2_grouped_agg(spark, sf_dir)
    ref5 = q5_multiway_join(spark, sf_dir)
    assert rows2 == canon_rows(ref2.columns, [tuple(r) for r in ref2.collect()])
    assert rows5 == canon_rows(ref5.columns, [tuple(r) for r in ref5.collect()])
    # and the doubles are bit-identical, not just 12-digit-identical
    vals = {r.l_returnflag + r.l_linestatus: r.sum_base_price for r in q2.collect()}
    ref_vals = {r.l_returnflag + r.l_linestatus: r.sum_base_price for r in ref2.collect()}
    assert vals == ref_vals


def test_stream_replays_invariant_to_state_partitioning(spark, sf_dir, monkeypatch):
    """The drained result of the stateful stream replays must not
    depend on the state-store partition count (one store instance per
    shuffle partition — count changes task layout, never results)."""
    from go_mapreduce_spark.streaming import events as SE

    results = {}
    for parts in (2, 8):
        monkeypatch.setattr(SE, "REPLAY_SHUFFLE_PARTITIONS", parts)
        totals = {
            tuple(r)
            for r in SE.x134_stateful_totals(spark, sf_dir).collect()
        }
        lj = {
            tuple(r)
            for r in SE.x135_stream_left_join(spark, sf_dir).collect()
        }
        results[parts] = (totals, lj)
    assert results[2] == results[8]


# Reference results at the session default partitioning, computed once
# per suite run and shared by every parametrized arm below — each arm
# previously recomputed the whole reference pass (~half its wall).
_REF_CACHE: dict = {}


def _refs_at_default(spark, sf_dir, names):
    missing = [n for n in names if n not in _REF_CACHE]
    if missing:
        from go_mapreduce_spark.queries import QUERIES

        for n in missing:
            df = QUERIES[n](spark, sf_dir)
            _REF_CACHE[n] = canon_rows(df.columns, [tuple(r) for r in df.collect()])
    return {n: _REF_CACHE[n] for n in names}


# The non-default arm (3) proves partition invariance on every run; the
# second arm (16) is redundant with it for the catch-a-regression
# purpose (any partition-sensitive expression already differs at 3) and
# runs in the opt-in full sweep, same policy as the full plan lints.
_PART_ARMS = [3, 16] if os.environ.get("SPARK_GRAFT_FULL_SWEEP") else [3]


@pytest.mark.parametrize("parts", _PART_ARMS)
def test_round4_queries_invariant_to_partitioning(spark, sf_dir, parts):
    """Wave 14–16 additions under the same invariance bar: decimal
    thresholds (x153), decimal-equality ties (x159), traversal loops
    (x164/x165 — internally pinned, so the SESSION partition count
    must be irrelevant by construction), and the incrementally
    maintained MV (x169)."""
    from go_mapreduce_spark.queries import QUERIES

    names = [
        "x153_important_part_value",
        "x159_top_supplier",
        "x164_khop_reachability",
        "x165_cheapest_path",
        "x169_incremental_mv",
    ]
    refs = _refs_at_default(spark, sf_dir, names)
    old = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", str(parts))
    try:
        for n in names:
            df = QUERIES[n](spark, sf_dir)
            got = canon_rows(df.columns, [tuple(r) for r in df.collect()])
            assert got == refs[n], f"{n} varies with shuffle partitions"
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)


def test_new_stream_replays_invariant_to_state_partitioning(
    spark, sf_dir, monkeypatch
):
    """x166 (full-outer) and x168 (chained join→window) must drain to
    identical results at any state-store fan-out."""
    from go_mapreduce_spark.streaming import events as SE

    results = {}
    for parts in (2, 8):
        monkeypatch.setattr(SE, "REPLAY_SHUFFLE_PARTITIONS", parts)
        fo = {tuple(r) for r in SE.x166_stream_full_join(spark, sf_dir).collect()}
        ch = {
            tuple(r)
            for r in SE.x168_stream_attributed_windows(spark, sf_dir).collect()
        }
        results[parts] = (fo, ch)
    assert results[2] == results[8]


@pytest.mark.parametrize("parts", _PART_ARMS)
def test_session_waves_invariant_to_partitioning(spark, sf_dir, parts):
    """Waves 18–24 under the same invariance bar — the queries whose
    determinism rests on an explicit discipline: decimal gradient
    sums (x185), histogram sweeps (x184/x186), bucketed exact rank
    (x189), bucket-decomposed running sums (x190), integer rolling
    hashes (x192), split-point thresholds (x193), and the fused
    pipeline (x200)."""
    from go_mapreduce_spark.queries import QUERIES

    names = [
        "x180_countmin_error",
        "x184_quality_auc",
        "x185_logreg_train",
        "x186_quality_calibration",
        "x189_revenue_gini",
        "x190_peak_concurrency",
        "x192_cdc_chunks",
        "x193_sql_variables",
        "x200_curation_pipeline",
    ]
    refs = _refs_at_default(spark, sf_dir, names)
    old = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", str(parts))
    try:
        for n in names:
            df = QUERIES[n](spark, sf_dir)
            got = canon_rows(df.columns, [tuple(r) for r in df.collect()])
            assert got == refs[n], f"{n} varies with shuffle partitions"
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)
