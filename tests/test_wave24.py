"""Property tests for wave 24: window completeness (x198), map
lambdas (x199), and the x200 capstone curation pipeline."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F


def test_window_completeness_semantics(spark, sf_dir):
    """first/second/cume_dist recomputed from collected per-customer
    histories."""
    from go_mapreduce_spark.operators.windows import x198_window_completeness
    from go_mapreduce_spark.sources.registry import load_table

    hist: dict = {}
    for r in (
        load_table(spark, sf_dir, "orders")
        .select("o_custkey", "o_orderkey", "o_orderdate")
        .collect()
    ):
        hist.setdefault(r.o_custkey, []).append((r.o_orderdate, r.o_orderkey))
    for v in hist.values():
        v.sort()
    for r in x198_window_completeness(spark, sf_dir).limit(500).collect():
        orders = hist[r.o_custkey]
        keys = [k for _, k in orders]
        assert r.first_order == keys[0]
        assert r.second_order == (keys[1] if len(keys) > 1 else None)
        assert r.n_orders == len(keys)
        pos = keys.index(r.o_orderkey) + 1
        assert abs(r.cume_dist - round(pos / len(keys), 6)) < 1e-9


def test_map_lambdas_match_plain_aggregate(spark, sf_dir):
    from go_mapreduce_spark.operators.relational_ext import x199_map_lambdas
    from go_mapreduce_spark.sources.registry import load_table

    plain = {
        (r.user_id, r.event_type): r.cnt
        for r in load_table(spark, sf_dir, "events")
        .groupBy("user_id", "event_type")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .collect()
        if r.cnt >= 2
    }
    got = {
        (r.user_id, r.event_type): r.adj_count
        for r in x199_map_lambdas(spark, sf_dir).collect()
    }
    assert got == {k: v * 2 for k, v in plain.items()}


def test_pipeline_composes_stage_semantics(spark, sf_dir):
    """The capstone must equal the composition of its already-tested
    stages, replayed in Python."""
    import re

    from go_mapreduce_spark.operators.curation import (
        PIPE_QUALITY_MIN,
        SPLIT_TRAIN_LT,
        SPLIT_VAL_LT,
        x200_curation_pipeline,
    )
    from go_mapreduce_spark.operators.text import EN_STOPWORDS
    from go_mapreduce_spark.sources.registry import load_table

    docs = load_table(spark, sf_dir, "documents").collect()
    # stage 1: exact dedup, min doc_id per text sha
    best: dict = {}
    for r in docs:
        h = hashlib.sha256(r.text.encode()).hexdigest()
        if h not in best or r.doc_id < best[h].doc_id:
            best[h] = r
    agg: dict = {}
    for r in best.values():
        tl = len(r.text)
        al = len(re.sub(r"[^A-Za-z]", "", r.text))
        toks = [t for t in re.split(r"[^a-z]+", r.text.lower()) if t]
        swc = sum(1 for t in toks if t in EN_STOPWORDS)
        quality = round(
            0.4 * (al / tl if tl else 0.0)
            + 0.3 * (swc / len(toks) if toks else 0.0)
            + 0.3 * min(1.0, len(toks) / 50),
            6,
        )
        if quality < PIPE_QUALITY_MIN:
            continue
        p = hashlib.sha256(str(r.doc_id).encode()).hexdigest()[:2]
        split = (
            "train" if p < SPLIT_TRAIN_LT else ("val" if p < SPLIT_VAL_LT else "test")
        )
        fp = int(
            hashlib.sha256(f"{r.doc_id}:pipe".encode()).hexdigest()[:8], 16
        )
        key = (split, r.lang)
        n, c, f = agg.get(key, (0, 0, 0))
        agg[key] = (n + 1, c + r.n_chars, f + fp)
    got = {
        (r.split, r.lang): (r.n_docs, r.total_chars, r.fingerprint)
        for r in x200_curation_pipeline(spark, sf_dir).collect()
    }
    assert got == agg
