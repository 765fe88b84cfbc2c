"""Property tests for wave 25: argmax aggregates (x201), explode_outer
(x202), unionByName drift (x203), sentence stats (x204), quantile
normalization (x205)."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_argmax_matches_window_formulation(spark, sf_dir):
    from go_mapreduce_spark.operators.relational_ext import x201_argmax_user
    from go_mapreduce_spark.sources.registry import load_table

    totals: dict = {}
    for r in (
        load_table(spark, sf_dir, "events")
        .groupBy("event_type", "user_id")
        .agg(F.sum(F.col("value").cast("decimal(38,6)")).alias("t"))
        .collect()
    ):
        totals.setdefault(r.event_type, []).append((r.t, r.user_id))
    for r in x201_argmax_user(spark, sf_dir).collect():
        tu = totals[r.event_type]
        top = max(tu, key=lambda p: (p[0], -p[1]))
        bot = min(tu, key=lambda p: (p[0], p[1]))
        assert (r.top_user, r.bottom_user) == (top[1], bot[1])
        assert abs(r.top_total - round(float(top[0]), 4)) < 1e-9
        assert abs(r.bottom_total - round(float(bot[0]), 4)) < 1e-9


def test_explode_outer_keeps_empty_docs(spark, sf_dir):
    from go_mapreduce_spark.operators.relational_ext import x202_explode_outer
    from go_mapreduce_spark.sources.registry import load_table

    out = x202_explode_outer(spark, sf_dir)
    n_docs = load_table(spark, sf_dir, "documents").count()
    rows = out.collect()
    assert len(rows) == n_docs  # every doc present, even shingle-free
    for r in rows:
        assert r.n_distinct_shingles <= r.n_shingle_occurrences


def test_union_by_name_null_fills_missing(spark, sf_dir):
    from go_mapreduce_spark.operators.relational_ext import x203_union_by_name
    from go_mapreduce_spark.sources.registry import load_table

    ev = load_table(spark, sf_dir, "events")
    total = ev.count()
    out = x203_union_by_name(spark, sf_dir).collect()
    assert sum(r.n_events for r in out) == total
    odd = ev.filter(F.col("event_id") % 2 == 1).count()
    assert sum(r.n_with_value for r in out) == odd


def test_sentence_stats_python_replay(spark, sf_dir):
    import re

    from go_mapreduce_spark.operators.text import x204_sentence_stats
    from go_mapreduce_spark.sources.registry import load_table

    docs = {
        r.doc_id: r.text
        for r in load_table(spark, sf_dir, "documents").collect()
    }
    for r in x204_sentence_stats(spark, sf_dir).limit(200).collect():
        sents = [s for s in re.split(r"[.!?]+", docs[r.doc_id]) if s.strip()]
        words = sum(
            len([w for w in re.split(r"[^A-Za-z]+", s) if w]) for s in sents
        )
        assert r.n_sentences == len(sents)
        assert r.n_words == words


def test_quantile_normalize_is_exact_percentile(spark, sf_dir):
    from go_mapreduce_spark.operators.layout import x205_quantile_normalize
    from go_mapreduce_spark.sources.registry import load_table

    docs = sorted(
        (
            (r.n_chars, r.doc_id)
            for r in load_table(spark, sf_dir, "documents").collect()
        )
    )
    rank = {d: i for i, (_, d) in enumerate(docs)}
    n = len(docs)
    for r in x205_quantile_normalize(spark, sf_dir).collect():
        assert abs(r.length_pct - round(rank[r.doc_id] / (n - 1), 6)) < 1e-9
    # the plan must not contain an unpartitioned window
    plan = (
        x205_quantile_normalize(spark, sf_dir)
        ._jdf.queryExecution()
        .optimizedPlan()
        .toString()
    )
    for line in plan.splitlines():
        if "windowspecdefinition(" in line.lower():
            assert "_rb" in line, line
