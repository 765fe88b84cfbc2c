"""Property tests for the wave-18 operators: count-min sketch audit
(x180), recursive-CTE chain walk (x181), VARIANT analytics (x182),
higher-order array lambdas (x183), and rank-based AUC (x184)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F


def test_countmin_never_undercounts(spark, sf_dir):
    """The defining CM guarantee: estimate >= exact for every audited
    key (min over rows of counters that each include the key's own
    occurrences plus non-negative collision mass)."""
    from go_mapreduce_spark.operators.sketches import x180_countmin_error

    rows = x180_countmin_error(spark, sf_dir).collect()
    assert len(rows) == 20
    for r in rows:
        assert r.cm_estimate >= r.exact_cnt
        assert r.overestimate == r.cm_estimate - r.exact_cnt


def test_countmin_estimate_matches_manual_sketch(spark, sf_dir):
    """Replay the sketch in plain Python (hashlib sha256 over the
    same token stream) and compare every audited estimate."""
    import hashlib
    from collections import Counter

    from go_mapreduce_spark.operators.sketches import (
        CM_ROWS,
        CM_WIDTH_HEX,
        x180_countmin_error,
    )
    from go_mapreduce_spark.operators.dedup import lower_tokens
    from go_mapreduce_spark.sources.registry import load_table

    docs = load_table(spark, sf_dir, "documents")
    toks = [
        t
        for r in docs.select(lower_tokens(F.col("text")).alias("t")).collect()
        for t in r.t
    ]
    cells: Counter = Counter()
    for t in toks:
        for r in range(CM_ROWS):
            h = hashlib.sha256(f"{r}:{t}".encode()).hexdigest()[:CM_WIDTH_HEX]
            cells[(r, h)] += 1

    def est(tok: str) -> int:
        return min(
            cells[
                (
                    r,
                    hashlib.sha256(f"{r}:{tok}".encode()).hexdigest()[
                        :CM_WIDTH_HEX
                    ],
                )
            ]
            for r in range(CM_ROWS)
        )

    for row in x180_countmin_error(spark, sf_dir).collect():
        assert row.cm_estimate == est(row.tok), row.tok


def test_recursive_chain_equals_window_cumsum(spark, sf_dir):
    """The recursion's deepest row per user must equal the plain
    window formulation: the (min(5+1, n_events))-th event in
    (ts, event_id) order with the prefix decimal sum of values."""
    from go_mapreduce_spark.operators.graph import (
        CHAIN_MAX_STEPS,
        x181_recursive_chain,
    )
    from go_mapreduce_spark.sources.registry import load_table
    from pyspark.sql.window import Window

    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    expected = (
        ev.select(
            "user_id",
            "event_id",
            F.row_number().over(w).alias("rn"),
            F.sum(F.col("value").cast("decimal(38,6)"))
            .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
            .alias("cum"),
            F.count(F.lit(1)).over(Window.partitionBy("user_id")).alias("n"),
        )
        .filter(F.col("rn") == F.least(F.lit(CHAIN_MAX_STEPS + 1), F.col("n")))
        .select(
            "user_id",
            F.col("event_id").alias("final_event_id"),
            (F.col("rn") - 1).alias("n_steps"),
            F.col("cum").cast("double").alias("chain_value"),
        )
    )
    got = {
        r.user_id: (r.final_event_id, r.n_steps, r.chain_value)
        for r in x181_recursive_chain(spark, sf_dir).collect()
    }
    exp = {
        r.user_id: (r.final_event_id, r.n_steps, r.chain_value)
        for r in expected.collect()
    }
    assert got == exp


def test_variant_analytics_conserves_events(spark, sf_dir):
    """Group counts must add up to the full table (VARIANT parsing
    dropped nothing) and every extracted k aggregates consistently."""
    from go_mapreduce_spark.operators.relational_ext import (
        x182_variant_analytics,
    )
    from go_mapreduce_spark.sources.registry import load_table

    out = x182_variant_analytics(spark, sf_dir).collect()
    total = load_table(spark, sf_dir, "events").count()
    assert sum(r.n_events for r in out) == total
    for r in out:
        assert r.n_events >= r.n_even_k >= 0
        assert r.max_k is not None


def test_array_lambda_stats_match_numpy(spark, sf_dir):
    """l2 / n_positive / max_abs / rev_dot recomputed with numpy on
    the collected vectors (float64, same fold order)."""
    import numpy as np

    from go_mapreduce_spark.operators.relational_ext import (
        x183_array_lambda_stats,
    )
    from go_mapreduce_spark.sources.registry import load_table

    em = {
        r.vec_id: np.array(r.embedding, dtype=np.float64)
        for r in load_table(spark, sf_dir, "embeddings").collect()
    }
    for r in x183_array_lambda_stats(spark, sf_dir).collect():
        a = em[r.vec_id]
        assert abs(r.l2_norm - math.sqrt(float(np.sum(a * a)))) < 1e-4
        assert r.n_positive == int((a > 0).sum())
        assert abs(r.max_abs - float(np.abs(a).max())) < 1e-6
        assert abs(r.rev_dot - float(np.dot(a, a[::-1]))) < 1e-4


def test_auc_matches_bruteforce_pairs(spark, sf_dir):
    """The histogram-sweep AUC equals the O(N^2) definition
    P(s_pos > s_neg) + 0.5 P(tie) on the collected scores."""
    from go_mapreduce_spark.operators.dedup import lower_tokens
    from go_mapreduce_spark.operators.text import (
        EN_STOPWORDS,
        _stopword_count,
        x184_quality_auc,
    )
    from go_mapreduce_spark.sources.registry import load_table

    docs = load_table(spark, sf_dir, "documents")
    toks = lower_tokens(F.col("text"))
    n_toks = F.size(toks)
    sw = _stopword_count(toks, EN_STOPWORDS)
    score = F.round(
        F.when(n_toks > 0, sw.cast("double") / n_toks).otherwise(0.0), 6
    )
    rows = docs.select(
        score.alias("s"), (F.col("lang") == "en").alias("y")
    ).collect()
    pos = [r.s for r in rows if r.y]
    neg = [r.s for r in rows if not r.y]
    wins = sum(1 for p in pos for n in neg if p > n)
    ties = sum(1 for p in pos for n in neg if p == n)
    expected = (wins + 0.5 * ties) / (len(pos) * len(neg))

    out = x184_quality_auc(spark, sf_dir).collect()[0]
    assert out.n_pos == len(pos)
    assert out.n_neg == len(neg)
    assert abs(out.auc - expected) < 1e-6
    assert 0.0 <= out.auc <= 1.0


def test_auc_plan_has_no_corpus_sized_global_window(spark, sf_dir):
    """The ordered sweep must run over the per-score histogram (<=
    1e6+1 rows by construction), never a per-document global rank:
    the Window's child must be the score aggregate."""
    from go_mapreduce_spark.operators.text import x184_quality_auc

    plan = (
        x184_quality_auc(spark, sf_dir)
        ._jdf.queryExecution()
        .optimizedPlan()
        .toString()
    )
    # the window input is the grouped histogram — an Aggregate node
    # appears below the Window in the optimized plan
    w = plan.find("Window")
    assert w != -1
    assert "Aggregate" in plan[w:], plan
