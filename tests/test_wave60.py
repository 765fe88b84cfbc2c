"""Wave-60 property tests: JSD bounds, Chao1 >= observed vocab,
split-fraction sanity, per-group OLS on a planted linear stream."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from go_mapreduce_spark.operators import analytics as AN
from go_mapreduce_spark.operators import curation as C
from go_mapreduce_spark.operators import text as T


def test_x307_jsd_bounds(spark, sf_dir):
    rows = T.x307_js_divergence(spark, sf_dir).collect()
    assert rows
    for r in rows:
        # JSD against the corpus mixture is bounded by ln 2
        assert -1e-9 <= r.jsd_nats <= math.log(2) + 1e-9


def test_x308_chao1_dominates_vocab(spark, sf_dir):
    for r in T.x308_chao1_richness(spark, sf_dir).collect():
        assert r.chao1 >= r.vocab
        assert 0.0 < r.coverage <= 1.0
        assert r.f1 <= r.vocab and r.f2 <= r.vocab


def test_x309_split_covers_corpus_near_fractions(spark, sf_dir):
    rows = C.x309_split_balance(spark, sf_dir).collect()
    from go_mapreduce_spark.sources.registry import load_table

    n = load_table(spark, sf_dir, "documents").count()
    assert sum(r.n_docs for r in rows) == n
    per_split = {}
    for r in rows:
        per_split[r.split] = per_split.get(r.split, 0) + r.n_docs
    assert abs(per_split["train"] / n - 0.8) < 0.05
    # deterministic: re-run is identical
    assert rows == C.x309_split_balance(spark, sf_dir).collect()


def test_x310_recovers_planted_slope(spark, tmp_path):
    import os

    rows = []
    for day in range(60):
        for i in range(5):
            # stream A: exact line y_total = 50 + 10*day (5 events/day)
            rows.append(("lin", f"2024-01-01", day, 10.0 + 2.0 * day))
    df = spark.createDataFrame(rows, "event_type string, base string, day int, value double")
    ev = df.select(
        "event_type",
        (F.to_timestamp("base") + F.make_interval(days=F.col("day"))).alias("ts"),
        F.lit(0).cast("bigint").alias("event_id"),
        F.lit(0).cast("bigint").alias("user_id"),
        "value",
        F.lit("{}").alias("props"),
    )
    ev.write.mode("overwrite").parquet(os.path.join(str(tmp_path), "events.parquet"))
    r = AN.x310_group_trend(spark, str(tmp_path)).collect()[0]
    assert r.n_days == 60
    assert abs(r.slope - 10.0) < 1e-6  # 5 events/day x 2.0/day
    assert abs(r.r2 - 1.0) < 1e-9
