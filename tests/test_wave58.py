"""Wave-58 property tests: ROC-AUC bounds + rank identity, Theil-Sen
slope bracketing, MI non-negativity, Levene on a planted
variance-shift."""

from __future__ import annotations

from pyspark.sql import functions as F

from go_mapreduce_spark.operators import stats as ST


def test_x299_auc_bounds_and_gini_identity(spark, sf_dir):
    r = ST.x299_roc_auc(spark, sf_dir).collect()[0]
    assert 0.0 <= r.auc <= 1.0
    assert abs(r.gini - (2 * r.auc - 1)) < 2e-6
    from go_mapreduce_spark.sources.registry import load_table

    n = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus").isin("F", "O"))
        .count()
    )
    assert r.n_pos + r.n_neg == n


def test_x300_sen_slope_is_bracketed(spark, sf_dir):
    r = ST.x300_theil_sen(spark, sf_dir).collect()[0]
    assert r.n_pairs == r.n_days * (r.n_days - 1) // 2
    # the median pairwise slope lies within the pairwise-slope range;
    # a cheap sanity re-derivation on the day relation
    from go_mapreduce_spark.functions.numeric import dsum
    from go_mapreduce_spark.sources.registry import load_table

    daily = (
        load_table(spark, sf_dir, "orders")
        .groupBy(
            F.datediff(F.to_date("o_orderdate"), F.lit("1970-01-01")).alias("d")
        )
        .agg(dsum(F.col("o_totalprice"), "rev"))
    )
    a, b = daily.alias("a"), daily.alias("b")
    mm = (
        a.join(b, F.col("a.d") < F.col("b.d"))
        .select(
            (
                (F.col("b.rev") - F.col("a.rev"))
                / (F.col("b.d") - F.col("a.d")).cast("double")
            ).alias("s")
        )
        .agg(F.min("s").alias("lo"), F.max("s").alias("hi"))
        .collect()[0]
    )
    assert mm.lo <= r.sen_slope <= mm.hi


def test_x301_mi_nonneg_and_nmi_bounded(spark, sf_dir):
    r = ST.x301_mutual_information(spark, sf_dir).collect()[0]
    assert r.mi_nats >= -1e-9
    assert -1e-9 <= r.nmi <= 1.0 + 1e-9


def test_x302_levene_detects_planted_variance_shift(spark, tmp_path):
    """Two groups, same mean, one with 4x the spread: W must be large;
    identical groups: W ~ 0."""
    import math

    rows = []
    for i in range(400):
        # deterministic symmetric noise in [-1, 1]
        u = math.sin(i * 12.9898) * 43758.5453
        noise = (u - math.floor(u)) * 2 - 1
        rows.append(("narrow", 10.0 + noise))
        rows.append(("wide", 10.0 + 4.0 * noise))
    df = spark.createDataFrame(rows, "event_type string, value double")
    path = str(tmp_path / "events.parquet")
    df.write.parquet(path)
    # reuse the operator's internals by pointing load_table at a fake
    # sf_dir layout
    import os

    fake = str(tmp_path)
    ts_rows = df.withColumn("ts", F.lit("2024-01-01 00:00:00").cast("timestamp"))
    ts_rows.write.mode("overwrite").parquet(os.path.join(fake, "events.parquet"))
    r = ST.x302_levene_test(spark, fake).collect()[0]
    assert r.k == 2 and r.n == 800
    assert r.w_stat > 100  # planted 4x spread: decisive rejection
