"""Wave-40 property tests: bootstrap weight distribution and CI
sanity, two-proportion z recompute, LTV monotonicity and conservation,
seasonal-index algebra."""

from __future__ import annotations

import math

from pyspark.sql import functions as F


def test_x254_ci_brackets_the_mean_and_weights_are_poissonish(spark, sf_dir):
    from go_mapreduce_spark.operators import stats as ST
    from go_mapreduce_spark.sources.registry import load_table

    got = ST.x254_bootstrap_ci(spark, sf_dir).collect()[0]
    assert got.n_replicates == ST.BOOTSTRAP_B
    assert got.ci_lo <= got.mean_order_value <= got.ci_hi
    # CI should be roughly ±2·σ/√n wide, not degenerate or absurd
    rows = [
        r.o_totalprice
        for r in load_table(spark, sf_dir, "orders").select("o_totalprice").collect()
    ]
    n = len(rows)
    mean = sum(rows) / n
    sd = math.sqrt(sum((x - mean) ** 2 for x in rows) / (n - 1))
    se = sd / math.sqrt(n)
    width = got.ci_hi - got.ci_lo
    assert 1.5 * se < width < 8 * se, (width, se)
    # the deterministic hash weights follow Poisson(1) closely:
    # mean weight ~1, P(w=0) ~ 1/e
    w = (
        spark.range(0, 20000)
        .select(
            F.substring(
                F.sha2(F.concat(F.col("id").cast("string"), F.lit("|1")), 256), 1, 4
            ).alias("h4")
        )
        .select(ST._bootstrap_weight(F.col("h4")).alias("w"))
        .groupBy("w")
        .count()
        .collect()
    )
    dist = {r.w: r["count"] / 20000 for r in w}
    assert abs(dist.get(0, 0) - math.exp(-1)) < 0.02
    assert abs(sum(k * v for k, v in dist.items()) - 1.0) < 0.03


def test_x255_matches_textbook_two_proportion_z(spark, sf_dir):
    from go_mapreduce_spark.operators import stats as ST

    got = ST.x255_two_proportion_z(spark, sf_dir).collect()[0]
    p_a, p_b = got.x_a / got.n_a, got.x_b / got.n_b
    pool = (got.x_a + got.x_b) / (got.n_a + got.n_b)
    z = (p_a - p_b) / math.sqrt(
        pool * (1 - pool) * (1 / got.n_a + 1 / got.n_b)
    )
    assert abs(got.z_stat - z) < 1e-5
    assert abs(got.rate_a - p_a) < 1e-5 and abs(got.rate_b - p_b) < 1e-5


def test_x256_ltv_monotone_and_conserves_revenue(spark, sf_dir):
    from go_mapreduce_spark.operators import analytics as AN
    from go_mapreduce_spark.sources.registry import load_table

    rows = AN.x256_cohort_ltv(spark, sf_dir).collect()
    by_cohort: dict = {}
    for r in rows:
        by_cohort.setdefault(r.cohort_month, []).append(r)
    total_from_curve = 0.0
    for cohort, pts in by_cohort.items():
        pts.sort(key=lambda r: r.offset)
        # cumulative LTV never decreases
        assert all(
            a.ltv_per_customer <= b.ltv_per_customer + 1e-9
            for a, b in zip(pts, pts[1:])
        ), cohort
        total_from_curve += pts[-1].ltv_per_customer * pts[-1].n_customers
    # the sum over cohorts of (final LTV × cohort size) equals total
    # revenue inside the offset horizon
    orders = load_table(spark, sf_dir, "orders")
    firsts = orders.groupBy("o_custkey").agg(
        F.min(F.trunc("o_orderdate", "month")).alias("cm")
    )
    horizon = (
        orders.join(firsts, "o_custkey")
        .filter(
            (F.year("o_orderdate") - F.year("cm")) * 12
            + (F.month("o_orderdate") - F.month("cm"))
            <= AN.LTV_MAX_OFFSET
        )
        .agg(F.sum("o_totalprice"))
        .collect()[0][0]
    )
    assert abs(total_from_curve - horizon) / horizon < 1e-6
    # cohort sizes cover every ordering customer
    n_cust = orders.select("o_custkey").distinct().count()
    assert sum(pts[0].n_customers for pts in by_cohort.values()) == n_cust


def test_x257_indices_average_to_one_day_weighted(spark, sf_dir):
    from go_mapreduce_spark.operators import analytics as AN

    rows = AN.x257_dow_seasonality(spark, sf_dir).collect()
    assert sorted(r.dow for r in rows) == list(range(1, 8))
    n_total = sum(r.n_days for r in rows)
    # day-weighted mean of dow_mean is the grand mean, so the
    # day-weighted mean of the seasonal index is 1
    wmean_idx = sum(r.seasonal_index * r.n_days for r in rows) / n_total
    assert abs(wmean_idx - 1.0) < 1e-3
    assert all(r.deseason_std >= 0 for r in rows)
    assert all(0.1 < r.seasonal_index < 10 for r in rows)
