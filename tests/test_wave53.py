"""Wave-53 tests: t-closeness EMD math, Spearman mid-ranks, exact
two-sample KS against a Python brute force, and the bucketed
running-sum helper's exactness."""

from __future__ import annotations

from collections import Counter, defaultdict

from pyspark.sql import functions as F


def test_x289_matches_python_variational_distance(spark, sf_dir):
    from go_mapreduce_spark.operators import curation as C
    from go_mapreduce_spark.sources.registry import load_table

    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    rows = (
        cust.join(nation, cust.c_nationkey == nation.n_nationkey)
        .select(
            "n_name",
            F.floor(F.col("c_acctbal") / 1000).cast("bigint").alias("bal_band"),
            "c_mktsegment",
        )
        .collect()
    )
    glob = Counter(r.c_mktsegment for r in rows)
    total = sum(glob.values())
    per_class = defaultdict(Counter)
    for r in rows:
        per_class[(r.n_name, r.bal_band)][r.c_mktsegment] += 1
    expect = {}
    for key, segs in per_class.items():
        size = sum(segs.values())
        t = sum(
            abs(segs.get(s, 0) / size - glob[s] / total) for s in glob
        ) / 2
        if t > C.T_CLOSE_T:
            expect[key] = (size, round(t, 6))
    got = C.x289_t_closeness(spark, sf_dir).collect()
    assert 0 < len(got) <= C.T_CLOSE_TOP_N
    for r in got:
        assert abs(expect[(r.n_name, r.bal_band)][1] - r.t_dist) < 1e-9
        assert expect[(r.n_name, r.bal_band)][0] == r.class_size
        assert 0.0 <= r.t_dist <= 1.0
    # worst-first ordering
    ts = [r.t_dist for r in got]
    assert ts == sorted(ts, reverse=True)


def test_x290_matches_python_midrank_pearson(spark, sf_dir):
    from go_mapreduce_spark.operators import stats as ST
    from go_mapreduce_spark.sources.registry import load_table

    daily = (
        load_table(spark, sf_dir, "orders")
        .groupBy(F.to_date("o_orderdate").alias("d"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            (
                F.sum(F.col("o_totalprice").cast("decimal(38,6)")).cast("double")
                / F.count(F.lit(1))
            ).alias("p"),
        )
        .collect()
    )

    def midranks(vals):
        order = sorted(vals)
        first = {}
        for i, v in enumerate(order):
            first.setdefault(v, i + 1)
        cnt = Counter(order)
        return [first[v] + (cnt[v] - 1) / 2 for v in vals]

    rx = midranks([r.n for r in daily])
    ry = midranks([r.p for r in daily])
    n = len(rx)
    sx, sy = sum(rx), sum(ry)
    sxx = sum(v * v for v in rx)
    syy = sum(v * v for v in ry)
    sxy = sum(a * b for a, b in zip(rx, ry))
    rho = (n * sxy - sx * sy) / (
        ((n * sxx - sx * sx) * (n * syy - sy * sy)) ** 0.5
    )
    row = ST.x290_spearman_daily(spark, sf_dir).collect()[0]
    assert row.n_days == n
    assert abs(row.spearman_rho - round(rho, 6)) < 1e-6
    assert -1.0 <= row.spearman_rho <= 1.0


def test_x291_matches_python_brute_force(spark, sf_dir):
    from go_mapreduce_spark.operators import stats as ST
    from go_mapreduce_spark.sources.registry import load_table

    orders = load_table(spark, sf_dir, "orders").collect()
    a = sorted(r.o_totalprice for r in orders if r.o_orderstatus == "F")
    b = sorted(r.o_totalprice for r in orders if r.o_orderstatus == "O")
    import bisect

    d = max(
        abs(
            bisect.bisect_right(a, v) / len(a)
            - bisect.bisect_right(b, v) / len(b)
        )
        for v in set(a) | set(b)
    )
    row = ST.x291_ks_test(spark, sf_dir).collect()[0]
    assert row.n_a == len(a) and row.n_b == len(b)
    assert abs(row.d_stat - round(d, 6)) < 1e-9
    assert 0.0 < row.d_stat <= 1.0
    # critical distances scale as sqrt((na+nb)/(na*nb)) with pinned c(α)
    scale = ((len(a) + len(b)) / (len(a) * len(b))) ** 0.5
    assert abs(row.crit_5pct - round(ST.KS_C_05 * scale, 6)) < 1e-9
    assert row.crit_1pct > row.crit_5pct
    assert row.reject_5pct == (row.d_stat > ST.KS_C_05 * scale)


def test_global_running_sum_matches_single_window(spark):
    """The bucketed prefix-sum must equal the textbook unpartitioned
    running sum, for every weight column, at any bucket count."""
    from pyspark.sql import Window

    from go_mapreduce_spark.operators.layout import _global_running_sum

    df = spark.range(1000).select(
        (F.col("id") * 37 % 101).alias("k"),
        F.col("id").alias("tie"),
        (F.col("id") % 7).cast("int").alias("w1"),
        F.lit(1).cast("int").alias("w2"),
    )
    got = _global_running_sum(
        df, ["k", "tie"], F.col("k"), {"w1": "c1", "w2": "c2"}, n_splits=8
    )
    w = (
        Window.orderBy("k", "tie")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    want = df.withColumn("c1", F.sum("w1").over(w)).withColumn(
        "c2", F.sum("w2").over(w)
    )
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, want.collect())
    )
