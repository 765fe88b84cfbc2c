"""Wave-37 property tests: each test statistic recomputed from first
principles on the collected sample and matched to the plan's output."""

from __future__ import annotations

import math

from pyspark.sql import functions as F


def _sample(spark, sf_dir):
    """Order values for the two t-test segments, keyed by arm."""
    from go_mapreduce_spark.operators import stats as ST
    from go_mapreduce_spark.sources.registry import load_table

    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    rows = (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .filter(F.col("c_mktsegment").isin(ST.TTEST_SEG_A, ST.TTEST_SEG_B))
        .select("o_totalprice", "c_mktsegment")
        .collect()
    )
    a = [r.o_totalprice for r in rows if r.c_mktsegment == ST.TTEST_SEG_A]
    b = [r.o_totalprice for r in rows if r.c_mktsegment != ST.TTEST_SEG_A]
    return a, b


def test_x242_benford_distribution_properties(spark, sf_dir):
    from go_mapreduce_spark.operators import stats as ST
    from go_mapreduce_spark.sources.registry import load_table

    rows = ST.x242_benford_audit(spark, sf_dir).collect()
    assert [r.digit for r in rows] == list(range(1, 10))
    assert abs(sum(r.observed_p for r in rows) - 1.0) < 1e-4
    assert abs(sum(r.expected_p for r in rows) - 1.0) < 1e-4
    assert all(r.chi2_term >= 0 for r in rows)
    # brute-force digit counts from the raw strings
    prices = [
        r.l_extendedprice
        for r in load_table(spark, sf_dir, "lineitem")
        .select("l_extendedprice")
        .collect()
        if r.l_extendedprice > 0
    ]
    want: dict[int, int] = {}
    for p in prices:
        d = int(next(ch for ch in str(p) if ch in "123456789"))
        want[d] = want.get(d, 0) + 1
    assert {r.digit: r.n for r in rows} == want


def test_x243_matches_textbook_welch(spark, sf_dir):
    from go_mapreduce_spark.operators import stats as ST

    got = ST.x243_welch_ttest(spark, sf_dir).collect()[0]
    a, b = _sample(spark, sf_dir)
    assert (got.n_a, got.n_b) == (len(a), len(b))
    ma, mb = sum(a) / len(a), sum(b) / len(b)
    va = sum((x - ma) ** 2 for x in a) / (len(a) - 1)
    vb = sum((x - mb) ** 2 for x in b) / (len(b) - 1)
    sea, seb = va / len(a), vb / len(b)
    t = (ma - mb) / math.sqrt(sea + seb)
    dof = (sea + seb) ** 2 / (
        sea**2 / (len(a) - 1) + seb**2 / (len(b) - 1)
    )
    assert abs(got.mean_a - ma) < 1e-4 and abs(got.mean_b - mb) < 1e-4
    assert abs(got.t_stat - t) < 1e-5
    assert abs(got.welch_df - dof) < 1e-3
    # the sign of t agrees with the direction of the mean difference
    assert (got.t_stat > 0) == (ma > mb)


def test_x244_matches_brute_force_midranks(spark, sf_dir):
    from go_mapreduce_spark.operators import stats as ST

    got = ST.x244_mannwhitney(spark, sf_dir).collect()[0]
    a, b = _sample(spark, sf_dir)
    pooled = sorted([(v, True) for v in a] + [(v, False) for v in b])
    # textbook mid-ranks: average the 1-based positions of each tie run
    ranks: dict[float, float] = {}
    i = 0
    while i < len(pooled):
        j = i
        while j < len(pooled) and pooled[j][0] == pooled[i][0]:
            j += 1
        ranks[pooled[i][0]] = (i + 1 + j) / 2
        i = j
    r_a = sum(ranks[v] for v in a)
    u_a = r_a - len(a) * (len(a) + 1) / 2
    assert (got.n_a, got.n_b) == (len(a), len(b))
    assert abs(got.u_a - u_a) < 1e-6
    # z against the tie-corrected normal approximation
    n = len(a) + len(b)
    tie = sum(
        t**3 - t
        for t in __import__("collections").Counter(v for v, _ in pooled).values()
    )
    var = len(a) * len(b) / 12 * ((n + 1) - tie / (n * (n - 1)))
    z = (u_a - len(a) * len(b) / 2) / math.sqrt(var)
    assert abs(got.z_stat - z) < 1e-5


def test_x245_matches_direct_acf(spark, sf_dir):
    from go_mapreduce_spark.operators import stats as ST
    from go_mapreduce_spark.sources.registry import load_table

    rows = {r.lag: r for r in ST.x245_acf(spark, sf_dir).collect()}
    assert set(rows) == set(range(1, ST.ACF_MAX_LAG + 1))
    assert all(abs(r.acf) <= 1.0 + 1e-9 for r in rows.values())
    daily = {
        r.d: r.rev
        for r in load_table(spark, sf_dir, "orders")
        .groupBy(F.to_date("o_orderdate").alias("d"))
        .agg(F.sum("o_totalprice").alias("rev"))
        .collect()
    }
    mean = sum(daily.values()) / len(daily)
    denom = sum((v - mean) ** 2 for v in daily.values())
    import datetime

    for lag in (1, 7):
        num = sum(
            (daily[d] - mean) * (daily[d + datetime.timedelta(days=lag)] - mean)
            for d in daily
            if d + datetime.timedelta(days=lag) in daily
        )
        n_pairs = sum(
            1 for d in daily if d + datetime.timedelta(days=lag) in daily
        )
        assert rows[lag].n_pairs == n_pairs
        assert abs(rows[lag].acf - num / denom) < 1e-4
