"""Wave 31: weighted median (x219) and waterfall decomposition (x220)."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_weighted_median_python_replay(spark, sf_dir):
    from go_mapreduce_spark.operators.analytics import x219_weighted_median
    from go_mapreduce_spark.sources.registry import load_table

    groups: dict = {}
    for r in (
        load_table(spark, sf_dir, "lineitem")
        .select(
            "l_returnflag",
            "l_linestatus",
            "l_extendedprice",
            "l_orderkey",
            "l_linenumber",
            "l_quantity",
        )
        .collect()
    ):
        groups.setdefault((r.l_returnflag, r.l_linestatus), []).append(
            (r.l_extendedprice, r.l_orderkey, r.l_linenumber, r.l_quantity)
        )
    for row in x219_weighted_median(spark, sf_dir).collect():
        rows = sorted(groups[(row.l_returnflag, row.l_linestatus)])
        total = sum(q for _, _, _, q in rows)
        cum = 0.0
        for price, _, _, q in rows:
            cum += q
            if 2 * cum >= total:
                assert abs(row.weighted_median_price - round(price, 4)) < 1e-9
                break
        assert abs(row.total_weight - total) < 1e-3


def test_waterfall_shares_sum_to_one(spark, sf_dir):
    """Within each month, segment deltas sum to the month delta, so
    the shares sum to 1 (when the month delta is nonzero)."""
    from go_mapreduce_spark.operators.analytics import x220_revenue_waterfall

    by_month: dict = {}
    for r in x220_revenue_waterfall(spark, sf_dir).collect():
        by_month.setdefault(r.month, []).append(r)
    n_checked = 0
    for month, rows in by_month.items():
        if len(rows) < 5:
            continue  # partial months (segment missing previous month)
        if all(r.share_of_change is not None for r in rows):
            s = sum(r.share_of_change for r in rows)
            assert abs(s - 1.0) < 1e-4, (month, s)
            n_checked += 1
    assert n_checked > 0
