"""Wave-85 property tests: recursive-CTE reachability laws, column
stats vs direct recompute, Page-Hinkley coherence."""

from __future__ import annotations

from pyspark.sql import functions as F

from go_mapreduce_spark.operators import relational_ext as RX
from go_mapreduce_spark.operators import stats as ST
from go_mapreduce_spark.sources.registry import load_table


def test_x385_reachability_laws(spark, sf_dir):
    rows = RX.x385_recursive_cte(spark, sf_dir).collect()
    assert rows
    hops = sorted(r.min_hops for r in rows)
    # the seed itself is hop 0; BFS levels have no gaps
    assert hops[0] == 0
    assert set(hops) == set(range(max(hops) + 1))
    assert max(hops) <= RX.RCTE_MAX_HOPS
    # nation names are unique
    assert len({r.n_name for r in rows}) == len(rows)


def test_x386_stats_match_direct(spark, sf_dir):
    rows = {r.column_name: r for r in RX.x386_column_stats(spark, sf_dir).collect()}
    orders = load_table(spark, sf_dir, "orders")
    direct = orders.agg(
        F.count_distinct("o_orderstatus").alias("ndv"),
        F.min("o_orderkey").cast("string").alias("mn"),
        F.max("o_totalprice").cast("string").alias("mx"),
    ).collect()[0]
    assert rows["o_orderstatus"].ndv == direct.ndv
    assert rows["o_orderkey"].min_value == direct.mn
    assert rows["o_totalprice"].max_value == direct.mx
    # fixture has no nulls in these columns
    assert all(r.null_frac == 0.0 for r in rows.values())
    assert rows["o_orderkey"].ndv == orders.count()


def test_x387_ph_coherence(spark, sf_dir):
    r = ST.x387_page_hinkley(spark, sf_dir).collect()[0]
    assert r.n_days > 100
    # PH is a max over (u - running-min(u)): nonnegative by definition
    assert r.ph_max >= 0.0
    assert r.drift_alarm == (r.ph_max * 100.0 > ST.PH_LAMBDA_CENTS)
    # the changepoint is a real day of the series
    assert r.changepoint_day >= 0
