"""TPC-H-shaped decorrelation suite (wave 14, x152-x163).

The classic OLAP subquery shapes the capability matrix (SURVEY.md
SS2.B rows: joins, aggregations, scalar subqueries) had not yet
exercised end-to-end: correlated scalar aggregates (Q2/Q15/Q17),
HAVING-vs-global-total (Q11), left-join count distributions (Q13),
conditional-ratio reports (Q8/Q14), disjunctive pushdown (Q19),
nested semi-join chains (Q18/Q20), and multi-dimension star rollups
(Q7/Q9).  Each is written the way Catalyst wants the DECORRELATED
plan: the correlated subquery becomes a keyed aggregate joined back
on its key (never a per-row re-scan), scalar aggregates become
1-row relations cross-joined in-plan (broadcast by construction),
and EXISTS chains become leftsemi joins.

Scale posture (SCALE.md): every query is one scan per base table;
fact-table shuffles are keyed (never global); 1-row/threshold
relations ride the plan as broadcasts; data-sized key sets are NOT
hinted broadcast (AQE decides -- round-3 advisor rule).  Numeric
determinism follows FIXTURES.md: decimal(38,6) summation,
IEEE-deterministic scalar expressions, rounding only at the output
edge.

The fixture schema lacks TPC-H's partsupp, so Q2/Q20 derive the
part-supplier relation from lineitem (unit cost = min observed
extendedprice/quantity per (part, supplier)) -- the decorrelation
shape is identical.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from go_mapreduce_spark.functions.numeric import DECIMAL_T, dsum_expr
from go_mapreduce_spark.sources.registry import load_table

_REV = "l_extendedprice * (1 - l_discount)"


def _rev_dec() -> F.Column:
    """Exact-decimal revenue term for order-independent summation."""
    return F.expr(_REV).cast(DECIMAL_T)


def x152_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape: cheapest EUROPE supplier per qualifying part.

    The correlated subquery ``cost = (SELECT min(cost) ... WHERE
    ps_partkey = p_partkey AND supplier in region)`` decorrelates to
    a per-part min aggregate joined back on ``(partkey, cost)`` --
    tie-preserving, exactly TPC-H's semantics.  The region dim chain
    (nation x region, 25 x 5 rows at any SF) broadcasts; the derived
    part-supplier cost relation is built with ONE lineitem shuffle on
    (partkey, suppkey); the min-cost relation is ps-sized, so the
    join-back never touches the fact table again.  min() over doubles
    is order-independent and picks an element of the set, so the
    equality join-back is bit-exact on any engine.
    """
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    sup = load_table(spark, sf_dir, "supplier")
    nat = load_table(spark, sf_dir, "nation")
    reg = load_table(spark, sf_dir, "region")

    eur = (
        sup.join(
            F.broadcast(
                nat.join(
                    reg.filter(F.col("r_name") == "EUROPE"),
                    nat.n_regionkey == reg.r_regionkey,
                )
            ),
            sup.s_nationkey == nat.n_nationkey,
        ).select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    ps = li.groupBy("l_partkey", "l_suppkey").agg(
        F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("unit_cost")
    )
    pq = part.filter((F.col("p_size") <= 10) & (F.col("p_type") == "STANDARD"))
    offers = ps.join(eur, ps.l_suppkey == eur.s_suppkey).join(
        pq, ps.l_partkey == pq.p_partkey
    )
    best = offers.groupBy(F.col("l_partkey").alias("bk")).agg(
        F.min("unit_cost").alias("min_cost")
    )
    return (
        offers.join(
            best,
            (offers.l_partkey == best.bk)
            & (offers.unit_cost == best.min_cost),
        )
        .select(
            F.col("p_partkey"),
            F.col("p_name"),
            F.col("s_name"),
            F.col("n_name"),
            F.col("s_acctbal"),
            F.round("unit_cost", 6).alias("unit_cost"),
        )
        .orderBy("p_partkey", "s_name")
    )


def x153_important_part_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: parts whose NATION_3-supplied value exceeds
    TWICE the mean per-part share of the nation's total.

    The scalar subquery ``HAVING value > f * (SELECT sum ...)``
    becomes a 1-row aggregate OVER THE PER-PART RELATION cross-joined
    back in-plan -- the fact table is scanned and shuffled exactly
    once, and decimal addition's associativity makes the re-aggregated
    total bit-identical to a direct global sum.  TPC-H fixes
    ``f = 0.0001/SF`` precisely because a constant fraction
    degenerates as the part count grows (a fixed 1/2000 returned 0
    rows at sf0.1); the scale-free form used here -- ``value *
    n_parts > 2 * total`` -- keeps the result population meaningful
    at every SF, and the compare runs entirely in exact
    integer-decimal arithmetic so no engine's float rounding can
    flip a boundary row.
    """
    li = load_table(spark, sf_dir, "lineitem")
    sup = load_table(spark, sf_dir, "supplier")
    nat = load_table(spark, sf_dir, "nation")

    n7 = sup.join(
        F.broadcast(nat.filter(F.col("n_name") == "NATION_3")),
        sup.s_nationkey == nat.n_nationkey,
    ).select("s_suppkey")
    val = (
        li.join(n7, li.l_suppkey == n7.s_suppkey, "leftsemi")
        .groupBy("l_partkey")
        .agg(F.sum(_rev_dec()).alias("value_dec"))
    )
    total = val.agg(
        F.sum("value_dec").alias("total_dec"),
        F.count(F.lit(1)).alias("n_parts"),
    )
    return (
        val.crossJoin(F.broadcast(total))
        .filter(
            F.col("value_dec") * F.col("n_parts")
            > F.col("total_dec") * 2
        )
        .select(
            F.col("l_partkey").alias("partkey"),
            F.round(F.col("value_dec").cast("double"), 4).alias("value"),
        )
        .orderBy(F.desc("value"), "partkey")
    )


def x154_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: monthly PROMO revenue share.

    Conditional-aggregate ratio over one lineitem-part join: both
    numerator and denominator come out of the SAME grouped aggregate
    (one scan, one shuffle on the month key after the join).  part is
    joined un-hinted -- at fixture scale AQE broadcasts it, at 100 TB
    part is data-sized and the shuffle join is the right plan.
    """
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    j = li.join(part, li.l_partkey == part.p_partkey).select(
        F.trunc("l_shipdate", "month").alias("month"),
        _rev_dec().alias("rev_dec"),
        (F.col("p_type") == "PROMO").alias("is_promo"),
    )
    g = j.groupBy("month").agg(
        F.sum(F.when(F.col("is_promo"), F.col("rev_dec")).otherwise(
            F.lit(0).cast(DECIMAL_T))).alias("promo_dec"),
        F.sum("rev_dec").alias("total_dec"),
    )
    return g.select(
        "month",
        F.round(F.col("promo_dec").cast("double"), 4).alias("promo_revenue"),
        F.round(F.col("total_dec").cast("double"), 4).alias("total_revenue"),
        F.round(
            F.lit(100.0)
            * F.col("promo_dec").cast("double")
            / F.col("total_dec").cast("double"),
            6,
        ).alias("promo_pct"),
    ).orderBy("month")


def x155_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: revenue lost to small-quantity Brand#1 orders.

    The correlated ``l_quantity < 0.5 * (SELECT avg(l_quantity) WHERE
    l_partkey = p_partkey)`` decorrelates to a per-part avg aggregate
    joined back on partkey.  The brand filter lands on part BEFORE
    either join, so the fact table is reduced by the (broadcastable)
    filtered part set first and the avg aggregate runs over the
    reduced relation -- both passes touch only Brand#1 rows.  avg is
    decimal-sum / count, so the 0.5*avg threshold is the same IEEE
    double on every engine.
    """
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    pb = part.filter(F.col("p_brand") == "Brand#1").select("p_partkey")
    lib = li.join(pb, li.l_partkey == pb.p_partkey).select(
        "l_partkey", "l_quantity", "l_extendedprice"
    )
    avgq = lib.groupBy(F.col("l_partkey").alias("ak")).agg(
        (
            F.sum(F.col("l_quantity").cast(DECIMAL_T)).cast("double")
            / F.count(F.lit(1))
        ).alias("avg_qty")
    )
    return (
        lib.join(avgq, lib.l_partkey == avgq.ak)
        .filter(F.col("l_quantity") < 0.5 * F.col("avg_qty"))
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice").cast(DECIMAL_T)).cast("double")
                / 7.0,
                4,
            ).alias("avg_yearly")
        )
    )


def x156_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: customers who placed bulk orders (sum qty > 180).

    The ``IN (SELECT l_orderkey ... HAVING sum > 180)`` becomes the
    aggregate ITSELF carried forward: one lineitem shuffle on
    orderkey produces the qualifying (orderkey, sum_qty) relation,
    which then drives the orders and customer joins -- the fact table
    is never re-joined to re-derive the quantity.  The HAVING filter
    makes the carried relation threshold-selective, so AQE turns both
    dimension joins into broadcasts at fixture scale while the same
    plan shuffles cleanly at 100 TB.
    """
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast(DECIMAL_T)).alias("qty_dec"))
        .filter(F.col("qty_dec") > 180)
    )
    return (
        big.join(orders, big.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            "o_orderdate",
            "o_totalprice",
            F.col("qty_dec").cast("double").alias("sum_qty"),
        )
        .orderBy(F.desc("o_totalprice"), "o_orderkey")
    )


def x157_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: revenue under an OR-of-ANDs part/quantity
    predicate.

    The disjunction mixes part attributes with lineitem attributes;
    Catalyst splits it per side -- the part scan receives the brand/
    size disjunction, the lineitem scan receives the union of the
    quantity ranges (l_quantity BETWEEN 1 AND 40 here) -- so BOTH
    scans prune before the join even though no single conjunct spans
    the whole predicate.  One join, one 1-row aggregate.
    """
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    j = li.join(part, li.l_partkey == part.p_partkey)
    cond = (
        (
            (F.col("p_brand") == "Brand#1")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(1, 20)
        )
        | (
            (F.col("p_brand") == "Brand#9")
            & F.col("p_size").between(10, 30)
            & F.col("l_quantity").between(10, 30)
        )
        | (
            (F.col("p_brand") == "Brand#20")
            & F.col("p_size").between(20, 50)
            & F.col("l_quantity").between(20, 40)
        )
    )
    return j.filter(cond).agg(
        F.round(F.sum(_rev_dec()).cast("double"), 4).alias("revenue")
    )


def x158_excess_shippers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape: NATION_3 suppliers who shipped an excess
    (> 30 units in 1997) of any 'small%' part.

    The nested ``s_suppkey IN (SELECT ... WHERE ps_partkey IN
    (SELECT p_partkey WHERE name LIKE ...) AND qty > ...)`` chain
    becomes: filtered part -> lineitem join (year-pruned at the
    scan) -> (suppkey, partkey) aggregate -> HAVING -> DISTINCT
    suppkeys -> leftsemi against the nation-filtered supplier dim.
    Every stage after the one fact shuffle is candidate-sized; the
    semi-join keeps supplier attributes out of the aggregate path.
    """
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    sup = load_table(spark, sf_dir, "supplier")
    nat = load_table(spark, sf_dir, "nation")
    psmall = part.filter(F.col("p_name").like("small%")).select("p_partkey")
    excess = (
        li.filter(F.year("l_shipdate") == 1997)
        .join(psmall, li.l_partkey == psmall.p_partkey)
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum(F.col("l_quantity").cast(DECIMAL_T)).alias("qty_dec"))
        .filter(F.col("qty_dec") > 30)
        .select("l_suppkey")
        .distinct()
    )
    return (
        sup.join(
            F.broadcast(nat.filter(F.col("n_name") == "NATION_3")),
            sup.s_nationkey == nat.n_nationkey,
        )
        .join(excess, sup.s_suppkey == excess.l_suppkey, "leftsemi")
        .select("s_suppkey", "s_name")
        .orderBy("s_suppkey")
    )


def x159_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: the supplier(s) with maximum 1996-Q1 revenue.

    The view + scalar-max subquery becomes: per-supplier revenue
    aggregate (decimal), a 1-row max over it cross-joined back, and a
    tie-preserving EQUALITY filter in exact decimal -- float equality
    never decides membership.  Only the winners join the supplier dim
    for names.
    """
    li = load_table(spark, sf_dir, "lineitem")
    sup = load_table(spark, sf_dir, "supplier")
    rev = (
        li.filter(
            (F.col("l_shipdate") >= "1996-01-01")
            & (F.col("l_shipdate") < "1996-04-01")
        )
        .groupBy("l_suppkey")
        .agg(F.sum(_rev_dec()).alias("rev_dec"))
    )
    mx = rev.agg(F.max("rev_dec").alias("max_dec"))
    return (
        rev.crossJoin(F.broadcast(mx))
        .filter(F.col("rev_dec") == F.col("max_dec"))
        .join(sup, F.col("l_suppkey") == sup.s_suppkey)
        .select(
            "s_suppkey",
            "s_name",
            F.round(F.col("rev_dec").cast("double"), 4).alias("total_revenue"),
        )
        .orderBy("s_suppkey")
    )


def x160_order_count_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: distribution of per-customer order counts,
    zero-order customers included.

    LEFT join customer -> (priority-filtered) orders, count the
    non-null orderkeys per customer, then aggregate the counts into a
    histogram.  The first aggregate's key equals the join key, so
    Catalyst reuses the join's hash partitioning -- one customer-key
    shuffle total; the histogram aggregate is count-distinct-sized.
    """
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    o = orders.filter(F.col("o_orderpriority") != "4-NOT SPECIFIED").select(
        "o_custkey", "o_orderkey"
    )
    per_cust = (
        cust.select("c_custkey")
        .join(o, cust.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


def x161_nation_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: NATION_3 <-> NATION_8 shipping volume by year.

    The nation-pair disjunction is applied AFTER both nation joins,
    but each nation dim is pre-filtered to the two relevant names, so
    the supplier/customer joins already discard ~23/25 of their rows
    before the fact table sees them.  nation broadcasts (25 rows at
    any SF); supplier/customer join un-hinted.
    """
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    sup = load_table(spark, sf_dir, "supplier")
    cust = load_table(spark, sf_dir, "customer")
    nat = load_table(spark, sf_dir, "nation")
    pair = ["NATION_3", "NATION_8"]
    ns = nat.filter(F.col("n_name").isin(pair)).select(
        F.col("n_nationkey").alias("sk"), F.col("n_name").alias("supp_nation")
    )
    nc = nat.filter(F.col("n_name").isin(pair)).select(
        F.col("n_nationkey").alias("ck"), F.col("n_name").alias("cust_nation")
    )
    s2 = sup.join(F.broadcast(ns), sup.s_nationkey == F.col("sk")).select(
        "s_suppkey", "supp_nation"
    )
    c2 = cust.join(F.broadcast(nc), cust.c_nationkey == F.col("ck")).select(
        "c_custkey", "cust_nation"
    )
    return (
        li.filter(
            (F.col("l_shipdate") >= "1996-01-01")
            & (F.col("l_shipdate") < "1998-01-01")
        )
        .join(s2, li.l_suppkey == s2.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(c2, orders.o_custkey == c2.c_custkey)
        .filter(
            (
                (F.col("supp_nation") == "NATION_3")
                & (F.col("cust_nation") == "NATION_8")
            )
            | (
                (F.col("supp_nation") == "NATION_8")
                & (F.col("cust_nation") == "NATION_3")
            )
        )
        .groupBy(
            "supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year")
        )
        .agg(dsum_expr(_REV, "revenue"))
        .select(
            "supp_nation",
            "cust_nation",
            "l_year",
            F.round("revenue", 4).alias("revenue"),
        )
        .orderBy("supp_nation", "cust_nation", "l_year")
    )


def x162_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: NATION_3's share of AMERICA's ECONOMY-part
    order revenue, per order year.

    Share-of-total as one conditional aggregate: the supplier-nation
    CASE rides through the star join, numerator and denominator come
    from the same grouped sum (decimal), and the division happens
    once per year row.  The customer side constrains to region
    AMERICA through the broadcast nation x region chain; ALL supplier
    nations are kept (the denominator needs them) -- only the
    numerator is nation-gated.
    """
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    orders = load_table(spark, sf_dir, "orders")
    sup = load_table(spark, sf_dir, "supplier")
    cust = load_table(spark, sf_dir, "customer")
    nat = load_table(spark, sf_dir, "nation")
    reg = load_table(spark, sf_dir, "region")

    pe = part.filter(F.col("p_type") == "ECONOMY").select("p_partkey")
    am_nat = nat.join(
        reg.filter(F.col("r_name") == "AMERICA"),
        nat.n_regionkey == reg.r_regionkey,
    ).select(F.col("n_nationkey").alias("amk"))
    cam = cust.join(F.broadcast(am_nat), cust.c_nationkey == F.col("amk")).select(
        "c_custkey"
    )
    sn = sup.join(
        F.broadcast(nat.select("n_nationkey", F.col("n_name").alias("supp_nation"))),
        sup.s_nationkey == F.col("n_nationkey"),
    ).select("s_suppkey", "supp_nation")
    j = (
        li.join(pe, li.l_partkey == pe.p_partkey)
        .join(
            orders.filter(
                (F.col("o_orderdate") >= "1996-01-01")
                & (F.col("o_orderdate") < "1998-01-01")
            ),
            li.l_orderkey == F.col("o_orderkey"),
        )
        .join(cam, F.col("o_custkey") == cam.c_custkey, "leftsemi")
        .join(sn, li.l_suppkey == sn.s_suppkey)
    )
    g = j.groupBy(F.year("o_orderdate").alias("o_year")).agg(
        F.sum(
            F.when(F.col("supp_nation") == "NATION_3", _rev_dec()).otherwise(
                F.lit(0).cast(DECIMAL_T)
            )
        ).alias("nat_dec"),
        F.sum(_rev_dec()).alias("tot_dec"),
    )
    return g.select(
        "o_year",
        F.round(
            F.col("nat_dec").cast("double") / F.col("tot_dec").cast("double"), 6
        ).alias("mkt_share"),
    ).orderBy("o_year")


def x163_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape: profit on 'gear' parts by supplier nation and
    order year.

    The fixture has no partsupp.ps_supplycost, so cost is the
    deterministic proxy ``0.1 * p_retailprice * l_quantity`` -- the
    join/aggregate shape (5-table star, LIKE-filtered part, two-key
    rollup) is Q9's.  The profit expression evaluates in IEEE double
    per row (identical on any engine) and only the summation goes
    through decimal.
    """
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    orders = load_table(spark, sf_dir, "orders")
    sup = load_table(spark, sf_dir, "supplier")
    nat = load_table(spark, sf_dir, "nation")
    pg = part.filter(F.col("p_name").like("%gear%")).select(
        "p_partkey", "p_retailprice"
    )
    sn = sup.join(
        F.broadcast(nat.select("n_nationkey", F.col("n_name").alias("nation"))),
        sup.s_nationkey == F.col("n_nationkey"),
    ).select("s_suppkey", "nation")
    profit = (
        F.expr(_REV) - 0.1 * F.col("p_retailprice") * F.col("l_quantity")
    ).cast(DECIMAL_T)
    return (
        li.join(pg, li.l_partkey == pg.p_partkey)
        .join(sn, li.l_suppkey == sn.s_suppkey)
        .join(orders, li.l_orderkey == F.col("o_orderkey"))
        .groupBy("nation", F.year("o_orderdate").alias("o_year"))
        .agg(F.round(F.sum(profit).cast("double"), 4).alias("sum_profit"))
        .orderBy("nation", F.desc("o_year"))
    )


def x172_late_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: order-priority census of 1996-Q3 orders with at
    least one late-shipped lineitem (EXISTS -> leftsemi).

    The fixture has no l_commitdate, so "late" is ``l_shipdate >
    o_orderdate + 60 days`` -- the decorrelation is identical: the
    correlated EXISTS becomes a leftsemi join against the (date-
    filtered) orders relation, evaluated ONCE, never per outer row.
    The date filter lands on the orders scan; the semi join keeps
    lineitem attributes out of the aggregate.
    """
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    oq = orders.filter(
        (F.col("o_orderdate") >= "1996-07-01")
        & (F.col("o_orderdate") < "1996-10-01")
    )
    late = li.join(
        oq.select("o_orderkey", "o_orderdate"),
        li.l_orderkey == F.col("o_orderkey"),
    ).filter(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS"))
    return (
        oq.join(
            late.select("l_orderkey").distinct(),
            oq.o_orderkey == F.col("l_orderkey"),
            "leftsemi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


def x173_priority_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: per line status, how many late-shipped items
    came from high- vs low-priority orders.

    The two-level CASE census after one lineitem-orders join: both
    counts come out of the SAME grouped aggregate (no second pass),
    the date-range filter prunes the lineitem scan, and the priority
    classification is a broadcastless in-row expression.  The fixture
    lacks l_shipmode, so l_linestatus stands in as the grouping
    dimension; the plan shape is Q12's exactly.
    """
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    j = (
        li.filter(
            (F.col("l_shipdate") >= "1997-01-01")
            & (F.col("l_shipdate") < "1998-01-01")
        )
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .filter(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS"))
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        j.groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(high, 0).otherwise(1)).alias("low_line_count"),
        )
        .orderBy("l_linestatus")
    )


def x174_parts_supplier_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: per (brand, type, size) of qualifying parts,
    how many DISTINCT suppliers ship them — excluding blacklisted
    suppliers via NOT IN (anti-join).

    The supplier exclusion (negative-balance stand-in for Q16's
    complaint suppliers) is a leftsemi-complement: the supplier key
    set is filtered BEFORE the distinct-count aggregate, so excluded
    suppliers never inflate partial aggregates.  The part-side
    disjunction (brand <>, size IN) pushes to the part scan; the
    part-supplier relation derives from lineitem (no partsupp in the
    fixture) with one fact shuffle.
    """
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    sup = load_table(spark, sf_dir, "supplier")
    pq = part.filter(
        (F.col("p_brand") != "Brand#9")
        & F.col("p_size").isin(5, 10, 15, 20, 25, 30, 35, 40)
    ).select("p_partkey", "p_brand", "p_type", "p_size")
    bad = sup.filter(F.col("s_acctbal") < 0).select("s_suppkey")
    ps = (
        li.join(pq, li.l_partkey == pq.p_partkey)
        .join(bad, li.l_suppkey == bad.s_suppkey, "left_anti")
        .select("p_brand", "p_type", "p_size", "l_suppkey")
        .distinct()
    )
    return (
        ps.groupBy("p_brand", "p_type", "p_size")
        .agg(F.count(F.lit(1)).alias("supplier_cnt"))
        .orderBy(F.desc("supplier_cnt"), "p_brand", "p_type", "p_size")
    )


# ---------------------------------------------------------------------------
# wave 42: the final three TPC-H shapes (Q5, Q6, Q21)
# ---------------------------------------------------------------------------


def x261_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: revenue served by LOCAL suppliers (customer and
    supplier in the same nation) for ASIA-region customers over one
    order year, by nation.

    The five-table star chain joins on keys only; the same-nation
    predicate is the Q5 signature — it lands as an equi-condition of
    the customer↔supplier join pair, not a filter after a cross
    product.  Region/nation dims are schema-bounded broadcasts; the
    orders date filter prunes before the fact join.
    """
    from go_mapreduce_spark.functions.numeric import dsum_expr

    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01")
        & (F.col("o_orderdate") < "1997-01-01")
    )
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region")
    asia_nations = nation.join(
        F.broadcast(region.filter(F.col("r_name") == "ASIA")),
        nation.n_regionkey == region.r_regionkey,
    ).select("n_nationkey", "n_name")
    return (
        li.join(orders.select("o_orderkey", "o_custkey"), li.l_orderkey == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == cust.c_custkey)
        # supplier scales with SF (data-sized): no broadcast hint, AQE
        # decides (x138 rule)
        .join(
            supp,
            (li.l_suppkey == supp.s_suppkey)
            & (cust.c_nationkey == supp.s_nationkey),
        )
        .join(F.broadcast(asia_nations), supp.s_nationkey == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(
            F.round(
                dsum_expr("l_extendedprice * (1 - l_discount)", "rev"), 4
            ).alias("revenue")
        )
        .orderBy(F.col("revenue").desc(), "n_name")
    )


def x262_forecast_revenue_change(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: revenue that would have been gained by
    eliminating small discounts — one tight filter-aggregate whose
    predicates ALL push to the parquet scan (year range on shipdate,
    discount band, quantity cap); the whole query is a single
    map-side decimal sum, the cheapest plan Spark can emit.
    """
    from go_mapreduce_spark.functions.numeric import dsum_expr

    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= "1996-01-01")
            & (F.col("l_shipdate") < "1997-01-01")
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_items"),
            F.round(
                dsum_expr("l_extendedprice * l_discount", "rev"), 4
            ).alias("revenue"),
        )
    )


WAITING_TOP_N = 20


def x263_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape: suppliers who kept finished multi-supplier
    orders waiting — their item shipped late while EVERY other
    supplier on the order shipped on time (the fixture's late rule:
    shipdate > orderdate + 60 days, per x172).

    Q21's EXISTS + NOT-EXISTS pair over self-joined lineitem is
    rewritten as ONE per-order aggregate: n_suppliers (distinct) and
    n_late_suppliers (distinct over late items) — then the verdict
    "order waited on exactly supplier s" is the relational predicate
    ``n_suppliers > 1 AND n_late_suppliers = 1`` joined back to s's
    late items.  The fact table is scanned once and shuffled once on
    orderkey; no correlated re-scan per outer row, no second
    self-join of lineitem.  Top-N is a TakeOrderedAndProject.
    """
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderstatus") == "F"
    )
    j = li.join(
        orders.select("o_orderkey", "o_orderdate"),
        li.l_orderkey == F.col("o_orderkey"),
    ).withColumn(
        "is_late",
        (
            F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
        ).cast("int"),
    )
    per_order = j.groupBy("l_orderkey").agg(
        F.count_distinct("l_suppkey").alias("n_suppliers"),
        F.count_distinct(
            F.when(F.col("is_late") == 1, F.col("l_suppkey"))
        ).alias("n_late_suppliers"),
    )
    waited = (
        j.filter(F.col("is_late") == 1)
        .join(
            per_order.filter(
                (F.col("n_suppliers") > 1) & (F.col("n_late_suppliers") == 1)
            ).select("l_orderkey"),
            "l_orderkey",
        )
        .select("l_orderkey", "l_suppkey")
        .distinct()
    )
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        waited.join(supp, waited.l_suppkey == supp.s_suppkey)  # AQE decides
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).cast("bigint").alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
        .limit(WAITING_TOP_N)
    )
