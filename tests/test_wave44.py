"""Wave-44 tests: LPA convergence semantics on a hand graph, pipe
lowering parity, collation case-folding."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_x267_lpa_on_two_cliques_with_bridge(spark):
    """Two 3-cliques joined by one bridge edge: after 3 synchronous
    min-tiebreak rounds every node must carry its clique's minimum
    id, communities stay separate across the bridge."""
    from go_mapreduce_spark.operators.graph import LPA_ROUNDS

    # clique A: 1-2-3 ; clique B: 10-11-12 ; bridge 3-10
    und = [(1, 2), (1, 3), (2, 3), (10, 11), (10, 12), (11, 12), (3, 10)]
    edges = spark.createDataFrame(
        und + [(b, a) for a, b in und], "u long, v long"
    )
    labels = edges.select(F.col("u").alias("node")).distinct().select(
        "node", F.col("node").alias("label")
    )
    for _ in range(LPA_ROUNDS):
        neigh = edges.join(labels, edges.u == labels.node).select(
            F.col("v").alias("node"), "label"
        )
        votes = neigh.groupBy("node", "label").agg(F.count(F.lit(1)).alias("cnt"))
        labels = votes.groupBy("node").agg(
            F.min(F.struct((-F.col("cnt")).alias("neg"), F.col("label").alias("l")))
            .getField("l")
            .alias("label")
        )
    got = {r.node: r.label for r in labels.collect()}
    # reference implementation: the same synchronous rule in Python
    adj: dict[int, list[int]] = {}
    for a, b in und:
        adj.setdefault(a, []).append(b)
        adj.setdefault(b, []).append(a)
    ref = {n: n for n in adj}
    for _ in range(LPA_ROUNDS):
        nxt = {}
        for n, nbrs in adj.items():
            from collections import Counter

            c = Counter(ref[m] for m in nbrs)
            nxt[n] = min(c, key=lambda l: (-c[l], l))
        ref = nxt
    assert got == ref
    # clique A stabilizes on its min id
    assert got[1] == got[2] == got[3] == 1


def test_x267_fixture_communities_partition_nodes(spark, sf_dir):
    from go_mapreduce_spark.operators import graph as G
    from go_mapreduce_spark.operators.dedup import x6_dedup_ngram_jaccard

    rows = G.x267_label_propagation(spark, sf_dir).collect()
    pairs = x6_dedup_ngram_jaccard(spark, sf_dir).collect()
    nodes = {r.doc_a for r in pairs} | {r.doc_b for r in pairs}
    assert {r.doc_id for r in rows} == nodes
    # community sizes are consistent with the label census
    from collections import Counter

    census = Counter(r.community for r in rows)
    assert all(census[r.community] == r.community_size for r in rows)


def test_x268_pipe_plan_equals_classic(spark, sf_dir):
    from go_mapreduce_spark.operators import relational_ext as RX
    from go_mapreduce_spark.sources.registry import load_table

    got = [tuple(r) for r in RX.x268_pipe_syntax(spark, sf_dir).collect()]
    li = load_table(spark, sf_dir, "lineitem")
    want = [
        tuple(r)
        for r in li.filter(F.col("l_shipdate") <= "1998-09-01")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            F.round(
                F.sum(F.col("l_quantity").cast("decimal(38,6)")).cast("double"), 4
            ).alias("sum_qty"),
            F.round(
                F.sum(
                    (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
                        "decimal(38,6)"
                    )
                ).cast("double"),
                4,
            ).alias("sum_disc_price"),
        )
        .orderBy("l_returnflag", "l_linestatus")
        .collect()
    ]
    assert got == want


def test_x269_collation_folds_mixed_case(spark):
    """UTF8_LCASE grouping must merge case variants of the same key."""
    df = spark.createDataFrame(
        [("1-Urgent", 10.0), ("1-URGENT", 20.0), ("2-high", 5.0)],
        "o_orderpriority string, o_totalprice double",
    )
    df.createOrReplaceTempView("_x269_orders")
    rows = {
        r.priority: (r.n_orders, r.total_price)
        for r in spark.sql(
            """SELECT lower(pri) AS priority,
                      CAST(COUNT(*) AS BIGINT) AS n_orders,
                      ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6)))
                            AS DOUBLE), 4) AS total_price
               FROM (SELECT o_orderpriority COLLATE UTF8_LCASE AS pri,
                            o_totalprice
                     FROM _x269_orders)
               GROUP BY pri ORDER BY priority"""
        ).collect()
    }
    assert rows == {"1-urgent": (2, 30.0), "2-high": (1, 5.0)}
