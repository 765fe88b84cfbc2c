"""Wave-42 tests: the Q21 rewrite against a brute-force EXISTS/NOT
EXISTS evaluation, and Q5's local-supplier predicate."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F


def test_x263_matches_brute_force_exists(spark, sf_dir):
    from go_mapreduce_spark.operators import tpch as TP
    from go_mapreduce_spark.sources.registry import load_table

    got = {r.s_name: r.numwait for r in TP.x263_waiting_suppliers(spark, sf_dir).collect()}
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    ).collect()
    orders = {
        r.o_orderkey: r.o_orderdate
        for r in load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "F")
        .select("o_orderkey", "o_orderdate")
        .collect()
    }
    per_order: dict = {}
    for r in li:
        od = orders.get(r.l_orderkey)
        if od is None:
            continue
        late = r.l_shipdate > od + datetime.timedelta(days=60)
        supps, lates = per_order.setdefault(r.l_orderkey, (set(), set()))
        supps.add(r.l_suppkey)
        if late:
            lates.add(r.l_suppkey)
    waits: dict = {}
    for _, (supps, lates) in per_order.items():
        # EXISTS another supplier on the order; NOT EXISTS another
        # late supplier -> exactly one late supplier, >1 total
        if len(supps) > 1 and len(lates) == 1:
            s = next(iter(lates))
            waits[s] = waits.get(s, 0) + 1
    names = {
        r.s_suppkey: r.s_name
        for r in load_table(spark, sf_dir, "supplier").collect()
    }
    want_full = sorted(
        ((n, names[s]) for s, n in waits.items()), key=lambda p: (-p[0], p[1])
    )[: TP.WAITING_TOP_N]
    assert got == {name: n for n, name in want_full}


def test_x261_only_local_pairs_count(spark, sf_dir):
    from go_mapreduce_spark.operators import tpch as TP
    from go_mapreduce_spark.sources.registry import load_table

    rows = TP.x261_local_supplier_volume(spark, sf_dir).collect()
    # ASIA holds 5 of the 25 nations; only same-nation pairs qualify
    assert 0 < len(rows) <= 5
    asia = {
        r.n_name
        for r in load_table(spark, sf_dir, "nation")
        .join(
            load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA"),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .collect()
    }
    assert {r.n_name for r in rows} <= asia
    assert all(r.revenue > 0 for r in rows)
