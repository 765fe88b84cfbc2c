"""Property tests for wave 21: content-defined chunking (x192), SQL
session variables (x193), dynamic partition pruning (x194)."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F


def _chunks(text: str):
    """Python replay of the x192 rolling-hash chunker."""
    from go_mapreduce_spark.operators.dedup import (
        CDC_B,
        CDC_MASK,
        CDC_MOD,
        CDC_WINDOW,
    )

    codes = [ord(c) for c in text]
    n = len(codes)
    bpos = []
    for i in range(CDC_WINDOW, n + 1):  # 1-based boundary position
        h = 0
        for k in range(CDC_WINDOW):
            h += codes[i - CDC_WINDOW + k] * CDC_B ** (CDC_WINDOW - 1 - k)
        if (h % CDC_MOD) % CDC_MASK == 0:
            bpos.append(i)
    starts = [0] + bpos
    ends = bpos + [n]
    return [text[s:e] for s, e in zip(starts, ends) if e > s]


def test_cdc_matches_python_replay(spark, sf_dir):
    from go_mapreduce_spark.operators.dedup import x192_cdc_chunks
    from go_mapreduce_spark.sources.registry import load_table

    docs = {
        r.doc_id: r.text
        for r in load_table(spark, sf_dir, "documents").collect()
    }
    hashes: dict[int, list[str]] = {
        d: [hashlib.sha256(c.encode()).hexdigest() for c in _chunks(t)]
        for d, t in docs.items()
    }
    doc_count: dict[str, set] = {}
    for d, hs in hashes.items():
        for h in hs:
            doc_count.setdefault(h, set()).add(d)
    for r in x192_cdc_chunks(spark, sf_dir).collect():
        hs = hashes[r.doc_id]
        assert r.n_chunks == len(hs), r.doc_id
        assert r.n_shared_chunks == sum(
            1 for h in hs if len(doc_count[h]) > 1
        ), r.doc_id


def test_cdc_shift_robustness():
    """The CDC property fixed-width blocking lacks: inserting a prefix
    leaves the chunk set of the unchanged suffix mostly intact."""
    base = (
        "the quick brown fox jumps over the lazy dog and then runs far "
        "away into the deep dark forest where nobody ever goes at night "
        "while the moon rises slowly over the silent hills beyond the "
        "river that flows gently toward the distant sea under the stars"
    ) * 3
    shifted = "INSERTED PREAMBLE >> " + base
    a, b = set(_chunks(base)), set(_chunks(shifted))
    assert len(a) >= 4  # enough chunks for the property to be meaningful
    # all but the first chunk(s) around the splice must survive
    assert len(a & b) >= len(a) - 2


def test_sql_variables_median_split(spark, sf_dir):
    from go_mapreduce_spark.operators.relational_ext import x193_sql_variables
    from go_mapreduce_spark.sources.registry import load_table

    import statistics

    prices = [
        r.o_totalprice
        for r in load_table(spark, sf_dir, "orders")
        .select("o_totalprice")
        .collect()
    ]
    med = round(statistics.median(prices), 6)
    expected_n = sum(1 for p in prices if p > med)
    out = x193_sql_variables(spark, sf_dir).collect()
    assert sum(r.n_above for r in out) == expected_n


def test_dpp_triggers_partition_pruning(spark, sf_dir):
    """The executed plan must carry a dynamic-pruning subquery on the
    fact scan's partition column — the reason the partitioned layout
    exists."""
    from go_mapreduce_spark.operators.relational import x194_dpp_join

    df = x194_dpp_join(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString().lower()
    assert "dynamicpruning" in plan, plan[:2000]
    # and the result matches the straight computation
    from go_mapreduce_spark.functions.numeric import dsum
    from go_mapreduce_spark.sources.registry import load_table

    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    years = (
        orders.filter(F.col("o_orderpriority") == "1-URGENT")
        .select(F.year("o_orderdate").alias("ship_year"))
        .distinct()
    )
    direct = {
        r.ship_year: (r.n_rows, r.revenue)
        for r in li.withColumn("ship_year", F.year("l_shipdate"))
        .join(years, "ship_year")
        .groupBy("ship_year")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.round(
                dsum(
                    F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount")),
                    "rev",
                ),
                4,
            ).alias("revenue"),
        )
        .collect()
    }
    got = {r.ship_year: (r.n_rows, r.revenue) for r in df.collect()}
    assert got == direct
