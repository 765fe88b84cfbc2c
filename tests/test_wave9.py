"""Property tests for wave-9 operators (PIT join, skyline, BPE step).

The oracle gate proves fixture equality; these pin the *semantic
invariants* on adversarial synthetic inputs the fixtures don't
exercise (price ties on the skyline, same-ts SCD2 edges).
"""

from __future__ import annotations

import pyspark.sql.functions as F


def test_pareto_sweep_equals_bruteforce_with_ties(spark):
    """The sorted-sweep frontier must equal the O(N²) NOT-EXISTS
    definition on data with duplicate prices AND exact ties."""
    rows = [
        # (partkey, price, size)
        (1, 10.0, 5),
        (2, 10.0, 7),   # same price, larger size → 1 dominated
        (3, 10.0, 7),   # exact tie with 2 → both on frontier
        (4, 9.0, 7),    # cheaper, same size as 2/3 → dominates them
        (5, 9.0, 6),    # same price as 4, smaller → dominated
        (6, 12.0, 9),   # pricier but biggest → frontier
        (7, 8.0, 1),    # cheapest → frontier
        (8, 12.0, 9),   # exact tie with 6 → frontier
    ]
    df = spark.createDataFrame(rows, "p_partkey int, p_retailprice double, p_size int")

    # brute force
    a, b = df.alias("a"), df.alias("b")
    dominated = (
        a.join(
            b,
            (F.col("b.p_retailprice") <= F.col("a.p_retailprice"))
            & (F.col("b.p_size") >= F.col("a.p_size"))
            & (
                (F.col("b.p_retailprice") < F.col("a.p_retailprice"))
                | (F.col("b.p_size") > F.col("a.p_size"))
            ),
            "left_semi",
        )
        .select("a.p_partkey")
    )
    brute = {r.p_partkey for r in df.select("p_partkey").subtract(dominated).collect()}

    # the x131 sweep, inlined on the synthetic relation
    from pyspark.sql.window import Window

    per_price = df.groupBy("p_retailprice").agg(F.max("p_size").alias("pmax"))
    w = Window.orderBy("p_retailprice").rowsBetween(Window.unboundedPreceding, -1)
    levels = per_price.withColumn("run_cheaper", F.max("pmax").over(w))
    sweep = {
        r.p_partkey
        for r in df.join(levels, "p_retailprice")
        .filter(
            (F.col("p_size") == F.col("pmax"))
            & (
                F.col("run_cheaper").isNull()
                | (F.col("p_size") > F.col("run_cheaper"))
            )
        )
        .select("p_partkey")
        .collect()
    }
    assert sweep == brute == {4, 6, 7, 8}


def test_pit_join_fanout_is_one(spark, sf_dir):
    """Every purchase matches at most one SCD2 interval — row count
    equals purchase count even with same-ts event ties."""
    from go_mapreduce_spark.operators.cdc import x129_pit_join
    from go_mapreduce_spark.sources.registry import load_table

    out = x129_pit_join(spark, sf_dir)
    n_purchases = (
        load_table(spark, sf_dir, "events")
        .filter(F.col("event_type") == "purchase")
        .count()
    )
    assert out.count() == n_purchases
    assert out.select("event_id").distinct().count() == n_purchases


def test_bpe_pairs_cover_only_adjacent_chars(spark, sf_dir):
    from go_mapreduce_spark.operators.text import x133_bpe_merge_step

    rows = x133_bpe_merge_step(spark, sf_dir).collect()
    assert rows and all(len(r.pair) == 2 for r in rows)
    counts = [r.cnt for r in rows]
    assert counts == sorted(counts, reverse=True)
