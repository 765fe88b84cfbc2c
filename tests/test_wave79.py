"""Wave-79 property tests: join-MV IVM equals recompute bit-for-bit,
HT unbiasedness sanity, sequential-monitoring coherence."""

from __future__ import annotations

from pyspark.sql import functions as F

from go_mapreduce_spark import lakehouse as LH
from go_mapreduce_spark.operators import curation as C
from go_mapreduce_spark.operators import stats as ST
from go_mapreduce_spark.sources.registry import load_table


def test_x368_ivm_equals_recompute(spark, sf_dir):
    got = {
        r.c_mktsegment: (r.n_orders, r.total_price)
        for r in LH.x368_join_mv_ivm(spark, sf_dir).collect()
    }
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    k = F.col("o_orderkey")
    facts_v2 = (
        orders.filter((k % 4 < 3) & (k % 16 != 2))
        .select(
            "o_custkey",
            F.when(
                k % 16 == 9, F.col("o_totalprice") + 1000.0
            ).otherwise(F.col("o_totalprice")).alias("price"),
        )
        .unionByName(
            orders.filter(k % 4 == 3).select(
                "o_custkey", F.col("o_totalprice").alias("price")
            )
        )
    )
    dim_v2 = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("o_custkey"),
        F.when(F.col("c_custkey") % 10 == 7, "MOVED")
        .otherwise(F.col("c_mktsegment"))
        .alias("seg"),
    )
    want = {
        r.seg: (r.n, r.t)
        for r in facts_v2.join(dim_v2, "o_custkey")
        .groupBy("seg")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(
                F.sum(F.col("price").cast("decimal(38,6)")).cast("double"),
                2,
            ).alias("t"),
        )
        .collect()
    }
    assert got == want
    assert "MOVED" in got


def test_x368_maintenance_never_rescans_base_fact(spark, sf_dir):
    """Round-6 verdict ask #7: maintenance after the CDC batch must be
    churn-proportional — driven by the MVs, the deltas, and the
    dimension only.  Feed mv_maintain() checkpointed MVs and deltas
    (as a real incremental pipeline would: the MVs are stored tables,
    the CDC batch arrives from outside) and assert the optimized plan
    scans NO fact parquet.  If someone "simplifies" maintenance into a
    recompute over the base orders table, the scan appears and this
    fails."""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    k = F.col("o_orderkey")
    facts_v1 = orders.filter(k % 4 < 3)
    dim_v1 = (
        load_table(spark, sf_dir, "customer")
        .select(F.col("c_custkey").alias("ck"), F.col("c_mktsegment").alias("seg"))
        .localCheckpoint()
    )
    aux = (
        facts_v1.groupBy(F.col("o_custkey").alias("ck"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("o_totalprice").cast("decimal(38,6)")).alias("v"),
        )
        .localCheckpoint()
    )
    mv = (
        aux.join(dim_v1, "ck")
        .groupBy("seg")
        .agg(F.sum("n").alias("n"), F.sum("v").cast("decimal(38,6)").alias("v"))
        .localCheckpoint()
    )
    dfact = (
        orders.filter(k % 4 == 3)
        .groupBy(F.col("o_custkey").alias("ck"))
        .agg(
            F.count(F.lit(1)).alias("d_n"),
            F.sum(F.col("o_totalprice").cast("decimal(38,6)")).alias("d_v"),
        )
        .localCheckpoint()
    )
    moves = (
        dim_v1.filter(F.col("ck") % 10 == 7)
        .select("ck", F.col("seg").alias("s_old"), F.lit("MOVED").alias("s_new"))
        .localCheckpoint()
    )
    _, mv2 = LH.mv_maintain(aux, mv, dfact, dim_v1, moves)
    plan = mv2._jdf.queryExecution().optimizedPlan().toString()
    # every input is a checkpointed LogicalRDD, so ANY parquet relation
    # in the maintenance plan means a base-table rescan leaked in
    assert "parquet" not in plan.lower(), plan[:2000]
    # and the maintained state is still the exact v2 answer
    rows = {r.seg: r.n for r in mv2.collect()}
    assert rows.get("MOVED", 0) > 0


def test_x369_ht_sanity(spark, sf_dir):
    r = C.x369_horvitz_thompson(spark, sf_dir).collect()[0]
    assert 0 < r.n_sample < r.n_pop
    assert r.ht_total > 0 and r.true_total > 0
    # the HT estimate should land within ~4 SE of the truth
    assert abs(r.ht_total - r.true_total) < 4.0 * r.se_ht + 1e-6
    assert abs(r.rel_err_pct) < 25.0
    # size-biased draw: sampling fraction well above the price floor
    # alone would give, but far below 100%
    assert 0.01 < r.n_sample / r.n_pop < 0.9


def test_x370_sequential_coherence(spark, sf_dir):
    rows = sorted(
        ST.x370_sequential_monitoring(spark, sf_dir).collect(),
        key=lambda r: r.look,
    )
    assert [r.look for r in rows] == [1, 2, 3, 4]
    # boundaries are the pinned OBF ladder, strictly decreasing
    assert [r.obf_bound for r in rows] == list(ST.OBF_BOUNDS)
    # cumulative looks: sample sizes nondecreasing
    na = [r.n_a for r in rows]
    nb = [r.n_b for r in rows]
    assert na == sorted(na) and nb == sorted(nb)
    for r in rows:
        assert r.n_a > 0 and r.n_b > 0
        assert r.crossed == (1 if abs(r.z_score) > r.obf_bound else 0)
    # a null A/A split on synthetic data must not cross OBF at any
    # look (boundary 1 is > 4 sigma)
    assert rows[0].crossed == 0
