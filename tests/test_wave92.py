"""Wave-92 property tests: Shapley efficiency axiom, expectation-suite
completeness."""

from __future__ import annotations

from pyspark.sql import functions as F

from go_mapreduce_spark.operators import analytics as AN
from go_mapreduce_spark.operators import relational_ext as RX
from go_mapreduce_spark.sources.registry import load_table


def test_x403_efficiency_axiom(spark, sf_dir):
    rows = AN.x403_shapley_attribution(spark, sf_dir).collect()
    assert {r.channel for r in rows} == set(AN.SHAPLEY_CHANNELS)
    total = sum(r.shapley_credit for r in rows)
    # efficiency: sum of credits = v(grand coalition) - v(empty set),
    # recomputed directly from the exposure cells
    ev = load_table(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(
        *[
            F.max((F.col("event_type") == c).cast("int")).alias(f"c{i}")
            for i, c in enumerate(AN.SHAPLEY_CHANNELS)
        ],
        F.max((F.col("event_type") == "purchase").cast("int")).alias("conv"),
    )
    cells = {
        r.mask: (r.n, r.k)
        for r in per_user.select(
            (F.col("c0") + 2 * F.col("c1") + 4 * F.col("c2")).alias("mask"),
            "conv",
        )
        .groupBy("mask")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("conv").alias("k"))
        .collect()
    }
    v7 = cells.get(7, (1, 0))[1] / cells.get(7, (1, 0))[0]
    v0 = cells.get(0, (1, 0))[1] / cells.get(0, (1, 0))[0]
    assert abs(total - (v7 - v0)) < 5e-6
    # per player, coalition weights sum to 1: C(2,s) copies of w[s]
    assert abs(
        AN.SHAPLEY_W[0] + 2 * AN.SHAPLEY_W[1] + AN.SHAPLEY_W[2] - 1.0
    ) < 1e-12


def test_x404_suite_passes_on_fixture(spark, sf_dir):
    rows = {r.expectation: r for r in RX.x404_expectation_suite(spark, sf_dir).collect()}
    assert len(rows) == 6
    # the fixture is clean by construction: every expectation holds
    for name, r in rows.items():
        assert r.passed, f"{name} failed with observed={r.observed}"
    assert int(rows["row_count_positive"].observed) > 0
    assert ".." in rows["orderdate_in_range"].observed
