"""Registry-wide unpartitioned-window lint (round-7 verdict ask #5).

The bench log sprays "No Partition Defined for Window operation"
warnings; every traced case fed a provably bounded relation (replicate
grids, per-day rollups, d-row matrices) — but that discipline was by
convention only.  This makes it a gate: no registry query may plan a
single-partition WindowExec whose input subtree reaches a data-sized
table scan without a bounding aggregate/limit in between.  Bounded
shapes pass because the aggregate below the window terminates the
plan walk (see plans/explain.windows_over_unbounded_input).
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from go_mapreduce_spark.plans.explain import windows_over_unbounded_input
from go_mapreduce_spark.sources.registry import load_table


def test_lint_catches_a_deliberate_violation(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    viol = li.withColumn(
        "rn", F.row_number().over(Window.orderBy("l_orderkey"))
    )
    hits = windows_over_unbounded_input(viol)
    assert hits, "global row_number over the raw fact must be flagged"
    assert "Window" in hits[0]


def test_lint_allows_bounded_and_partitioned_shapes(spark, sf_dir):
    li = load_table(spark, sf_dir, "lineitem")
    # window over an aggregate output: bounded, allowed
    agg = li.groupBy("l_linestatus").agg(F.sum("l_quantity").alias("s"))
    ok1 = agg.withColumn("rn", F.row_number().over(Window.orderBy("s")))
    assert not windows_over_unbounded_input(ok1)
    # partitioned window over the fact: allowed
    ok2 = li.withColumn(
        "rn",
        F.row_number().over(
            Window.partitionBy("l_orderkey").orderBy("l_linenumber")
        ),
    )
    assert not windows_over_unbounded_input(ok2)
    # window over a limited fact: bounded, allowed
    ok3 = li.limit(100).withColumn(
        "rn", F.row_number().over(Window.orderBy("l_orderkey"))
    )
    assert not windows_over_unbounded_input(ok3)


def test_registry_has_no_unpartitioned_windows_over_data(spark, sf_dir):
    """Walks every registry query's pre-execution physical plan
    (~5 min: some query builders embed actions — streaming replays,
    iterative fixpoints).  Full-sweep verified green in round 8
    (417/417); this keeps it true."""
    from go_mapreduce_spark.queries import QUERIES

    offenders: dict[str, list[str]] = {}
    for name, fn in QUERIES.items():
        hits = windows_over_unbounded_input(fn(spark, sf_dir))
        if hits:
            offenders[name] = [h[:160] for h in hits[:2]]
    assert not offenders, f"unpartitioned windows over data-sized scans: {offenders}"
