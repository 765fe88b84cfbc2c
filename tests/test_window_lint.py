"""Registry-wide plan lints: unpartitioned windows (round-7 verdict
ask #5) and corpus-side broadcasts (round 12, the x253 lesson).

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


def test_broadcast_explode_lint_catches_a_deliberate_violation(spark, sf_dir):
    """The x253 failure mode, reconstructed: a join whose broadcast
    side is an explode over the documents table (corpus-sized fan-out
    shipped through the driver)."""
    from go_mapreduce_spark.plans.explain import broadcasts_over_exploded_data

    docs = load_table(spark, sf_dir, "documents")
    grams = docs.select(
        "doc_id",
        F.explode(F.split(F.lower("text"), r"\s+")).alias("g"),
    )
    dim = docs.groupBy(F.substring("lang", 1, 2).alias("g")).count()
    viol = F.broadcast(grams).join(dim, "g")
    hits = broadcasts_over_exploded_data(viol)
    assert hits, "broadcast of an exploded corpus stream must be flagged"
    # the scale-correct direction — broadcast the bounded aggregate —
    # passes (the Aggregate bounds the walk)
    ok = grams.join(F.broadcast(dim), "g")
    assert not broadcasts_over_exploded_data(ok)
    # corpus x corpus self-join: no bounded side exists to hint, the
    # local broadcast is Catalyst's size-based pick (flips to SMJ at
    # scale) — allowed (x178/x227's candidate-join shape)
    self_join = grams.alias("a").join(
        grams.alias("b"),
        (F.col("a.g") == F.col("b.g"))
        & (F.col("a.doc_id") < F.col("b.doc_id")),
    )
    assert not broadcasts_over_exploded_data(self_join)
    # probe slice: explode over a point/range literal key filter is
    # bounded by selectivity — allowed (x41/x420's 5-vector probes)
    probe = (
        docs.filter(F.col("doc_id").between(1, 5))
        .select("doc_id", F.explode(F.split(F.lower("text"), r"\s+")).alias("g"))
    )
    sliced = F.broadcast(probe).join(docs.select("doc_id"), "doc_id")
    assert not broadcasts_over_exploded_data(sliced)


def test_registry_has_no_unpartitioned_windows_over_data(spark, sf_dir):
    """Walks every registry query's pre-execution physical plan
    (~5 min: some query builders embed actions — streaming replays,
    iterative fixpoints) and applies BOTH plan lints in the one walk:
    unpartitioned windows over data-sized scans (round 7) and
    corpus-side broadcasts of exploded data (round 12 — the x253
    gram-join bug; see SCALE.md round-12 notes).  Full-sweep verified
    green in round 8 (417/417) and round 12 (429/429); this keeps it
    true."""
    from go_mapreduce_spark.plans.explain import broadcasts_over_exploded_data
    from go_mapreduce_spark.queries import QUERIES

    offenders: dict[str, list[str]] = {}
    for name, fn in QUERIES.items():
        df = fn(spark, sf_dir)
        hits = [
            *windows_over_unbounded_input(df),
            *broadcasts_over_exploded_data(df),
        ]
        if hits:
            offenders[name] = [h[:160] for h in hits[:2]]
    assert not offenders, f"plan-lint offenders: {offenders}"
