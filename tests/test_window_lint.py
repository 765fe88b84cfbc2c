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


# Historically lint-relevant queries (past offenders and the
# window/broadcast-heaviest shapes) — always linted, even in the
# default fast subset.
_LINT_PINNED = (
    "x74_skipgram_cooc",
    "x94_measure_corr",
    "x106_column_profile",
    "x142_skipping_estimate",
    "x241_pmi_pairs",
    "x247_rfm_segments",
    "x253_naive_bayes_langid",
    "x297_mmr_selection",
    "x298_textrank_keywords",
    "x300_theil_sen",
    "x314_markov_stationary",
    "x316_lsh_band_advisor",
    "x320_permutation_test",
    "x338_lorenz_deciles",
    "x386_column_stats",
)


def _lint_sweep_names():
    """Default: a deterministic fast subset — the pinned historical
    offenders plus every 8th registry query by sorted name, excluding
    the I/O-class tag set (stream replays and iterative fixpoints
    embed ACTIONS in their builders; building them costs seconds each
    and sank the round-12 driver pytest run at 217 s for this one
    test).  ``SPARK_GRAFT_FULL_SWEEP=1`` restores the full 432-query
    sweep — run at round close (tools/round_close.py documents it),
    where the 4-minute wall is paid once per round instead of on
    every suite run."""
    import os

    from go_mapreduce_spark.queries import IO_TMP_STATE_QUERIES, QUERIES

    names = sorted(QUERIES)
    if os.environ.get("SPARK_GRAFT_FULL_SWEEP"):
        return names
    io_class = IO_TMP_STATE_QUERIES
    sample = [n for i, n in enumerate(names) if i % 8 == 0 and n not in io_class]
    return sorted(set(sample) | (set(_LINT_PINNED) & set(names)))


def test_registry_has_no_unpartitioned_windows_over_data(spark, sf_dir):
    """Walks registry queries' pre-execution physical plans and
    applies BOTH plan lints in the one walk: unpartitioned windows
    over data-sized scans (round 7) and corpus-side broadcasts of
    exploded data (round 12 — the x253 gram-join bug; see SCALE.md
    round-12 notes).  Full-sweep verified green in round 8 (417/417),
    round 12 (429/429) and round 13 (SPARK_GRAFT_FULL_SWEEP=1); the
    default run lints the deterministic subset (_lint_sweep_names) so
    the suite fits the external driver's pytest budget."""
    from go_mapreduce_spark.plans.explain import broadcasts_over_exploded_data
    from go_mapreduce_spark.queries import QUERIES

    offenders: dict[str, list[str]] = {}
    for name in _lint_sweep_names():
        df = QUERIES[name](spark, sf_dir)
        hits = [
            *windows_over_unbounded_input(df),
            *broadcasts_over_exploded_data(df),
        ]
        if hits:
            offenders[name] = [h[:160] for h in hits[:2]]
    assert not offenders, f"plan-lint offenders: {offenders}"
