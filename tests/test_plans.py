"""Plan-shape contract tests: the physical plans that make the 100 TB
design real — pushdown reaches the scan, dims broadcast, top-k avoids
full sorts (SURVEY.md §4 / project scale rules)."""

from __future__ import annotations

import pytest

from go_mapreduce_spark.operators import relational as R
from go_mapreduce_spark.plans.explain import (
    count_nodes,
    formatted_plan,
    has_broadcast_hash_join,
    has_take_ordered,
    pushed_filters,
    scan_read_schema,
    wholestage_codegen_ids,
)


def test_q3_filters_pushed_to_scan(spark, sf_dir):
    df = R.q3_filter_agg(spark, sf_dir)
    pf = " ".join(pushed_filters(df))
    assert "l_discount" in pf and "l_quantity" in pf


def test_q3_column_pruning(spark, sf_dir):
    schemas = scan_read_schema(R.q3_filter_agg(spark, sf_dir))
    assert schemas, "expected a parquet scan"
    # only the three needed columns of lineitem's 11 are read
    for s in schemas:
        assert "l_extendedprice" in s and "l_shipdate" not in s and "l_orderkey" not in s


def test_q4_broadcasts_dimension(spark, sf_dir):
    assert has_broadcast_hash_join(R.q4_broadcast_join(spark, sf_dir))


def test_q5_all_dim_joins_broadcast(spark, sf_dir):
    df = R.q5_multiway_join(spark, sf_dir)
    assert count_nodes(df, "BroadcastHashJoin") == 4
    assert "SortMergeJoin" not in formatted_plan(df)


def test_q7_topk_avoids_global_sort(spark, sf_dir):
    assert has_take_ordered(R.q7_topk(spark, sf_dir))


def test_q2_uses_partial_aggregation(spark, sf_dir):
    plan = formatted_plan(R.q2_grouped_agg(spark, sf_dir))
    assert "HashAggregate" in plan
    # partial + final pairs → at least two HashAggregate nodes
    assert plan.count("HashAggregate") >= 2


def test_wordcount_stays_in_codegen(spark, sf_dir):
    from go_mapreduce_spark.operators.wordcount import q1_word_count

    df = q1_word_count(spark, sf_dir)
    assert wholestage_codegen_ids(df), "expected WholeStageCodegen spans"
    plan = formatted_plan(df)
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_partition_pruning_reaches_scan(spark, sf_dir, tmp_path):
    """A filter on the partition column of a partitioned parquet table
    must become a PartitionFilter (pruned directories, not scanned
    rows) — the layout that turns a 100 TB table into a per-day read."""
    from pyspark.sql import functions as F

    from go_mapreduce_spark.sources.registry import load_table

    out = str(tmp_path / "events_by_type")
    load_table(spark, sf_dir, "events").write.mode("overwrite").partitionBy(
        "event_type"
    ).parquet(out)
    df = spark.read.parquet(out).filter(F.col("event_type") == "click")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan
    pf = plan.split("PartitionFilters: [", 1)[1].split("]", 1)[0]
    assert "event_type" in pf, plan[:1500]
    # and the pruned read returns exactly the filtered rows
    want = load_table(spark, sf_dir, "events").filter(F.col("event_type") == "click").count()
    assert df.count() == want


def test_x52_benchmark_probe_is_broadcast(spark, sf_dir):
    """Decontamination must probe the holdout shingle set via a
    broadcast (semi) join — the corpus side must never shuffle for
    the membership test."""
    from go_mapreduce_spark.operators.curation import x52_decontaminate

    plan = formatted_plan(x52_decontaminate(spark, sf_dir))
    assert "BroadcastExchange" in plan
    assert "LeftSemi" in plan


def test_x56_assignment_aggregates_map_side(spark, sf_dir):
    """Nearest-centroid assignment: centroids broadcast (nested-loop
    over k rows), and the arg-min is a partial+final aggregate — the
    exchange carries one row per vector, never N×k."""
    from go_mapreduce_spark.operators.clustering import x56_kmeans_assign

    plan = formatted_plan(x56_kmeans_assign(spark, sf_dir))
    assert "BroadcastNestedLoopJoin" in plan
    # min(struct) is not hash-aggregable → SortAggregate, still
    # partial+final (partial_min before the exchange)
    assert "partial_min" in plan and plan.count("Aggregate") >= 2
    assert "SortMergeJoin" not in plan


def test_x54_merge_join_is_shuffle_not_nested_loop(spark, sf_dir):
    """The MERGE full-outer join must plan as a key-partitioned
    shuffle join (SMJ/SHJ) — full outer cannot broadcast, and a
    nested loop would be O(N·M)."""
    from go_mapreduce_spark.operators.cdc import x54_merge_upsert

    plan = formatted_plan(x54_merge_upsert(spark, sf_dir))
    assert ("SortMergeJoin" in plan) or ("ShuffledHashJoin" in plan)
    assert "FullOuter" in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_large_large_join_uses_sort_merge(spark, sf_dir):
    """Two fact tables with no broadcast hint and no bucketing: the
    planner must choose a shuffle join (SMJ or shuffled hash), never a
    nested loop — the strategy that scales to fact⋈fact at 100 TB."""
    from go_mapreduce_spark.plans.explain import executed_plan
    from go_mapreduce_spark.sources.registry import load_table

    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    # disable broadcast so fixture-scale stats don't hide the strategy
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = li.join(orders, li.l_orderkey == orders.o_orderkey).select(
            "l_orderkey", "o_totalprice"
        )
        plan = executed_plan(j)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    assert ("SortMergeJoin" in plan) or ("ShuffledHashJoin" in plan), plan[:1500]
    assert "BroadcastNestedLoopJoin" not in plan


def test_x74_skipgram_has_no_joins_at_all(spark, sf_dir):
    """Round-12 rewrite: pairs are generated array-side (nested
    transform + slice, one explode) — the plan must contain NO join
    of any kind; the only shuffle is the final pair count.  (The old
    per-offset equi-join shape paid WINDOW join shuffles of two
    corpus-sized exploded streams and tripped the broadcast-explode
    lint at fixture scale.)"""
    from go_mapreduce_spark.operators.text import x74_skipgram_cooc

    plan = formatted_plan(x74_skipgram_cooc(spark, sf_dir))
    assert "Join" not in plan
    assert "CartesianProduct" not in plan


def test_x66_posting_join_is_equi_with_partial_agg(spark, sf_dir):
    """TF-IDF cosine: posting-list self-join on tok (equi), dot
    products partially aggregated before the exchange."""
    from go_mapreduce_spark.operators.text import x66_tfidf_cosine

    df = x66_tfidf_cosine(spark, sf_dir)
    plan = formatted_plan(df)
    assert "CartesianProduct" not in plan
    # the posting self-join and norm joins are equi joins; the only
    # nested-loop joins are the 1-row corpus-constants broadcasts
    # (replicated per reference to the weighted relation)
    equi = sum(
        count_nodes(df, j)
        for j in ("SortMergeJoin", "ShuffledHashJoin", "BroadcastHashJoin")
    )
    assert equi >= 1
    assert plan.count("HashAggregate") >= 2


def test_x72_centroids_aggregate_map_side(spark, sf_dir):
    """The (label, dim) mean must partial-aggregate before its
    exchange — the explode output never shuffles raw."""
    from go_mapreduce_spark.operators.clustering import x72_label_centroids

    plan = formatted_plan(x72_label_centroids(spark, sf_dir))
    assert "partial" in plan.lower() or plan.count("HashAggregate") >= 2


def test_x79_pricing_filter_pushed_and_partial_agg(spark, sf_dir):
    """The shipdate filter reaches the parquet scan and the wide
    aggregate map-side combines before its constant-size shuffle."""
    from go_mapreduce_spark.operators import relational_ext as RX

    df = RX.x79_pricing_summary(spark, sf_dir)
    pf = " ".join(pushed_filters(df))
    assert "l_shipdate" in pf
    plan = formatted_plan(df)
    assert plan.count("HashAggregate") >= 2  # partial + final
    for s in scan_read_schema(df):
        assert "l_orderkey" not in s  # pruned: 7 of 11 columns read


def test_x83_fences_broadcast_back(spark, sf_dir):
    """The ~|event_types|-row fence table joins back by broadcast —
    the events relation never shuffles for the join."""
    from go_mapreduce_spark.operators import analytics as AN

    assert has_broadcast_hash_join(AN.x83_iqr_outliers(spark, sf_dir))


def test_x80_sessionize_single_user_shuffle(spark, sf_dir):
    """Both window passes and the session group-by reuse ONE hash
    partitioning on user_id: exactly one exchange in the plan."""
    from go_mapreduce_spark.operators import windows as WIN

    plan = formatted_plan(WIN.x80_sessionize(spark, sf_dir))
    # one shuffle keyed on user_id serves windows + group-by; the only
    # other exchange is the final declared-order range partitioning
    assert plan.count("hashpartitioning(user_id") == 1
    assert plan.count("rangepartitioning") <= 1


def test_x84_neighborhood_comparisons_bounded(spark, sf_dir):
    """No join anywhere: candidate generation is window-lead only, so
    the comparison count is SN_WINDOW per doc by construction."""
    from go_mapreduce_spark.operators import dedup as D

    plan = formatted_plan(D.x84_sorted_neighborhood(spark, sf_dir))
    assert "Join" not in plan
    assert "Window" in plan


def test_x96_batch_side_broadcasts(spark, sf_dir):
    """Incremental dedup joins corpus postings against a BROADCAST
    batch side — the corpus (100 TB side) never shuffles for the
    posting join."""
    from go_mapreduce_spark.operators import dedup as D

    plan = formatted_plan(D.x96_incremental_dedup(spark, sf_dir))
    assert "BroadcastHashJoin" in plan


def test_x97_topk_is_heap_based(spark, sf_dir):
    """Q3-shape: TakeOrderedAndProject (per-partition heaps), segment
    filter pushed, customer broadcast."""
    from go_mapreduce_spark.operators import relational_ext as RX

    df = RX.x97_shipping_priority(spark, sf_dir)
    assert has_take_ordered(df)
    assert has_broadcast_hash_join(df)
    pf = " ".join(pushed_filters(df))
    assert "c_mktsegment" in pf and "l_shipdate" in pf


def test_x127_x142_windows_are_partitioned(spark, sf_dir):
    """The exact-rank plans must never contain an unpartitioned
    WindowExec over the fact table (the round-3 single-task
    scale-killer): row numbering runs partitioned by range bucket,
    offsets come from a metadata-sized cumsum."""
    from go_mapreduce_spark.operators import layout as L
    from go_mapreduce_spark.plans.explain import unpartitioned_windows, window_lines

    from go_mapreduce_spark.operators import relational_ext as RX

    for fn in (
        L.x127_equidepth_hist,
        L.x142_skipping_estimate,
        RX.x131_pareto_frontier,
    ):
        df = fn(spark, sf_dir)
        assert window_lines(df), f"{fn.__name__}: expected a window node"
        assert not unpartitioned_windows(df), fn.__name__


def test_x219_window_is_range_bucketed(spark, sf_dir):
    """The weighted-median running sum must never partition on the
    ~6-value (returnflag, linestatus) pair alone — that funnels ~N/6
    of lineitem through one window task.  Every window spec must carry
    the price-range bucket `_rb` in its partition key, and the final
    pick must be an aggregate, not a second window (exactly one
    window node in the plan)."""
    from go_mapreduce_spark.operators import analytics as AN
    from go_mapreduce_spark.plans.explain import unpartitioned_windows, window_lines

    df = AN.x219_weighted_median(spark, sf_dir)
    lines = window_lines(df)
    assert lines, "expected the running-weight window"
    assert len(lines) == 1, "the median pick must be an aggregate, not a window"
    for ln in lines:
        assert "_rb" in ln, f"window not range-bucketed: {ln.strip()[:160]}"
    assert not unpartitioned_windows(df)


def test_x98_aggregates_before_customer_join(spark, sf_dir):
    """Q10-shape: the per-customer aggregate collapses the fact volume
    BEFORE the customer attribute join (aggregate below the join in
    the plan tree) — customer names never ride the fact shuffle."""
    from go_mapreduce_spark.operators import relational_ext as RX

    df = RX.x98_returned_items(spark, sf_dir)
    plan = formatted_plan(df)
    assert has_take_ordered(df)
    # the wide-attribute join input must already be aggregated:
    # rev_dec appears as an aggregate result before any c_name ref
    assert plan.index("rev_dec") < plan.index("c_name")


def test_wave37_38_windows_are_partitioned(spark, sf_dir):
    """Mann-Whitney ranks and all three RFM rank passes must run on
    range-bucketed (partitioned) windows; x248's islands partition on
    user_id.  No unpartitioned WindowExec anywhere in the family
    (x245/x246 windows run on metadata-sized day series and are
    exempt BY CONSTRUCTION — they are not asserted here)."""
    from go_mapreduce_spark.operators import analytics as AN
    from go_mapreduce_spark.operators import stats as ST
    from go_mapreduce_spark.plans.explain import unpartitioned_windows, window_lines

    for fn in (ST.x244_mannwhitney, AN.x247_rfm_segments, AN.x248_interval_coverage):
        df = fn(spark, sf_dir)
        assert window_lines(df), f"{fn.__name__}: expected a window node"
        assert not unpartitioned_windows(df), fn.__name__


# ---------------------------------------------------------------------------
# Broadcast-hint lint (round-6 ask #2): no F.broadcast() argument may be a
# data-sized base table.  Walks every operator module's AST, resolves each
# hinted expression back through non-reducing DataFrame ops
# (select/filter/alias/withColumn/...) to its root, and fails if the root is
# load_table(..., <table that scales with SF>).  Reducing ops (groupBy/agg/
# limit/distinct/join/...) terminate the trace: their outputs are
# contract-bounded aggregates or batch-bounded relations, which the x138
# standard allows.  This pins the q4/x249 regression class for good.
# ---------------------------------------------------------------------------

import ast as _ast
import pathlib as _pathlib

_DATA_SIZED = {
    "customer", "supplier", "orders", "lineitem", "part",
    "documents", "embeddings", "events",
}
# ops that neither bound row count nor break SF-proportionality
_NON_REDUCING = {
    "select", "selectExpr", "alias", "filter", "where", "withColumn",
    "withColumns", "withColumnRenamed", "drop", "dropna", "na", "fill",
    "cache", "persist", "unpersist", "localCheckpoint", "checkpoint",
    "repartition", "repartitionByRange", "coalesce", "sample", "sortWithinPartitions",
}


def _broadcast_root_table(node, var_tables):
    """Trace a F.broadcast() argument to a load_table root through
    non-reducing ops; return the table name or None (bounded/unknown)."""
    while True:
        if isinstance(node, _ast.Name):
            return var_tables.get(node.id)
        if isinstance(node, _ast.Call):
            fn = node.func
            if isinstance(fn, _ast.Name) and fn.id == "load_table":
                if len(node.args) >= 3 and isinstance(node.args[2], _ast.Constant):
                    return node.args[2].value
                return None
            if isinstance(fn, _ast.Attribute):
                if fn.attr in _NON_REDUCING:
                    node = fn.value
                    continue
                return None  # reducing / unknown op: treated as bounded
            return None
        if isinstance(node, _ast.Attribute):
            node = node.value
            continue
        return None


def _lint_broadcast_hints(tree):
    """Return [(lineno, table)] violations: hinted data-sized base tables."""
    violations = []
    for func in _ast.walk(tree):
        if not isinstance(func, (_ast.FunctionDef, _ast.AsyncFunctionDef)):
            continue
        var_tables = {}
        for stmt in _ast.walk(func):
            if isinstance(stmt, _ast.Assign) and len(stmt.targets) == 1 and isinstance(
                stmt.targets[0], _ast.Name
            ):
                t = _broadcast_root_table(stmt.value, var_tables)
                if t is not None:
                    var_tables[stmt.targets[0].id] = t
        for call in _ast.walk(func):
            if (
                isinstance(call, _ast.Call)
                and isinstance(call.func, _ast.Attribute)
                and call.func.attr == "broadcast"
                and isinstance(call.func.value, _ast.Name)
                and call.func.value.id == "F"
                and call.args
            ):
                t = _broadcast_root_table(call.args[0], var_tables)
                if t in _DATA_SIZED:
                    violations.append((call.lineno, t))
    return violations


def test_no_broadcast_hint_on_data_sized_tables():
    pkg = _pathlib.Path(__file__).resolve().parents[1] / "go_mapreduce_spark"
    bad = []
    for py in sorted(pkg.rglob("*.py")):
        tree = _ast.parse(py.read_text(), filename=str(py))
        for lineno, table in _lint_broadcast_hints(tree):
            bad.append(f"{py.relative_to(pkg.parent)}:{lineno} hints data-sized table {table!r}")
    assert not bad, "forced broadcast of data-sized base table(s):\n" + "\n".join(bad)


def test_broadcast_lint_actually_trips():
    """Self-test: the lint must flag the exact q4/x249 shapes it exists for."""
    snippet = (
        "def bad(spark, sf_dir):\n"
        "    cust = load_table(spark, sf_dir, 'customer').select('c_custkey')\n"
        "    direct = x.join(F.broadcast(load_table(spark, sf_dir, 'supplier')), 'k')\n"
        "    return orders.join(F.broadcast(cust), 'c_custkey')\n"
        "def fine(spark, sf_dir):\n"
        "    nat = load_table(spark, sf_dir, 'nation')\n"
        "    agg = load_table(spark, sf_dir, 'orders').groupBy('k').agg(F.count('*'))\n"
        "    return x.join(F.broadcast(nat), 'n').join(F.broadcast(agg), 'k')\n"
    )
    hits = _lint_broadcast_hints(_ast.parse(snippet))
    assert sorted(t for _, t in hits) == ["customer", "supplier"]
