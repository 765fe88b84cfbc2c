"""Physical-plan inspection helpers.

The 100 TB design rules (predicate pushdown reaches the scan, small
dims broadcast, hot paths stay in WholeStageCodegen) are asserted in
tests via these helpers, so a regression that silently flips a
broadcast join to sort-merge or drops a pushed filter fails CI —
plan shape is part of the contract, not a hope.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    """`explain("formatted")` output as a string."""
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), "formatted"
    )


def pushed_filters(df: DataFrame) -> list[str]:
    """All PushedFilters entries across the plan's scans."""
    plan = formatted_plan(df)
    out: list[str] = []
    for m in re.finditer(r"PushedFilters: \[([^\]]*)\]", plan):
        entry = m.group(1).strip()
        if entry:
            out.extend(p.strip() for p in entry.split(","))
    return out


def scan_read_schema(df: DataFrame) -> list[str]:
    """ReadSchema column lists (one string per scan) — column-pruning check."""
    plan = formatted_plan(df)
    return [m.group(1) for m in re.finditer(r"ReadSchema: (struct<[^\n]*)", plan)]


def count_nodes(df: DataFrame, node: str) -> int:
    """Count physical-plan nodes by their numbered detail header —
    the formatted dump shows each node twice (tree + details), so a
    raw substring count double-counts."""
    return len(re.findall(rf"\(\d+\) {re.escape(node)}\b", formatted_plan(df)))


def has_broadcast_hash_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in formatted_plan(df)


def has_sort_merge_join(df: DataFrame) -> bool:
    return "SortMergeJoin" in formatted_plan(df)


def executed_plan(df: DataFrame) -> str:
    """Final (post-AQE) physical plan — triggers execution.

    Under AQE the pre-execution dump shows ``isFinalPlan=false`` with
    no codegen spans; only the executed plan reveals the real stage
    shapes.  Use on small/test data only.
    """
    df.collect()
    return df._jdf.queryExecution().executedPlan().toString()  # type: ignore[attr-defined]


def wholestage_codegen_ids(df: DataFrame) -> list[int]:
    """Distinct WholeStageCodegen span ids in the executed plan
    (rendered as ``*(id)`` prefixes in the plan tree)."""
    plan = executed_plan(df)
    return sorted({int(m.group(1)) for m in re.finditer(r"\*\((\d+)\)", plan)})


def has_take_ordered(df: DataFrame) -> bool:
    """True when top-k planned as TakeOrderedAndProject (no full sort)."""
    return "TakeOrderedAndProject" in formatted_plan(df)


def window_lines(df: DataFrame) -> list[str]:
    """Physical-plan lines containing a ``Window`` (WindowExec) node.

    Uses the pre-execution sparkPlan — AQE never changes a window's
    partition spec, so the shape check is valid without executing.
    """
    plan = df._jdf.queryExecution().sparkPlan().toString()  # type: ignore[attr-defined]
    return [ln for ln in plan.splitlines() if re.search(r"\bWindow \[", ln)]


def unpartitioned_windows(df: DataFrame) -> list[str]:
    """Window nodes with an EMPTY partition spec — the single-partition
    scale-killer (WindowExec with no PARTITION BY moves every input row
    to ONE task; Spark logs "No Partition Defined" and the stage cannot
    scale past one core or one task's memory).

    A partitioned node prints ``Window [exprs], [partSpec], [orderSpec]``
    (two ``], [`` separators); an unpartitioned one omits the partition
    group.  Any returned line is a plan bug unless the input is provably
    metadata-sized (see operators/layout.py's inventory windows).
    """
    return [ln for ln in window_lines(df) if ln.count("], [") < 2]

# Tables whose row counts scale with SF — a window with no PARTITION BY
# may never consume one of these without an intervening aggregate/limit
# (round-7 verdict ask #5: the WindowExec warnings in the bench log were
# policed by convention only; this makes the discipline a gate).
DATA_SIZED_TABLES = (
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "documents",
    "embeddings",
    "events",
)


def _plan_children(node) -> list:
    ch = node.children()
    return [ch.apply(i) for i in range(ch.size())]


def _subtree_reaches_data_scan(node) -> bool:
    """True if this physical subtree can deliver data-table-sized row
    counts: it reaches a file scan of a data-sized table without an
    intervening aggregate / limit / top-k (those bound the output to
    group-count / k rows regardless of what they scan)."""
    name = node.nodeName()
    if (
        "Aggregate" in name
        or "Limit" in name
        or name.startswith("TakeOrdered")
    ):
        return False
    kids = _plan_children(node)
    if not kids:
        head = node.toString().splitlines()[0]
        return any(f"{t}.parquet" in head for t in DATA_SIZED_TABLES)
    return any(_subtree_reaches_data_scan(k) for k in kids)


def windows_over_unbounded_input(df: DataFrame) -> list[str]:
    """Single-partition Window nodes (empty PARTITION BY) whose input
    subtree reaches a data-sized table scan with no bounding
    aggregate/limit in between — the one-task scale-killer.  Bounded
    shapes (replicate grids, per-day rollups, d-row matrices, windows
    over aggregate outputs) pass because the aggregate/limit below the
    window terminates the walk.  Uses the pre-execution sparkPlan (AQE
    never changes a window's partition spec), so no execution happens.
    """
    plan = df._jdf.queryExecution().sparkPlan()  # type: ignore[attr-defined]
    bad: list[str] = []

    def walk(node) -> None:
        name = node.nodeName()
        if name.startswith("Window"):
            try:
                nparts = node.partitionSpec().size()
            except Exception:
                nparts = None  # node variant without a spec: skip
            if nparts == 0 and any(
                _subtree_reaches_data_scan(k) for k in _plan_children(node)
            ):
                bad.append(node.simpleString(120))
        for k in _plan_children(node):
            walk(k)

    walk(plan)
    return bad
