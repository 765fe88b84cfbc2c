"""Wave 32: proportional allocation (x221), survival curve (x222),
ABC classification (x223)."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_allocation_sums_to_budget_and_hamilton(spark, sf_dir):
    from go_mapreduce_spark.operators.curation import (
        ALLOC_TOTAL,
        x221_proportional_allocation,
    )
    from go_mapreduce_spark.sources.registry import load_table

    rows = x221_proportional_allocation(spark, sf_dir).collect()
    assert sum(r.allocated for r in rows) == ALLOC_TOTAL
    counts = {r.lang: r.n_docs for r in rows}
    N = sum(counts.values())
    # Hamilton replay
    base = {l: (n * ALLOC_TOTAL) // N for l, n in counts.items()}
    rem = {l: (n * ALLOC_TOTAL) % N for l, n in counts.items()}
    leftover = ALLOC_TOTAL - sum(base.values())
    order = sorted(counts, key=lambda l: (-rem[l], l))
    for i, l in enumerate(order):
        if i < leftover:
            base[l] += 1
    assert {r.lang: r.allocated for r in rows} == base


def test_survival_curve_monotone_and_anchored(spark, sf_dir):
    from go_mapreduce_spark.operators.analytics import x222_survival_curve
    from go_mapreduce_spark.sources.registry import load_table

    rows = sorted(
        x222_survival_curve(spark, sf_dir).collect(), key=lambda r: r.day_k
    )
    n_users = (
        load_table(spark, sf_dir, "events").select("user_id").distinct().count()
    )
    assert rows[0].surviving_users == n_users  # everyone survives day 0...
    # (smallest recorded span bucket carries the full population)
    for a, b in zip(rows, rows[1:]):
        assert a.surviving_users >= b.surviving_users  # monotone decay
    assert abs(rows[0].survival - 1.0) < 1e-9


def test_abc_classes_partition_revenue_exactly(spark, sf_dir):
    from go_mapreduce_spark.operators.analytics import x223_abc_classification
    from go_mapreduce_spark.sources.registry import load_table

    rows = {r.cls: r for r in x223_abc_classification(spark, sf_dir).collect()}
    rev = (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(F.sum(F.col("o_totalprice").cast("decimal(38,6)")).alias("rev"))
        .collect()
    )
    vals = sorted((float(r.rev) for r in rev), reverse=True)
    total = sum(vals)
    # brute-force classes
    import collections

    cls_n = collections.Counter()
    cum = 0.0
    for v in vals:
        cum += v
        cls_n["A" if cum * 2 <= total + 1e-6 else ("B" if cum * 5 <= 4 * total + 1e-6 else "C")] += 1
    assert sum(r.n_customers for r in rows.values()) == len(vals)
    # A-class is a small minority carrying half the revenue (Pareto)
    assert rows["A"].n_customers < len(vals) // 2
    assert abs(rows["A"].revenue_share - 0.5) < 0.05
    for r in rows.values():
        assert 0 < r.revenue_share < 1
    tot_share = sum(r.revenue_share for r in rows.values())
    assert abs(tot_share - 1.0) < 1e-4
    # exact per-class counts match the brute force (float tolerance
    # only affects knife-edge rows; compare loosely)
    for c in "ABC":
        assert abs(rows[c].n_customers - cls_n[c]) <= 1
