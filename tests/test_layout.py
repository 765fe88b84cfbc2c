"""Property tests for the physical-layout planners (operators/layout.py).

The oracle gate proves value equality; these assert the *invariants*
the layout contracts promise — contiguous bins, balanced equi-depth
buckets, monotone split points — which a value hash alone wouldn't
explain if broken.
"""

from __future__ import annotations

from go_mapreduce_spark.operators import layout as L


def test_compaction_bins_are_contiguous_and_ordered(spark, sf_dir):
    rows = L.x119_compaction_plan(spark, sf_dir).collect()
    assert rows, "inventory must be non-empty"
    # sequential fill: bin ids non-decreasing in file order, starting at 0
    bins = [r.bin_id for r in rows]
    assert bins[0] == 0
    assert all(a <= b for a, b in zip(bins, bins[1:]))
    # no bin exceeds target by more than one file (the closed form
    # only overshoots by the file that crosses the boundary)
    per_bin: dict[int, int] = {}
    for r in rows:
        per_bin[r.bin_id] = per_bin.get(r.bin_id, 0) + r.size_bytes
    max_file = max(r.size_bytes for r in rows)
    assert all(v <= L.COMPACT_TARGET_BYTES + max_file for v in per_bin.values())
    # the unpartitioned cumulative window is safe BY CONSTRUCTION only
    # because its input is the file MANIFEST: inventory cardinality is
    # data_rows / COMPACT_FILE_GROUP, metadata-sized at any data scale
    n_orders = spark.read.parquet(f"{sf_dir}/orders.parquet").count()
    assert len(rows) <= n_orders / L.COMPACT_FILE_GROUP + 1


def test_range_boundaries_are_monotone(spark, sf_dir):
    rows = L.x120_range_boundaries(spark, sf_dir).collect()
    assert len(rows) == L.RANGE_N_BUCKETS - 1
    vals = [r.split_value for r in rows]
    assert all(a <= b for a, b in zip(vals, vals[1:]))


def test_zorder_blocks_bounded_and_complete(spark, sf_dir):
    from go_mapreduce_spark.sources.registry import load_table

    out = L.x124_zorder_audit(spark, sf_dir).collect()
    n_blocks_max = (4**L.Z_BITS) >> L.Z_BLOCK_SHIFT
    assert all(0 <= r.block_id < n_blocks_max for r in out)
    total = load_table(spark, sf_dir, "lineitem").count()
    assert sum(r.n_rows for r in out) == total


def test_global_row_number_matches_single_window(spark, sf_dir):
    """The distributed exact-rank plan must agree row-for-row with the
    reference single-window row_number, and report the right total —
    on a key with heavy duplicates (l_quantity: 50 distinct values), so
    split-point ties exercise the same-bucket monotonicity argument."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from go_mapreduce_spark.sources.registry import load_table

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_quantity", "l_orderkey", "l_linenumber"
    )
    cols = ["l_quantity", "l_orderkey", "l_linenumber"]
    ranked, n = L._global_row_number(li, cols, F.col("l_quantity"), n_splits=8)
    ref = li.withColumn(
        "ref_rn", F.row_number().over(Window.orderBy(*cols)).cast("bigint")
    )
    assert n == li.count()
    # the fixture has duplicate (orderkey, linenumber) pairs, so the
    # sort key is not unique: within a tie group rank order is
    # arbitrary on BOTH sides — compare the rank multiset per key
    a = ranked.groupBy(cols).agg(F.sort_array(F.collect_list("rn")).alias("rns"))
    b = ref.groupBy(cols).agg(F.sort_array(F.collect_list("ref_rn")).alias("ref_rns"))
    mismatches = a.join(b, cols).where(F.col("rns") != F.col("ref_rns")).count()
    assert mismatches == 0


def test_equidepth_buckets_are_balanced(spark, sf_dir):
    rows = L.x127_equidepth_hist(spark, sf_dir).collect()
    assert len(rows) == L.HIST_N_BUCKETS
    sizes = [r.n_rows for r in rows]
    assert max(sizes) - min(sizes) <= 1
    # bucket ranges are ordered: bucket i's hi <= bucket i+1's hi
    his = [r.hi for r in sorted(rows, key=lambda r: r.bucket)]
    assert all(a <= b for a, b in zip(his, his[1:]))
