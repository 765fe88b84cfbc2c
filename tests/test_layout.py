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


def test_equidepth_buckets_are_balanced(spark, sf_dir):
    rows = L.x127_equidepth_hist(spark, sf_dir).collect()
    assert len(rows) == L.HIST_N_BUCKETS
    sizes = [r.n_rows for r in rows]
    assert max(sizes) - min(sizes) <= 1
    # bucket ranges are ordered: bucket i's hi <= bucket i+1's hi
    his = [r.hi for r in sorted(rows, key=lambda r: r.bucket)]
    assert all(a <= b for a, b in zip(his, his[1:]))
