"""Wave-55 tests: Kruskal-Wallis against a Python rank brute force,
BH step-up selection semantics, and the z-threshold pinning."""

from __future__ import annotations

import math
from collections import Counter, defaultdict


def test_x295_matches_python_brute_force(spark, sf_dir):
    from go_mapreduce_spark.operators import stats as ST
    from go_mapreduce_spark.sources.registry import load_table

    rows = load_table(spark, sf_dir, "orders").select(
        "o_totalprice", "o_orderpriority"
    ).collect()
    vals = sorted(r.o_totalprice for r in rows)
    first = {}
    for i, v in enumerate(vals):
        first.setdefault(v, i + 1)
    cnt = Counter(vals)
    midrank = {v: first[v] + (cnt[v] - 1) / 2 for v in cnt}
    rj = defaultdict(float)
    nj = Counter()
    for r in rows:
        rj[r.o_orderpriority] += midrank[r.o_totalprice]
        nj[r.o_orderpriority] += 1
    n = len(rows)
    h = 12.0 / (n * (n + 1)) * sum(
        rj[g] ** 2 / nj[g] for g in rj
    ) - 3 * (n + 1)
    corr = 1 - sum(t**3 - t for t in cnt.values()) / (n**3 - n)
    got = ST.x295_kruskal_wallis(spark, sf_dir).collect()[0]
    assert got.n == n
    assert got.dof == len(nj) - 1
    # operator quantizes normalized terms at 1e-6 (decimal-sum rule) —
    # allow k·1e-5 slack vs the float brute force
    assert abs(got.h_stat - h) < 1e-3
    assert abs(got.h_tie_corrected - h / corr) < 1e-3
    assert got.h_tie_corrected >= got.h_stat > 0


def test_x296_step_up_selection_is_bh(spark, sf_dir):
    from go_mapreduce_spark.operators import stats as ST

    rows = ST.x296_fdr_bh(spark, sf_dir).collect()
    assert len(rows) == ST.FDR_M_TESTS
    assert [r.bh_rank for r in rows] == list(range(1, ST.FDR_M_TESTS + 1))
    # |z| non-increasing in rank order
    zs = [abs(r.z_stat) for r in rows]
    assert all(a >= b - 1e-9 for a, b in zip(zs, zs[1:]))
    # step-up: the rejected set is exactly ranks 1..i*, where i* is the
    # LARGEST i with |z|_(i) >= t_i (later crossings rescue earlier
    # non-crossings — the defining BH property)
    crossings = [
        r.bh_rank
        for r in rows
        if abs(r.z_stat) >= ST.FDR_Z_THRESHOLDS[r.bh_rank] - 1e-9
    ]
    istar = max(crossings, default=0)
    for r in rows:
        assert r.rejected == (r.bh_rank <= istar)


def test_fdr_thresholds_invert_normal_tail():
    """t_i must satisfy 2·(1 − Φ(t_i)) = α·i/m to ~1e-9 — the pinned
    literals really are the two-sided BH p-value cutoffs."""
    from go_mapreduce_spark.operators import stats as ST

    for i, t in ST.FDR_Z_THRESHOLDS.items():
        p = math.erfc(t / math.sqrt(2.0))
        assert abs(p - ST.FDR_ALPHA * i / ST.FDR_M_TESTS) < 1e-9
    # monotone decreasing thresholds
    ts = [ST.FDR_Z_THRESHOLDS[i] for i in range(1, ST.FDR_M_TESTS + 1)]
    assert ts == sorted(ts, reverse=True)
