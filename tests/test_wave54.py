"""Wave-54 tests: eigenvector-centrality invariants, Cramér's V
against a Python contingency brute force, EXCEPT ALL multiplicity
semantics."""

from __future__ import annotations

from collections import Counter

from pyspark.sql import functions as F


def test_x292_l1_normalized_and_matches_python(spark):
    """Power iteration on a known two-clique graph: the bigger, denser
    clique's members end up more central, scores sum to 1, and the
    Spark loop matches a plain Python power iteration exactly."""
    from go_mapreduce_spark.operators.graph import eigenvector_centrality

    # 4-clique {0..3} bridged to a 3-path {4,5,6}
    und = [(0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3), (3, 4), (4, 5), (5, 6)]
    edges = spark.createDataFrame(
        und + [(v, u) for u, v in und], "u long, v long"
    )
    got = {
        r.node: r.score for r in eigenvector_centrality(edges).collect()
    }
    # python reference with the same L1 discipline
    adj = {}
    for u, v in und:
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    score = {n: 1.0 / len(adj) for n in adj}
    for _ in range(8):
        raw = {n: sum(score[m] for m in adj[n]) for n in adj}
        tot = sum(raw.values())
        score = {n: s / tot for n, s in raw.items()}
    assert set(got) == set(score)
    for n in score:
        assert abs(got[n] - score[n]) < 1e-12
    assert abs(sum(got.values()) - 1.0) < 1e-9
    # clique core outranks the path tail
    assert min(got[n] for n in (0, 1, 2)) > max(got[n] for n in (5, 6))


def test_x293_matches_python_chi2(spark, sf_dir):
    from go_mapreduce_spark.operators import stats as ST
    from go_mapreduce_spark.sources.registry import load_table

    rows = load_table(spark, sf_dir, "orders").select(
        "o_orderstatus", "o_orderpriority"
    ).collect()
    cells = Counter((r.o_orderstatus, r.o_orderpriority) for r in rows)
    n = sum(cells.values())
    rt = Counter()
    ct = Counter()
    for (a, b), o in cells.items():
        rt[a] += o
        ct[b] += o
    chi2 = sum(
        (o - rt[a] * ct[b] / n) ** 2 / (rt[a] * ct[b] / n)
        for (a, b), o in cells.items()
    )
    # identity form the operator uses: n * (Σ o²/(r·c) − 1) — equal up
    # to float noise to the textbook (o−e)²/e sum over observed cells
    # BECAUSE no cell is empty in this fixture's full grid; assert that
    # precondition too so the test stays honest
    assert len(cells) == len(rt) * len(ct)
    v = (chi2 / (n * min(len(rt) - 1, len(ct) - 1))) ** 0.5
    got = {
        r.pair: r
        for r in ST.x293_cramers_v(spark, sf_dir).collect()
    }
    row = got["orders:status_x_priority"]
    assert row.n == n
    assert abs(row.chi2 - chi2) < max(1e-6 * chi2, 1e-4)
    assert abs(row.cramers_v - v) < 1e-6
    assert 0.0 <= row.cramers_v <= 1.0
    assert row.dof == (len(rt) - 1) * (len(ct) - 1)


def test_x294_multiplicity_semantics(spark, sf_dir):
    from go_mapreduce_spark.operators import relational_ext as RX
    from go_mapreduce_spark.sources.registry import load_table

    got = RX.x294_except_all(spark, sf_dir).collect()
    assert 0 < len(got) <= RX.EXCEPT_ALL_TOP_N
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", F.year("l_shipdate").alias("yr")
    ).collect()
    na = Counter(r.l_partkey for r in li if r.yr == RX.EXCEPT_ALL_YR_A)
    nb = Counter(r.l_partkey for r in li if r.yr == RX.EXCEPT_ALL_YR_B)
    for r in got:
        assert r.matches_closed_form
        assert r.surviving == max(na[r.l_partkey] - nb[r.l_partkey], 0)
        assert r.n_a == na[r.l_partkey]
        assert r.n_b == nb[r.l_partkey]
    survs = [r.surviving for r in got]
    assert survs == sorted(survs, reverse=True)


def test_except_all_is_bag_not_set(spark):
    """Pin the bag semantics the operator relies on: duplicates cancel
    one-for-one, they don't collapse."""
    a = spark.createDataFrame([(1,), (1,), (1,), (2,)], "k int")
    b = spark.createDataFrame([(1,), (2,), (2,)], "k int")
    got = sorted(r.k for r in a.exceptAll(b).collect())
    assert got == [1, 1]
