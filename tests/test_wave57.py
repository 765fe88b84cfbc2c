"""Wave-57 tests: weighted PageRank invariants and TextRank output
properties."""

from __future__ import annotations


def test_pagerank_weighted_matches_python(spark):
    """Toy weighted triangle + pendant: the Spark loop must equal a
    plain Python weighted-PageRank with the same decimal-free math,
    and total rank mass must stay 1 (symmetric graph, no dangling)."""
    from go_mapreduce_spark.operators.graph import (
        PR_DAMPING,
        PR_ITERS,
        pagerank_weighted,
    )

    und = {(1, 2): 5, (2, 3): 1, (1, 3): 1, (3, 4): 2}
    rows = []
    for (u, v), w in und.items():
        rows += [(u, v, w), (v, u, w)]
    edges = spark.createDataFrame(rows, "u long, v long, w long")
    got = {r.node: r.rank for r in pagerank_weighted(edges).collect()}

    adj = {}
    for (u, v), w in und.items():
        adj.setdefault(u, {})[v] = w
        adj.setdefault(v, {})[u] = w
    n = len(adj)
    strength = {u: sum(ws.values()) for u, ws in adj.items()}
    rank = {u: 1.0 / n for u in adj}
    for _ in range(PR_ITERS):
        new = {}
        for v in adj:
            s = sum(rank[u] * adj[u][v] / strength[u] for u in adj[v])
            new[v] = (1.0 - PR_DAMPING) / n + PR_DAMPING * s
        rank = new
    assert set(got) == set(rank)
    for u in rank:
        assert abs(got[u] - rank[u]) < 1e-12
    assert abs(sum(got.values()) - 1.0) < 1e-9
    # the heavy-edge pair dominates
    assert got[1] > got[4] and got[2] > got[4]


def test_x298_output_properties(spark, sf_dir):
    from go_mapreduce_spark.operators import text as T
    from go_mapreduce_spark.operators.dedup import lower_tokens
    from go_mapreduce_spark.sources.registry import load_table
    from pyspark.sql import functions as F

    got = T.x298_textrank_keywords(spark, sf_dir).collect()
    assert 0 < len(got) <= T.TEXTRANK_TOP_N
    ranks = [r.rank for r in got]
    assert all(r > 0 for r in ranks)
    assert ranks == sorted(ranks, reverse=True)
    # every keyword clears the vocabulary floor in the corpus
    counts = dict(
        load_table(spark, sf_dir, "documents")
        .select(F.explode(lower_tokens(F.col("text"))).alias("t"))
        .groupBy("t")
        .count()
        .collect()
    )
    for r in got:
        assert counts[r.token] >= T.TEXTRANK_MIN_COUNT
