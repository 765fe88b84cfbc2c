"""Property tests for the wave-17 operators: full BPE trainer loop
(x175), temperature-resampled mixture (x176), vocabulary coverage
curve (x177), exact shared-substring spans (x178), and dominant-PC
power iteration (x179)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F


def test_bpe_train_matches_reference_trainer(spark, sf_dir):
    """The Spark merge table equals a plain-Python reference BPE
    trainer (greedy leftmost non-overlapping merges over the word
    vocabulary) — round for round, pair and count."""
    import re
    from collections import Counter

    from go_mapreduce_spark.operators.text import (
        BPE_TRAIN_MERGES,
        x175_bpe_train,
    )
    from go_mapreduce_spark.sources.registry import load_table

    docs = load_table(spark, sf_dir, "documents").select("text").collect()
    vocab: Counter[str] = Counter()
    for r in docs:
        for w in re.split(r"[^a-z]+", r.text.lower()):
            if w:
                vocab[w] += 1
    # spaced-symbol encoding with boundary sentinels
    state = {f" {' '.join(w)} ": f for w, f in vocab.items()}
    expected = []
    for rnd in range(1, BPE_TRAIN_MERGES + 1):
        pc: Counter[str] = Counter()
        for s, f in state.items():
            syms = s.split()
            for i in range(len(syms) - 1):
                pc[f"{syms[i]} {syms[i + 1]}"] += f
        pair, cnt = min(pc.items(), key=lambda kv: (-kv[1], kv[0]))
        expected.append((rnd, pair, cnt))
        merged = {}
        for s, f in state.items():
            merged[s.replace(f" {pair} ", f" {pair.replace(' ', '')} ")] = f
        state = merged
    got = [
        (r.round, r.pair, r.cnt)
        for r in x175_bpe_train(spark, sf_dir).collect()
    ]
    assert got == expected


def test_bpe_train_rounds_and_distinct_pairs(spark, sf_dir):
    from go_mapreduce_spark.operators.text import (
        BPE_TRAIN_MERGES,
        x175_bpe_train,
    )

    rows = x175_bpe_train(spark, sf_dir).collect()
    assert [r.round for r in rows] == list(range(1, BPE_TRAIN_MERGES + 1))
    pairs = [r.pair for r in rows]
    assert len(set(pairs)) == len(pairs)  # a pair can win only once
    assert all(r.cnt > 0 for r in rows)


def test_temperature_mix_invariants(spark, sf_dir):
    """Shares sum to ~1, weights follow sqrt scaling, sample rates are
    valid probabilities, and small streams get up-sampled relative to
    proportional allocation."""
    from go_mapreduce_spark.operators.curation import x176_temperature_mix

    rows = x176_temperature_mix(spark, sf_dir).collect()
    assert rows
    assert abs(sum(r.share for r in rows) - 1.0) < 1e-3
    total_tok = sum(r.n_tokens for r in rows)
    for r in rows:
        assert abs(r.weight - math.sqrt(r.n_tokens)) < 1e-6
        assert 0.0 <= r.sample_rate <= 1.0
        prop_share = r.n_tokens / total_tok
        if prop_share < 1e-3:  # clearly small stream
            assert r.share > prop_share  # temperature up-samples it


def test_vocab_coverage_exact_minimality(spark, sf_dir):
    """vocab_size is exactly the minimal prefix (most-frequent-first)
    of the token-count relation whose mass reaches the threshold —
    verified against a brute-force token-level cumulative sum."""
    from go_mapreduce_spark.operators.text import x177_vocab_coverage
    from go_mapreduce_spark.sources.registry import load_table

    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        F.explode(
            F.filter(
                F.split("text", "[^A-Za-z]+"), lambda t: F.length(t) > 0
            )
        ).alias("tok")
    )
    counts = sorted(
        [
            (r.cnt, r.tok)
            for r in toks.groupBy("tok").agg(F.count("*").alias("cnt")).collect()
        ],
        key=lambda t: (-t[0], t[1]),
    )
    total = sum(c for c, _ in counts)
    rows = x177_vocab_coverage(spark, sf_dir).collect()
    assert [r.pct for r in rows] == [50, 90, 95, 99]
    for r in rows:
        # brute force: smallest prefix with mass*100 >= pct*total
        acc, k = 0, 0
        for c, _ in counts:
            acc += c
            k += 1
            if acc * 100 >= r.pct * total:
                break
        assert r.vocab_size == k
        assert r.covered_cnt == acc
        assert r.total_cnt == total
        assert r.covered_cnt * 100 >= r.pct * total
    sizes = [r.vocab_size for r in rows]
    assert sizes == sorted(sizes)  # monotone in pct


def test_longest_shared_span_matches_bruteforce(spark, sf_dir):
    """For the top reported pair, the span equals the brute-force
    longest common contiguous token run of those two documents."""
    from go_mapreduce_spark.operators.dedup import x178_longest_shared_span
    from go_mapreduce_spark.sources.registry import load_table

    rows = x178_longest_shared_span(spark, sf_dir).collect()
    assert rows, "fixture has planted near-dups; spans must exist"
    top = rows[0]
    docs = dict(
        load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id").isin([top.doc_a, top.doc_b]))
        .select("doc_id", "text")
        .rdd.map(lambda r: (r.doc_id, r.text))
        .collect()
    )
    import re

    def toks(t):
        return [w for w in re.split(r"[^a-z]+", t.lower()) if w]

    a, b = toks(docs[top.doc_a]), toks(docs[top.doc_b])
    best = 0
    # O(n*m) LCS-of-runs via suffix table
    prev = [0] * (len(b) + 1)
    for i in range(1, len(a) + 1):
        cur = [0] * (len(b) + 1)
        for j in range(1, len(b) + 1):
            if a[i - 1] == b[j - 1]:
                cur[j] = prev[j - 1] + 1
                best = max(best, cur[j])
        prev = cur
    assert top.span_tokens == best
    # spans are 5-gram-anchored, so every reported span is >= 5 tokens
    assert all(r.span_tokens >= 5 for r in rows)
    # verify the reported offsets really align identical token runs
    n = top.span_tokens
    assert (
        a[top.start_a : top.start_a + n] == b[top.start_b : top.start_b + n]
    )


def test_power_iteration_matches_numpy_replay(spark, sf_dir):
    """The in-plan iteration equals a numpy replay of the identical
    algorithm (same rounded covariance, same round count) and the
    loading vector is unit-norm."""
    import numpy as np

    from go_mapreduce_spark.operators.clustering import (
        EMB_DIM,
        POWER_ITER_ROUNDS,
        x130_covariance_matrix,
        x179_pca_power_iteration,
    )

    cov_rows = x130_covariance_matrix(spark, sf_dir).collect()
    C = np.zeros((EMB_DIM, EMB_DIM))
    for r in cov_rows:
        C[r.dim_i, r.dim_j] = r.cov
        C[r.dim_j, r.dim_i] = r.cov
    v = np.full(EMB_DIM, 1.0 / EMB_DIM)
    for _ in range(POWER_ITER_ROUNDS):
        u = C @ v
        nrm = math.sqrt(float(u @ u))
        v = u / nrm
    rows = x179_pca_power_iteration(spark, sf_dir).collect()
    got = np.array([r.loading for r in rows])
    assert abs(np.linalg.norm(got) - 1.0) < 1e-4
    assert np.max(np.abs(got - np.round(v, 6))) < 1e-5
    assert abs(rows[0].eigenvalue - round(nrm, 6)) < 1e-5
    # dominant-eigenpair sanity: residual ||Cv - λv|| small relative
    # to λ once converged enough to report
    resid = np.linalg.norm(C @ got - rows[0].eigenvalue * got)
    assert resid <= 0.25 * rows[0].eigenvalue
