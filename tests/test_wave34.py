"""Wave-34 property tests: invariants the oracle hash alone would not
explain if broken (credit conservation, top-k exactness, candidate
completeness, probability normalization)."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_x225_is_exact_weighted_topk(spark, sf_dir):
    """Every selected sample key must dominate every excluded one —
    the A-ES sample is the EXACT top-k by key, not approximate."""
    from go_mapreduce_spark.operators import curation as C
    from go_mapreduce_spark.sources.registry import load_table

    got = C.x225_weighted_sample(spark, sf_dir)
    assert got.count() == C.WS_K
    docs = load_table(spark, sf_dir, "documents")
    u = (
        F.conv(
            F.substring(F.sha2(F.col("doc_id").cast("string"), 256), 1, 12),
            16,
            10,
        ).cast("double")
        + F.lit(1.0)
    ) / F.lit(C._WS_DENOM)
    keyed = docs.select("doc_id", (F.log(u) / F.col("n_chars")).alias("k"))
    chosen = {r.doc_id for r in got.collect()}
    rows = keyed.collect()
    min_in = min(r.k for r in rows if r.doc_id in chosen)
    max_out = max(r.k for r in rows if r.doc_id not in chosen)
    assert min_in >= max_out


def test_x225_plans_per_partition_heaps(spark, sf_dir):
    """The sample must plan as TakeOrderedAndProject (k-heaps per
    partition), never a global sort — the 100 TB shape."""
    from go_mapreduce_spark.operators import curation as C
    from go_mapreduce_spark.plans.explain import formatted_plan

    plan = formatted_plan(C.x225_weighted_sample(spark, sf_dir))
    assert "TakeOrderedAndProject" in plan


def test_x226_credit_is_conserved(spark, sf_dir):
    """Each converting user with ≥1 touch distributes EXACTLY one
    unit of credit under both models — the defining attribution
    invariant."""
    from go_mapreduce_spark.operators import analytics as AN
    from go_mapreduce_spark.sources.registry import load_table

    rows = AN.x226_attribution(spark, sf_dir).collect()
    ev = load_table(spark, sf_dir, "events")
    fp = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(F.min("ts").alias("p_ts"))
    )
    n_converted = (
        ev.filter(F.col("event_type").isin("view", "click"))
        .join(fp, "user_id")
        .filter(F.col("ts") < F.col("p_ts"))
        .select("user_id")
        .distinct()
        .count()
    )
    assert abs(sum(r.linear_credit for r in rows) - n_converted) < 1e-3
    assert abs(sum(r.ushaped_credit for r in rows) - n_converted) < 1e-3


def test_x227_passjoin_matches_bruteforce(spark, sf_dir):
    """PassJoin candidate generation must be COMPLETE: the segment +
    shifted-window filter never loses a pair within the distance
    threshold (the pigeonhole guarantee), verified against the
    definitional all-pairs filter."""
    from go_mapreduce_spark.operators import dedup as D
    from go_mapreduce_spark.sources.registry import load_table

    got = {
        (r.doc_a, r.doc_b, r.edit_dist)
        for r in D.x227_passjoin_editdist(spark, sf_dir).collect()
    }
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", F.substring(F.lower("text"), 1, D.PASSJOIN_L).alias("p")
    )
    a, b = docs.alias("a"), docs.alias("b")
    brute = {
        (r.doc_a, r.doc_b, r.ed)
        for r in a.join(
            b,
            (F.col("a.lang") == F.col("b.lang"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.levenshtein("a.p", "b.p").alias("ed"),
        )
        .filter(F.col("ed") <= D.PASSJOIN_D)
        .collect()
    }
    assert got == brute


def test_x227_candidate_join_is_equi(spark, sf_dir):
    """The candidate stage must be an equi-join on (slot, gram) —
    never a nested-loop cross product."""
    from go_mapreduce_spark.operators import dedup as D
    from go_mapreduce_spark.plans.explain import formatted_plan

    plan = formatted_plan(D.x227_passjoin_editdist(spark, sf_dir))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_x228_containment_bounds_and_direction(spark, sf_dir):
    """Containment is a fraction of the SOURCE doc's shingles: in
    (0, 1], and the two directions of a pair may legitimately
    disagree (that asymmetry is the point)."""
    from go_mapreduce_spark.operators import dedup as D

    rows = D.x228_containment(spark, sf_dir).collect()
    assert rows, "fixture has planted near-dups; expected matches"
    assert all(0 < r.containment <= 1.0 + 1e-9 for r in rows)
    assert all(r.doc_a != r.doc_b for r in rows)


def test_x229_novelty_conserves_first_occurrences(spark, sf_dir):
    """Every distinct shingle is novel in exactly ONE doc: the novel
    counts must sum to the corpus-wide distinct shingle count, and
    the lowest doc_id is 100% novel."""
    from go_mapreduce_spark.operators import dedup as D
    from go_mapreduce_spark.operators import text as T
    from go_mapreduce_spark.sources.registry import load_table

    rows = T.x229_trigram_novelty(spark, sf_dir).collect()
    docs = load_table(spark, sf_dir, "documents")
    n_distinct = (
        D.doc_shingles(docs).select("sh").distinct().count()
    )
    assert sum(r.n_novel for r in rows) == n_distinct
    first = min(rows, key=lambda r: r.doc_id)
    assert first.n_novel == first.n_trigrams and first.novelty == 1.0


def test_x230_probabilities_normalize(spark, sf_dir):
    """Each from_type row group is a conditional distribution: probs
    sum to 1 and transition counts equal total events minus one per
    active user."""
    from go_mapreduce_spark.operators import analytics as AN
    from go_mapreduce_spark.sources.registry import load_table

    rows = AN.x230_transition_matrix(spark, sf_dir).collect()
    by_from: dict[str, float] = {}
    for r in rows:
        by_from[r.from_type] = by_from.get(r.from_type, 0.0) + r.prob
    assert all(abs(s - 1.0) < 1e-4 for s in by_from.values()), by_from
    ev = load_table(spark, sf_dir, "events")
    n_events = ev.count()
    n_users = ev.select("user_id").distinct().count()
    assert sum(r.n_transitions for r in rows) == n_events - n_users


def test_x231_cosines_are_bounded(spark, sf_dir):
    """Cosines live in [-1, 1]; the mean dominates the min; every
    label accounts for its vectors."""
    from go_mapreduce_spark.operators import clustering as CL
    from go_mapreduce_spark.sources.registry import load_table

    rows = CL.x231_centroid_cosine_audit(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert -1.0 - 1e-9 <= r.min_cos <= r.avg_cos <= 1.0 + 1e-9
    emb = load_table(spark, sf_dir, "embeddings")
    assert sum(r.n_vectors for r in rows) == emb.count()
