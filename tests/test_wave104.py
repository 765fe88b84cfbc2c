"""Wave 104 (round 12): x421, the composed training-data pipeline.

The DuckDB oracle replays the full five-stage chain exactly (it is
registered in ORACLE_SQL and swept by the correctness gate); these
tests pin the COMPOSITION invariants the summary output can't show —
that each stage actually removed what it claims to remove, and that
the whole thing is one lazy plan.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from go_mapreduce_spark.operators import curation as C
from go_mapreduce_spark.sources.registry import load_table


def test_x421_manifest_shape_and_bounds(spark, sf_dir):
    rows = C.x421_training_pipeline(spark, sf_dir).collect()
    assert 1 <= len(rows) <= C.PACK_SHARDS
    shard_ids = [r.shard_id for r in rows]
    assert shard_ids == sorted(shard_ids)
    assert all(0 <= s < C.PACK_SHARDS for s in shard_ids)
    for r in rows:
        # census nesting: candidates >= clean >= admitted
        assert r.n_candidates >= 1
        assert r.n_candidates >= r.n_clean >= r.n_admitted >= 0
        assert r.n_tokens >= 0
        # a bin receives at most one doc-start per admitted doc, and
        # at least one bin exists whenever anything was admitted
        assert r.n_bins <= r.n_admitted
        assert (r.n_bins >= 1) == (r.n_admitted >= 1)
        assert (r.fingerprint > 0) == (r.n_admitted >= 1)
    # the pipeline admits SOMETHING at the test sf (the sf0.1 fixture
    # is the template-leakage case where decon rejects ~all; sf0.001
    # must keep a non-trivial admitted mass)
    assert sum(r.n_admitted for r in rows) > 0


def test_x421_each_stage_strictly_filters(spark, sf_dir):
    """The fixture contains duplicates, holdout twins, and junk docs;
    every stage must remove SOMETHING and admitted counts must nest:
    admitted <= decontaminated <= non-holdout survivors <= docs."""
    docs = load_table(spark, sf_dir, "documents")
    n_raw = docs.count()
    n_surv = docs.select(F.sha2(F.col("text"), 256)).distinct().count()
    n_admitted = (
        C.x421_training_pipeline(spark, sf_dir)
        .agg(F.sum("n_admitted"))
        .collect()[0][0]
    )
    n_holdout_surv = (
        docs.withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy(F.sha2(F.col("text"), 256)).orderBy("doc_id")
            ),
        )
        .filter(
            (F.col("rn") == 1)
            & (F.pmod(F.col("doc_id"), F.lit(C.DECON_HOLDOUT_MOD)) != 0)
        )
        .count()
    )
    # sf0.001 happens to contain no duplicate texts, so dedup is <=;
    # the 10% holdout slice and the decon/quality gates always bite
    assert n_surv <= n_raw
    assert n_holdout_surv < n_surv, "holdout exclusion must remove docs"
    assert n_admitted < n_holdout_surv, "decon+quality must remove docs"
    assert n_admitted > 0
    assert n_admitted < n_raw, "the pipeline as a whole must filter"


def test_x421_is_one_lazy_plan(spark, sf_dir):
    """Composition without driver round-trips: building the DataFrame
    must launch no Spark jobs (no collect/count inside), and the plan
    must pass both registry lints."""
    from go_mapreduce_spark.plans.explain import (
        broadcasts_over_exploded_data,
        windows_over_unbounded_input,
    )

    tracker = spark.sparkContext.statusTracker()
    before = len(tracker.getJobIdsForGroup(None) or [])
    df = C.x421_training_pipeline(spark, sf_dir)
    after = len(tracker.getJobIdsForGroup(None) or [])
    # load_table costs one parquet-footer schema-read job (measured:
    # a bare load_table shows the same +1); building the pipeline
    # itself must add NO data-pass jobs beyond that
    assert after - before <= 1, "building x421 must not run data-pass jobs"
    assert not windows_over_unbounded_input(df)
    assert not broadcasts_over_exploded_data(df)
