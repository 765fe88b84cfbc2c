"""Wave-59 property tests: negative-sampling determinism/counts,
weighted-Jaccard bounds vs set Jaccard, curriculum quota conservation,
user-entropy bounds."""

from __future__ import annotations

from pyspark.sql import functions as F

from go_mapreduce_spark.operators import curation as C
from go_mapreduce_spark.operators import dedup as D
from go_mapreduce_spark.operators import stats as ST


def test_x303_counts_and_determinism(spark, sf_dir):
    r = C.x303_negative_sampling(spark, sf_dir).collect()[0]
    assert r.n_collisions + r.n_negatives == r.n_candidates
    assert 0 <= r.collision_rate < 0.05  # uniform draw vs sparse positives
    r2 = C.x303_negative_sampling(spark, sf_dir).collect()[0]
    assert r == r2  # sha-derived: no RNG state anywhere


def test_x304_weighted_jaccard_bounded_by_overlap(spark, sf_dir):
    rows = D.x304_weighted_jaccard(spark, sf_dir).collect()
    assert rows, "x6 pairs exist in the fixture"
    for r in rows:
        assert 0.0 < r.weighted_jaccard <= 1.0


def test_x305_curriculum_quota_conservation(spark, sf_dir):
    rows = C.x305_curriculum_mix(spark, sf_dir).collect()
    assert [r.decile for r in rows] == list(range(1, 11))
    from go_mapreduce_spark.sources.registry import load_table

    n = load_table(spark, sf_dir, "documents").count()
    assert sum(r.n_docs for r in rows) == n
    # exact-decile balance: sizes differ by at most 1
    sizes = [r.n_docs for r in rows]
    assert max(sizes) - min(sizes) <= 1
    assert [r.weight for r in rows] == list(range(10, 0, -1))
    for r in rows:
        assert 0.0 < r.sample_rate <= 1.0


def test_x306_entropy_bounds(spark, sf_dir):
    import math

    r = ST.x306_user_entropy(spark, sf_dir).collect()[0]
    from go_mapreduce_spark.sources.registry import load_table

    n_types = (
        load_table(spark, sf_dir, "events").select("event_type").distinct().count()
    )
    assert 0.0 <= r.mean_entropy <= r.max_entropy <= math.log(n_types) + 1e-9
    assert 0 <= r.n_single_type <= r.n_users
