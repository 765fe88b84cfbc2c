"""Wave-93 property tests: KS-vs-exponential laws, cluster-spectrum
conservation."""

from __future__ import annotations

from go_mapreduce_spark.operators import dedup as D
from go_mapreduce_spark.operators import stats as ST
from go_mapreduce_spark.sources.registry import load_table


def test_x405_gof_laws(spark, sf_dir):
    r = ST.x405_exponential_gof(spark, sf_dir).collect()[0]
    assert r.n > 100
    assert r.lambda_per_sec > 0
    assert 0.0 <= r.d_stat <= 1.0
    assert r.crit_5pct > 0
    assert r.reject_5pct == (r.d_stat > r.crit_5pct)


def test_x406_spectrum_conservation(spark, sf_dir):
    rows = D.x406_cluster_size_spectrum(spark, sf_dir).collect()
    assert rows
    n_docs = load_table(spark, sf_dir, "documents").count()
    # every document sits in exactly one cluster (singletons included)
    assert sum(r.cluster_size * r.n_clusters for r in rows) == n_docs
    assert all(r.n_clusters > 0 for r in rows)
    # one shared slope on every row; heavy tail means it is negative
    slopes = {r.loglog_slope for r in rows}
    assert len(slopes) == 1
    if len(rows) > 1:
        assert rows[0].loglog_slope < 0
