"""Wave-88 property tests: streaming-PH vs batch replay, correlation
matrix laws, retention-triangle accounting."""

from __future__ import annotations

from go_mapreduce_spark.operators import analytics as AN
from go_mapreduce_spark.streaming import events as SE


def test_x393_stream_ph_coherence(spark, sf_dir):
    r = SE.x393_stream_page_hinkley(spark, sf_dir).collect()[0]
    assert r.n_days >= 1
    assert r.ph_max >= 0.0
    assert r.drift_alarm == (r.ph_max > SE.STREAM_PH_LAMBDA)
    assert r.changepoint_day is not None


def test_x394_corr_matrix_laws(spark, sf_dir):
    rows = AN.x394_correlation_matrix(spark, sf_dir).collect()
    k = len(AN.CORR_COLS)
    assert len(rows) == k * (k - 1) // 2
    order = {c: i for i, c in enumerate(AN.CORR_COLS)}
    for r in rows:
        assert -1.0 - 1e-9 <= r.pearson_r <= 1.0 + 1e-9
        # upper triangle only, in declaration order
        assert order[r.col_a] < order[r.col_b]
    # fixture columns are generated independently: no |r| near 1
    assert all(abs(r.pearson_r) < 0.9 for r in rows)


def test_x395_retention_laws(spark, sf_dir):
    rows = AN.x395_retention_triangle(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 1 <= r.age_weeks <= AN.RETENTION_MAX_AGE_WEEKS
        assert 0 < r.n_active <= r.cohort_size
        assert 0.0 < r.retention <= 1.0
    # a later-age cell of the same cohort can never contain users the
    # cohort does not have (monotone cap, not monotone decay)
    sizes = {r.cohort_week: r.cohort_size for r in rows}
    assert all(r.n_active <= sizes[r.cohort_week] for r in rows)
