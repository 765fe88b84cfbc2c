"""Wave-80 tests: streaming PSI drift — baseline anchor, bin
accounting, stream-vs-batch equality is the oracle's job."""

from __future__ import annotations

from go_mapreduce_spark.streaming import events as SE


def test_x371_stream_psi_properties(spark, sf_dir):
    rows = sorted(
        SE.x371_stream_psi_drift(spark, sf_dir).collect(),
        key=lambda r: r.window_start,
    )
    assert len(rows) >= 5  # a month of finalized day windows
    # the baseline day self-compares to PSI exactly 0
    assert rows[0].psi == 0.0
    assert rows[0].drift_alert == 0
    for r in rows:
        assert r.psi >= 0.0  # PSI terms are individually nonnegative
        assert r.n_bins >= 1
        assert r.drift_alert == (1 if r.psi > 0.25 else 0)
    # every window covers at least the baseline's bin set
    assert len({r.n_bins for r in rows}) >= 1
    assert min(r.n_bins for r in rows) >= rows[0].n_bins - 5
