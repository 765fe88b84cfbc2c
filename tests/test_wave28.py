"""Wave 28: observe() DQ metrics (x210) and linear-interpolation gap
fill (x211)."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_observed_metrics_match_direct_aggregate(spark, sf_dir):
    from go_mapreduce_spark.operators.relational import x210_observed_metrics
    from go_mapreduce_spark.sources.registry import load_table

    li = load_table(spark, sf_dir, "lineitem")
    direct = li.agg(
        F.count(F.lit(1)).alias("n"),
        F.round(
            F.sum(F.col("l_quantity").cast("decimal(38,6)")).cast("double"), 4
        ).alias("sq"),
        F.min("l_orderkey").alias("mn"),
        F.max("l_orderkey").alias("mx"),
    ).collect()[0]
    r = x210_observed_metrics(spark, sf_dir).collect()[0]
    assert (r.n_rows, r.sum_qty, r.min_orderkey, r.max_orderkey) == (
        direct.n,
        direct.sq,
        direct.mn,
        direct.mx,
    )
    assert r.n_bad_discount == 0  # fixture discounts are in [0, 1]


def test_linear_gapfill_properties(spark, sf_dir):
    """Observed rows keep their value; interpolated rows sit strictly
    between their neighbours' values and on the straight line."""
    from go_mapreduce_spark.operators.windows import x211_gapfill_linear

    rows = x211_gapfill_linear(spark, sf_dir).collect()
    by_type: dict = {}
    for r in rows:
        by_type.setdefault(r.event_type, []).append(r)
    for et, rs in by_type.items():
        rs.sort(key=lambda r: r.hour)
        # first and last grid points are observed by construction
        assert rs[0].observed and rs[-1].observed
        for i, r in enumerate(rs):
            assert r.filled_value is not None
            if r.observed:
                continue
            # find surrounding observed rows
            lo = next(
                rs[j] for j in range(i - 1, -1, -1) if rs[j].observed
            )
            hi = next(
                rs[j] for j in range(i + 1, len(rs)) if rs[j].observed
            )
            span = (hi.hour - lo.hour).total_seconds()
            w = (r.hour - lo.hour).total_seconds() / span
            expect = lo.filled_value + (hi.filled_value - lo.filled_value) * w
            # 2e-6: Python round() is banker's, Spark's is HALF_UP —
            # exact .5 midpoints differ by one ulp-of-the-6th-decimal
            assert abs(r.filled_value - round(expect, 6)) < 2e-6
