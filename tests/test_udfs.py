"""UDF-surface tests: the applyInPandas grouped-map demo must compute
exactly what the declared window-function x28 computes (same math,
different physical strategy — see operators/udfs.grouped_zscore_pandas
for why the window plan is the declared one)."""

from __future__ import annotations

from go_mapreduce_spark.operators.relational_ext import x28_grouped_zscore
from go_mapreduce_spark.operators.udfs import grouped_zscore_pandas
from tests.conftest import canon_rows


def test_grouped_zscore_pandas_matches_window_plan(spark, sf_dir):
    got = grouped_zscore_pandas(spark, sf_dir)
    want = x28_grouped_zscore(spark, sf_dir)
    assert canon_rows(got.columns, [tuple(r) for r in got.collect()]) == canon_rows(
        want.columns, [tuple(r) for r in want.collect()]
    )
