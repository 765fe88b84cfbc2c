"""Differential tests: every oracle-checked query vs DuckDB
(SURVEY.md §5.2.1) at the smoke scale factor, plus determinism."""

from __future__ import annotations

import pytest

from go_mapreduce_spark.queries import ORACLE_SQL, QUERIES
from tests.conftest import canon_rows

ORACLE_QUERIES = sorted(ORACLE_SQL)
NO_ORACLE = sorted(set(QUERIES) - set(ORACLE_SQL))


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_query_matches_oracle(spark, duck, sf_dir, name):
    sdf = QUERIES[name](spark, sf_dir)
    srows = [tuple(r) for r in sdf.collect()]
    ores = duck.execute(ORACLE_SQL[name])
    ocols = [d[0] for d in ores.description]
    orows = ores.fetchall()
    assert sorted(sdf.columns) == sorted(ocols), "column names must match oracle"
    assert len(srows) == len(orows), "row count mismatch"
    assert canon_rows(sdf.columns, srows) == canon_rows(ocols, orows)


@pytest.mark.parametrize("name", NO_ORACLE)
def test_no_oracle_query_runs_and_is_deterministic(spark, sf_dir, name):
    a = QUERIES[name](spark, sf_dir)
    rows1 = canon_rows(a.columns, [tuple(r) for r in a.collect()])
    b = QUERIES[name](spark, sf_dir)
    rows2 = canon_rows(b.columns, [tuple(r) for r in b.collect()])
    assert rows1 == rows2, "same input must produce identical results"


def test_every_oracle_key_has_query():
    assert not set(ORACLE_SQL) - set(QUERIES)


def test_no_declared_query_emits_unhashable_columns(spark, sf_dir):
    """The driver's canonicalizer sorts result columns with pandas —
    array/map/struct values crash it (round-1 x33 lesson). Every
    declared query must emit only scalar columns; complex values must
    be serialized (array_join etc.) before they leave the query."""
    from pyspark.sql.types import ArrayType, MapType, StructType

    from go_mapreduce_spark.queries import QUERIES

    offenders = {}
    for name, fn in QUERIES.items():
        schema = fn(spark, sf_dir).schema
        bad = [
            f.name
            for f in schema.fields
            if isinstance(f.dataType, (ArrayType, MapType, StructType))
        ]
        if bad:
            offenders[name] = bad
    assert not offenders, f"complex-typed output columns: {offenders}"
