"""Wave-98 (round 8): SQLite query-option reads (compute inside the
store) + NaN/type round-trip edges."""

from __future__ import annotations

import math
import sqlite3

from go_mapreduce_spark.sources import sqlite_source as SQ


def test_query_option_runs_inside_sqlite(tmp_path, spark):
    SQ.register(spark)
    path = str(tmp_path / "q.db")
    con = sqlite3.connect(path)
    con.execute("CREATE TABLE t (k TEXT, v INTEGER)")
    con.executemany(
        "INSERT INTO t VALUES (?, ?)",
        [("a", 1), ("a", 2), ("b", 10), ("b", 20), ("c", 5)],
    )
    con.commit()
    con.close()
    df = (
        spark.read.format("gms_sqlite")
        .option("path", path)
        .option("query", "SELECT k, SUM(v) AS s, COUNT(*) AS n FROM t GROUP BY k")
        .load()
    )
    # the answer relation rides one partition — sqlite did the work
    assert df.rdd.getNumPartitions() == 1
    assert [(f.name, f.dataType.simpleString()) for f in df.schema.fields] == [
        ("k", "string"), ("s", "bigint"), ("n", "bigint")
    ]
    got = {(r.k, r.s, r.n) for r in df.collect()}
    assert got == {("a", 3, 2), ("b", 30, 2), ("c", 5, 1)}
    # residual Spark filters still compose on top of the subquery
    assert df.filter("s > 4").count() == 2


def test_nan_round_trips_as_null_infinity_exact(tmp_path, spark):
    SQ.register(spark)
    out = str(tmp_path / "nan.db")
    df = spark.createDataFrame(
        [(1, float("nan")), (2, float("inf")), (3, -float("inf")), (4, 1.5)],
        "id bigint, v double",
    )
    df.write.format("gms_sqlite").mode("overwrite").option("path", out).option(
        "table", "t"
    ).save()
    back = {
        r.id: r.v
        for r in spark.read.format("gms_sqlite")
        .option("path", out)
        .option("table", "t")
        .load()
        .collect()
    }
    assert back[1] is None  # sqlite has no NaN: stored as NULL
    assert back[2] == float("inf") and back[3] == -float("inf")
    assert back[4] == 1.5


def test_x413_matches_duckdb(spark, sf_dir, duck):
    got = {
        (r.o_orderpriority, r.n_orders, r.total_value)
        for r in SQ.x413_sqlite_query_option(spark, sf_dir).collect()
    }
    want = {
        tuple(r)
        for r in duck.execute(
            """
            SELECT o_orderpriority, COUNT(*),
                   ROUND(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT))
                         / 100.0, 2)
            FROM orders GROUP BY 1
            """
        ).fetchall()
    }
    assert got == want


# --- differential fuzz: adversarial values through the connector ---------

from hypothesis import HealthCheck, given, settings, strategies as st

_FUZZ = settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

_vals = st.tuples(
    st.integers(min_value=-(2**63), max_value=2**63 - 1),
    st.one_of(
        st.none(),
        st.text(max_size=12),  # unicode, quotes, control chars
    ),
    st.one_of(
        st.none(),
        st.floats(allow_nan=False, width=64),  # ±inf included; NaN→NULL is
    ),                                          # pinned separately above
    st.one_of(st.none(), st.binary(max_size=8)),
)


@_FUZZ
@given(st.lists(_vals, min_size=1, max_size=25))
def test_fuzz_roundtrip_writer_reader(spark, tmp_path_factory, rows):
    SQ.register(spark)
    out = str(tmp_path_factory.mktemp("fz") / "t.db")
    # unique id column so order-insensitive compare is exact
    data = [(i, *r) for i, r in enumerate(rows)]
    df = spark.createDataFrame(
        data, "rid bigint, i bigint, s string, d double, b binary"
    )
    df.write.format("gms_sqlite").mode("overwrite").option("path", out).option(
        "table", "t"
    ).save()
    back = (
        spark.read.format("gms_sqlite")
        .option("path", out)
        .option("table", "t")
        .option("partitions", "3")
        .load()
        .collect()
    )
    got = sorted((r.rid, r.i, r.s, r.d, bytes(r.b) if r.b is not None else None) for r in back)
    want = sorted((rid, i, s, d, b) for rid, i, s, d, b in data)
    assert got == want


@_FUZZ
@given(
    st.lists(st.integers(-50, 50), min_size=1, max_size=30),
    st.integers(-60, 60),
)
def test_fuzz_pushdown_equals_spark_side_filter(spark, tmp_path_factory, xs, cut):
    import sqlite3 as _sq

    SQ.register(spark)
    out = str(tmp_path_factory.mktemp("fz") / "p.db")
    con = _sq.connect(out)
    con.execute("CREATE TABLE t (x INTEGER)")
    con.executemany("INSERT INTO t VALUES (?)", [(x,) for x in xs])
    con.commit()
    con.close()
    base = (
        spark.read.format("gms_sqlite")
        .option("path", out)
        .option("table", "t")
        .load()
    )
    from pyspark.sql import functions as F

    pushed = sorted(r.x for r in base.filter(F.col("x") > cut).collect())
    spark_side = sorted(x for x in xs if x > cut)
    assert pushed == spark_side
