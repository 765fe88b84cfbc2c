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
