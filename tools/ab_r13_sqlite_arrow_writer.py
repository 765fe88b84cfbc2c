"""Interleaved A/B for the round-13 sqlite Arrow writer change: the
pre-change pickled-Row writer (kept inline below, byte-equivalent to
the old SqliteWriter.write) registered as a second data source vs the
committed Arrow-batch writer, both writing the same 150k-row orders
relation to fresh sqlite files.  Row-content identity is asserted
before timing (COUNT + per-column checksums inside sqlite).
"""
import os
import sys
import sqlite3
import time
import uuid

sys.path.insert(0, "/root/repo")

from pyspark.sql.datasource import DataSource, DataSourceWriter  # noqa: E402

from go_mapreduce_spark.session import get_spark  # noqa: E402
from go_mapreduce_spark.sources import sqlite_source as SQ  # noqa: E402
from go_mapreduce_spark.sources.registry import load_table  # noqa: E402

N = 3


class RowPathWriter(DataSourceWriter):
    """The pre-round-13 write body: pickled Rows, per-value
    _to_sqlite_value, 10k-row executemany batches."""

    def __init__(self, schema, options, overwrite):
        self.schema = schema
        self.path = options["path"]
        self.table = options["table"]
        self.overwrite = overwrite

    def _cols_sql(self):
        return ", ".join(
            f'"{f.name}" {SQ._spark_to_sqlite(f.dataType)}'
            for f in self.schema.fields
        )

    def _ddl(self):
        return f'CREATE TABLE IF NOT EXISTS "{self.table}" ({self._cols_sql()})'

    def write(self, iterator):
        stage = f"{self.path}.stage-{uuid.uuid4().hex}"
        con = sqlite3.connect(stage)
        n = 0
        try:
            con.execute(self._ddl())
            ph = ", ".join("?" * len(self.schema.fields))
            ins = f'INSERT INTO "{self.table}" VALUES ({ph})'
            batch = []
            for row in iterator:
                batch.append(tuple(SQ._to_sqlite_value(v) for v in row))
                n += 1
                if len(batch) >= 10_000:
                    con.executemany(ins, batch)
                    batch = []
            if batch:
                con.executemany(ins, batch)
            con.commit()
        finally:
            con.close()
        return SQ._StageCommit(stage_path=stage, n_rows=n)

    commit = SQ.SqliteWriter.commit
    abort = SQ.SqliteWriter.abort


class RowPathDataSource(DataSource):
    @classmethod
    def name(cls):
        return "gms_sqlite_rowpath"

    def writer(self, schema, overwrite):
        return RowPathWriter(schema, self.options, overwrite)


def checksum(path, table):
    con = sqlite3.connect(path)
    try:
        return con.execute(
            f'SELECT COUNT(*), SUM(o_orderkey), SUM(LENGTH(o_orderpriority)),'
            f' ROUND(SUM(o_totalprice), 2), MIN(o_orderdate), MAX(o_orderdate)'
            f' FROM "{table}"'
        ).fetchone()
    finally:
        con.close()


def main():
    SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("ab-sqlite-writer")
    SQ.register(spark)
    spark.dataSource.register(RowPathDataSource)
    orders = load_table(spark, SF, "orders").select(
        "o_orderkey", "o_custkey", "o_orderpriority", "o_totalprice", "o_orderdate"
    )
    orders.count()  # warm the scan

    base = "/tmp/ab_r13_sqlite_writer"
    os.makedirs(base, exist_ok=True)

    def run(fmt, label):
        out = os.path.join(base, f"{label}.db")
        if os.path.isfile(out):
            os.remove(out)
        spark.sparkContext.setJobDescription(f"ab_writer:{label}")
        t0 = time.monotonic()
        (orders.write.format(fmt).mode("append")
         .option("path", out).option("table", "t").save())
        wall = time.monotonic() - t0
        spark.sparkContext.setJobDescription(None)
        return wall, out

    _, o_old = run("gms_sqlite_rowpath", "ident_old")
    _, o_new = run("gms_sqlite", "ident_new")
    co, cn = checksum(o_old, "t"), checksum(o_new, "t")
    assert co == cn, (co, cn)
    print("identical content:", co, flush=True)

    old_w, new_w = [], []
    for i in range(N):
        old_w.append(run("gms_sqlite_rowpath", f"old_{i}")[0])
        new_w.append(run("gms_sqlite", f"new_{i}")[0])
    print("row-path walls", [round(w, 3) for w in old_w], "min", round(min(old_w), 3))
    print("arrow walls   ", [round(w, 3) for w in new_w], "min", round(min(new_w), 3))
    spark.stop()


if __name__ == "__main__":
    main()
