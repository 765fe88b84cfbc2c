"""Custom connector via the Python Data Source API (Spark 4.x) —
the modern extension point for "teach Spark a new format/system".

The reference's scan operator is a line-aligned file split handed to
each map task (R1, mapreduce/mapreduce.go:74-112).  This re-expresses
that contract natively: ``partitions()`` returns ONE InputPartition
per shard file (the planner schedules them like any other scan), and
``read()`` parses a whole shard with pyarrow's CSV reader and yields
Arrow RecordBatches — columnar, vectorized transfer into the JVM, not
row-at-a-time Python tuples.

Scale notes: per-file partitioning means parallelism = shard count
(the writer controls it); a production connector would also split
WITHIN large files at line boundaries exactly like the reference
does.  Filters/column pruning stop at the source boundary for Python
data sources today — the honest trade vs a native DSv2 connector,
and why parquet remains the primary format; this is the escape hatch
for systems Spark has no reader for.
"""

from __future__ import annotations

import os

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition
from pyspark.sql.types import StructType


class _ShardPartition(InputPartition):
    def __init__(self, path: str):
        self.path = path


class TsvDataSource(DataSource):
    """``spark.read.format("gms_tsv")`` — headerless TSV shards under
    option ``path``, typed by the caller-provided read schema."""

    @classmethod
    def name(cls) -> str:
        return "gms_tsv"

    def schema(self):
        # A connector for untyped text needs a caller schema; default
        # to a single string column when none is given.
        return "value string"

    def reader(self, schema: StructType) -> DataSourceReader:
        return TsvReader(schema, self.options)


class TsvReader(DataSourceReader):
    def __init__(self, schema: StructType, options: dict):
        self.schema = schema
        self.path = options["path"]

    def partitions(self):
        shards = sorted(
            f
            for f in os.listdir(self.path)
            if f.startswith("part-") and not f.endswith(".crc")
        )
        return [_ShardPartition(os.path.join(self.path, f)) for f in shards]

    def read(self, partition: _ShardPartition):
        import pyarrow as pa
        from pyarrow import csv as pacsv

        arrow_types = {
            "string": pa.string(),
            "long": pa.int64(),
            "bigint": pa.int64(),
            "integer": pa.int32(),
            "double": pa.float64(),
        }
        names = [f.name for f in self.schema.fields]
        types = {
            f.name: arrow_types[f.dataType.simpleString()]
            for f in self.schema.fields
        }
        if os.path.getsize(partition.path) == 0:
            return
        table = pacsv.read_csv(
            partition.path,
            read_options=pacsv.ReadOptions(column_names=names),
            parse_options=pacsv.ParseOptions(delimiter="\t"),
            convert_options=pacsv.ConvertOptions(column_types=types),
        )
        yield from table.to_batches()


_REGISTERED_SESSIONS: set[str] = set()


def register(spark) -> None:
    """Register the connector once per SparkSession (re-registration
    under the same name raises in pyspark 4)."""
    key = spark.sparkContext.applicationId
    if key in _REGISTERED_SESSIONS:
        return
    spark.dataSource.register(TsvDataSource)
    _REGISTERED_SESSIONS.add(key)


def x171_custom_source_roundtrip(spark, sf_dir: str):
    """Full wire-format loop through the custom connector: Q1's word
    counts written with the reference's sorted-TSV sink contract
    (range-partitioned shards), read BACK through ``gms_tsv`` —
    one scheduled partition per shard, Arrow-batched — and reduced to
    the top-20 tokens.  The oracle is x2's SQL over raw documents, so
    any loss in the sink→connector cycle (type round-trip, shard
    boundary, dropped/duplicated partition) hash-mismatches.
    """
    import tempfile

    from pyspark.sql import functions as F

    from go_mapreduce_spark.operators.wordcount import word_counts
    from go_mapreduce_spark.sources.registry import load_table
    from go_mapreduce_spark.sources.sinks import write_sorted_tsv

    tag = os.path.basename(os.path.normpath(sf_dir))
    out = os.path.join(tempfile.gettempdir(), f"gms_wc_tsv_{tag}")
    if not os.path.isdir(out) or not any(
        f.startswith("part-") for f in os.listdir(out)
    ):
        docs = load_table(spark, sf_dir, "documents").select("text")
        write_sorted_tsv(word_counts(docs), out, key_cols=["word"])
    register(spark)
    df = (
        spark.read.format("gms_tsv")
        .schema("word string, cnt bigint")
        .option("path", out)
        .load()
    )
    return df.orderBy(F.col("cnt").desc(), F.col("word").asc()).limit(20)
