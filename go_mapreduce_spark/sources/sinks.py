"""Sinks: the reference's output formats plus the engine's real ones.

Reference surface (SURVEY.md §2.A): a globally key-sorted single TSV
file (Merge + R9, mapreduce/mapreduce.go:229-266) and JSON
intermediates (subsumed by Spark's internal shuffle).  Engine surface:
parquet (columnar, partitioned — the 100 TB default), CSV/TSV, JSON.

Scale rules:
- ``partition_by`` on parquet gives partition pruning to every
  downstream reader; choose low-cardinality columns.
- The single-file sorted TSV exists for reference parity; its
  coalesce(1) serializes through one task — exactly as bottlenecked
  as the reference's single-process Merge, and flagged as such.
  ``write_sorted_tsv`` (sharded) is the scalable variant: globally
  ordered across shards via range partitioning, one file per range.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def write_parquet(
    df: DataFrame,
    path: str,
    partition_by: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)


def write_csv(
    df: DataFrame,
    path: str,
    sep: str = ",",
    header: bool = True,
    mode: str = "overwrite",
) -> None:
    df.write.mode(mode).option("sep", sep).option("header", str(header).lower()).csv(path)


def write_json(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    df.write.mode(mode).json(path)


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str,
    n_buckets: int = 16,
    path: str | None = None,
    sort_by: str | None = None,
) -> None:
    """Persist as a bucketed (and optionally sort-within-bucket) table.

    Bucketing is THE shuffle eliminator for repeated big-big joins:
    two tables bucketed on the same key with the same bucket count
    join with zero Exchange — each task reads matching bucket files
    from both sides.  At 100 TB, bucket the fact tables on their
    primary join key at write time and every downstream join/agg on
    that key skips its shuffle (verified in tests/test_bucketing.py).
    """
    w = df.write.mode("overwrite").bucketBy(n_buckets, key)
    if sort_by:
        w = w.sortBy(sort_by)
    if path:
        w = w.option("path", path)
    w.saveAsTable(table)


def write_sorted_tsv(
    df: DataFrame, path: str, key_cols: list[str], single_file: bool = False
) -> None:
    """Globally key-sorted TSV (reference Merge output format).

    single_file=True reproduces the reference's one-file contract via
    coalesce(1) — fine for result sets, wrong for datasets.  Default
    writes range-partitioned shards: shard i's keys all precede shard
    i+1's, so `cat part-*` is still globally sorted (what the
    reference's own "XXX use merge sort" TODO wanted,
    mapreduce.go:228)."""
    out = df.orderBy(*key_cols)
    if single_file:
        out = out.coalesce(1)
    out.write.mode("overwrite").option("sep", "\t").option("header", "false").csv(path)


def write_orc(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """ORC sink (columnar twin of the parquet sink)."""
    df.write.mode(mode).orc(path)
