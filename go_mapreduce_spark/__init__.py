"""go_mapreduce_spark — a PySpark-native analytics engine.

A from-scratch re-expression of the capabilities of the reference
``darkjh/go-mapreduce`` (an educational Go MapReduce runtime: split /
map / hash-partition shuffle / group / sort / reduce / merge, see
reference mapreduce/mapreduce.go:74-301), rebuilt Spark-first:

- The reference's entire runtime (split, shuffle, scheduling, merge)
  is subsumed by stock Spark; we author only the operator surface.
- DataFrame/SQL first so Catalyst provides pushdown, pruning, join
  selection, and AQE for free.
- A thin RDD-based ``map_reduce`` parity shim mirrors the reference's
  user-facing (Map, Reduce) callback contract.
- North-star extensions for LLM training-data pipelines: dedup
  (exact / MinHash-LSH / SimHash / n-gram Jaccard / embedding),
  similarity search, text analysis, multimodal column plumbing,
  and a Structured Streaming slice.

Designed for 100 TB scale: every operator keeps work JVM-side where
possible, shuffles on explicit keys, broadcasts small dimensions, and
avoids driver-side collection.
"""

from go_mapreduce_spark.session import get_spark  # noqa: F401

__version__ = "0.1.0"
