"""Similarity search over embedding columns.

- x3: exact brute-force cosine top-k for a small query set — the
  declared, oracle-checked query (SURVEY.md §2.C X3).
- ann_lsh_topk: sign-random-projection LSH bucketing — the
  approximate scale path (recall-tested vs x3 in pytest, no SQL
  oracle by design).

Scale design: the *query* side is broadcast (queries ≪ corpus), so
the corpus never shuffles — each corpus partition scores its rows
against the in-memory query block and emits only its local top-k
candidates; the final global top-k touches (partitions × k) rows.
Dot products run JVM-side via zip_with/aggregate in double precision.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from go_mapreduce_spark.functions.vectors import cosine_similarity, dot, l2_norm
from go_mapreduce_spark.sources.registry import load_table


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k of each query against the corpus.

    queries: (query_id, q_embedding).  Returns
    (query_id, neighbor_id, similarity) with rank ≤ k by
    (similarity desc, neighbor_id asc), self-matches excluded.
    """
    joined = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("ne")
    ).join(F.broadcast(queries), F.col("neighbor_id") != F.col("query_id"))
    sim = cosine_similarity(F.col("qe"), F.col("ne"))
    w = Window.partitionBy("query_id").orderBy(
        F.col("similarity_raw").desc(), F.col("neighbor_id").asc()
    )
    return (
        joined.withColumn("similarity_raw", sim)
        .withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select(
            "query_id",
            "neighbor_id",
            F.round("similarity_raw", 6).alias("similarity"),
        )
    )


def x3_knn_cosine(spark: SparkSession, sf_dir: str, k: int = 5) -> DataFrame:
    """Top-5 cosine neighbors for vec_id 1..5 (SURVEY.md §2.C X3)."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id").between(1, 5)).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qe")
    )
    return brute_force_topk(emb, queries, k=k).orderBy(
        "query_id", F.col("similarity").desc(), "neighbor_id"
    )


# ---------------------------------------------------------------------------
# approximate path: multi-table sign-random-projection LSH
# ---------------------------------------------------------------------------

N_TABLES = 8       # L independent hash tables
BITS_PER_TABLE = 8  # k hyperplanes per table
_DIM = 64

# Recall for a neighbor at angular sign-agreement prob p:
#   1 - (1 - p^k)^L     (collide in >= 1 of L tables)
# With k=8, L=8: p=0.86 (cos~0.9) -> 0.93; p=0.62 (random data) -> 0.15.
# Multi-table, not multiprobe, is the structure that gives the knob:
# raise L for recall, raise k for precision/bucket-size.


def _hyperplanes(dim: int = _DIM, n_planes: int = N_TABLES * BITS_PER_TABLE) -> list[list[float]]:
    """Deterministic ±1 hyperplanes from a counter-based hash (seeded
    forever — signatures must be identical across runs/clusters)."""
    import hashlib

    planes = []
    for p in range(n_planes):
        row = []
        for d in range(dim):
            h = hashlib.sha256(f"plane:{p}:{d}".encode()).digest()
            row.append(1.0 if h[0] % 2 == 0 else -1.0)
        planes.append(row)
    return planes


def lsh_signature(vec_col: Column, dim: int = _DIM) -> Column:
    """Full bit-string over all L×k hyperplanes: sign of <v, r_p>."""
    planes = _hyperplanes(dim)
    bits = []
    for row in planes:
        plane_lit = F.array(*[F.lit(x) for x in row])
        proj = F.aggregate(
            F.zip_with(vec_col, plane_lit, lambda x, y: x.cast("double") * y),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        bits.append(F.when(proj >= 0, F.lit("1")).otherwise(F.lit("0")))
    return F.concat(*bits)


def _table_buckets(sig_col: Column) -> Column:
    """Array of (table, key) structs — table t's key is bits [t*k, (t+1)*k)."""
    return F.array(
        *[
            F.struct(
                F.lit(t).alias("table"),
                F.substring(sig_col, t * BITS_PER_TABLE + 1, BITS_PER_TABLE).alias("key"),
            )
            for t in range(N_TABLES)
        ]
    )


def ann_lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k via L-table sign-LSH: score only corpus rows
    colliding with the query in ≥1 table, dedup, exact-cosine rank.

    At 100 TB the corpus side is materialized once as the exploded
    (table, key, id, vec) relation — written bucketed by (table, key)
    so each query probes L buckets via partition pruning.  Here the
    same plan is an equi-join on (table, key) against the broadcast
    (tiny) query probe set; the corpus never shuffles.
    """
    corpus_b = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("ne"),
        F.explode(_table_buckets(lsh_signature(F.col(vec_col)))).alias("tb"),
    ).select("neighbor_id", "ne", "tb.table", "tb.key")

    qprobe = queries.select(
        "query_id",
        "qe",
        F.explode(_table_buckets(lsh_signature(F.col("qe")))).alias("tb"),
    ).select("query_id", "qe", "tb.table", "tb.key")

    joined = corpus_b.join(F.broadcast(qprobe), ["table", "key"]).filter(
        F.col("neighbor_id") != F.col("query_id")
    )
    # a pair colliding in multiple tables appears L× — dedup before scoring
    pairs = joined.dropDuplicates(["query_id", "neighbor_id"]).select(
        "query_id", "qe", "neighbor_id", "ne"
    )
    sim = cosine_similarity(F.col("qe"), F.col("ne"))
    w = Window.partitionBy("query_id").orderBy(
        F.col("similarity_raw").desc(), F.col("neighbor_id").asc()
    )
    return (
        pairs.withColumn("similarity_raw", sim)
        .withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select(
            "query_id", "neighbor_id", F.round("similarity_raw", 6).alias("similarity")
        )
    )
