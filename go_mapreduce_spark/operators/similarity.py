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
# approximate path: sign-random-projection LSH
# ---------------------------------------------------------------------------

N_PLANES = 12
_DIM = 64


def _hyperplanes(dim: int = _DIM, n_planes: int = N_PLANES) -> list[list[float]]:
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
    """Bit-string bucket id: sign of <v, r_p> for each hyperplane."""
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


def ann_lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    multiprobe: int = 1,
) -> DataFrame:
    """Approximate top-k: score only corpus rows in the query's LSH
    bucket (plus Hamming-≤multiprobe neighbor buckets).

    At 100 TB the corpus is written bucketed/partitioned by signature
    so a query touches only its probe partitions (partition pruning);
    here we express the same thing as an equi-join on the signature,
    which Spark executes as a broadcast join on the (tiny) probe set.
    """
    sig = lsh_signature(F.col(vec_col))
    corpus_b = corpus.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("ne"), sig.alias("bucket")
    )

    qsig = queries.select("query_id", "qe", lsh_signature(F.col("qe")).alias("qbucket"))
    # multiprobe: flip ≤ multiprobe bits of the query signature
    probes = [F.col("qbucket")]
    if multiprobe >= 1:
        for i in range(N_PLANES):
            flipped = F.concat(
                F.substring("qbucket", 1, i),
                F.when(F.substring("qbucket", i + 1, 1) == "1", F.lit("0")).otherwise(F.lit("1")),
                F.substring("qbucket", i + 2, N_PLANES - i - 1),
            )
            probes.append(flipped)
    qprobe = qsig.select(
        "query_id", "qe", F.explode(F.array_distinct(F.array(*probes))).alias("bucket")
    )

    joined = corpus_b.join(F.broadcast(qprobe), "bucket").filter(
        F.col("neighbor_id") != F.col("query_id")
    )
    sim = cosine_similarity(F.col("qe"), F.col("ne"))
    w = Window.partitionBy("query_id").orderBy(
        F.col("similarity_raw").desc(), F.col("neighbor_id").asc()
    )
    return (
        joined.withColumn("similarity_raw", sim)
        .dropDuplicates(["query_id", "neighbor_id"])
        .withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select(
            "query_id", "neighbor_id", F.round("similarity_raw", 6).alias("similarity")
        )
    )
