"""Interleaved same-session A/B for the round-13 checkpoint fixes:

  x164_khop_reachability — frontier localCheckpoint per round (the old
      loop re-embedded the whole prior frontier join chain in every
      round's plan: O(rounds^2) joins recomputed)
  x382_semdedup — one localCheckpoint of the (vec_id, centroid_id, sub)
      assignment (the old plan replayed the two-level assignment
      pipeline for both self-join sides and the census)

The OLD implementations are kept inline below, byte-equivalent to the
pre-round-13 operators; identity is asserted at sf0.01 before timing.
min-of-N interleaved through the noop sink (guide §1).
"""
import hashlib
import sys
import time

sys.path.insert(0, "/root/repo")
from pyspark.sql import DataFrame, functions as F  # noqa: E402
from pyspark.sql.window import Window  # noqa: E402

from go_mapreduce_spark.operators import dedup as D  # noqa: E402
from go_mapreduce_spark.operators.graph import (  # noqa: E402
    BFS_ROUNDS,
    _nation3_seeds,
    purchase_edges_sym,
)
from go_mapreduce_spark.operators.clustering import (  # noqa: E402
    assign_nearest_two_level,
    semdedup_k,
    semdedup_supers,
)
from go_mapreduce_spark.functions.vectors import cosine_similarity  # noqa: E402
from go_mapreduce_spark.operators.scale import (  # noqa: E402
    iterative_plan_confs,
    iterative_shuffle_partitions,
)
from go_mapreduce_spark.queries import QUERIES  # noqa: E402
from go_mapreduce_spark.session import get_spark  # noqa: E402
from go_mapreduce_spark.sources.registry import load_table  # noqa: E402

N = 3


def bfs_khop_old(edges_sym: DataFrame, seeds: DataFrame, rounds: int = BFS_ROUNDS):
    """Pre-round-13 loop: dist checkpointed, frontier NOT."""
    edges_sym = edges_sym.persist()
    m = edges_sym.count()
    spark = edges_sym.sparkSession
    with iterative_plan_confs(spark, iterative_shuffle_partitions(m)):
        dist = (
            seeds.select("node", F.lit(0).alias("dist"))
            .distinct()
            .localCheckpoint(eager=False)
        )
        frontier = dist.select("node")
        for r in range(1, rounds + 1):
            nbrs = (
                frontier.join(edges_sym, frontier.node == edges_sym.u)
                .select(F.col("v").alias("node"))
                .distinct()
            )
            new = nbrs.join(dist, "node", "left_anti").select(
                "node", F.lit(r).alias("dist")
            )
            dist = dist.union(new).localCheckpoint(eager=r == rounds)
            frontier = new
    edges_sym.unpersist()
    return dist


def x164_old(spark, sf_dir):
    return (
        bfs_khop_old(purchase_edges_sym(spark, sf_dir), _nation3_seeds(spark, sf_dir))
        .orderBy("node")
    )


def x382_old(spark, sf_dir, k=None):
    """Pre-round-13 x382: no assignment checkpoint."""
    emb = load_table(spark, sf_dir, "embeddings")
    if k is None:
        k = semdedup_k(emb.count())
    centroids = emb.filter(F.col("vec_id").between(1, k)).select(
        F.col("vec_id").alias("centroid_id"), F.col("embedding").alias("ce")
    )
    assign = assign_nearest_two_level(
        emb, centroids, semdedup_supers(k)
    ).select("vec_id", "centroid_id")
    w_sub = Window.partitionBy("centroid_id").orderBy("vec_id")
    assign = assign.withColumn(
        "sub",
        ((F.row_number().over(w_sub) - F.lit(1)) / F.lit(D.SEMDEDUP_CLUSTER_CAP))
        .cast("int"),
    )
    vecs = assign.join(emb.select("vec_id", "embedding"), "vec_id")
    a = vecs.select(
        F.col("centroid_id").alias("c"), F.col("sub").alias("s"),
        F.col("vec_id").alias("ia"), F.col("embedding").alias("va"),
    )
    b = vecs.select(
        F.col("centroid_id").alias("c"), F.col("sub").alias("s"),
        F.col("vec_id").alias("ib"), F.col("embedding").alias("vb"),
    )
    dropped = (
        a.join(b, ["c", "s"])
        .filter(F.col("ia") < F.col("ib"))
        .filter(cosine_similarity(F.col("va"), F.col("vb")) >= F.lit(D.SEMDEDUP_TAU))
        .select("c", F.col("ib").alias("vec_id"))
        .distinct()
    )
    return (
        assign.join(
            dropped.select("vec_id").withColumn("_drop", F.lit(1)), "vec_id", "left"
        )
        .groupBy("centroid_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_vectors"),
            F.sum(F.coalesce(F.col("_drop"), F.lit(0))).cast("bigint").alias("n_dropped"),
        )
        .select(
            "centroid_id", "n_vectors", "n_dropped",
            (F.col("n_vectors") - F.col("n_dropped")).alias("n_kept"),
        )
        .orderBy("centroid_id")
    )


def rows_hash(df):
    cols = df.columns
    rows = df.collect()
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted("|".join(str(r[i]) for i in order) for r in rows)
    return hashlib.sha256("\n".join(lines).encode()).hexdigest(), len(rows)


def run(spark, fn, sf, label):
    spark.sparkContext.setJobDescription(f"ab_r13:{label}")
    t0 = time.monotonic()
    fn(spark, sf).write.format("noop").mode("overwrite").save()
    wall = time.monotonic() - t0
    spark.catalog.clearCache()
    spark.sparkContext.setJobDescription(None)
    return wall


def main():
    SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("ab-r13")
    pairs = [
        ("x164", x164_old, QUERIES["x164_khop_reachability"]),
        ("x382", x382_old, QUERIES["x382_semdedup"]),
    ]
    for name, old, new in pairs:
        ho = rows_hash(old(spark, "/root/testdata/sf0.01"))
        hn = rows_hash(new(spark, "/root/testdata/sf0.01"))
        assert ho == hn, (name, ho, hn)
        print(f"identical {name} sf0.01: {ho}", flush=True)
        spark.catalog.clearCache()
    for name, old, new in pairs:
        run(spark, old, SF, f"warmup_old_{name}")
        run(spark, new, SF, f"warmup_new_{name}")
        ow, nw = [], []
        for i in range(N):
            ow.append(run(spark, old, SF, f"old_{name}_{i}"))
            nw.append(run(spark, new, SF, f"new_{name}_{i}"))
        print(
            f"{name}: old min={min(ow):.3f} walls={[round(w,3) for w in ow]} | "
            f"new min={min(nw):.3f} walls={[round(w,3) for w in nw]}",
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
