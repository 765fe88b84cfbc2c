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

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
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

N_TABLES = 16      # L independent hash tables
BITS_PER_TABLE = 4  # k hyperplanes per table
_DIM = 64

# Recall for a neighbor at angular sign-agreement prob p = 1 - θ/π:
#   1 - (1 - p^k)^L     (collide in >= 1 of L tables)
# Defaults are tuned for the MODERATE-similarity regime the fixture's
# true top-k lives in (cos ≈ 0.35 → p ≈ 0.61): k=4, L=16 → recall
# ≈ 0.92 (measured per-run in bench.py's ann_recall).  The old k=8,
# L=8 setting recalls ~0.15 there — fine for cos ≥ 0.9 near-dups,
# useless for kNN.  Tuning rule at scale: k ≈ log2(N / target bucket
# size) bounds candidates per table; then raise L until
# 1-(1-p^k)^L clears the recall target for the p your neighbors
# actually have.


def _plane_matrix(dim: int, n_planes: int):
    """Deterministic ±1 hyperplanes from a counter-based hash (seeded
    forever — signatures must be identical across runs/clusters)."""
    import hashlib

    import numpy as np

    m = np.empty((n_planes, dim))
    for p in range(n_planes):
        for d in range(dim):
            h = hashlib.sha256(f"plane:{p}:{d}".encode()).digest()
            m[p, d] = 1.0 if h[0] % 2 == 0 else -1.0
    return m


def table_keys_udf(dim: int = _DIM, n_tables: int = N_TABLES, bits: int = BITS_PER_TABLE):
    """Arrow-batched signature: per row, the array of L table keys
    (each the k sign bits of <v, plane> packed into an int).

    This is the one similarity step done in Python ON PURPOSE: all
    L×k projections are ONE numpy matmul per Arrow batch
    ((B×dim) @ (dim×L·k)), where the expression-tree formulation (64
    zip_with/aggregate chains) spends multiple seconds in analysis +
    codegen alone.  The plane matrix is captured in the closure —
    pickled by value, no executor-side package import needed.  Built
    lazily: pandas_udf needs an active SparkContext to parse its
    return type.
    """
    import numpy as np

    from pyspark.sql.functions import pandas_udf

    planes = _plane_matrix(dim, n_tables * bits)

    @pandas_udf("array<int>")
    def _keys(v: pd.Series) -> pd.Series:
        import numpy as _np

        if len(v) == 0:
            return pd.Series([], dtype=object)
        m = _np.stack([_np.asarray(x, dtype=_np.float64) for x in v])
        bitm = (m @ planes.T) >= 0                       # (B, L*k) sign bits
        w = 1 << _np.arange(bits)
        keys = bitm.reshape(len(m), n_tables, bits) @ w  # pack k bits per table
        return pd.Series([row.tolist() for row in keys.astype("int32")])

    return _keys


# ---------------------------------------------------------------------------
# approximate path 2: IVF (inverted-file) coarse quantizer
# ---------------------------------------------------------------------------

IVF_CELLS = 16
IVF_PROBE = 4
# 3 Lloyd rounds: on the isotropic fixture recall peaks here (0.6 vs
# 0.4 untrained; more rounds shift cell boundaries without helping —
# measured in-round), and each round costs a full re-analyzed plan
# (centroids re-enter as literals, so codegen recompiles per round)
IVF_TRAIN_ITERS = 3

# (analyzed-plan string, n_cells, iters) → unit-normalized centroids
_CENTROID_CACHE: dict[tuple, object] = {}


def _ivf_centroids(
    corpus: DataFrame,
    n_cells: int,
    id_col: str,
    vec_col: str,
    trained: bool = True,
):
    """Coarse-quantizer centroids, unit-normalized (cosine cells).

    ``trained=True`` (default): Lloyd's k-means over unit-normalized
    corpus vectors (``clustering.kmeans_fit`` — spherical-k-means
    shape: L2 on the unit sphere orders identically to cosine), which
    adapts cells to the actual data geometry.  Training runs on a
    deterministic hash-sample of ≤256·k rows (the FAISS discipline:
    quantizer quality saturates at a few hundred points per cell, so
    training cost is O(k²·d·iters), independent of corpus size).  Per
    round only k×dim floats cross the driver boundary; the corpus
    never shuffles.

    ``trained=False``: the round-2 seed-free pick — the ``n_cells``
    corpus vectors with smallest sha256(id) — kept for bench
    comparison.  Centroid CHOICE only moves recall, never
    correctness, since candidates are exact-scored."""
    import numpy as np

    if trained:
        from go_mapreduce_spark.operators.clustering import kmeans_fit

        # A production IVF index trains its quantizer ONCE and
        # persists it alongside the partitioned corpus; memoizing on
        # the CANONICALIZED plan (same immutable source + transforms
        # → same data) mirrors that, so repeated index probes in one
        # session don't re-run Lloyd.  ``semanticHash`` normalizes
        # expression AND lambda-variable ids (the previous
        # regex-stripped plan string left lambda numbering in, so
        # transform-bearing corpora like x41b's clustered view never
        # hit), and the backing file list pins the key to the actual
        # source paths — the plan's Relation toString omits them, so
        # without it two scale factors of the same table would have
        # SHARED a key (wrong centroids on the second corpus).
        key = (
            corpus.semanticHash(),
            tuple(sorted(corpus.inputFiles())),
            n_cells,
            IVF_TRAIN_ITERS,
        )
        hit = _CENTROID_CACHE.get(key)
        if hit is not None:
            return hit

        target = 256 * n_cells
        n = corpus.count()
        sampled = corpus.select(F.col(id_col), F.col(vec_col))
        if n > target:
            # deterministic hash-sample: content-stable, no RNG state
            mod = max(1, n // target)
            sampled = sampled.filter(
                F.pmod(F.xxhash64(F.col(id_col)), F.lit(mod)) == 0
            )
        # materialize the norm as a real column BEFORE the transform
        # lambda (captured expressions re-evaluate per element)
        # bounded sample → single partition: every Lloyd round then
        # runs 1-task stages instead of 32 scheduler round-trips
        normed = (
            sampled.withColumn(
                "_nrm", F.greatest(l2_norm(F.col(vec_col)), F.lit(1e-12))
            )
            .select(
                F.col(id_col),
                F.transform(
                    F.col(vec_col), lambda x: x.cast("double") / F.col("_nrm")
                ).alias(vec_col),
            )
            .coalesce(1)
        )
        cents, _ = kmeans_fit(
            normed,
            k=n_cells,
            max_iter=IVF_TRAIN_ITERS,
            tol=1e-6,
            id_col=id_col,
            vec_col=vec_col,
        )
        m = np.asarray(cents, dtype=np.float64)
        out = m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)
        _CENTROID_CACHE[key] = out
        return out
    else:
        rows = (
            corpus.select(F.col(id_col).alias("cid"), F.col(vec_col).alias("cvec"))
            .orderBy(F.sha2(F.col("cid").cast("string"), 256))
            .limit(n_cells)
            .collect()
        )
        m = np.stack([np.asarray(r.cvec, dtype=np.float64) for r in rows])
    return m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)


def _cell_assign_udf(centroids, n_probe: int):
    """Arrow-batched: per vector, the ``n_probe`` nearest centroid
    indices by cosine (ties → lower cell index), one matmul per batch."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("array<int>")
    def _cells(v: pd.Series) -> pd.Series:
        import numpy as _np

        if len(v) == 0:
            return pd.Series([], dtype=object)
        m = _np.stack([_np.asarray(x, dtype=_np.float64) for x in v])
        m = m / _np.maximum(_np.linalg.norm(m, axis=1, keepdims=True), 1e-12)
        sims = m @ centroids.T                       # (B, n_cells)
        # argsort is stable → ties resolve to the lower cell index
        order = _np.argsort(-sims, axis=1, kind="stable")[:, :n_probe]
        return pd.Series([row.tolist() for row in order.astype("int32")])

    return _cells


def ann_ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_cells: int = IVF_CELLS,
    n_probe: int = IVF_PROBE,
    trained: bool = True,
) -> DataFrame:
    """Approximate top-k via an IVF coarse quantizer: corpus rows are
    bucketed by nearest centroid; each query exact-scores only the
    rows in its ``n_probe`` nearest cells.

    Candidate volume ≈ N·(n_probe/n_cells) per query, tunable
    independently of data geometry (unlike LSH's collision
    probability).  At 100 TB the assignment pass writes the corpus
    bucketed/partitioned BY CELL once; probes then read n_probe
    partitions via partition pruning — the classic FAISS-IVF layout
    expressed as a partitioned table.  Here the same plan is an
    equi-join on cell against the broadcast probe set; the corpus
    never shuffles.

    CONTRACT (recall): IVF targets CLUSTERED corpora — near-dup
    mining, retrieval embeddings, anything where a query's true
    neighbors co-locate.  There ``ivf_recall_clustered`` is 1.0 at
    the default settings and the pytest floor is 0.8
    (tests/test_similarity.py).  Isotropic corpora are OUT of this
    operator's contract, and not by implementation weakness: every
    candidate here is already exact-cosine-scored, so recall is
    bounded by candidate GENERATION, and on isotropic data a query's
    true top-k is uniformly spread over cells — the expected recall
    of ANY cell-partitioned index is the probed candidate fraction
    (n_probe/n_cells = 0.25 at defaults; a residual re-rank stage
    cannot lift it, and raising n_probe toward n_cells just converges
    on a full scan).  Measured on the near-isotropic fixture (true
    top-k at cos ≈ 0.35): 0.36–0.64 across sfs, i.e. at-or-above the
    bound; the pytest floor for the isotropic fixture is 0.8× that
    fraction.  The designated isotropic path is sign-LSH
    (:func:`ann_lsh_topk`, recall 0.92 on the same fixture, floor
    0.8), whose collision probability adapts to geometry instead of
    partitioning it.  bench.py records both ``ivf_recall`` (isotropic
    fixture, advisory) and ``ivf_recall_clustered`` (the contract
    metric) every run.
    """
    centroids = _ivf_centroids(corpus, n_cells, id_col, vec_col, trained=trained)
    assign = _cell_assign_udf(centroids, 1)
    probe = _cell_assign_udf(centroids, n_probe)

    corpus_b = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("ne"),
        F.element_at(assign(F.col(vec_col)), 1).alias("cell"),
    )
    qprobe = queries.select(
        "query_id",
        "qe",
        F.explode(probe(F.col("qe"))).alias("cell"),
    )
    joined = corpus_b.join(F.broadcast(qprobe), ["cell"]).filter(
        F.col("neighbor_id") != F.col("query_id")
    )
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


def x41_ann_ivf(spark: SparkSession, sf_dir: str, k: int = 5) -> DataFrame:
    """Declared IVF query: approximate top-5 neighbors for vec_id 1..5
    (no SQL oracle — recall-bound-tested vs exact x3 in pytest and
    tracked per-run as ``ivf_recall`` in bench.py)."""
    emb = load_table(spark, sf_dir, "embeddings")
    probe = emb.filter(F.col("vec_id").between(1, 5)).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qe")
    )
    return ann_ivf_topk(emb, probe, k=k).orderBy(
        "query_id", F.col("similarity").desc(), "neighbor_id"
    )


def x420_ann_lsh(spark: SparkSession, sf_dir: str, k: int = 5) -> DataFrame:
    """Declared sign-LSH ANN query (round-11 verdict ask #5: promoted
    from bench-harness-only to a first-class registry entry, the x41
    pattern): approximate top-5 neighbors for vec_id 1..5 via
    :func:`ann_lsh_topk` — the exact probe bench.py's ``ann_lsh_topk``
    recall gate has tracked since round 2.  No SQL oracle (ANN output
    is index-specific); the recall contract is pytest-gated vs exact
    brute force (tests/test_similarity.py::
    test_ann_lsh_recall_vs_brute_force) and tracked per-run as
    ``ann_recall`` in bench.py."""
    emb = load_table(spark, sf_dir, "embeddings")
    probe = emb.filter(F.col("vec_id").between(1, 5)).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qe")
    )
    return ann_lsh_topk(emb, probe, k=k).orderBy(
        "query_id", F.col("similarity").desc(), "neighbor_id"
    )


CLUSTER_VIEW_K = 8       # planted clusters: vec_id % 8 → one-hot anchor
CLUSTER_VIEW_PULL = 2.5  # anchor weight vs the unit-normalized vector


def clustered_embeddings_view(emb: DataFrame) -> DataFrame:
    """Deterministic CLUSTERED view of the embeddings table — the
    corpus regime IVF exists for, derived in-plan from the fixture
    (no synthetic data): each vector is unit-normalized, then pulled
    toward one of ``CLUSTER_VIEW_K`` orthogonal one-hot anchors
    chosen by ``vec_id % K``.  With pull 2.5 against a unit residual,
    intra-cluster cosine ≳ 0.86 and cross-cluster ≲ 0.2 — real
    neighbor structure with the fixture's own vectors as noise.

    Pure JVM expression work (transform lambda over the array), so
    the view costs one projection at any scale and the clustered
    corpus inherits the source's partitioning.
    """
    nrm = F.greatest(l2_norm(F.col("embedding")), F.lit(1e-12))
    anchor_pos = (F.col("vec_id") % CLUSTER_VIEW_K).cast("int")
    return emb.select(
        "vec_id",
        F.transform(
            F.col("embedding"),
            lambda x, i: (
                x.cast("double") / nrm
                + F.when(i == anchor_pos, F.lit(float(CLUSTER_VIEW_PULL)))
                .otherwise(F.lit(0.0))
            ).cast("float"),
        ).alias("embedding"),
    )


def x41b_ivf_clustered(spark: SparkSession, sf_dir: str, k: int = 5) -> DataFrame:
    """The trained-quantizer IVF on a CLUSTERED corpus — the
    operator's declared contract regime, promoted from bench footnote
    to a first-class registry entry (round-8 verdict ask): top-5
    approximate neighbors for vec_id 1..10 over
    :func:`clustered_embeddings_view`.  No SQL oracle (ANN output is
    index-specific); the recall contract is pytest-gated ≥ 0.9
    against exact brute force at BOTH committed scale factors
    (tests/test_similarity.py::test_ivf_clustered_recall_gate), and
    bench.py tracks ``ivf_recall_clustered`` every run.
    """
    emb = clustered_embeddings_view(load_table(spark, sf_dir, "embeddings"))
    probe = emb.filter(F.col("vec_id").between(1, 10)).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qe")
    )
    return ann_ivf_topk(emb, probe, k=k).orderBy(
        "query_id", F.col("similarity").desc(), "neighbor_id"
    )


def ann_lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = _DIM,
    n_tables: int = N_TABLES,
    bits: int = BITS_PER_TABLE,
) -> DataFrame:
    """Approximate top-k via L-table sign-LSH: score only corpus rows
    colliding with the query in ≥1 table, dedup, exact-cosine rank.

    At 100 TB the corpus side is materialized once as the exploded
    (table, key, id, vec) relation — written bucketed by (table, key)
    so each query probes L buckets via partition pruning.  Here the
    same plan is an equi-join on (table, key) against the broadcast
    (tiny) query probe set; the corpus never shuffles.
    """
    keys = table_keys_udf(dim, n_tables, bits)
    corpus_b = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("ne"),
        F.posexplode(keys(F.col(vec_col))).alias("table", "key"),
    )

    qprobe = queries.select(
        "query_id",
        "qe",
        F.posexplode(keys(F.col("qe"))).alias("table", "key"),
    )

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


# ---------------------------------------------------------------------------
# x187: Johnson-Lindenstrauss sign-projection distortion audit
# ---------------------------------------------------------------------------

JL_DIM = 8  # projected dimensionality


def _jl_sign(j: int, i) -> Column:
    """±1 from the parity class of sha256("<j>:<i>")'s first hex char
    — a deterministic Rademacher matrix both engines can rebuild
    exactly (the x116/x180 hash-family trick applied to JL)."""
    h = F.substring(
        F.sha2(F.concat(F.lit(f"{j}:"), i.cast("string")), 256), 1, 1
    )
    return F.when(h.isin(*"01234567"), F.lit(1.0)).otherwise(F.lit(-1.0))


def _jl_project(a: Column) -> Column:
    """array<double> of JL_DIM signed sums, each an index-ordered fold
    (bit-identical cross-engine; scaling by 1/sqrt(k) is omitted —
    cosine is scale-invariant)."""
    def fold(j: int):
        return F.aggregate(
            F.sequence(F.lit(0), F.size(a) - 1),
            F.lit(0.0),
            lambda acc, i: acc + _jl_sign(j, i) * F.get(a, i),
        )

    return F.array(*[fold(j) for j in range(JL_DIM)])


def x187_jl_distortion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """How much cosine structure survives a 64→8 Rademacher random
    projection: for every exact top-5 pair from x3 (queries 1..5),
    the original cosine, the projected-space cosine, and the
    absolute distortion — the audit run before committing an ANN
    index to a reduced dimensionality.

    The projection matrix is sha256-derived (deterministic ±1), so
    the full report has an exact SQL oracle.  Projections are
    computed once per referenced vector on the 30-vector slice that
    x3's pair set touches (broadcast join onto the pair relation) —
    at corpus scale the projection is a per-row map (64k ops/row,
    in-codegen), and the audit stays bounded by the declared pair
    budget, never pairwise in corpus size.
    """
    emb = load_table(spark, sf_dir, "embeddings")
    pairs = x3_knn_cosine(spark, sf_dir).select(
        "query_id", "neighbor_id", F.col("similarity").alias("orig_cos")
    )
    # materialize the double-cast array in its own projection first:
    # lambda-captured expressions re-evaluate per fold element (the
    # shingles_from_tokens O(d^2) trap)
    proj = emb.select(
        "vec_id",
        F.transform(F.col("embedding"), lambda x: x.cast("double")).alias("ad"),
    ).select("vec_id", _jl_project(F.col("ad")).alias("p"))
    qp = proj.select(F.col("vec_id").alias("query_id"), F.col("p").alias("qp"))
    np_ = proj.select(
        F.col("vec_id").alias("neighbor_id"), F.col("p").alias("np")
    )
    dot_ = F.aggregate(
        F.zip_with(F.col("qp"), F.col("np"), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    nrm = lambda c: F.sqrt(
        F.aggregate(c, F.lit(0.0), lambda acc, v: acc + v * v)
    )
    return (
        # qp/np_ are corpus-sized projections: no broadcast hint —
        # the tiny pairs relation (5 queries × k) is the correct
        # build side and AQE/statistics pick it on their own
        pairs.join(qp, "query_id")
        .join(np_, "neighbor_id")
        .select(
            "query_id",
            "neighbor_id",
            "orig_cos",
            F.round(dot_ / (nrm(F.col("qp")) * nrm(F.col("np"))), 6).alias(
                "proj_cos"
            ),
        )
        .select(
            "query_id",
            "neighbor_id",
            "orig_cos",
            "proj_cos",
            F.round(F.abs(F.col("proj_cos") - F.col("orig_cos")), 6).alias(
                "distortion"
            ),
        )
        .orderBy("query_id", "neighbor_id")
    )


# ---------------------------------------------------------------------------
# x297 — maximal marginal relevance selection (wave 56)
# ---------------------------------------------------------------------------

MMR_K = 6
MMR_LAMBDA = 0.7
_DEC18 = "decimal(38,18)"


def x297_mmr_selection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximal-marginal-relevance subset selection (Carbonell &
    Goldstein '98) over the embedding corpus: greedily pick
    ``MMR_K`` vectors maximizing ``λ·rel − (1−λ)·max_sim_to_picked``
    — the diversity-aware selection a training-data pipeline runs to
    choose exemplars that COVER the space instead of k near-copies
    of the densest mode.  Relevance is cosine to the corpus centroid
    (the query every "summarize this corpus" selection starts from).

    Plan: the centroid is a per-dimension exact-decimal mean (one
    posexplode aggregate, d rows); relevance is ONE corpus pass,
    checkpointed.  Each greedy step joins the corpus against the
    ≤ K-row picked set (broadcast, corpus never shuffles) and takes
    one global argmax (TakeOrderedAndProject) — K·O(corpus) total,
    the same bounded-loop discipline as x224's decode.  All vector
    math is the sequential-double ``functions/vectors.py`` kernel,
    bit-identical in DuckDB.

    ``picked`` is localCheckpointed PER STEP (the x319/x324 bounded-
    relation discipline): each step references it twice (anti-join
    ids + broadcast embeddings), so the lazy union's plan DOUBLED per
    step — 2^K subtree copies by the end, all re-analyzed and
    re-executed at every action.  Checkpointing the ≤ K-row relation
    makes each step's plan flat; measured 7.1 → 3.4 s at sf0.1,
    output bit-identical.
    """
    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    dims = emb.select(F.posexplode("embedding").alias("pos", "x"))
    cent = (
        dims.groupBy("pos")
        .agg(
            (
                F.sum(F.col("x").cast("double").cast(_DEC18)).cast("double")
                / F.count(F.lit(1))
            ).alias("c")
        )
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "c"))),
                lambda s: s["c"],
            ).alias("cv")
        )
    )
    rel = (
        emb.crossJoin(F.broadcast(cent))  # 1-row centroid: safe
        .select(
            "vec_id",
            "embedding",
            cosine_similarity(F.col("embedding"), F.col("cv")).alias("rel"),
        )
        .localCheckpoint()  # corpus-sized; K steps rescan it
    )
    lam, lam1 = float(MMR_LAMBDA), 1.0 - MMR_LAMBDA
    picked = rel.orderBy(F.col("rel").desc(), "vec_id").limit(1).select(
        "vec_id",
        "embedding",
        F.lit(1).alias("pick"),
        "rel",
        F.lit(0.0).alias("max_sim"),
        (F.lit(lam) * F.col("rel")).alias("score"),
    ).localCheckpoint()
    for step in range(2, MMR_K + 1):
        sel_ids = picked.select("vec_id")
        cand = rel.join(F.broadcast(sel_ids), "vec_id", "left_anti")
        scored = (
            cand.crossJoin(
                F.broadcast(picked.select(F.col("embedding").alias("se")))
            )
            .select(
                "vec_id",
                "embedding",
                "rel",
                cosine_similarity(F.col("embedding"), F.col("se")).alias("s"),
            )
            .groupBy("vec_id")
            .agg(
                F.first("embedding").alias("embedding"),
                F.first("rel").alias("rel"),
                F.max("s").alias("max_sim"),
            )
        )
        pick = (
            scored.select(
                "vec_id",
                "embedding",
                F.lit(step).alias("pick"),
                "rel",
                "max_sim",
                (
                    F.lit(lam) * F.col("rel")
                    - F.lit(lam1) * F.col("max_sim")
                ).alias("score"),
            )
            .orderBy(F.col("score").desc(), "vec_id")
            .limit(1)
        )
        picked = picked.unionAll(pick).localCheckpoint()
    return picked.select(
        F.col("pick").cast("bigint").alias("pick"),
        F.col("vec_id").cast("bigint").alias("vec_id"),
        F.round("rel", 6).alias("rel"),
        F.round("max_sim", 6).alias("max_sim"),
        F.round("score", 6).alias("mmr_score"),
    ).orderBy("pick")


# ---------------------------------------------------------------------------
# x344 — kNN classifier evaluation over embeddings (wave 71)
# ---------------------------------------------------------------------------

KNN_EVAL_PROBES = 50  # held-out probe ids [0, KNN_EVAL_PROBES)
KNN_EVAL_K = 5


def x344_knn_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label accuracy of a k-nearest-neighbor label classifier on
    a held-out probe set: predict each probe's label by majority vote
    of its ``KNN_EVAL_K`` cosine-nearest TRAIN vectors — the eval
    harness that tells you whether an embedding column actually
    encodes its labels before you build retrieval features on it
    (the supervised complement of x334's unsupervised anisotropy).

    The declared shape holds the probe set contract-bounded
    (``KNN_EVAL_PROBES`` ids), so probes broadcast and the corpus
    never shuffles — one scan scores all probes (the x3 discipline);
    votes and the argmax run on the bounded (probe × label) relation.
    Ties break by label value, pinned in both engines.
    """
    emb = load_table(spark, sf_dir, "embeddings")
    probes = emb.filter(F.col("vec_id") < KNN_EVAL_PROBES).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("qe"),
        F.col("label").alias("true_label"),
    )
    train = emb.filter(F.col("vec_id") >= KNN_EVAL_PROBES)
    topk = brute_force_topk(train, probes.select("query_id", "qe"), k=KNN_EVAL_K)
    votes = (
        topk.join(
            train.select(
                F.col("vec_id").alias("neighbor_id"),
                F.col("label").alias("nb_label"),
            ),
            "neighbor_id",
        )
        .groupBy("query_id", "nb_label")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    wv = Window.partitionBy("query_id").orderBy(
        F.col("c").desc(), F.col("nb_label")
    )
    pred = (
        votes.withColumn("r", F.row_number().over(wv))
        .filter(F.col("r") == 1)
        .select("query_id", F.col("nb_label").alias("pred"))
    )
    scored = probes.select("query_id", "true_label").join(pred, "query_id")
    return (
        scored.groupBy(F.col("true_label").alias("label"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_probes"),
            F.sum(
                F.when(F.col("pred") == F.col("true_label"), 1).otherwise(0)
            )
            .cast("bigint")
            .alias("n_correct"),
        )
        .withColumn(
            "accuracy",
            F.round(F.col("n_correct") / F.col("n_probes").cast("double"), 6),
        )
        .orderBy("label")
    )


# ---------------------------------------------------------------------------
# x377 — k-center greedy coreset selection (wave 82)
# ---------------------------------------------------------------------------

KCENTER_K = 8
KCENTER_SEED_SENTINEL = 2.0  # cosine distance is ≤ 2; the seed has no
#                              predecessor set, so its d_min is pinned
#                              to this "infinitely far" sentinel


def x377_kcenter_coreset(
    spark: SparkSession, sf_dir: str, k: int = KCENTER_K
) -> DataFrame:
    """Greedy k-center coreset over the embedding corpus: start from
    the lowest vec_id, then k−1 times pick the vector FARTHEST (max
    cosine distance, ties to the lowest vec_id) from everything
    selected so far — the classic 2-approximation for k-center and
    the diversity-first answer to "which 8 examples summarize this
    corpus?" (MMR/x297 trades relevance vs diversity; k-center is
    pure coverage).

    Scale shape: the selected set is ≤ k rows, collected (bounded —
    the in-plan-training discipline) and re-entering each round as
    64-float literal arrays, so every round is ONE corpus projection
    (j sequential-double cosines + least()) and a global top-1 — the
    corpus never shuffles and is never cached.  k is a constant, so
    total work is k corpus passes regardless of data volume.

    Round-12 (guide §5 "the driver should do almost no data work",
    §7.3 plan-build cost): each round's distance expression is built
    as ONE SQL string handed to a single ``F.expr`` call instead of
    per-element ``F.lit`` Columns — the old construction issued
    ~75 Py4J round trips per pick per round (64 lits + array +
    zip_with/aggregate lambdas), ~2,400 driver→JVM calls across the
    loop, all fixed cost that delays every round regardless of data
    volume.  The pick-side L2 norms are folded to double literals in
    Python: ``math.sqrt`` over a sequential float64 accumulation is
    the exact IEEE sequence the JVM fold performs, so the folded
    literal is bit-identical and the per-row literal-array norm fold
    disappears from the plan.  Measured min-of-3 interleaved at
    sf0.1: 3.53 → 1.49 s, rows identical at sf0.01 AND sf0.1.
    """
    import math

    from go_mapreduce_spark.operators.scale import iterative_plan_confs

    emb_norm_sql = (
        "sqrt(aggregate(embedding, 0.0D, (acc, v) -> "
        "acc + CAST(v AS DOUBLE) * CAST(v AS DOUBLE)))"
    )

    def term_sql(vec):
        # 1 − cos(embedding, vec) with vec's norm constant-folded;
        # repr() round-trips FINITE doubles exactly through the SQL
        # parser — a non-finite component or zero-norm pick would
        # format as 'infD'/'nanD' (parser error) or divide by zero,
        # so reject such inputs loudly instead of crashing in the SQL
        # parser (the pre-r12 F.lit path tolerated them silently)
        vals = [float(v) for v in vec]
        if not all(math.isfinite(v) for v in vals):
            raise ValueError(
                "x377_kcenter_coreset: non-finite embedding component "
                "in a selected pick — cosine distance is undefined"
            )
        arr = "array(" + ", ".join(f"{v!r}D" for v in vals) + ")"
        acc = 0.0
        for v in vals:
            acc += v * v
        if acc <= 0.0:
            raise ValueError(
                "x377_kcenter_coreset: zero-norm pick — cosine "
                "distance is undefined"
            )
        dot = (
            f"aggregate(zip_with(embedding, {arr}, (x, y) -> "
            "CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), 0.0D, (acc, v) -> acc + v)"
        )
        return f"1.0D - {dot} / ({emb_norm_sql} * {math.sqrt(acc)!r}D)"

    # cached for the loop (k corpus passes otherwise re-read the
    # parquet each round) under pinned-confs (the top-1 rounds are
    # fixed-shape; AQE re-planning buys nothing — A/B'd r10,
    # 3.54 -> 3.11 s; a broadcast-join reformulation of the distance
    # fold measured flat and was not adopted)
    emb = (
        load_table(spark, sf_dir, "embeddings")
        .select("vec_id", "embedding")
        .persist()
    )
    with iterative_plan_confs(spark, 4):
        seed = emb.orderBy("vec_id").limit(1).collect()[0]
        picks = [(1, int(seed.vec_id), KCENTER_SEED_SENTINEL, seed.embedding)]
        for rank in range(2, k + 1):
            terms = [term_sql(vec) for _, _, _, vec in picks]
            dmin_sql = (
                "least(" + ", ".join(terms) + ")" if len(terms) > 1 else terms[0]
            )
            far = (
                emb.withColumn("d", F.expr(dmin_sql))
                .orderBy(F.col("d").desc(), F.col("vec_id").asc())
                .limit(1)
                .collect()[0]
            )
            picks.append((rank, int(far.vec_id), float(far.d), far.embedding))
    emb.unpersist()
    # rounding happens in-plan (F.round ↔ SQL ROUND — the pinned pair);
    # Python round() is half-even and would drift at 6-dp boundaries
    return (
        spark.createDataFrame(
            [(r, v, d) for r, v, d, _ in picks],
            "sel_rank int, vec_id bigint, d_raw double",
        )
        .select("sel_rank", "vec_id", F.round("d_raw", 6).alias("d_min"))
        .orderBy("sel_rank")
    )


# ---------------------------------------------------------------------------
# x392 — NDCG@k of the kNN retrieval (wave 87)
# ---------------------------------------------------------------------------

# partial sums of the ideal DCG: IDCG for R relevant items in a top-5
# list = sum_{i=1..R} 1/log2(i+1), pinned as literals shared with the
# oracle (libm-stable like KS_C_05)
NDCG_IDCG = (
    0.0,
    1.0,
    1.6309297535714575,
    2.1309297535714578,
    2.5616063116448506,
    2.9484591188793923,
)


def x392_ndcg_at_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NDCG@5 of the exact cosine retrieval (x3) with same-label
    neighbors as the relevance signal — the position-discounted
    ranking metric that tells a retrieval pipeline WHERE its relevant
    hits land, not just how many (x299/x375 grade classifiers; this
    grades the ranking).  DCG = Σ rel_i / log2(i+1) over the ranked
    top-5; IDCG is the pinned partial-sum table indexed by the number
    of relevant hits, so NDCG is exact and engine-portable.
    """
    from go_mapreduce_spark.functions.numeric import DECIMAL_T

    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "label")
    knn = x3_knn_cosine(spark, sf_dir)
    w = Window.partitionBy("query_id").orderBy(
        F.col("similarity").desc(), F.col("neighbor_id").asc()
    )
    ranked = (
        knn.withColumn("rnk", F.row_number().over(w))
        .join(
            emb.select(
                F.col("vec_id").alias("query_id"),
                F.col("label").alias("ql"),
            ),
            "query_id",
        )
        .join(
            emb.select(
                F.col("vec_id").alias("neighbor_id"),
                F.col("label").alias("nl"),
            ),
            "neighbor_id",
        )
        .select(
            "query_id",
            "rnk",
            (F.col("ql") == F.col("nl")).cast("int").alias("rel"),
        )
    )
    idcg_arr = F.array(*[F.lit(v) for v in NDCG_IDCG])
    per_q = ranked.groupBy("query_id").agg(
        F.sum("rel").cast("bigint").alias("n_relevant"),
        F.sum(
            (
                F.col("rel").cast("double")
                / F.log2(F.col("rnk").cast("double") + 1.0)
            ).cast(DECIMAL_T)
        )
        .cast("double")
        .alias("dcg"),
    )
    return per_q.select(
        "query_id",
        "n_relevant",
        F.round("dcg", 6).alias("dcg"),
        F.round(
            F.when(F.col("n_relevant") > 0,
                   F.col("dcg")
                   / F.element_at(idcg_arr, F.col("n_relevant").cast("int") + 1))
            .otherwise(F.lit(0.0)),
            6,
        ).alias("ndcg"),
    ).orderBy("query_id")


# ---------------------------------------------------------------------------
# x402 — hard-negative mining for contrastive training (wave 91)
# ---------------------------------------------------------------------------

HARDNEG_K = 3


def x402_hard_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hard-negative mining: for each probe embedding, the 3 cosine-
    NEAREST vectors with a DIFFERENT label — the pairs that teach a
    contrastive model the most (random negatives are trivially far;
    these sit on the decision boundary).  Same broadcast-probe shape
    as x3: the corpus never shuffles, each partition emits its local
    candidates, the global top-k touches (partitions × k) rows.
    """
    emb = load_table(spark, sf_dir, "embeddings")
    # the between() filter already bounds probes to 5 rows; limit(5)
    # states the contract as a REDUCING op so the broadcast-hint lint
    # can prove the hinted side is bounded
    probes = (
        emb.filter(F.col("vec_id").between(1, 5))
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("label").alias("ql"),
            F.col("embedding").alias("qe"),
        )
        .limit(5)
    )
    joined = emb.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("label").alias("nl"),
        F.col("embedding").alias("ne"),
    ).join(
        F.broadcast(probes),
        (F.col("neighbor_id") != F.col("query_id"))
        & (F.col("nl") != F.col("ql")),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("sim_raw").desc(), F.col("neighbor_id").asc()
    )
    return (
        joined.withColumn(
            "sim_raw", cosine_similarity(F.col("qe"), F.col("ne"))
        )
        .withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= HARDNEG_K)
        .select(
            "query_id",
            "neighbor_id",
            F.col("nl").alias("negative_label"),
            F.round("sim_raw", 6).alias("similarity"),
        )
        .orderBy("query_id", F.col("similarity").desc(), "neighbor_id")
    )
