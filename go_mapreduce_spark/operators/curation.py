"""Training-data curation operators: deterministic sampling, per-group
caps, and BPE-style token accounting over the ``documents`` table.

These are the selection/budgeting primitives of an LLM data pipeline
(the reference has none — its surface ends at Map/Reduce callbacks,
reference wc.go:14-38): every one is a single declarative pass with
cross-engine-exact semantics, so the driver's DuckDB oracle checks
them bit-for-bit.

Scale notes:
- Hash sampling replaces ``df.sample`` ON PURPOSE: ``sample`` is
  seed+partitioning-dependent (a repartition changes the sample),
  while a content-hash predicate is a pure function of the row —
  reproducible across engines, runs, cluster sizes, and input
  layouts, and it pushes down to the scan like any filter.
- The per-group cap is one window over the group key — the standard
  "at most N docs per domain" budget; skewed groups cost one
  in-partition sort each, never a cross-partition explosion.
- BPE-ish counting is a pure regexp_extract_all expression — JVM
  codegen, no tokenizer library on the hot path; counts approximate a
  byte-pair tokenizer's segmentation (contractions, letter runs,
  digit runs, punctuation runs, space runs) closely enough for
  token-budget accounting.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from go_mapreduce_spark.sources.registry import load_table

# GPT-2-ish pre-tokenizer segmentation (ASCII fixture variant).  The
# single-quoted contraction alternatives come first, mirroring the
# published BPE pre-tokenizer regex ordering.
BPE_REGEX = "'s|'t|'re|'ve|'m|'ll|'d| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9 ]+| +"

# Sampling keeps rows whose 2-hex-char sha256 prefix sorts below this
# threshold: '1a' keeps 26/256 ≈ 10.2% — the rate knob is the prefix.
SAMPLE_PREFIX_LT = "1a"


def x37_hash_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic ~10% document sample by content-addressed hash.

    Keep doc iff substring(sha256(doc_id), 1, 2) < '1a' — a pure
    row-function predicate: the same doc is in or out regardless of
    engine, partitioning, or run (unlike seeded ``sample``).  The
    string comparison avoids hex→int parsing differences between
    engines entirely.
    """
    docs = load_table(spark, sf_dir, "documents")
    pfx = F.substring(F.sha2(F.col("doc_id").cast("string"), 256), 1, 2)
    return (
        docs.filter(pfx < F.lit(SAMPLE_PREFIX_LT))
        .select("doc_id", "lang")
        .orderBy("doc_id")
    )


def x38_per_group_cap(spark: SparkSession, sf_dir: str, cap: int = 50) -> DataFrame:
    """Balanced downsampling: keep at most ``cap`` documents per
    language (deterministic keep-order: lowest doc_id first).

    The "cap per domain/source/language" budget every curation
    pipeline applies before mixing; one window, one shuffle on the
    group key.
    """
    docs = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy("lang").orderBy("doc_id")
    return (
        docs.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= cap)
        .select("doc_id", "lang", F.col("rn").cast("bigint").alias("rn"))
        .orderBy("doc_id")
    )


def x39_bpe_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc BPE-style token count + whitespace token count.

    Token-budget accounting: n_ws_tokens is the naive whitespace
    split; n_bpe_tokens segments like a byte-pair pre-tokenizer
    (contractions / letter runs / digit runs / punctuation / spaces).
    """
    docs = load_table(spark, sf_dir, "documents")
    bpe = F.size(F.regexp_extract_all("text", F.lit(BPE_REGEX), F.lit(0)))
    ws = F.size(F.filter(F.split(F.col("text"), " +"), lambda t: F.length(t) > 0))
    return docs.select(
        "doc_id",
        bpe.cast("bigint").alias("n_bpe_tokens"),
        ws.cast("bigint").alias("n_ws_tokens"),
    ).orderBy("doc_id")


PACK_BUDGET = 512  # tokens per packed sequence
PACK_SHARDS = 16   # independent packing streams


def x48_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sharded sequence packing: documents are assigned to
    PACK_SHARDS deterministic shards (doc_id mod), laid end-to-end in
    doc_id order WITHIN each shard, and split into PACK_BUDGET-token
    bins — each doc gets (shard_id, bin_id, start_offset).

    The concat-then-split packing used to build fixed-length training
    batches without padding waste.  Sharding is what makes it a
    100 TB plan: a GLOBAL cumulative sum is a single-partition window
    (one task sees every row); per-shard windows run PACK_SHARDS-wide
    in parallel and each training shard is packed independently —
    which is how packing is consumed anyway (one stream per data
    loader).  Raise PACK_SHARDS with the cluster, bins stay identical
    within a shard.
    """
    from go_mapreduce_spark.operators.text import _tokens_ascii

    docs = load_table(spark, sf_dir, "documents")
    n_tok = F.size(_tokens_ascii(F.col("text"))).cast("bigint")
    w = (
        Window.partitionBy("shard_id")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    sized = docs.select(
        "doc_id",
        F.pmod(F.col("doc_id"), F.lit(PACK_SHARDS)).cast("bigint").alias("shard_id"),
        n_tok.alias("n_tokens"),
    )
    return (
        sized.withColumn("start_offset", F.coalesce(F.sum("n_tokens").over(w), F.lit(0)))
        .select(
            "doc_id",
            "shard_id",
            "n_tokens",
            "start_offset",
            F.floor(F.col("start_offset") / PACK_BUDGET).cast("bigint").alias("bin_id"),
        )
        .orderBy("doc_id")
    )


def x49_repetition_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Within-document repetition: fraction of duplicate word-3-gram
    occurrences (Gopher-style repetition quality rule — a doc whose
    shingles are mostly repeats is boilerplate/spam).

    dup_frac = 1 − distinct_shingles / total_shingles; docs with < 3
    tokens score 0 by contract.  Pure array expressions, scan-speed.
    """
    from go_mapreduce_spark.operators.dedup import lower_tokens, shingles_from_tokens

    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select("doc_id", lower_tokens(F.col("text")).alias("toks"))
    shs = shingles_from_tokens(F.col("toks"))
    n_sh = F.size(shs)
    n_uniq = F.size(F.array_distinct(shs))
    dup_frac = F.when(
        n_sh > 0, F.lit(1.0) - n_uniq.cast("double") / n_sh.cast("double")
    ).otherwise(F.lit(0.0))
    return toks.select(
        "doc_id",
        n_sh.cast("bigint").alias("n_shingles"),
        n_uniq.cast("bigint").alias("n_distinct_shingles"),
        F.round(dup_frac, 6).alias("dup_frac"),
    ).orderBy("doc_id")


EMAIL_RE = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
LONGNUM_RE = "[0-9]{6,}"


def x50_redact_pii(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrubbing accounting: redact email-like strings and long
    digit runs, report counts and the redacted length delta.

    The scrub itself is regexp_replace (JVM, scan-speed); the DECLARED
    output is the per-doc audit (n_emails, n_longnums, chars removed)
    — the numbers a compliance pass reports.  Redaction order is
    pinned (emails first, then digit runs) so both engines transform
    identical intermediate text.
    """
    docs = load_table(spark, sf_dir, "documents")
    n_email = F.size(F.regexp_extract_all("text", F.lit(EMAIL_RE), F.lit(0))).cast("bigint")
    step1 = F.regexp_replace("text", EMAIL_RE, "<EMAIL>")
    n_num = F.size(F.regexp_extract_all(step1, F.lit(LONGNUM_RE), F.lit(0))).cast("bigint")
    redacted = F.regexp_replace(step1, LONGNUM_RE, "<NUM>")
    return docs.select(
        "doc_id",
        n_email.alias("n_emails"),
        n_num.alias("n_longnums"),
        (F.length("text") - F.length(redacted)).cast("bigint").alias("chars_removed"),
    ).orderBy("doc_id")


DECON_HOLDOUT_MOD = 10   # doc_id % MOD == 0 → benchmark/eval holdout
DECON_FLAG_FRAC = 0.2    # flag a train doc when ≥20% of its shingles hit


def x52_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: per train doc, how many of its word
    3-gram shingles also appear in the benchmark (holdout) set, and a
    flag when the overlap fraction clears ``DECON_FLAG_FRAC``.

    The standard eval-leakage audit before training: the holdout here
    is the deterministic ``doc_id % 10 == 0`` slice of ``documents``
    (in production: the benchmark suite itself).

    100 TB shape: benchmark suites are tiny (10⁵–10⁶ shingles) next
    to the corpus, so the DISTINCT benchmark-shingle set is
    **broadcast** and the train corpus is scanned once — a broadcast
    left-semi probe per posting, no shuffle of the corpus, no join
    key skew (a hot shingle multiplies nothing: the probe is a set
    membership test, not a pair generator).  Contrast x6, where
    pairwise train×train overlap needs the capped inverted index.
    """
    from go_mapreduce_spark.operators.dedup import doc_shingles

    # No spread on either branch: x52 probes set membership (semi
    # join), so the shingle explode feeds a distinct shuffle that
    # already parallelizes downstream work; per-branch spreads each
    # add a full-text shuffle + an `.rdd` planning round-trip that
    # cost more than the single-task tokenize they save (A/B'd
    # round 10; same reasoning as x195).
    docs = load_table(spark, sf_dir, "documents")
    is_holdout = F.pmod(F.col("doc_id"), F.lit(DECON_HOLDOUT_MOD)) == 0
    bench_sh = (
        doc_shingles(docs.filter(is_holdout), spread=False)
        .select("sh")
        .distinct()
    )
    train = docs.filter(~is_holdout)
    train_sh = doc_shingles(train, spread=False)

    sizes = train_sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_shingles"))
    hits = (
        train_sh.join(F.broadcast(bench_sh), "sh", "left_semi")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_contaminated"))
    )
    frac = F.when(
        F.col("n_shingles") > 0,
        F.col("n_contaminated").cast("double") / F.col("n_shingles").cast("double"),
    ).otherwise(F.lit(0.0))
    return (
        train.select("doc_id")
        .join(sizes, "doc_id", "left")
        .join(hits, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_shingles", F.lit(0)).cast("bigint").alias("n_shingles"),
            F.coalesce("n_contaminated", F.lit(0)).cast("bigint").alias("n_contaminated"),
        )
        .withColumn("contamination", F.round(frac, 6))
        .withColumn("flagged", frac >= DECON_FLAG_FRAC)
        .orderBy("doc_id")
    )


MIX_TOKEN_BUDGET = 2000  # tokens admitted per language stream


def x53_token_budget_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget mixing: admit documents per language, in
    deterministic doc_id order, until each language's token budget is
    reached (the document that crosses the budget line is admitted —
    fill-then-stop semantics).

    This is the mixture-weighting step of corpus assembly ("x tokens
    of code, y of web, z of books"): one window cumulative sum per
    group key, then a pure filter — the same shape as x48's packing,
    so skewed languages cost one in-partition sort, never a
    cross-partition explosion.  Budgets scale by raising
    MIX_TOKEN_BUDGET; determinism comes from the (lang, doc_id)
    ordering, not from arrival order.
    """
    from go_mapreduce_spark.operators.text import _tokens_ascii

    docs = load_table(spark, sf_dir, "documents")
    n_tok = F.size(_tokens_ascii(F.col("text"))).cast("bigint")
    w = (
        Window.partitionBy("lang")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    sized = docs.select("doc_id", "lang", n_tok.alias("n_tokens"))
    return (
        sized.withColumn(
            "cum_before",
            F.coalesce(F.sum("n_tokens").over(w), F.lit(0)).cast("bigint"),
        )
        .filter(F.col("cum_before") < MIX_TOKEN_BUDGET)
        .select("doc_id", "lang", "n_tokens", "cum_before")
        .orderBy("doc_id")
    )


CHUNK_TOKENS = 64
CHUNK_STRIDE = 48  # 16-token overlap between consecutive chunks


def x60_chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Context-window chunking: split each document into
    CHUNK_TOKENS-token windows starting every CHUNK_STRIDE tokens
    (overlapping), emitting (doc_id, chunk_idx, start_tok, chunk_len).
    The final chunk truncates at the document end; empty documents
    produce no chunks.

    The pre-tokenization shaping step before embedding/packing: pure
    ``sequence``+``explode`` arithmetic on the token count — no text
    is materialized per chunk here (the slice itself is
    ``F.slice(toks, start+1, len)`` at consumption time), so the
    chunk INDEX relation is a few ints per chunk regardless of
    document size.
    """
    from go_mapreduce_spark.operators.text import _tokens_ascii

    docs = load_table(spark, sf_dir, "documents")
    n_tok = F.size(_tokens_ascii(F.col("text")))
    sized = docs.select("doc_id", n_tok.alias("n")).filter(F.col("n") > 0)
    idx = F.sequence(F.lit(0), F.floor((F.col("n") - 1) / CHUNK_STRIDE))
    return (
        sized.select("doc_id", "n", F.explode(idx).alias("chunk_idx"))
        .select(
            "doc_id",
            F.col("chunk_idx").cast("bigint").alias("chunk_idx"),
            (F.col("chunk_idx") * CHUNK_STRIDE).cast("bigint").alias("start_tok"),
            F.least(
                F.lit(CHUNK_TOKENS), F.col("n") - F.col("chunk_idx") * CHUNK_STRIDE
            )
            .cast("bigint")
            .alias("chunk_len"),
        )
        .orderBy("doc_id", "chunk_idx")
    )


QUALITY_KEEP_MIN = 0.5


def x61_curation_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end curation keep-set: a document survives iff it
    (a) is its exact-dedup cluster representative (x1),
    (b) clears the quality threshold (x9), and
    (c) has language-ID agreeing with its metadata lang (x8).

    The composition query: each stage is the ALREADY-DECLARED
    operator reused as a relation, joined on doc_id — demonstrating
    that the curation ops compose relationally (Catalyst collapses
    the shared ``documents`` scans via exchange reuse; each stage
    remains one narrow pass).  This is the shape of a production
    keep-list job: N independent signals, one join, one filter.
    """
    from go_mapreduce_spark.operators.dedup import x1_dedup_exact
    from go_mapreduce_spark.operators.text import x8_lang_id, x9_quality_score

    keep = x1_dedup_exact(spark, sf_dir)
    quality = x9_quality_score(spark, sf_dir).select("doc_id", "quality", "n_tokens")
    lang = x8_lang_id(spark, sf_dir)
    return (
        keep.join(quality, "doc_id")
        .join(lang, "doc_id")
        .filter(
            (F.col("quality") >= QUALITY_KEEP_MIN)
            & (F.col("pred_lang") == F.col("lang"))
        )
        .select("doc_id", "lang", "quality", "n_tokens")
        .orderBy("doc_id")
    )


def x64_neardup_curation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NEAR-dup-aware keep-set — x61 upgraded from exact dedup to
    near-duplicate clusters: a document survives iff
    (a) it is its near-dup cluster's canonical representative —
        ``doc_id == cluster_id`` from x27's connected components over
        the x6 Jaccard pair graph (min-id canonical; a doc in no
        near-dup pair is its own singleton representative),
    (b) it clears the quality threshold (x9), and
    (c) its language-ID agrees with the metadata lang (x8).

    This is the full production curation shape: pair generation is
    capped-posting blocked (x6), clustering is the checkpointed CC
    loop (x27), and the keep decision composes relationally with the
    per-doc quality/lang signals — one left join against the (small:
    only docs in some near-dup pair) cluster relation, never a second
    corpus-wide shuffle.
    """
    from go_mapreduce_spark.operators.dedup import x27_dedup_clusters
    from go_mapreduce_spark.operators.text import x8_lang_id, x9_quality_score

    clusters = x27_dedup_clusters(spark, sf_dir)
    quality = x9_quality_score(spark, sf_dir).select("doc_id", "quality", "n_tokens")
    lang = x8_lang_id(spark, sf_dir)
    return (
        quality.join(lang, "doc_id")
        .join(clusters, "doc_id", "left")
        .filter(
            (F.col("cluster_id").isNull() | (F.col("cluster_id") == F.col("doc_id")))
            & (F.col("quality") >= QUALITY_KEEP_MIN)
            & (F.col("pred_lang") == F.col("lang"))
        )
        .select("doc_id", "lang", "quality", "n_tokens")
        .orderBy("doc_id")
    )


def x40_grouped_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact per-group median and p90 (linear interpolation) of
    lineitem quantity.

    ``percentile`` (exact, interpolating — ≡ DuckDB quantile_cont) is
    the right call below ~10⁹ rows per group; the sketch-based
    ``approx_percentile`` path for unbounded groups is x26.
    """
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.expr("percentile(l_quantity, 0.5)").alias("median_qty"),
            F.expr("percentile(l_quantity, 0.9)").alias("p90_qty"),
            F.count(F.lit(1)).alias("n_items"),
        )
        .orderBy("l_returnflag")
    )


# per-language keep thresholds: sha256(doc_id) 2-hex-char prefix must
# sort below the stratum's threshold => keep rate = int(thresh,16)/256.
# 'en' is downsampled hardest (the overrepresented stratum in web
# corpora); unknown languages fall back to STRATA_DEFAULT_LT.
STRATA_PREFIX_LT: dict[str, str] = {
    "en": "20",  # ~12.5%
    "zh": "c0",  # ~75%
    "de": "80",  # ~50%
    "es": "80",
    "fr": "80",
}
STRATA_DEFAULT_LT = "40"  # ~25%


def x85_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-stratified deterministic sampling: each stratum keeps
    a different content-addressed fraction (rebalancing a skewed
    corpus toward a target language mix).

    Same mechanism as x37 — keep iff the 2-hex-char sha256(doc_id)
    prefix sorts below the stratum threshold — so membership is a
    pure row predicate: no seeded RNG, no shuffle, identical keep set
    at any partitioning or scale.  The lang→threshold CASE is a
    constant-folded expression, not a join.
    """
    docs = load_table(spark, sf_dir, "documents")
    pfx = F.substring(F.sha2(F.col("doc_id").cast("string"), 256), 1, 2)
    thresh = F.lit(STRATA_DEFAULT_LT)
    for lang, lt in STRATA_PREFIX_LT.items():
        thresh = F.when(F.col("lang") == lang, F.lit(lt)).otherwise(thresh)
    return (
        docs.filter(pfx < thresh)
        .select("doc_id", "lang", "source")
        .orderBy("doc_id")
    )


# 16 output shards for the deterministic corpus shuffle: one hex digit
# of the shuffle key.  Production would use O(cluster-cores) shards —
# the digit-width is the only knob (2 hex chars = 256, 3 = 4096, ...).
N_SHUFFLE_SHARDS = 16

# Length-weighted sampling: keep probability min(1, n_chars / this).
# Docs at least this long are always kept; shorter docs keep
# proportionally to length (token-budget-fair downsampling).
WEIGHTED_SAMPLE_FULL_CHARS = 400


def x101_corpus_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic corpus shuffle: assign every document a shard and
    a position within the shard, both pure functions of doc_id.

    Training-data loaders need the corpus in a *fixed random* order —
    re-runs, resumed jobs, and differently-partitioned inputs must
    produce byte-identical shard files.  Seeded ``orderBy(rand())``
    fails all three.  Here the order key is sha256(doc_id || ':shuffle'):
    shard = first hex digit (16-way split), position = rank of the key
    within the shard — cryptographic mixing makes within-shard order
    indistinguishable from random while staying content-addressed.

    Scale: no global sort.  Each shard is an independent in-partition
    sort after one hash shuffle — with shards ≥ executor count the
    whole corpus sorts in parallel, and a shard's writer streams rows
    in key order (this is the layout x48's sequence packer and any
    epoch reader want).  At 100 TB widen the digit prefix (2 hex chars
    → 256 shards, 3 → 4096); position stays a per-shard window rank.
    """
    docs = load_table(spark, sf_dir, "documents")
    key = F.sha2(F.concat(F.col("doc_id").cast("string"), F.lit(":shuffle")), 256)
    shard = (F.instr(F.lit("0123456789abcdef"), F.substring(F.col("key"), 1, 1)) - 1).cast("bigint")
    w = Window.partitionBy("shard").orderBy("key")
    return (
        docs.select("doc_id", key.alias("key"))
        .withColumn("shard", shard)
        .withColumn("pos", F.row_number().over(w).cast("bigint"))
        .select("doc_id", "shard", "pos")
        .orderBy("shard", "pos")
    )


def x102_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Length-weighted deterministic sampling: keep each document with
    probability min(1, n_chars / 400) — longer docs (more tokens, more
    training signal) survive downsampling proportionally more often.

    Unlike x37/x85 (uniform / per-stratum rates), the keep rate here
    is a *continuous per-row weight*.  Determinism is the same
    content-hash trick with a per-row threshold: draw u from the first
    4 hex chars of sha256(doc_id || ':w') and keep iff
    u <= floor(rate·65536) − 1 rendered as 4 lowercase hex digits —
    P(keep) = floor(rate·65536)/65536 exactly, on any engine, at any
    partitioning.  Pure row predicate: pushes to the scan, no RNG
    state, no shuffle.
    """
    docs = load_table(spark, sf_dir, "documents")
    u = F.substring(
        F.sha2(F.concat(F.col("doc_id").cast("string"), F.lit(":w")), 256), 1, 4
    )
    cap = F.lit(WEIGHTED_SAMPLE_FULL_CHARS)
    thresh_int = F.floor(
        F.least(F.col("n_chars"), cap) * F.lit(65536) / cap
    ).cast("int") - F.lit(1)
    thresh_hex = F.format_string("%04x", thresh_int)
    return (
        docs.filter((thresh_int >= 0) & (u <= thresh_hex))
        .select("doc_id", "lang", "n_chars")
        .orderBy("doc_id")
    )


def x109_shard_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-shard manifest over the x101 shuffle assignment: per
    shard, the document count, total characters, total BPE tokens,
    and a content fingerprint (exact sum of each member's 32-bit key
    prefix) — the sidecar file a dataloader checks before trusting a
    shard, and the artifact that makes re-shuffles auditable (same
    corpus ⇒ same manifest, bit for bit).

    The fingerprint sums ``int(sha256-key[:8], 16)`` through a
    decimal-exact aggregate: order-independent, so any partitioning —
    or an entirely different engine — produces the same value per
    shard.  One scan, one 16-group aggregate; token counting rides
    the same pass as a codegen'd regexp, and no window is needed
    because the manifest doesn't care about within-shard order.
    """
    docs = load_table(spark, sf_dir, "documents")
    key = F.sha2(F.concat(F.col("doc_id").cast("string"), F.lit(":shuffle")), 256)
    shard = (F.instr(F.lit("0123456789abcdef"), F.substring(F.col("key"), 1, 1)) - 1).cast(
        "bigint"
    )
    bpe = F.size(F.regexp_extract_all("text", F.lit(BPE_REGEX), F.lit(0)))
    return (
        docs.select(
            "n_chars",
            key.alias("key"),
            bpe.cast("bigint").alias("n_bpe"),
        )
        .withColumn("shard", shard)
        .withColumn("kpfx", F.conv(F.substring("key", 1, 8), 16, 10).cast("bigint"))
        .groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
            F.sum("n_bpe").alias("total_bpe_tokens"),
            F.sum(F.col("kpfx").cast("decimal(38,0)")).cast("bigint").alias("fingerprint"),
        )
        .orderBy("shard")
    )


# train/val/test split boundaries on the 2-hex-char sha256 prefix
# (204/256 ≈ 79.7% train, 26/256 ≈ 10.2% val, rest test); string
# comparison on the hex prefix — the x37 engine-portable hash trick
SPLIT_TRAIN_LT = "cc"
SPLIT_VAL_LT = "e6"


def x141_split_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic train/val/test split manifest: every document is
    assigned a split by its content-addressed sha256(doc_id) prefix —
    stable across engines, partitionings, and re-runs (the property a
    training pipeline needs so no document ever migrates between
    train and eval after a re-shard) — and the manifest reports
    per-(split, lang) document and character totals.

    One scan, one aggregate; the split predicate is a pure row
    function (same trick as the x37 sample), so the assignment also
    serves as the join key for downstream shard writes without any
    recorded state.
    """
    docs = load_table(spark, sf_dir, "documents")
    pfx = F.substring(F.sha2(F.col("doc_id").cast("string"), 256), 1, 2)
    split = (
        F.when(pfx < F.lit(SPLIT_TRAIN_LT), "train")
        .when(pfx < F.lit(SPLIT_VAL_LT), "val")
        .otherwise("test")
    )
    return (
        docs.select(split.alias("split"), "lang", "n_chars")
        .groupBy("split", "lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
        )
        .orderBy("split", "lang")
    )


# ---------------------------------------------------------------------------
# wave 17: temperature-resampled corpus mixture
# ---------------------------------------------------------------------------

TEMP_MIX_ALPHA_DENOM = 2  # temperature alpha = 1/2 (sqrt scaling)
TEMP_MIX_BUDGET_TOKENS = 20_000


def x176_temperature_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-resampled mixture weights per (lang, source)
    stream: sampling weight ∝ (stream token count)^α with α = 0.5 —
    the standard multilingual-training rebalance (up-samples small
    streams, down-samples dominant ones; α=1 is proportional, α=0
    uniform).  Output per stream: size, normalized share, the token
    target under TEMP_MIX_BUDGET_TOKENS, and the within-stream
    sampling rate that achieves it.

    One corpus scan collapses to ~|lang×source| rows (metadata-sized
    at any corpus scale); everything after is arithmetic on that tiny
    relation with a 1-row broadcast total.  Determinism discipline:
    each weight is rounded to 9 decimals and summed as
    DECIMAL(38,9) — the normalizing total is then exact and
    engine-invariant (no float-summation-order dependence); the final
    shares divide as identical doubles on both sides.
    """
    from go_mapreduce_spark.operators.text import _tokens_ascii

    docs = load_table(spark, sf_dir, "documents")
    streams = (
        docs.select(
            "lang",
            "source",
            F.size(_tokens_ascii(F.col("text"))).cast("bigint").alias("n_tok"),
        )
        .groupBy("lang", "source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tok").alias("n_tokens"),
        )
        .withColumn(
            "weight",
            F.round(F.sqrt(F.col("n_tokens").cast("double")), 9).cast(
                "decimal(38,9)"
            ),
        )
    )
    total = streams.groupBy().agg(F.sum("weight").alias("total_w"))
    share = (
        F.col("weight").cast("double") / F.col("total_w").cast("double")
    )
    target = F.round(share * F.lit(TEMP_MIX_BUDGET_TOKENS), 2)
    return (
        streams.crossJoin(F.broadcast(total))
        .select(
            "lang",
            "source",
            "n_docs",
            "n_tokens",
            F.col("weight").cast("double").alias("weight"),
            F.round(share, 6).alias("share"),
            target.alias("target_tokens"),
            F.round(
                F.least(F.lit(1.0), target / F.col("n_tokens").cast("double")),
                6,
            ).alias("sample_rate"),
        )
        .orderBy("lang", "source")
    )


# ---------------------------------------------------------------------------
# x195: cross-split n-gram leakage census (train -> test contamination)
# ---------------------------------------------------------------------------


def x195_split_leakage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train→test contamination census over the x141 split rule: for
    every TEST document, the fraction of its distinct word-3-gram
    shingles that also occur anywhere in the TRAIN split — the
    leakage number a held-out eval set must report before its scores
    mean anything (x52 audits the train side against a benchmark;
    this audits the split itself).

    Splits are sha256-prefix-deterministic (x141), so the census is
    exactly replayable.  Shape: both shingle relations are DISTINCT
    (doc,·)/(·) projections of one corpus scan each; the probe is a
    left-semi join keyed on the shingle — output bounded by the test
    side's shingle count, and a hot shingle multiplies nothing (set
    membership, not pair generation).  At 100 TB the test split is
    the small side by construction (eval sets are fixed-size), so
    AQE broadcasts it; the train side only ever streams through the
    join.
    """
    from go_mapreduce_spark.operators.dedup import doc_shingles

    # No spread on either branch (r9 driver regression 1.44 -> 4.77 s
    # came from per-branch spread_for_fanout inside doc_shingles, and
    # a shared pre-filter spread still measured 2.3 s vs 1.17 s
    # without): the semi-join census shape does all heavy work after
    # the distinct shuffle, which parallelizes regardless of scan
    # splits, so the spread buys nothing here at any scale.
    docs = load_table(spark, sf_dir, "documents")
    pfx = F.substring(F.sha2(F.col("doc_id").cast("string"), 256), 1, 2)
    tagged = docs.withColumn(
        "split",
        F.when(pfx < F.lit(SPLIT_TRAIN_LT), "train")
        .when(pfx < F.lit(SPLIT_VAL_LT), "val")
        .otherwise("test"),
    )
    train_sh = (
        doc_shingles(tagged.filter(F.col("split") == "train"), spread=False)
        .select("sh")
        .distinct()
    )
    test_sh = doc_shingles(  # already distinct
        tagged.filter(F.col("split") == "test"), spread=False
    )
    sizes = test_sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_shingles"))
    leaked = (
        test_sh.join(train_sh, "sh", "left_semi")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_leaked"))
    )
    return (
        tagged.filter(F.col("split") == "test")
        .select("doc_id")
        .join(sizes, "doc_id", "left")
        .join(leaked, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_shingles", F.lit(0)).cast("bigint").alias("n_shingles"),
            F.coalesce("n_leaked", F.lit(0)).cast("bigint").alias("n_leaked"),
            F.round(
                F.when(
                    F.coalesce("n_shingles", F.lit(0)) > 0,
                    F.coalesce("n_leaked", F.lit(0)).cast("double")
                    / F.col("n_shingles"),
                ).otherwise(0.0),
                6,
            ).alias("leak_frac"),
        )
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# x200: the end-to-end curation pipeline, one declared plan
# ---------------------------------------------------------------------------

PIPE_QUALITY_MIN = 0.5


def x200_curation_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The capstone composition — the full LLM-data curation pipeline
    as ONE lazy plan: exact dedup (sha256, keep min doc_id per hash)
    → quality gate (the x9 composite ≥ 0.5) → deterministic
    train/val/test split (x141 sha-prefix rule) → per-(split, lang)
    shard accounting with an order-independent corpus fingerprint
    (sum of per-doc hash prefixes, the x109 device) that certifies
    WHICH documents survived, not just how many.

    Every stage is a previously-declared, individually-oracle-checked
    operator; composing them costs: one doc scan + one hash-keyed
    dedup shuffle + map-side-combinable final aggregate.  Nothing
    else — the quality features and the split tag are per-row
    expressions that FUSE into the dedup output in a single codegen
    stage (no extra pass per stage, which is the entire argument for
    declaring pipelines lazily instead of materializing between
    steps).  At 100 TB this plan is: scan, one shuffle on a uniform
    64-hex key, aggregate of ≤ |splits|x|langs| rows.
    """
    from go_mapreduce_spark.operators.dedup import lower_tokens
    from go_mapreduce_spark.operators.text import EN_STOPWORDS, _stopword_count

    docs = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy(F.sha2(F.col("text"), 256)).orderBy("doc_id")
    surv = (
        docs.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
    toks = lower_tokens(F.col("text"))
    text_len = F.length("text")
    alpha_len = F.length(F.regexp_replace("text", "[^A-Za-z]", ""))
    n_toks = F.size(toks)
    sw = _stopword_count(toks, EN_STOPWORDS)
    alpha_ratio = F.when(text_len > 0, alpha_len.cast("double") / text_len).otherwise(0.0)
    sw_ratio = F.when(n_toks > 0, sw.cast("double") / n_toks).otherwise(0.0)
    quality = F.round(
        F.lit(0.4) * alpha_ratio
        + F.lit(0.3) * sw_ratio
        + F.lit(0.3) * F.least(F.lit(1.0), n_toks.cast("double") / 50),
        6,
    )
    pfx = F.substring(F.sha2(F.col("doc_id").cast("string"), 256), 1, 2)
    split = (
        F.when(pfx < F.lit(SPLIT_TRAIN_LT), "train")
        .when(pfx < F.lit(SPLIT_VAL_LT), "val")
        .otherwise("test")
    )
    fp_piece = F.conv(
        F.substring(
            F.sha2(F.concat(F.col("doc_id").cast("string"), F.lit(":pipe")), 256),
            1,
            8,
        ),
        16,
        10,
    ).cast("decimal(38,0)")
    kept = surv.filter(quality >= PIPE_QUALITY_MIN).select(
        split.alias("split"),
        "lang",
        "n_chars",
        fp_piece.alias("fp"),
    )
    return (
        kept.groupBy("split", "lang")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("n_chars").cast("bigint").alias("total_chars"),
            F.sum("fp").cast("bigint").alias("fingerprint"),
        )
        .orderBy("split", "lang")
    )


def x421_training_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The end-to-end training-data pipeline as ONE lazy plan
    (round-11 verdict ask #7): exact dedup → benchmark
    decontamination → quality gate → sharded sequence packing →
    per-shard manifest.  Every stage is a previously-declared,
    individually-oracle-checked operator (x1/x200 dedup rule, x52
    decontamination rule, x200 quality composite, x48 packing rule);
    this query evidences that they COMPOSE without driver round-trips
    — no collect, no materialization between stages, one DataFrame.

    Stage semantics (all deterministic, DuckDB-replayed end-to-end):

    1. dedup: keep min doc_id per sha256(text).
    2. decontaminate: the holdout is the raw ``doc_id % 10 == 0``
       slice (x52); holdout docs never train, and a surviving train
       doc is dropped when ≥ 20% of its distinct word-3-gram shingles
       hit the holdout shingle set.  (A survivor whose duplicate twin
       sits in the holdout is 100% contaminated and drops — the
       eval-leakage case the stage exists for.)
    3. quality: the x200 composite (alpha ratio / stopword ratio /
       length term) ≥ 0.5.
    4. pack: shard = doc_id % PACK_SHARDS, admitted docs laid
       end-to-end per shard in doc_id order, PACK_BUDGET-token bins
       (x48).
    5. manifest: per shard — candidate/clean/admitted counts, admitted
       tokens, bins receiving a document start, and an
       order-independent survivorship fingerprint (sum of per-doc
       hash prefixes, the x109/x200 device) certifying WHICH
       documents were admitted, not just how many.  The census keeps
       the REJECTED mass visible: on the synthetic sf0.1 fixture the
       template-generated texts overlap the holdout so heavily (avg
       shingle contamination 0.61) that decontamination correctly
       rejects ~all candidates — a manifest of admitted docs alone
       would be empty there and indistinguishable from a broken
       pipeline; n_clean ≪ n_candidates makes the leakage a reported
       fact instead.

    100 TB shape: one corpus scan feeds dedup (one shuffle on a
    uniform 64-hex key); the benchmark shingle set is tiny and
    BROADCAST (set-membership probe, no corpus shuffle, no skew
    amplification — x52's argument); quality is per-row expression
    work fused into the same stage; packing windows partition by
    shard (PACK_SHARDS-wide parallelism, raise with the cluster);
    the manifest is a ≤ PACK_SHARDS-row aggregate."""
    from go_mapreduce_spark.operators.dedup import doc_shingles, lower_tokens
    from go_mapreduce_spark.operators.text import (
        EN_STOPWORDS,
        _stopword_count,
        _tokens_ascii,
    )

    docs = load_table(spark, sf_dir, "documents")

    # 1. exact dedup (x1/x200 rule)
    w_dup = Window.partitionBy(F.sha2(F.col("text"), 256)).orderBy("doc_id")
    surv = (
        docs.withColumn("_rn", F.row_number().over(w_dup))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )

    # 2. decontamination (x52 rule) over the non-holdout survivors
    is_holdout = F.pmod(F.col("doc_id"), F.lit(DECON_HOLDOUT_MOD)) == 0
    bench_sh = (
        doc_shingles(docs.filter(is_holdout), spread=False).select("sh").distinct()
    )
    train = surv.filter(~is_holdout)
    train_sh = doc_shingles(train, spread=False)
    sizes = train_sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    hits = (
        train_sh.join(F.broadcast(bench_sh), "sh", "left_semi")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_hit"))
    )
    contamination = F.coalesce("n_hit", F.lit(0)).cast("double") / F.coalesce(
        "n_sh", F.lit(1)
    ).cast("double")
    is_clean = contamination < DECON_FLAG_FRAC

    # 3. quality gate (x200 composite)
    toks = lower_tokens(F.col("text"))
    text_len = F.length("text")
    alpha_len = F.length(F.regexp_replace("text", "[^A-Za-z]", ""))
    n_toks = F.size(toks)
    sw = _stopword_count(toks, EN_STOPWORDS)
    alpha_ratio = F.when(text_len > 0, alpha_len.cast("double") / text_len).otherwise(
        0.0
    )
    sw_ratio = F.when(n_toks > 0, sw.cast("double") / n_toks).otherwise(0.0)
    quality = F.round(
        F.lit(0.4) * alpha_ratio
        + F.lit(0.3) * sw_ratio
        + F.lit(0.3) * F.least(F.lit(1.0), n_toks.cast("double") / 50),
        6,
    )
    is_admitted = is_clean & (quality >= PIPE_QUALITY_MIN)

    # 4. packing (x48 rule) over the ADMITTED docs: the conditional
    # running sum skips rejected rows, so admitted docs get exactly
    # the offsets they would have in an admitted-only relation while
    # rejected docs stay visible for the census (bin NULL)
    fp_piece = F.conv(
        F.substring(
            F.sha2(F.concat(F.col("doc_id").cast("string"), F.lit(":x421")), 256),
            1,
            8,
        ),
        16,
        10,
    ).cast("decimal(38,0)")
    flagged = (
        train.join(sizes, "doc_id", "left")
        .join(hits, "doc_id", "left")
        .select(
            "doc_id",
            F.pmod(F.col("doc_id"), F.lit(PACK_SHARDS))
            .cast("bigint")
            .alias("shard_id"),
            is_clean.alias("clean"),
            is_admitted.alias("admitted"),
            F.when(is_admitted, F.size(_tokens_ascii(F.col("text"))))
            .otherwise(0)
            .cast("bigint")
            .alias("adm_tokens"),
            F.when(is_admitted, fp_piece).otherwise(F.lit(0)).alias("fp"),
        )
    )
    w_pack = (
        Window.partitionBy("shard_id")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    packed = flagged.withColumn(
        "bin_id",
        F.when(
            F.col("admitted"),
            F.floor(
                F.coalesce(F.sum("adm_tokens").over(w_pack), F.lit(0)) / PACK_BUDGET
            ),
        ).cast("bigint"),
    )

    # 5. per-shard census manifest
    return (
        packed.groupBy("shard_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_candidates"),
            F.sum(F.col("clean").cast("int")).cast("bigint").alias("n_clean"),
            F.sum(F.col("admitted").cast("int")).cast("bigint").alias("n_admitted"),
            F.sum("adm_tokens").cast("bigint").alias("n_tokens"),
            F.countDistinct("bin_id").cast("bigint").alias("n_bins"),
            F.sum("fp").cast("bigint").alias("fingerprint"),
        )
        .orderBy("shard_id")
    )


# ---------------------------------------------------------------------------
# x221: exact proportional allocation (largest-remainder method)
# ---------------------------------------------------------------------------

ALLOC_TOTAL = 100  # sampled docs to allocate across languages


def x221_proportional_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact proportional sample allocation across languages — the
    largest-remainder (Hamilton) method: each stratum gets
    floor(total · share) seats, and the leftover seats go to the
    largest fractional remainders (ties to the smaller language code
    for determinism).  The survey-sampling step before any stratified
    draw (x85 samples WITHIN strata; this decides HOW MANY each
    stratum gets so the sample hits an exact global budget).

    All integer arithmetic: quota numerators are doc_count ×
    ALLOC_TOTAL, floors and remainders are exact bigints, and the
    leftover count is a 1-row broadcast — no floating shares
    anywhere.  The stratum relation is |langs|-sized; every window is
    over that metadata relation.
    """
    docs = load_table(spark, sf_dir, "documents")
    counts = docs.groupBy("lang").agg(F.count(F.lit(1)).alias("n"))
    # "ntot", not "N": Spark resolves case-insensitively, so a column
    # named N collides with n
    tot = counts.agg(F.sum("n").alias("ntot"))
    q = counts.crossJoin(F.broadcast(tot)).select(
        "lang",
        "n",
        "ntot",
        (F.col("n") * ALLOC_TOTAL).alias("num"),
    )
    q = q.select(
        "lang",
        "n",
        F.expr("num div ntot").cast("long").alias("base"),  # exact int div
        F.pmod(F.col("num"), F.col("ntot")).alias("rem"),
        "ntot",
    )
    w = Window.orderBy(F.col("rem").desc(), F.col("lang").asc())
    wsum = Window.partitionBy()
    ranked = q.select(
        "lang",
        "n",
        "base",
        "rem",
        F.row_number().over(w).alias("pr"),
        (F.lit(ALLOC_TOTAL) - F.sum("base").over(wsum)).alias("leftover"),
    )
    return (
        ranked.select(
            "lang",
            F.col("n").cast("bigint").alias("n_docs"),
            (
                F.col("base")
                + F.when(F.col("pr") <= F.col("leftover"), 1).otherwise(0)
            )
            .cast("bigint")
            .alias("allocated"),
        )
        .orderBy("lang")
    )


# ---------------------------------------------------------------------------
# x225 — weighted sampling without replacement (wave 34)
# ---------------------------------------------------------------------------

WS_K = 50
_WS_DENOM = float(16**12) + 1.0


def x225_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic weighted sample WITHOUT replacement of ``WS_K``
    documents, probability proportional to length (``n_chars``) — the
    Efraimidis–Spirakis A-ES scheme: each row draws a hash-derived
    uniform u and the sample is the top-k by key u^(1/w), computed in
    log space as ln(u)/w (same ordering, no float pow).

    This is THE distributed weighted-sampling algorithm: one pass, no
    coordination, exact top-k semantics — at 100 TB it is a
    TakeOrderedAndProject (per-partition k-heaps, only k rows per
    partition reach the driver-side merge), never a sort.  u comes
    from sha256(doc_id), so the "random" draw is a pure row function
    both engines replay bit-identically (the x37 discipline); +1 in
    the numerator dodges ln(0) on an all-zero hash prefix.
    """
    docs = load_table(spark, sf_dir, "documents")
    u = (
        F.conv(
            F.substring(F.sha2(F.col("doc_id").cast("string"), 256), 1, 12),
            16,
            10,
        ).cast("double")
        + F.lit(1.0)
    ) / F.lit(_WS_DENOM)
    key = F.log(u) / F.col("n_chars").cast("double")
    return (
        docs.select(
            "doc_id",
            "lang",
            F.col("n_chars").cast("bigint").alias("n_chars"),
            key.alias("_k"),
        )
        .orderBy(F.col("_k").desc(), F.col("doc_id"))
        .limit(WS_K)
        .select(
            "doc_id", "lang", "n_chars", F.round("_k", 10).alias("sample_key")
        )
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# x266 — k-anonymity audit (wave 43)
# ---------------------------------------------------------------------------

K_ANON_K = 5
K_ANON_TOP_N = 50


def x266_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity audit over the customer quasi-identifier grid
    (nation × market segment × account-balance band): every
    equivalence class smaller than ``K_ANON_K`` is a re-identification
    risk — the governance check run before any "anonymized" extract
    leaves the platform (Sweeney's k-anonymity, the regulatory
    baseline for quasi-identifier release).

    One grouped count over the quasi-identifier columns, then a
    filter — the audit costs one map-side-combinable aggregate no
    matter the table size; the violating-class surface is a
    deterministic Top-N (smallest classes first).
    """
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    classes = (
        cust.join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy(
            "n_name",
            "c_mktsegment",
            F.floor(F.col("c_acctbal") / 1000).cast("bigint").alias("bal_band"),
        )
        .agg(F.count(F.lit(1)).alias("class_size"))
    )
    return (
        classes.filter(F.col("class_size") < K_ANON_K)
        .select(
            "n_name",
            "c_mktsegment",
            "bal_band",
            F.col("class_size").cast("bigint").alias("class_size"),
        )
        .orderBy("class_size", "n_name", "c_mktsegment", "bal_band")
        .limit(K_ANON_TOP_N)
    )


# ---------------------------------------------------------------------------
# x273 — declarative data expectations (wave 47)
# ---------------------------------------------------------------------------


def x273_data_expectations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declarative data-quality contract over ``orders`` (the
    dbt-test / Great-Expectations shape): uniqueness, not-null,
    value-range, date-range, and referential-integrity expectations,
    each reported with its violation count and verdict — the gate a
    pipeline runs before publishing a table.

    Cost model matters at 100 TB: four of the five expectations fold
    into ONE pass over orders (conditional aggregates; uniqueness via
    count vs count-distinct in the same aggregate), and only the FK
    check pays a join — an anti-join against the dimension, AQE-
    planned.  The report is a fixed 5-row relation.
    """
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey")
    one_pass = orders.agg(
        (F.count(F.lit(1)) - F.count_distinct("o_orderkey")).alias("dup_keys"),
        F.count(F.when(F.col("o_custkey").isNull(), 1)).alias("null_cust"),
        F.count(F.when(~(F.col("o_totalprice") > 0), 1)).alias("bad_price"),
        F.count(
            F.when(
                (F.col("o_orderdate") < "1992-01-01")
                | (F.col("o_orderdate") >= "2003-01-01"),
                1,
            )
        ).alias("bad_date"),
    ).collect()[0]  # bounded: 4 scalars
    # SQL FK semantics: a NULL foreign key is not a violation (it is
    # the not_null expectation's job) — filter before the anti-join
    fk_misses = (
        orders.select("o_custkey")
        .filter(F.col("o_custkey").isNotNull())
        .join(cust, orders.o_custkey == cust.c_custkey, "left_anti")
        .count()
    )
    rows = [
        ("unique:o_orderkey", int(one_pass["dup_keys"])),
        ("not_null:o_custkey", int(one_pass["null_cust"])),
        ("positive:o_totalprice", int(one_pass["bad_price"])),
        ("in_range:o_orderdate", int(one_pass["bad_date"])),
        ("fk:o_custkey->customer", int(fk_misses)),
    ]
    return (
        spark.createDataFrame(rows, "expectation string, n_violations long")
        .select(
            "expectation",
            F.col("n_violations").cast("bigint").alias("n_violations"),
            (F.col("n_violations") == 0).alias("passed"),
        )
        .orderBy("expectation")
    )


# ---------------------------------------------------------------------------
# x280 — l-diversity audit (wave 49)
# ---------------------------------------------------------------------------

L_DIVERSITY_L = 3
L_DIV_TOP_N = 50


def x280_l_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """l-diversity audit (x266's companion): a k-anonymous class is
    still unsafe if everyone in it shares the same SENSITIVE value —
    here, classes on (nation, balance band) whose market-segment
    diversity falls below ``L_DIVERSITY_L`` distinct values
    (Machanavajjhala et al.'s homogeneity-attack fix).

    One grouped count-distinct over the quasi-identifier grid;
    deterministic Top-N of the least-diverse classes.
    """
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    classes = (
        cust.join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy(
            "n_name",
            F.floor(F.col("c_acctbal") / 1000).cast("bigint").alias("bal_band"),
        )
        .agg(
            F.count(F.lit(1)).alias("class_size"),
            F.count_distinct("c_mktsegment").alias("l_div"),
        )
    )
    return (
        classes.filter(F.col("l_div") < L_DIVERSITY_L)
        .select(
            "n_name",
            "bal_band",
            F.col("class_size").cast("bigint").alias("class_size"),
            F.col("l_div").cast("bigint").alias("l_div"),
        )
        .orderBy("l_div", "class_size", "n_name", "bal_band")
        .limit(L_DIV_TOP_N)
    )


# ---------------------------------------------------------------------------
# x289 — t-closeness audit (wave 53)
# ---------------------------------------------------------------------------

T_CLOSE_T = 0.30
T_CLOSE_TOP_N = 25


def x289_t_closeness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """t-closeness audit (the third rung of the x266 → x280 privacy
    ladder): a class can be k-anonymous AND l-diverse yet still leak
    if its sensitive-value DISTRIBUTION differs sharply from the
    table-wide one (Li et al., ICDE'07).  For a categorical sensitive
    attribute the earth-mover distance reduces to total variation:
    ``t = ½ Σ_s |p_class(s) − p_global(s)|``; classes with
    ``t > T_CLOSE_T`` are flagged, worst first.

    Shape: one grouped count per (class × segment), one 5-row global
    segment distribution, and a class × segment-dim grid join so
    absent segments still contribute their global mass — the grid
    side is the SEGMENT dim (≤ distinct segments, schema-bounded),
    never a second pass over the fact.  All shares are integer/integer
    doubles, bit-identical across engines.
    """
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    base = cust.join(
        F.broadcast(nation), cust.c_nationkey == nation.n_nationkey
    ).select(
        "n_name",
        F.floor(F.col("c_acctbal") / 1000).cast("bigint").alias("bal_band"),
        "c_mktsegment",
    )
    cls_seg = base.groupBy("n_name", "bal_band", "c_mktsegment").agg(
        F.count(F.lit(1)).alias("n_cs")
    )
    classes = cls_seg.groupBy("n_name", "bal_band").agg(
        F.sum("n_cs").alias("class_size")
    )
    glob = base.groupBy("c_mktsegment").agg(F.count(F.lit(1)).alias("n_s"))
    total = glob.agg(F.sum("n_s").alias("n_total"))
    # global segment counts: ≤ |segments| rows — a true dim, safe broadcast
    gcnt = glob.crossJoin(F.broadcast(total))
    grid = classes.crossJoin(F.broadcast(gcnt))
    # exact-rational form: ½ Σ|p−q| = Σ|n_cs·n_total − n_s·class_size|
    # / (2·class_size·n_total) — the numerator is an INTEGER sum
    # (decimal: the product crosses int64 past ~10⁹ rows), so the sum
    # has no float-order sensitivity and the single final division is
    # bit-identical across engines.
    dev_num = F.abs(
        F.coalesce(F.col("n_cs"), F.lit(0)).cast("decimal(38,0)")
        * F.col("n_total")
        - F.col("n_s").cast("decimal(38,0)") * F.col("class_size")
    )
    dist = (
        grid.join(cls_seg, ["n_name", "bal_band", "c_mktsegment"], "left")
        .select("n_name", "bal_band", "class_size", "n_total", dev_num.alias("dev"))
        .groupBy("n_name", "bal_band")
        .agg(
            F.first("class_size").alias("class_size"),
            (
                F.sum("dev").cast("double")
                / (2 * F.first("class_size").cast("double") * F.first("n_total"))
            ).alias("t_dist"),
        )
    )
    return (
        dist.filter(F.col("t_dist") > T_CLOSE_T)
        .select(
            "n_name",
            "bal_band",
            F.col("class_size").cast("bigint").alias("class_size"),
            F.round("t_dist", 6).alias("t_dist"),
        )
        .orderBy(F.desc("t_dist"), "n_name", "bal_band")
        .limit(T_CLOSE_TOP_N)
    )


# ---------------------------------------------------------------------------
# wave 59 (round 6): negative sampling, curriculum token-budget deciles
# ---------------------------------------------------------------------------

NEG_SAMPLE_K = 2  # negatives per positive pair


def x303_negative_sampling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic negative sampling for contrastive two-tower
    training over (order, part) interactions: each positive pair gets
    ``NEG_SAMPLE_K`` candidate negatives drawn uniformly from the part
    catalog by a sha256 hash of (order, slot), with candidates that
    collide with the order's own parts rejected — the
    training-data-prep step behind every retrieval/recommendation
    embedding model, made replayable (same corpus → same negatives on
    any cluster size, no RNG state).

    p_partkey is contiguous 0-based (asserted by the inner join back
    to part), so ``hash mod |parts|`` maps straight to a key; |parts|
    enters as a 1-row broadcast.  The collision rejection is one
    composite-key anti join against the positive set.  Output is the
    1-row audit (counts + collision rate); the pair relation itself
    stays distributed.
    """
    pos = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    n_parts = load_table(spark, sf_dir, "part").agg(
        F.count(F.lit(1)).alias("n_parts")
    )
    slots = F.array(*[F.lit(i) for i in range(NEG_SAMPLE_K)])
    cand = (
        pos.select("l_orderkey", F.explode(slots).alias("slot"))
        .distinct()  # one candidate per (order, slot)
        .crossJoin(F.broadcast(n_parts))
        .select(
            "l_orderkey",
            "slot",
            F.pmod(
                F.conv(
                    F.substring(
                        F.sha2(
                            F.concat_ws(
                                "|",
                                F.col("l_orderkey").cast("string"),
                                F.col("slot").cast("string"),
                            ),
                            256,
                        ),
                        1,
                        12,
                    ),
                    16,
                    10,
                ).cast("bigint"),
                F.col("n_parts"),
            ).alias("cand_part"),
        )
    )
    hits = pos.select(
        F.col("l_orderkey").alias("po"), F.col("l_partkey").alias("pp")
    )
    neg = cand.join(
        hits,
        (F.col("l_orderkey") == F.col("po")) & (F.col("cand_part") == F.col("pp")),
        "left_anti",
    )
    a = cand.agg(F.count(F.lit(1)).alias("n_candidates"))
    # semi and anti on the same predicate partition cand exactly, so
    # n_collisions ≡ n_candidates − n_negatives: deriving it drops a
    # whole join branch that re-evaluated the sha256 fan-out (the
    # count-only branch `a` prunes the hash column; only the anti
    # join still computes it — 3 hash passes down to 1)
    c = neg.agg(
        F.count(F.lit(1)).alias("n_negatives"),
        F.count_distinct("cand_part").alias("n_distinct_neg_parts"),
    )
    d = pos.agg(F.count(F.lit(1)).alias("n_positives"))
    return (
        d.crossJoin(F.broadcast(a))
        .crossJoin(F.broadcast(c))
        .select(
            F.col("n_positives").cast("bigint").alias("n_positives"),
            F.col("n_candidates").cast("bigint").alias("n_candidates"),
            (F.col("n_candidates") - F.col("n_negatives"))
            .cast("bigint")
            .alias("n_collisions"),
            F.col("n_negatives").cast("bigint").alias("n_negatives"),
            F.col("n_distinct_neg_parts")
            .cast("bigint")
            .alias("n_distinct_neg_parts"),
            F.round(
                (F.col("n_candidates") - F.col("n_negatives"))
                / F.col("n_candidates").cast("double"),
                6,
            ).alias("collision_rate"),
        )
    )


CURRICULUM_BUDGET_CHARS = 1_000_000  # per-epoch char budget to allocate
CURRICULUM_DECILES = 10


def x305_curriculum_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curriculum token-budget allocation: documents are ranked into
    exact global deciles by length (the difficulty proxy), and a fixed
    char budget is split across deciles with linearly decaying weights
    (easy-first curriculum: decile 1 gets weight 10, decile 10 weight
    1).  Per decile: document count, available chars, allocated quota,
    and the sampling rate a downstream mixer would apply — the
    "what do we actually train on this epoch?" planning query.

    Exact deciles WITHOUT an unpartitioned window: global row numbers
    come from the range-bucketed ``layout._global_row_number``
    machinery, and ``decile = floor((rn−1)·10/n) + 1`` is a static
    projection (NTILE-equivalent only when 10 | n, so both engines pin
    THIS formula, not NTILE).  Everything after is a 10-group
    aggregate with decimal char sums.
    """
    from go_mapreduce_spark.operators.layout import _global_row_number

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "n_chars")
    ranked, n = _global_row_number(
        docs, ["n_chars", "doc_id"], F.col("n_chars")
    )
    k = CURRICULUM_DECILES
    dec = ranked.withColumn(
        "decile",
        (F.floor((F.col("rn") - 1) * k / F.lit(n)) + 1).cast("int"),
    )
    per = dec.groupBy("decile").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("n_chars").cast("bigint").alias("n_chars_avail"),
    )
    w = F.lit(k + 1) - F.col("decile")  # 10, 9, ..., 1
    w_total = k * (k + 1) // 2
    quota = F.floor(
        F.lit(CURRICULUM_BUDGET_CHARS) * w / F.lit(w_total)
    ).cast("bigint")
    return per.select(
        F.col("decile").cast("bigint").alias("decile"),
        "n_docs",
        "n_chars_avail",
        w.cast("bigint").alias("weight"),
        quota.alias("quota_chars"),
        F.round(
            F.least(F.lit(1.0), quota / F.col("n_chars_avail").cast("double")), 6
        ).alias("sample_rate"),
    ).orderBy("decile")


# ---------------------------------------------------------------------------
# x309 — train/val/test split balance audit (wave 60)
# ---------------------------------------------------------------------------

SPLIT_FRACS = (0.8, 0.1, 0.1)  # train / val / test


def x309_split_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 80/10/10 train/val/test split of the document
    corpus by sha256(doc_id), audited per split × language: counts,
    char volume, and the chi-square balance term against the expected
    split fraction — the "is my eval set biased?" check every
    training pipeline should run, replayable on any cluster size.

    The split is a pure projection (hash prefix against two pinned
    hex cuts — the x254/x96 discipline, no RNG); the audit is one
    (split, lang) grouped aggregate plus lang marginals re-entering
    by key.  Chi² terms use exact-integer ratios in double.
    """
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "n_chars"
    )
    h = F.substring(F.sha2(F.col("doc_id").cast("string"), 256), 1, 4)
    # 4 hex chars = 65536 buckets; cuts at 0.8 and 0.9 of the space
    cut1, cut2 = format(int(65536 * 0.8), "04x"), format(int(65536 * 0.9), "04x")
    split = (
        F.when(h < F.lit(cut1), "train")
        .when(h < F.lit(cut2), "val")
        .otherwise("test")
    )
    tagged = docs.withColumn("split", split)
    cell = tagged.groupBy("split", "lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").cast("bigint").alias("n_chars"),
    )
    lang_tot = cell.groupBy("lang").agg(F.sum("n_docs").alias("n_lang"))
    frac = F.create_map(
        F.lit("train"), F.lit(SPLIT_FRACS[0]),
        F.lit("val"), F.lit(SPLIT_FRACS[1]),
        F.lit("test"), F.lit(SPLIT_FRACS[2]),
    )
    expected = F.element_at(frac, F.col("split")) * F.col("n_lang")
    return (
        cell.join(lang_tot, "lang")
        .select(
            "split",
            "lang",
            F.col("n_docs").cast("bigint").alias("n_docs"),
            "n_chars",
            F.round(expected, 6).alias("expected_docs"),
            F.round(
                (F.col("n_docs") - expected) * (F.col("n_docs") - expected)
                / expected,
                6,
            ).alias("chi2_term"),
        )
        .orderBy("split", "lang")
    )


# ---------------------------------------------------------------------------
# x323 — weighted reservoir sample per source (wave 63)
# ---------------------------------------------------------------------------

WRES_K = 5
WRES_SALT = "|wres"


def x323_weighted_reservoir(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source weighted sample WITHOUT replacement, K=``WRES_K``
    docs per source with inclusion probability ∝ ``n_chars`` — the
    Efraimidis–Spirakis exponential-sort scheme ("Weighted random
    sampling with a reservoir", IPL 2006): rank every row by
    ln(u)/w (u uniform) and keep the top K.  This is how a curation
    pipeline draws a size-weighted audit sample from each source in
    ONE pass with no per-group state.

    Determinism (the x37/x254 content-hash discipline): u is derived
    from an 8-hex-digit sha256 window of the doc id, so every engine,
    retry, and partitioning draws the SAME sample — a sample that
    changes on re-run cannot be audited.  The per-source top-K is a
    partitioned window (never a global sort); at 100 TB a group's
    rank scan is a map-side TakeOrdered per partition followed by a
    K-row merge.
    """
    docs = load_table(spark, sf_dir, "documents").filter(F.col("n_chars") > 0)
    h8 = F.substring(
        F.sha2(F.concat(F.col("doc_id").cast("string"), F.lit(WRES_SALT)), 256),
        1,
        8,
    )
    v = F.conv(h8, 16, 10).cast("bigint")
    u = (v.cast("double") + 0.5) / F.lit(4294967296.0)
    key = F.log(u) / F.col("n_chars").cast("double")
    wk = Window.partitionBy("source").orderBy(F.col("wkey").desc(), "doc_id")
    return (
        docs.select("source", "doc_id", F.col("n_chars").cast("bigint").alias("n_chars"),
                    key.alias("wkey"))
        .withColumn("rk", F.row_number().over(wk))
        .filter(F.col("rk") <= WRES_K)
        .select(
            "source",
            F.col("rk").cast("bigint").alias("rk"),
            "doc_id",
            "n_chars",
            F.round("wkey", 10).alias("wkey"),
        )
        .orderBy("source", "rk")
    )


# ---------------------------------------------------------------------------
# x328 — differentially-private noisy counts (wave 65)
# ---------------------------------------------------------------------------

DP_EPSILON = 0.5
DP_SALT = "|dp"


def x328_dp_noisy_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ε-differentially-private release of per-nation order counts via
    the Laplace mechanism: noise ~ Laplace(Δf/ε) with sensitivity
    Δf = 1 (one order moves one count by one) — the k-anonymity/
    l-diversity/t-closeness family's (x266/x280/x289) quantitative
    sibling, and the standard mechanism for publishing aggregate
    stats of a training corpus without leaking any single record.

    The noise draw is DETERMINISTIC per released cell (inverse-CDF of
    a sha256-derived uniform, the x254 discipline): a DP release must
    be drawn ONCE — re-sampling on every retry would let an observer
    average the noise away, so making the draw a pure function of the
    cell key is not just testability, it is the correct semantics for
    an idempotent release pipeline.  One grouped count (map-side
    combined) + per-group closed-form noise; the true count is
    carried only to let the oracle and tests pin the mechanism — a
    production release would drop it.
    """
    orders = load_table(spark, sf_dir, "orders").select("o_custkey")
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey"
    )
    nation = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name"
    )
    counts = (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("n_name")
        .agg(F.count(F.lit(1)).alias("true_n"))
    )
    h8 = F.substring(
        F.sha2(F.concat(F.col("n_name"), F.lit(DP_SALT)), 256), 1, 8
    )
    v = F.conv(h8, 16, 10).cast("bigint")
    u = (v.cast("double") + 0.5) / F.lit(4294967296.0)
    b = 1.0 / DP_EPSILON
    noise = (
        F.lit(-b)
        * F.signum(u - 0.5)
        * F.log(1.0 - 2.0 * F.abs(u - 0.5))
    )
    return counts.select(
        "n_name",
        F.col("true_n").cast("bigint").alias("true_n"),
        F.round(noise, 6).alias("noise"),
        F.round(F.col("true_n") + noise, 6).alias("noisy_n"),
    ).orderBy("n_name")


# ---------------------------------------------------------------------------
# x332 — Bloom-filter sizing advisor per partition (wave 66)
# ---------------------------------------------------------------------------

BLOOM_M_BITS = 1 << 17  # fixed per-partition filter budget (16 KiB)
BLOOM_FPR_TARGET = 0.01


def x332_bloom_fpr_advisor(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-skipping index health check: for every monthly partition
    of orders, the expected false-positive rate of a fixed-budget
    customer-key Bloom filter — fpr = (1 − e^{−kn/m})^k with the
    per-partition optimal k = ⌊ln2·m/n + 0.5⌋ — and a flag for
    partitions whose key cardinality has outgrown the budget.  The
    x316 LSH-advisor pattern pointed at the lakehouse's manifest
    Bloom index (x270): measure the design ON the real key counts
    before trusting it to prune.

    One distinct-count aggregate per partition (the only corpus-sized
    work), then closed-form arithmetic on the bounded calendar-month
    relation.  floor(x + 0.5) is used instead of round() — the two
    engines disagree on banker's rounding, an explicit half-up pin
    does not.
    """
    orders = load_table(spark, sf_dir, "orders")
    per = orders.select(
        F.date_format("o_orderdate", "yyyy-MM").alias("month"),
        "o_custkey",
    ).groupBy("month").agg(
        F.countDistinct("o_custkey").alias("n_keys")
    )
    m = float(BLOOM_M_BITS)
    k = F.greatest(
        F.lit(1).cast("bigint"),
        F.floor(
            F.lit(math.log(2.0)) * F.lit(m) / F.col("n_keys") + F.lit(0.5)
        ).cast("bigint"),
    )
    fpr = F.pow(
        1.0 - F.exp(-(k.cast("double") * F.col("n_keys")) / F.lit(m)),
        k.cast("double"),
    )
    return (
        per.select(
            "month",
            F.col("n_keys").cast("bigint").alias("n_keys"),
            k.alias("k_hashes"),
            F.round(F.col("n_keys") / F.lit(m), 6).alias("fill_per_bit"),
            F.round(fpr, 6).alias("expected_fpr"),
            (fpr > F.lit(BLOOM_FPR_TARGET)).alias("undersized"),
        )
        .orderBy("month")
    )


# ---------------------------------------------------------------------------
# x360 — functional-dependency audit (wave 76)
# ---------------------------------------------------------------------------

# Candidate dependencies to profile: (label, table, determinant,
# dependent).  A mix of a key anchor (must hold) and plausible
# business rules (the audit's job is to report which actually hold).
FD_CANDIDATES = (
    ("orders.o_orderkey->o_orderstatus", "orders", "o_orderkey", "o_orderstatus"),
    ("orders.o_custkey->o_orderpriority", "orders", "o_custkey", "o_orderpriority"),
    ("customer.c_nationkey->c_mktsegment", "customer", "c_nationkey", "c_mktsegment"),
    ("part.p_brand->p_type", "part", "p_brand", "p_type"),
    ("lineitem.l_orderkey->l_shipdate", "lineitem", "l_orderkey", "l_shipdate"),
)


def x360_fd_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Functional-dependency profiler: for each candidate A→B, the
    number of determinant values that map to MORE than one dependent
    value and the violation rate — schema-discovery's workhorse
    (does this column actually determine that one, or does the app
    only wish it did?), complementing x138's FK audit and x273's
    row-level expectations.

    One grouped count-distinct per candidate (map-side combined; the
    per-key distinct state is bounded by the dependent's real
    fan-out), collapsed to a single audit row each and unioned — the
    output is exactly ``len(FD_CANDIDATES)`` rows at any scale.
    """
    parts = []
    for label, table, det, dep in FD_CANDIDATES:
        per_key = (
            load_table(spark, sf_dir, table)
            .groupBy(F.col(det))
            .agg(F.countDistinct(F.col(dep)).alias("nd"))
        )
        parts.append(
            per_key.agg(
                F.lit(label).alias("candidate"),
                F.count(F.lit(1)).cast("bigint").alias("n_keys"),
                F.sum(F.when(F.col("nd") > 1, 1).otherwise(0))
                .cast("bigint")
                .alias("n_violating"),
                F.max("nd").cast("bigint").alias("max_fanout"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.select(
        "candidate",
        "n_keys",
        "n_violating",
        "max_fanout",
        F.round(F.col("n_violating") / F.col("n_keys").cast("double"), 6).alias(
            "violation_rate"
        ),
        (F.col("n_violating") == 0).cast("bigint").alias("holds"),
    ).orderBy("candidate")


# ---------------------------------------------------------------------------
# x369 — Horvitz-Thompson estimation from a size-biased sample (wave 79)
# ---------------------------------------------------------------------------

HT_PRICE_SCALE = 500_000.0  # pi target = clamp(price/scale, floor, 1)
HT_PI_FLOOR = 0.02


def x369_horvitz_thompson(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Horvitz-Thompson total-revenue estimate from a Poisson
    size-biased sample: include each order with probability
    π ∝ its value (big orders almost surely, small ones rarely),
    estimate the population total as Σ y/π over the sample, and
    report the HT variance-based SE — the estimator that makes
    "sample 2% of rows but keep the spend estimate unbiased"
    legitimate, and the x102 weighted sampler's missing read path.

    Inclusion is the deterministic x102 hex-tick draw (u ≤ tick), so
    the sample — and therefore every number here — is reproducible
    across engines and runs; the REALIZED probability (tick+1)/65536
    feeds the estimator, keeping it exactly unbiased on the grid.
    One scan; sums via exact decimal.
    """
    from go_mapreduce_spark.functions.numeric import dsum_expr

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice"
    )
    pi_target = F.greatest(
        F.lit(HT_PI_FLOOR),
        F.least(F.lit(1.0), F.col("o_totalprice") / F.lit(HT_PRICE_SCALE)),
    )
    ti = F.floor(pi_target * 65536.0).cast("int") - 1
    u = F.substring(
        F.sha2(F.concat(F.col("o_orderkey").cast("string"), F.lit(":ht")), 256),
        1,
        4,
    )
    drawn = orders.select(
        "o_totalprice",
        ti.alias("ti"),
        (u <= F.format_string("%04x", ti)).alias("inc"),
        ((ti + 1) / F.lit(65536.0)).alias("pi"),
    )
    agg = drawn.agg(
        F.count(F.lit(1)).alias("n_pop"),
        dsum_expr("o_totalprice", "true_total"),
        F.sum(F.when(F.col("inc"), 1).otherwise(0)).alias("n_sample"),
        F.sum(
            F.when(F.col("inc"), F.col("o_totalprice") / F.col("pi"))
            .otherwise(0.0)
            .cast("decimal(38,6)")
        )
        .cast("double")
        .alias("ht_total"),
        F.sum(
            F.when(
                F.col("inc"),
                (1.0 - F.col("pi"))
                / (F.col("pi") * F.col("pi"))
                * F.col("o_totalprice")
                * F.col("o_totalprice"),
            )
            .otherwise(0.0)
            .cast("decimal(38,6)")
        )
        .cast("double")
        .alias("var_ht"),
    )
    return agg.select(
        F.col("n_pop").cast("bigint").alias("n_pop"),
        F.col("n_sample").cast("bigint").alias("n_sample"),
        F.round("ht_total", 2).alias("ht_total"),
        F.round("true_total", 2).alias("true_total"),
        F.round(
            (F.col("ht_total") - F.col("true_total"))
            / F.col("true_total")
            * 100.0,
            6,
        ).alias("rel_err_pct"),
        F.round(F.sqrt("var_ht"), 2).alias("se_ht"),
    )


# ---------------------------------------------------------------------------
# x383 — tokenizer fertility audit per source (wave 84)
# ---------------------------------------------------------------------------


def x383_tokenizer_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer fertility audit: per source, BPE-ish tokens per word
    and characters per token — the "how expensive is this corpus slice
    to train on" number that decides mixing weights before anyone
    looks at quality.  High fertility (many subword tokens per word)
    flags vocabularies the tokenizer fragments; chars/token is the
    budget conversion every token-budget mix (x105-class) needs.

    One corpus pass, three counters per document (pinned BPE_REGEX,
    alpha words, chars), integer sums per source; the ratios are
    ratios of exact integers.
    """
    docs = load_table(spark, sf_dir, "documents").filter(
        F.length("text") > 0
    )
    per = docs.select(
        "source",
        F.size(F.regexp_extract_all("text", F.lit(BPE_REGEX), F.lit(0)))
        .cast("bigint")
        .alias("n_bpe"),
        F.size(
            F.filter(
                F.split(F.col("text"), "[^A-Za-z]+"),
                lambda t: F.length(t) > 0,
            )
        )
        .cast("bigint")
        .alias("n_words"),
        F.col("n_chars").cast("bigint").alias("nc"),
    )
    return (
        per.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("n_bpe").cast("bigint").alias("total_bpe"),
            F.sum("n_words").cast("bigint").alias("total_words"),
            F.sum("nc").cast("bigint").alias("total_chars"),
        )
        .select(
            "source",
            "n_docs",
            "total_bpe",
            F.round(
                F.col("total_bpe") / F.col("total_words").cast("double"), 6
            ).alias("fertility"),
            F.round(
                F.col("total_chars") / F.col("total_bpe").cast("double"), 6
            ).alias("chars_per_token"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# x391 — leakage-safe train/test split (wave 87)
# ---------------------------------------------------------------------------

LSPLIT_SALT = "|lsplit"
LSPLIT_TRAIN_OF_10 = 8  # hash residues 0-7 train, 8-9 test


def x391_leakage_safe_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train/test split that cannot leak through near-duplicates: the
    split hash is computed on the document's DEDUP-CLUSTER
    representative (x27's connected components; singletons represent
    themselves), so every member of a near-dup cluster lands on the
    same side BY CONSTRUCTION.  The naive per-document hash split is
    computed alongside and its straddling-pair count reported — the
    number every eval-contamination postmortem wishes had been zero.
    x52 decontaminates against a FIXED eval set; this makes the split
    itself safe.

    Scale shape: the pair graph and components are the shared
    x6/x27 machinery (memoized per run); the split itself is one
    sha256 per document and two bounded join-audits on the pair
    relation.
    """
    from go_mapreduce_spark.operators.dedup import (
        connected_components,
        shared_pair_graph,
    )

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    pairs = shared_pair_graph(spark, sf_dir, 0.8)
    cl = connected_components(pairs)

    def is_train(col):
        h8 = F.substring(
            F.sha2(F.concat(col.cast("string"), F.lit(LSPLIT_SALT)), 256),
            1,
            8,
        )
        return F.pmod(
            F.conv(h8, 16, 10).cast("bigint"), F.lit(10)
        ) < F.lit(LSPLIT_TRAIN_OF_10)

    rep = docs.join(cl, "doc_id", "left").select(
        "doc_id",
        F.coalesce(F.col("cluster_id"), F.col("doc_id")).alias("rep"),
    )
    splits = rep.select(
        "doc_id",
        is_train(F.col("rep")).alias("tr_cluster"),
        is_train(F.col("doc_id")).alias("tr_naive"),
    )
    sa = splits.select(
        F.col("doc_id").alias("doc_a"),
        F.col("tr_cluster").alias("ca"),
        F.col("tr_naive").alias("na"),
    )
    sb = splits.select(
        F.col("doc_id").alias("doc_b"),
        F.col("tr_cluster").alias("cb"),
        F.col("tr_naive").alias("nb"),
    )
    audited = pairs.join(sa, "doc_a").join(sb, "doc_b")
    counts = splits.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum(F.col("tr_cluster").cast("int")).cast("bigint").alias("n_train"),
    )
    straddle = audited.agg(
        F.sum((F.col("ca") != F.col("cb")).cast("int"))
        .cast("bigint")
        .alias("straddle_cluster"),
        F.sum((F.col("na") != F.col("nb")).cast("int"))
        .cast("bigint")
        .alias("straddle_naive"),
        F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
    )
    return counts.crossJoin(F.broadcast(straddle)).select(
        "n_docs",
        "n_train",
        (F.col("n_docs") - F.col("n_train")).alias("n_test"),
        "n_pairs",
        "straddle_cluster",
        "straddle_naive",
    )


# ---------------------------------------------------------------------------
# x398 — Neyman sampling allocation (wave 90)
# ---------------------------------------------------------------------------

NEYMAN_BUDGET = 1000


def x398_neyman_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Optimal (Neyman) sample allocation across document sources for
    a fixed labeling budget: n_h ∝ N_h·S_h, so variable strata get
    proportionally MORE than their share of rows — the sampling-design
    step that decides where annotation money goes before x85's
    deterministic draw executes it.  The proportional allocation is
    reported alongside as the naive baseline.

    One corpus pass → per-stratum (N_h, decimal moment sums); the
    allocation is scalar algebra on the ~20-row stratum relation.
    Integer allocations use the pinned floor(x+0.5) rounding (engine
    round() half-even differs).
    """
    from go_mapreduce_spark.functions.numeric import (
        DECIMAL_T,
        dsum,
        dsum_expr,
    )

    docs = load_table(spark, sf_dir, "documents")
    per = docs.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_rows"),
        dsum(F.col("n_chars"), "s1"),
        dsum_expr("n_chars * n_chars", "s2"),
    )
    nh = F.col("n_rows").cast("double")
    var = (F.col("s2") - F.col("s1") * F.col("s1") / nh) / (nh - 1.0)
    scored = per.select(
        "source",
        F.col("n_rows").cast("bigint").alias("n_rows"),
        F.sqrt(var).alias("s_h"),
        (nh * F.sqrt(var)).alias("w"),
    )
    tot = scored.agg(
        F.sum(F.col("w").cast(DECIMAL_T)).cast("double").alias("sw"),
        F.sum("n_rows").cast("double").alias("n_all"),
    )
    j = scored.crossJoin(F.broadcast(tot))
    alloc = F.lit(float(NEYMAN_BUDGET)) * F.col("w") / F.col("sw")
    prop = F.lit(float(NEYMAN_BUDGET)) * F.col("n_rows") / F.col("n_all")
    return j.select(
        "source",
        "n_rows",
        F.round("s_h", 6).alias("s_h"),
        F.floor(alloc + 0.5).cast("bigint").alias("n_neyman"),
        F.floor(prop + 0.5).cast("bigint").alias("n_proportional"),
    ).orderBy("source")
