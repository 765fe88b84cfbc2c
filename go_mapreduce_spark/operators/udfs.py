"""UDF surface demonstration — the reference's ENTIRE query language
was a user (Map, Reduce) callback pair compiled into the worker
(reference mapreduce/worker.go:13-21, wc.go:14-38).  Our engine's
user-extension points, fastest first:

1. built-in expressions (JVM, codegen)            — everything else here
2. pandas_udf / mapInPandas (Arrow, vectorized)   — this module + multimodal
3. RDD callbacks (pickled Python, row-at-a-time)  — mapreduce.py shim only

x22 exists to pin the Arrow path with an exact oracle: a vectorized
scalar pandas_udf whose integer output is engine-portable.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from go_mapreduce_spark.sources.registry import load_table


def token_count_udf():
    """Vectorized [A-Za-z]+ token counter (same tokenizer as Q1).

    Built lazily: the pandas_udf decorator parses its DDL return type
    against the ACTIVE SparkContext, so decorating at module import
    time fails before any session exists.
    """

    @pandas_udf("bigint")
    def _count(text: pd.Series) -> pd.Series:
        return text.str.count(r"[A-Za-z]+").astype("int64")

    return _count


def x22_pandas_udf_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc token count via an Arrow-batched pandas UDF.

    Integer results → exact oracle parity, proving the Python
    vectorized path produces driver-checkable results.  (The same
    quantity is computed JVM-side in x7; pick that in production —
    this entry exists to keep the UDF path tested end-to-end.)
    """
    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id", token_count_udf()(F.col("text")).alias("n_tokens")
    ).orderBy("doc_id")


def geomean_udaf():
    """Vectorized grouped-aggregate (UDAF) pandas_udf: geometric mean.

    The GROUPED_AGG Arrow path — per group, the whole value series
    arrives as ONE pandas Series and returns one scalar.  Chosen
    because the quantity is exactly SQL-expressible (exp(avg(ln x)))
    so the Python aggregate gets a real cross-engine oracle, unlike
    typical UDAF demos.  Built lazily (pandas_udf needs an active
    SparkContext for its return type).
    """
    import numpy as np

    @pandas_udf("double")
    def _geomean(v: pd.Series) -> float:
        return float(np.exp(np.log(v.to_numpy(dtype="float64")).mean()))

    return _geomean


def x42_pandas_udaf_geomean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-status geometric mean of order totals via a grouped-agg
    pandas UDF, rounded for cross-engine float parity.

    Scale note: GROUPED_AGG ships each group's full value series to
    Python — right for bounded group counts with big groups (3 order
    statuses); for the JVM-only formulation use exp(avg(ln x)), which
    is what the oracle does.  This entry exists to driver-gate the
    UDAF surface itself.
    """
    orders = load_table(spark, sf_dir, "orders")
    gm = geomean_udaf()
    return (
        orders.groupBy("o_orderstatus")
        .agg(F.round(gm(F.col("o_totalprice")), 6).alias("geomean_price"))
        .orderBy("o_orderstatus")
    )


def x45_udtf_bigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Positional word bigrams via a real Python UDTF (1 row → N
    rows), consumed through SQL LATERAL — completing the
    UDF/UDAF/UDTF triple of driver-gated extension points (x22 scalar,
    x42 grouped-agg, x45 table function).

    This is the exact shape of the reference's Map callback
    (reference worker.go:13-21: one string in, a list of records out)
    re-expressed as a first-class SQL-addressable table function.
    Tokenization pinned to [A-Za-z]+ so the oracle's
    regexp_extract_all matches Python's re.findall byte-for-byte on
    the ASCII fixtures.
    """
    from pyspark.sql.functions import udtf

    # useArrow: results cross the Python↔JVM boundary as Arrow
    # batches instead of pickled rows — the UDTF analog of pandas_udf
    @udtf(returnType="pos bigint, bigram string", useArrow=True)
    class Bigrams:
        def eval(self, text: str):
            import re

            toks = re.findall(r"[A-Za-z]+", text or "")
            for i in range(len(toks) - 1):
                yield i, toks[i] + " " + toks[i + 1]

    spark.udtf.register("gms_bigrams", Bigrams)
    load_table(spark, sf_dir, "documents").createOrReplaceTempView("gms_docs")
    return spark.sql(
        """
        SELECT doc_id, pos, bigram
        FROM gms_docs, LATERAL gms_bigrams(text)
        ORDER BY doc_id, pos
        """
    )


def _zscore_group(pdf: pd.DataFrame) -> pd.DataFrame:
    """Grouped-map worker: z-score of o_totalprice within the group
    (sample stddev).  Whole group in one pandas frame — the UDTF-style
    grouped transform the reference could only express as a Reduce
    callback over a materialized value list."""
    mean = pdf["o_totalprice"].mean()
    std = pdf["o_totalprice"].std(ddof=1)
    out = pdf[["o_orderkey", "o_orderstatus"]].copy()
    out["z"] = ((pdf["o_totalprice"] - mean) / std).round(6)
    return out


def grouped_zscore_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-status z-score of order totals via applyInPandas — the
    grouped-map UDF surface demo (pytest-covered, NOT the declared
    x28 plan).

    Grouped-map contract notes for scale: one whole group must fit in
    one pandas frame and parallelism is bounded by group count (3
    order statuses here) — which is why the DECLARED x28 is the
    window-function plan in relational_ext.x28_grouped_zscore: same
    math, zero Python, per-partition parallelism.  This variant exists
    to keep the applyInPandas path tested end-to-end against it.
    """
    from go_mapreduce_spark.session import ensure_package_on_executors

    ensure_package_on_executors(spark)
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.select("o_orderkey", "o_orderstatus", "o_totalprice")
        .groupBy("o_orderstatus")
        .applyInPandas(
            _zscore_group, "o_orderkey long, o_orderstatus string, z double"
        )
        .orderBy("o_orderkey")
    )


# ---------------------------------------------------------------------------
# x265 — mapInArrow (zero-pandas Arrow batch transform) (wave 43)
# ---------------------------------------------------------------------------


def x265_arrow_doc_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language document statistics computed in a ``mapInArrow``
    transform — the THIRD executor-Python surface next to pandas UDFs
    (x22/x42) and ``mapInPandas`` (x35): the function receives raw
    ``pyarrow.RecordBatch``es and answers with Arrow arrays, skipping
    the Arrow→pandas→Arrow conversion entirely.  For byte-shaped work
    (length/byte/codepoint counting, binary parsing) this is the
    leanest Python path Spark offers — no object boxing, no pandas
    block manager, just vectorized kernels on Arrow buffers.

    The per-doc map emits exact integers (char length, space count),
    so the downstream per-language aggregate is oracle-checkable in
    SQL — proving the Arrow path computes precisely what the engine
    would.
    """
    import pyarrow as pa
    import pyarrow.compute as pc

    docs = load_table(spark, sf_dir, "documents").select("lang", "text")

    def stats(batches):
        for batch in batches:
            text = batch.column("text")
            n_chars = pc.utf8_length(text)
            # spaces = length - length(text with spaces removed)
            n_spaces = pc.subtract(
                n_chars, pc.utf8_length(pc.replace_substring(text, " ", ""))
            )
            yield pa.RecordBatch.from_arrays(
                [batch.column("lang"), n_chars.cast(pa.int64()), n_spaces.cast(pa.int64())],
                names=["lang", "n_chars", "n_spaces"],
            )

    mapped = docs.mapInArrow(
        stats, "lang string, n_chars bigint, n_spaces bigint"
    )
    return (
        mapped.groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("n_chars").cast("bigint").alias("total_chars"),
            F.sum("n_spaces").cast("bigint").alias("total_spaces"),
        )
        .orderBy("lang")
    )
