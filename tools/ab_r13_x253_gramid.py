"""Interleaved A/B for x253 (round-12 verdict ask #8, the last untried
lever on the worst remaining sf1 exponent): current 2-char STRING gram
keys vs a BIGINT codepoint-pair dictionary encode
(``ascii(g)*2^21 + ascii(substring(g, 2, 1))`` — injective, since a
Unicode code point is < 2^21) through the training aggregate and the
broadcast model join.  The decimal score sums are unchanged, so results
must be bit-identical; identity is asserted before any timing.

Expected effect: the corpus-sized gram stream probes the broadcast
hash relation on a long instead of a string, and the training
aggregate shuffles (bigint, lang) keys instead of (string, lang).
The encode itself costs two extra ascii/substring ops per gram
instance ON TOP of the existing substring — this harness decides
whether the cheaper hashing pays for the extra extraction.
"""
import hashlib
import sys
import time

sys.path.insert(0, "/root/repo")
from pyspark.sql import SparkSession, functions as F  # noqa: E402

from go_mapreduce_spark.operators.text import x253_naive_bayes_langid  # noqa: E402
from go_mapreduce_spark.operators.scale import spread_for_fanout  # noqa: E402
from go_mapreduce_spark.session import get_spark  # noqa: E402
from go_mapreduce_spark.sources.registry import load_table  # noqa: E402

N = 3

_CACHE = {}

# 2^21: above any Unicode code point, so (cp1, cp2) -> cp1*2^21 + cp2
# is injective and the distinct-gram count is unchanged
_GRAM_BASE = 2_097_152


def x253_gramid(spark: SparkSession, sf_dir: str):
    docs = (
        spread_for_fanout(load_table(spark, sf_dir, "documents"))
        .select("doc_id", "lang", F.lower("text").alias("t"))
        .filter(F.length("t") >= 2)
    )
    grams = docs.select(
        "doc_id",
        "lang",
        F.explode(
            F.expr(
                "transform(sequence(1, length(t) - 1),"
                f" i -> CAST(ascii(substring(t, i, 2)) AS BIGINT) * {_GRAM_BASE}"
                " + ascii(substring(substring(t, i, 2), 2, 1)))"
            )
        ).alias("g"),
    )
    stale = _CACHE.pop(spark, None)
    if stale is not None:
        stale.unpersist(blocking=False)
    counts = (
        grams.groupBy("g", F.col("lang").alias("model_lang"))
        .agg(F.count(F.lit(1)).alias("c"))
        .persist()
    )
    _CACHE[spark] = counts
    docs.createOrReplaceTempView("v_x253g_docs")
    counts.createOrReplaceTempView("v_x253g_counts")
    return spark.sql(
        f"""
        WITH meta AS (
            SELECT doc_id, lang, length(t) - 1 AS n_grams_doc
            FROM v_x253g_docs
        ), lstat AS (
            SELECT model_lang, SUM(c) AS n_grams_lang
            FROM v_x253g_counts GROUP BY model_lang
        ), prior AS (
            SELECT lang AS model_lang, COUNT(*) AS n_docs_lang
            FROM v_x253g_docs GROUP BY lang
        ), alln AS (SELECT SUM(n_docs_lang) AS n_docs_all FROM prior),
        grid AS (
            SELECT ls.model_lang,
                   ln(p.n_docs_lang / a.n_docs_all) AS log_prior,
                   ln(ls.n_grams_lang +
                      (SELECT COUNT(DISTINCT g) FROM v_x253g_counts))
                       AS log_denom
            FROM lstat ls
            JOIN prior p USING (model_lang)
            CROSS JOIN alln a
        ), overlap AS (
            SELECT /*+ BROADCAST(c) */ dg.doc_id, c.model_lang,
                   CAST(SUM(CAST(ln(c.c + 1) AS DECIMAL(38,6))) AS DOUBLE)
                       AS log_match
            FROM (SELECT doc_id,
                         explode(transform(sequence(1, length(t) - 1),
                             i -> CAST(ascii(substring(t, i, 2)) AS BIGINT)
                                  * {_GRAM_BASE}
                                  + ascii(substring(substring(t, i, 2), 2, 1))))
                             AS g
                  FROM v_x253g_docs) dg
            JOIN v_x253g_counts c USING (g)
            GROUP BY dg.doc_id, c.model_lang
        ), pred AS (
            SELECT /*+ BROADCAST(gr) */ m.doc_id, m.lang,
                   MIN(named_struct(
                       'ns', -round(gr.log_prior
                                    + COALESCE(o.log_match, CAST(0.0 AS DOUBLE))
                                    - m.n_grams_doc * gr.log_denom, 6),
                       'ml', gr.model_lang)).ml AS pred_lang
            FROM meta m
            CROSS JOIN grid gr
            LEFT JOIN overlap o
              ON o.doc_id = m.doc_id AND o.model_lang = gr.model_lang
            GROUP BY m.doc_id, m.lang
        )
        SELECT lang,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(CAST(pred_lang = lang AS INT)) AS BIGINT)
                   AS n_correct,
               ROUND(SUM(CAST(pred_lang = lang AS INT)) / COUNT(*), 4)
                   AS accuracy
        FROM pred GROUP BY lang ORDER BY lang
        """
    )


def rows_hash(df):
    cols = df.columns
    rows = df.collect()
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted("|".join(str(r[i]) for i in order) for r in rows)
    return hashlib.sha256("\n".join(lines).encode()).hexdigest(), len(rows)


def run(spark, fn, sf, label):
    spark.sparkContext.setJobDescription(f"ab_x253_gramid:{label}")
    t0 = time.monotonic()
    df = fn(spark, sf)
    df.write.format("noop").mode("overwrite").save()
    wall = time.monotonic() - t0
    spark.catalog.clearCache()
    spark.sparkContext.setJobDescription(None)
    return wall


def main():
    SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("ab-x253-gramid")
    for sf in ("/root/testdata/sf0.01", SF):
        ho = rows_hash(x253_naive_bayes_langid(spark, sf))
        hn = rows_hash(x253_gramid(spark, sf))
        assert ho == hn, (sf, ho, hn)
        print("identical", sf, ho, flush=True)
        spark.catalog.clearCache()
    run(spark, x253_naive_bayes_langid, SF, "warmup_old")
    run(spark, x253_gramid, SF, "warmup_new")
    old_w, new_w = [], []
    for i in range(N):
        old_w.append(run(spark, x253_naive_bayes_langid, SF, f"old_{i}"))
        new_w.append(run(spark, x253_gramid, SF, f"new_{i}"))
    print("old walls", [round(w, 3) for w in old_w], "min", round(min(old_w), 3))
    print("new walls", [round(w, 3) for w in new_w], "min", round(min(new_w), 3))
    spark.stop()


if __name__ == "__main__":
    main()
