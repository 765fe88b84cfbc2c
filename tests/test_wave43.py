"""Wave-43 tests: corrupt-row quarantine exactness, mapInArrow parity
with JVM expressions, k-anonymity audit completeness."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_x264_quarantine_is_exact(spark, sf_dir):
    from go_mapreduce_spark.sources import sinks as SNK
    from go_mapreduce_spark.sources.registry import load_table

    got = SNK.x264_malformed_csv(spark, sf_dir).collect()[0]
    orders = load_table(spark, sf_dir, "orders")
    assert got.n_corrupt == SNK._N_CORRUPT
    assert got.n_clean == orders.count()
    want = orders.agg(
        F.round(F.sum(F.col("o_totalprice").cast("decimal(38,6)")).cast("double"), 4)
    ).collect()[0][0]
    assert got.clean_total == want


def test_x265_arrow_matches_jvm_expressions(spark, sf_dir):
    from go_mapreduce_spark.operators import udfs as U
    from go_mapreduce_spark.sources.registry import load_table

    got = {r.lang: r for r in U.x265_arrow_doc_stats(spark, sf_dir).collect()}
    want = {
        r.lang: r
        for r in load_table(spark, sf_dir, "documents")
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.length("text")).alias("total_chars"),
            F.sum(
                F.length("text") - F.length(F.replace(F.col("text"), F.lit(" ")))
            ).alias("total_spaces"),
        )
        .collect()
    }
    assert set(got) == set(want)
    for lang in got:
        assert (got[lang].n_docs, got[lang].total_chars, got[lang].total_spaces) == (
            want[lang].n_docs,
            want[lang].total_chars,
            want[lang].total_spaces,
        )


def test_x266_flags_exactly_the_small_classes(spark, sf_dir):
    from go_mapreduce_spark.operators import curation as C
    from go_mapreduce_spark.sources.registry import load_table

    rows = C.x266_k_anonymity(spark, sf_dir).collect()
    assert all(r.class_size < C.K_ANON_K for r in rows)
    # recompute the full class census and check the flagged set is the
    # Top-N prefix of all violating classes
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    census = (
        cust.join(nation, cust.c_nationkey == nation.n_nationkey)
        .groupBy(
            "n_name",
            "c_mktsegment",
            F.floor(F.col("c_acctbal") / 1000).cast("bigint").alias("bal_band"),
        )
        .count()
        .collect()
    )
    violating = sorted(
        (
            (r["count"], r.n_name, r.c_mktsegment, r.bal_band)
            for r in census
            if r["count"] < C.K_ANON_K
        )
    )[: C.K_ANON_TOP_N]
    got = [(r.class_size, r.n_name, r.c_mktsegment, r.bal_band) for r in rows]
    assert got == violating
