"""Property tests for the round-3 wave-4 operators: pricing summary
(x79), batch sessionization (x80), token entropy (x81), chi-square
independence (x82), IQR outliers (x83), sorted-neighborhood (x84)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F


def test_pricing_summary_invariants(spark, sf_dir):
    """Group cardinality is tiny, counts conserve under the filter,
    and disc_price <= base_price (discount in [0, 1])."""
    from go_mapreduce_spark.operators.relational_ext import (
        PRICING_CUTOFF,
        x79_pricing_summary,
    )
    from go_mapreduce_spark.sources.registry import load_table

    rows = x79_pricing_summary(spark, sf_dir).collect()
    assert 0 < len(rows) <= 12
    li = load_table(spark, sf_dir, "lineitem")
    expected_n = li.filter(
        F.col("l_shipdate") <= F.lit(PRICING_CUTOFF).cast("timestamp")
    ).count()
    assert sum(r.count_order for r in rows) == expected_n
    for r in rows:
        assert r.sum_disc_price <= r.sum_base_price + 1e-6
        assert r.sum_charge >= r.sum_disc_price - 1e-6
        assert abs(r.avg_qty - r.sum_qty / r.count_order) < 1e-9


def test_sessionize_gap_semantics(spark, sf_dir):
    """Sessions per user are contiguous 1..k, consecutive sessions are
    separated by more than the gap, and every event lands in exactly
    one session."""
    from go_mapreduce_spark.operators.windows import (
        SESSION_GAP_SECONDS,
        x80_sessionize,
    )
    from go_mapreduce_spark.sources.registry import load_table

    sessions = x80_sessionize(spark, sf_dir).collect()
    assert sessions
    n_events_total = load_table(spark, sf_dir, "events").count()
    assert sum(s.n_events for s in sessions) == n_events_total

    by_user: dict[int, list] = {}
    for s in sessions:
        by_user.setdefault(s.user_id, []).append(s)
    for user, ss in by_user.items():
        ss.sort(key=lambda s: s.session_idx)
        assert [s.session_idx for s in ss] == list(range(1, len(ss) + 1))
        for a, b in zip(ss, ss[1:]):
            gap = (b.session_start - a.session_end).total_seconds()
            assert gap > SESSION_GAP_SECONDS, (user, a.session_idx)
        for s in ss:
            assert s.session_end >= s.session_start
            assert s.duration_us == int(
                (s.session_end - s.session_start).total_seconds() * 1_000_000
            )


def test_token_entropy_bounds(spark):
    """Uniform tokens hit ln(k) exactly; a single repeated token has
    zero entropy; entropy <= ln(n_distinct) everywhere."""
    from go_mapreduce_spark.operators import text as T

    docs = spark.createDataFrame(
        [
            (1, "aa bb cc dd", "en", "s", 11),
            (2, "zz zz zz zz", "en", "s", 11),
            (3, "aa aa bb", "en", "s", 8),
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        docs.write.parquet(f"{d}/documents.parquet")
        out = {r.doc_id: r for r in T.x81_token_entropy(spark, d).collect()}
    assert abs(out[1].entropy - round(math.log(4), 6)) < 1e-9
    assert out[2].entropy == 0.0
    expect3 = -(2 / 3) * math.log(2 / 3) - (1 / 3) * math.log(1 / 3)
    assert abs(out[3].entropy - expect3) < 1e-6
    for r in out.values():
        assert r.entropy <= math.log(r.n_distinct) + 1e-9


def test_chi2_marginals_consistent(spark, sf_dir):
    """Expected counts reproduce the marginal products and every
    contribution is non-negative; cells partition the corpus."""
    from go_mapreduce_spark.operators.analytics import x82_chi2_independence
    from go_mapreduce_spark.sources.registry import load_table

    rows = x82_chi2_independence(spark, sf_dir).collect()
    assert rows
    n_docs = load_table(spark, sf_dir, "documents").count()
    assert sum(r.n for r in rows) == n_docs
    # expected counts sum to N only over a COMPLETE table; cells with
    # zero observed count are absent, so the visible sum is <= N
    assert sum(r.expected for r in rows) <= n_docs + 1e-3
    for r in rows:
        assert r.chi2_contrib >= 0.0
        assert r.expected > 0.0


def test_iqr_outlier_census(spark):
    """Known distribution: a single wild point is flagged, bulk data
    inside the fences is not."""
    from go_mapreduce_spark.operators.analytics import x83_iqr_outliers

    rows = [(i, f"2024-01-01 00:00:{i % 60:02d}", 1, "a", float(i % 7), "{}")
            for i in range(100)]
    rows.append((100, "2024-01-01 00:01:40", 1, "a", 1e6, "{}"))
    ev = spark.createDataFrame(
        rows,
        "event_id long, ts string, user_id long, event_type string, value double, props string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        ev.write.parquet(f"{d}/events.parquet")
        out = x83_iqr_outliers(spark, d).collect()
    assert len(out) == 1
    r = out[0]
    assert r.n_total == 101
    assert r.n_outliers == 1
    assert r.q1 <= r.q3


def test_sorted_neighborhood_finds_exact_dups(spark, sf_dir):
    """Exact duplicates (same normalized prefix) appear as dist-0
    pairs; output pairs are ordered a < b is NOT guaranteed (block
    order is doc_id), but dist is within threshold and symmetric
    inputs yield one canonical row."""
    from go_mapreduce_spark.operators.dedup import (
        SN_MAX_DIST,
        x1_dedup_exact,
        x84_sorted_neighborhood,
    )

    pairs = x84_sorted_neighborhood(spark, sf_dir).collect()
    for p in pairs:
        assert p.doc_id_a < p.doc_id_b  # lead() over doc_id order
        assert 0 <= p.dist <= SN_MAX_DIST
    # exact-dup groups from x1 share identical text => dist 0 whenever
    # the pair is within the same block and window reach
    seen = {(p.doc_id_a, p.doc_id_b): p.dist for p in pairs}
    zero_pairs = [k for k, v in seen.items() if v == 0]
    assert zero_pairs, "fixture contains exact dups -> some dist-0 pair"


def test_stratified_sample_rates(spark, sf_dir):
    """Per-stratum keep rate tracks its threshold (content-hash keep
    is binomial: allow generous tolerance at fixture scale)."""
    from go_mapreduce_spark.operators.curation import (
        STRATA_DEFAULT_LT,
        STRATA_PREFIX_LT,
        x85_stratified_sample,
    )
    from go_mapreduce_spark.sources.registry import load_table

    kept = x85_stratified_sample(spark, sf_dir).groupBy("lang").count().collect()
    totals = {
        r.lang: r.n
        for r in load_table(spark, sf_dir, "documents")
        .groupBy("lang")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    for r in kept:
        target = int(STRATA_PREFIX_LT.get(r.lang, STRATA_DEFAULT_LT), 16) / 256
        rate = r["count"] / totals[r.lang]
        assert abs(rate - target) < 0.35, (r.lang, rate, target)


def test_price_histogram_partitions_orders(spark, sf_dir):
    from go_mapreduce_spark.operators.analytics import (
        HIST_BIN_WIDTH,
        x86_price_histogram,
    )
    from go_mapreduce_spark.sources.registry import load_table

    bins = x86_price_histogram(spark, sf_dir).collect()
    n_orders = load_table(spark, sf_dir, "orders").count()
    assert sum(b.n_orders for b in bins) == n_orders
    for b in bins:
        assert b.bin_id * HIST_BIN_WIDTH <= b.min_price
        assert b.max_price < (b.bin_id + 1) * HIST_BIN_WIDTH
        assert b.min_price <= b.max_price


def test_basket_pairs_planted(spark):
    """Planted baskets: pair support counts are exact and repeated
    lines of the same part in one order collapse first."""
    from go_mapreduce_spark.operators.analytics import x87_basket_pairs

    rows = []
    # orders 1..4 contain {10, 20}; order 5 contains {10, 20, 20}
    for ok in (1, 2, 3, 4):
        rows += [(ok, 10), (ok, 20)]
    rows += [(5, 10), (5, 20), (5, 20)]
    # parts {30, 40} co-occur only twice -> below min support 3
    rows += [(6, 30), (6, 40), (7, 30), (7, 40)]
    li = spark.createDataFrame(
        [(ok, pk, 1, 1, 1.0, 1.0, 0.0, 0.0, "N", "O", "1995-01-01")
         for ok, pk in rows],
        "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber int, "
        "l_quantity double, l_extendedprice double, l_discount double, "
        "l_tax double, l_returnflag string, l_linestatus string, l_shipdate string",
    ).withColumn("l_shipdate", F.col("l_shipdate").cast("timestamp"))
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        li.write.parquet(f"{d}/lineitem.parquet")
        out = x87_basket_pairs(spark, d).collect()
    assert len(out) == 1
    assert (out[0].part_a, out[0].part_b, out[0].support) == (10, 20, 5)


def test_key_skew_spectrum_conserves(spark, sf_dir):
    from go_mapreduce_spark.operators.analytics import x88_key_skew_spectrum
    from go_mapreduce_spark.sources.registry import load_table

    spec = x88_key_skew_spectrum(spark, sf_dir).collect()
    orders = load_table(spark, sf_dir, "orders")
    assert sum(r.n_orders * r.n_customers for r in spec) == orders.count()
    assert sum(r.n_customers for r in spec) == orders.select("o_custkey").distinct().count()


def test_perplexity_degenerate_lm(spark):
    """A corpus whose every context has exactly one continuation is
    perfectly predictable: cross-entropy 0 for every doc."""
    from go_mapreduce_spark.operators import text as T

    docs = spark.createDataFrame(
        [(1, "alpha beta gamma", "en", "s", 16), (2, "beta gamma delta", "en", "s", 16)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        docs.write.parquet(f"{d}/documents.parquet")
        out = {r.doc_id: r for r in T.x91_doc_perplexity(spark, d).collect()}
    assert set(out) == {1, 2}
    for r in out.values():
        assert r.n_trigrams == 1
        assert r.cross_entropy == 0.0


def test_perplexity_fixture_properties(spark, sf_dir):
    from go_mapreduce_spark.operators.text import x91_doc_perplexity

    rows = x91_doc_perplexity(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.n_trigrams >= 1
        assert r.cross_entropy >= 0.0


def test_share_of_total_sums_to_one(spark, sf_dir):
    from go_mapreduce_spark.operators.relational_ext import x92_share_of_total

    rows = x92_share_of_total(spark, sf_dir).collect()
    assert rows
    by_region: dict[str, list] = {}
    for r in rows:
        by_region.setdefault(r.r_name, []).append(r)
    for region, rs in by_region.items():
        assert abs(sum(x.share for x in rs) - 1.0) < 1e-4, region
        top = min(rs, key=lambda x: x.rnk)
        assert top.revenue == max(x.revenue for x in rs)


def test_string_agg_deterministic_and_complete(spark, sf_dir):
    from go_mapreduce_spark.operators.relational_ext import x93_string_agg
    from go_mapreduce_spark.sources.registry import load_table

    rows = x93_string_agg(spark, sf_dir).collect()
    li_n = load_table(spark, sf_dir, "lineitem").count()
    assert sum(r.n_parts for r in rows) == li_n
    for r in rows[:200]:
        parts = r.parts.split(",")
        assert len(parts) == r.n_parts
        assert parts == sorted(parts, key=int)


def test_measure_corr_bounds(spark, sf_dir):
    from go_mapreduce_spark.operators.analytics import x94_measure_corr

    r = x94_measure_corr(spark, sf_dir).collect()[0]
    assert r.n_rows > 0
    for c in (r.corr_qty_price, r.corr_qty_disc, r.corr_price_disc):
        assert -1.0 - 1e-9 <= c <= 1.0 + 1e-9
    # fixture measures are drawn independently: correlations near 0
    # (this also catches a formula error, which yields |corr| ≈ 1)
    assert abs(r.corr_qty_price) < 0.1


def test_dim_stats_envelope(spark, sf_dir):
    from go_mapreduce_spark.operators.clustering import x95_dim_stats

    rows = x95_dim_stats(spark, sf_dir).collect()
    assert len(rows) == 64
    counts = {r.n_vectors for r in rows}
    assert len(counts) == 1  # every vector has all 64 dims
    for r in rows:
        assert r.min_v <= r.mean_v <= r.max_v


def test_cumulative_users_monotone_and_conserving(spark, sf_dir):
    from go_mapreduce_spark.operators.analytics import x99_cumulative_users
    from go_mapreduce_spark.sources.registry import load_table

    rows = x99_cumulative_users(spark, sf_dir).collect()
    assert rows
    total_users = (
        load_table(spark, sf_dir, "events").select("user_id").distinct().count()
    )
    assert rows[-1].cum_users == total_users
    running = 0
    for r in rows:
        running += r.n_new
        assert r.cum_users == running


def test_topk_reports_are_exactly_k_and_ordered(spark, sf_dir):
    from go_mapreduce_spark.operators.relational_ext import (
        Q3_TOP_N,
        Q10_TOP_N,
        x97_shipping_priority,
        x98_returned_items,
    )

    q3 = x97_shipping_priority(spark, sf_dir).collect()
    assert len(q3) == Q3_TOP_N
    assert all(a.revenue >= b.revenue for a, b in zip(q3, q3[1:]))
    q10 = x98_returned_items(spark, sf_dir).collect()
    assert len(q10) == Q10_TOP_N
    assert all(a.revenue >= b.revenue for a, b in zip(q10, q10[1:]))
