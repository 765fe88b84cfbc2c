"""Wave-6 operator tests: deterministic corpus shuffle, weighted
sampling, rolling windows, grouped regression, bloom join, and the
column profiler (queries x101–x106)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from go_mapreduce_spark.operators import analytics as AN
from go_mapreduce_spark.operators import curation as C
from go_mapreduce_spark.operators import scale as SC
from go_mapreduce_spark.sources.registry import load_table


# --- x101 corpus shuffle -------------------------------------------------

def test_corpus_shuffle_is_a_permutation(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    out = C.x101_corpus_shuffle(spark, sf_dir)
    assert out.count() == docs.count()
    assert out.select("doc_id").distinct().count() == docs.count()
    # positions are contiguous 1..n within every shard
    bad = (
        out.groupBy("shard")
        .agg(F.count(F.lit(1)).alias("n"), F.max("pos").alias("mx"), F.min("pos").alias("mn"))
        .filter((F.col("mx") != F.col("n")) | (F.col("mn") != 1))
        .count()
    )
    assert bad == 0


def test_corpus_shuffle_invariant_to_partitioning(spark, sf_dir):
    a = C.x101_corpus_shuffle(spark, sf_dir).collect()
    # same computation over a repartitioned source must agree row-for-row
    docs = load_table(spark, sf_dir, "documents").repartition(13)
    docs.createOrReplaceTempView("_shuffle_repart")
    key = F.sha2(F.concat(F.col("doc_id").cast("string"), F.lit(":shuffle")), 256)
    from pyspark.sql.window import Window

    shard = (F.instr(F.lit("0123456789abcdef"), F.substring(F.col("key"), 1, 1)) - 1).cast("bigint")
    b = (
        docs.select("doc_id", key.alias("key"))
        .withColumn("shard", shard)
        .withColumn("pos", F.row_number().over(Window.partitionBy("shard").orderBy("key")).cast("bigint"))
        .select("doc_id", "shard", "pos")
        .orderBy("shard", "pos")
        .collect()
    )
    assert a == b


def test_corpus_shuffle_order_is_mixed(spark, sf_dir):
    # the shuffle must not preserve doc_id order: within a shard,
    # consecutive positions should not be consecutive doc_ids
    rows = C.x101_corpus_shuffle(spark, sf_dir).filter(F.col("shard") == 0).collect()
    ids = [r.doc_id for r in sorted(rows, key=lambda r: r.pos)]
    monotone_runs = sum(1 for a, b in zip(ids, ids[1:]) if b == a + 1)
    assert monotone_runs < len(ids) / 4


# --- x102 weighted sample ------------------------------------------------

def test_weighted_sample_keeps_all_long_docs(spark, sf_dir):
    out = C.x102_weighted_sample(spark, sf_dir)
    docs = load_table(spark, sf_dir, "documents")
    n_long = docs.filter(F.col("n_chars") >= C.WEIGHTED_SAMPLE_FULL_CHARS).count()
    kept_long = out.filter(F.col("n_chars") >= C.WEIGHTED_SAMPLE_FULL_CHARS).count()
    assert kept_long == n_long  # rate 1.0 above the cap: threshold 'ffff' keeps every hash
    # and the sample is a strict subset overall (some short docs dropped)
    assert out.count() < docs.count()


def test_weighted_sample_rate_tracks_length(spark):
    # planted corpus: many docs at two length points; empirical keep
    # rates must bracket the analytic rates
    n = 2000
    rows = [(i, "x", "en", "s", 100) for i in range(n)] + [
        (i + n, "x", "en", "s", 300) for i in range(n)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string, source string, n_chars long")
    df.write.mode("overwrite").parquet("/tmp/wave6_docs/documents.parquet")
    out = C.x102_weighted_sample(spark, "/tmp/wave6_docs")
    k100 = out.filter(F.col("n_chars") == 100).count() / n
    k300 = out.filter(F.col("n_chars") == 300).count() / n
    assert abs(k100 - 0.25) < 0.05
    assert abs(k300 - 0.75) < 0.05


# --- x103 rolling revenue ------------------------------------------------

def test_rolling_revenue_frame_semantics(spark, sf_dir):
    rows = AN.x103_rolling_revenue(spark, sf_dir).collect()
    assert rows, "non-empty"
    # first row: ma7 == revenue, cum_max == revenue
    r0 = rows[0]
    assert abs(r0.ma7 - round(r0.revenue, 6)) < 1e-6
    assert r0.cum_max == r0.revenue
    # cum_max is monotone non-decreasing and >= revenue
    prev = float("-inf")
    for r in rows:
        assert r.cum_max >= r.revenue - 1e-9
        assert r.cum_max >= prev - 1e-9
        prev = r.cum_max
    # interior row: ma7 equals the mean of the trailing window
    if len(rows) > 10:
        i = 9
        window = [rows[j].revenue for j in range(i - 6, i + 1)]
        assert abs(rows[i].ma7 - round(sum(window) / 7, 6)) < 1e-4


# --- x104 grouped regression --------------------------------------------

def test_regr_matches_numpy(spark, sf_dir):
    np = pytest.importorskip("numpy")
    got = {r.l_returnflag: r for r in AN.x104_regr_by_group(spark, sf_dir).collect()}
    li = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_returnflag", "l_quantity", "l_extendedprice")
        .collect()
    )
    by_flag: dict[str, list] = {}
    for r in li:
        by_flag.setdefault(r.l_returnflag, []).append((r.l_quantity, r.l_extendedprice))
    for flag, pts in by_flag.items():
        x = np.array([p[0] for p in pts])
        y = np.array([p[1] for p in pts])
        slope, intercept = np.polyfit(x, y, 1)
        assert got[flag].n_rows == len(pts)
        assert abs(got[flag].slope - slope) < 1e-3
        assert abs(got[flag].intercept - intercept) < 1e-2
        r = np.corrcoef(x, y)[0, 1]
        assert abs(got[flag].r2 - r * r) < 1e-4


# --- x105 bloom join -----------------------------------------------------

def test_x105_bloom_filter_injected_when_forced(spark, sf_dir):
    """With injection thresholds opened up, Catalyst rewrites the x105
    plan to scan-side ``might_contain`` — the 100 TB shape."""
    from go_mapreduce_spark.plans.explain import formatted_plan

    keep = {
        "spark.sql.autoBroadcastJoinThreshold": spark.conf.get("spark.sql.autoBroadcastJoinThreshold"),
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": spark.conf.get(
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold"
        ),
    }
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set(
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0"
        )
        df = SC.x105_bloom_join(spark, sf_dir)
        plan = formatted_plan(df)
        assert "might_contain" in plan and "bloom_filter_agg" in plan
        forced = {(r.l_returnflag, r.n_items, round(r.revenue, 6)) for r in df.collect()}
    finally:
        for k, v in keep.items():
            spark.conf.set(k, v)
    plain = {
        (r.l_returnflag, r.n_items, round(r.revenue, 6))
        for r in SC.x105_bloom_join(spark, sf_dir).collect()
    }
    assert forced == plain  # the rewrite is cost-only, never semantic


# --- x106 column profile -------------------------------------------------

def test_column_profile_matches_duck(spark, sf_dir, duck):
    got = {r.column_name: r for r in AN.x106_column_profile(spark, sf_dir).collect()}
    assert set(got) == {c for c, _ in AN.PROFILE_COLS}
    for col, _num in AN.PROFILE_COLS:
        n_nulls, n_distinct = duck.execute(
            f"SELECT SUM(CASE WHEN {col} IS NULL THEN 1 ELSE 0 END), COUNT(DISTINCT {col}) FROM orders"
        ).fetchone()
        assert got[col].n_nulls == (n_nulls or 0)
        assert got[col].n_distinct == n_distinct


def test_column_profile_plan_shape(spark, sf_dir):
    # 5 exact multi-column distincts plan as ONE Expand-based
    # rewrite (RewriteDistinctAggregates), not 5 separate scans
    from go_mapreduce_spark.plans.explain import formatted_plan

    plan = formatted_plan(AN.x106_column_profile(spark, sf_dir))
    assert "Expand" in plan
    assert plan.count("Scan parquet") <= 2


# --- x107 keyword search -------------------------------------------------

def test_keyword_search_hits_contain_query_terms(spark, sf_dir):
    from go_mapreduce_spark.operators import text as T

    rows = T.x107_keyword_search(spark, sf_dir).collect()
    assert 0 < len(rows) <= T.SEARCH_TOP_N
    scores = [r.score for r in rows]
    assert scores == sorted(scores, reverse=True)
    assert all(1 <= r.n_terms_hit <= len(T.SEARCH_QUERY) for r in rows)
    # every hit really contains a query term
    docs = {
        r.doc_id: r.text
        for r in load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id").isin([r.doc_id for r in rows]))
        .collect()
    }
    for r in rows:
        toks = set(docs[r.doc_id].lower().split())
        assert toks & set(T.SEARCH_QUERY)


def test_keyword_search_topk_plan(spark, sf_dir):
    from go_mapreduce_spark.operators import text as T
    from go_mapreduce_spark.plans.explain import has_take_ordered

    assert has_take_ordered(T.x107_keyword_search(spark, sf_dir))


# --- x108 rolling anomaly ------------------------------------------------

def test_rolling_anomaly_flags_verified_in_python(spark, sf_dir):
    from go_mapreduce_spark.operators import analytics as AN

    flagged = AN.x108_rolling_anomaly(spark, sf_dir).collect()
    assert all(r.n_hist >= AN.ANOMALY_MIN_N for r in flagged)
    # recompute one flagged row's trailing stats from raw events
    if flagged:
        probe = flagged[0]
        ev = sorted(
            load_table(spark, sf_dir, "events")
            .filter(F.col("user_id") == probe.user_id)
            .select("event_id", "ts", "value")
            .collect(),
            key=lambda r: (r.ts, r.event_id),
        )
        idx = next(i for i, r in enumerate(ev) if r.event_id == probe.event_id)
        hist = [r.value for r in ev[max(0, idx - AN.ANOMALY_WINDOW):idx]]
        assert len(hist) == probe.n_hist
        mean = sum(hist) / len(hist)
        var = (sum(v * v for v in hist) - sum(hist) ** 2 / len(hist)) / (len(hist) - 1)
        assert abs(probe.mean_prev - mean) < 1e-4
        assert abs(probe.std_prev - max(var, 0.0) ** 0.5) < 1e-4
        assert probe.value > probe.mean_prev + AN.ANOMALY_Z * probe.std_prev


def test_rolling_anomaly_planted_spike(spark, tmp_path):
    from datetime import datetime, timedelta

    from go_mapreduce_spark.operators import analytics as AN

    base = datetime(2024, 1, 1)
    rows = [
        (i, base + timedelta(minutes=i), 1, "view", 10.0 + (i % 3) * 0.1, "{}")
        for i in range(30)
    ]
    rows.append((99, base + timedelta(minutes=99), 1, "view", 1000.0, "{}"))
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    )
    df.write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    flagged = AN.x108_rolling_anomaly(spark, str(tmp_path)).collect()
    assert [r.event_id for r in flagged] == [99]


# --- x109 shard manifest -------------------------------------------------

def test_shard_manifest_conserves_totals(spark, sf_dir):
    m = C.x109_shard_manifest(spark, sf_dir).collect()
    docs = load_table(spark, sf_dir, "documents")
    assert sum(r.n_docs for r in m) == docs.count()
    assert sum(r.total_chars for r in m) == docs.agg(F.sum("n_chars")).collect()[0][0]
    # shards agree with the x101 assignment
    shuffle_counts = {
        r.shard: r.n
        for r in C.x101_corpus_shuffle(spark, sf_dir)
        .groupBy("shard")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert {r.shard: r.n_docs for r in m} == shuffle_counts


def test_shard_manifest_fingerprint_partition_invariant(spark, sf_dir):
    a = {r.shard: r.fingerprint for r in C.x109_shard_manifest(spark, sf_dir).collect()}
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "3")
        b = {r.shard: r.fingerprint for r in C.x109_shard_manifest(spark, sf_dir).collect()}
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    assert a == b


# --- x110 time-range rolling ---------------------------------------------

def test_time_range_rolling_recomputed(spark, sf_dir):
    from go_mapreduce_spark.operators import windows as WIN

    out = WIN.x110_time_range_rolling(spark, sf_dir).collect()
    ev = load_table(spark, sf_dir, "events").select("event_id", "user_id", "ts", "value").collect()
    uid = ev[0].user_id
    mine = sorted((r for r in ev if r.user_id == uid), key=lambda r: r.ts)
    got = {r.event_id: r for r in out if r.user_id == uid}
    ms = lambda t: int(t.timestamp() * 1000)  # noqa: E731
    for r in mine:
        frame = [e for e in mine if 0 <= ms(r.ts) - ms(e.ts) <= WIN.RANGE_WINDOW_MS]
        assert got[r.event_id].n_1h == len(frame)
        assert abs(got[r.event_id].sum_1h - sum(e.value for e in frame)) < 1e-4


def test_time_range_vs_rows_frame_differs(spark, sf_dir):
    # RANGE semantics are genuinely time-based: some user must have a
    # trailing-hour count that is not simply "all preceding rows"
    from go_mapreduce_spark.operators import windows as WIN

    out = WIN.x110_time_range_rolling(spark, sf_dir)
    n_users_with_bounded = (
        out.groupBy("user_id")
        .agg(F.max("n_1h").alias("mx"), F.count(F.lit(1)).alias("n"))
        .filter(F.col("mx") < F.col("n"))
        .count()
    )
    assert n_users_with_bounded > 0


# --- x111 corpus drift ---------------------------------------------------

def test_corpus_drift_planted(spark, tmp_path):
    from go_mapreduce_spark.operators import text as T

    # corpus A says "alpha" constantly, B says "beta"; drift report
    # must surface both with opposite-signed contributions
    rows = [(i, "alpha common word", "en", "s", 10) for i in range(50)]
    rows += [(100 + i, "beta common word", "de", "s", 10) for i in range(50)]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string, source string, n_chars long")
    df.write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    out = {r.tok: r for r in T.x111_corpus_drift(spark, str(tmp_path)).collect()}
    assert out["alpha"].kl_contrib > 0  # overrepresented in A
    assert out["beta"].kl_contrib < 0   # A nearly never says it
    assert out["alpha"].cnt_a == 50 and out["alpha"].cnt_b == 0


def test_corpus_drift_identical_corpora_is_flat(spark, tmp_path):
    from go_mapreduce_spark.operators import text as T

    rows = [(i, "same words here", "en", "s", 10) for i in range(30)]
    rows += [(100 + i, "same words here", "de", "s", 10) for i in range(30)]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string, source string, n_chars long")
    df.write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    for r in T.x111_corpus_drift(spark, str(tmp_path)).collect():
        assert abs(r.kl_contrib) < 1e-9


# --- x112 heavy hitters --------------------------------------------------

def test_misra_gries_guarantee_on_planted_skew(spark):
    from go_mapreduce_spark.operators.sketches import misra_gries_candidates

    # 100k rows: 'hot' is 20%, 1000 distinct cold values share the rest;
    # capacity 10 → threshold 10% → 'hot' MUST be a candidate
    rows = [("hot",)] * 20000 + [(f"cold{i % 1000}",) for i in range(80000)]
    df = spark.createDataFrame(rows, "tok string").repartition(8)
    cands = {r.tok for r in misra_gries_candidates(df, "tok", capacity=10).collect()}
    assert "hot" in cands
    assert len(cands) <= 8 * 10  # bounded by partitions x capacity


def test_heavy_hitters_equal_naive_groupby(spark, sf_dir):
    from go_mapreduce_spark.operators.dedup import lower_tokens
    from go_mapreduce_spark.operators.sketches import HH_CAPACITY, x112_heavy_hitters

    got = {(r.tok, r.cnt) for r in x112_heavy_hitters(spark, sf_dir).collect()}
    terms = (
        load_table(spark, sf_dir, "documents")
        .select(F.explode(lower_tokens(F.col("text"))).alias("tok"))
    )
    n = terms.count()
    exact = {
        (r.tok, r.cnt)
        for r in terms.groupBy("tok").agg(F.count(F.lit(1)).alias("cnt")).collect()
        if r.cnt > n / HH_CAPACITY
    }
    assert got == exact
