"""Property tests for the wave-19 operators: in-plan logistic trainer
(x185), calibration bins (x186), JL distortion audit (x187),
time-weighted average (x188), and exact Gini (x189)."""

from __future__ import annotations

import hashlib
import math

from pyspark.sql import functions as F


def _doc_features(spark, sf_dir):
    """Collected (alpha_ratio, stopword_ratio, y) with x185's rounding."""
    import re

    from go_mapreduce_spark.operators.text import EN_STOPWORDS
    from go_mapreduce_spark.sources.registry import load_table

    out = []
    for r in load_table(spark, sf_dir, "documents").select("text", "lang").collect():
        tl = len(r.text)
        al = len(re.sub(r"[^A-Za-z]", "", r.text))
        toks = [t for t in re.split(r"[^a-z]+", r.text.lower()) if t]
        sw = sum(1 for t in toks if t in EN_STOPWORDS)
        fa = round(al / tl, 6) if tl else 0.0
        fs = round(sw / len(toks), 6) if toks else 0.0
        out.append((fa, fs, 1.0 if r.lang == "en" else 0.0))
    return out


def test_logreg_matches_python_replay(spark, sf_dir):
    """Full-batch GD with the rational link, replayed in plain Python
    with the same 12-dp rounding — weights and MSE must agree."""
    from go_mapreduce_spark.operators.clustering import (
        LOGREG_LR,
        LOGREG_ROUNDS,
        x185_logreg_train,
    )

    feats = _doc_features(spark, sf_dir)
    n = float(len(feats))
    w1 = w2 = b = 0.0
    sig = lambda z: 0.5 + 0.5 * z / (1.0 + abs(z))
    for _ in range(LOGREG_ROUNDS):
        g1 = g2 = gb = 0.0
        for fa, fs, y in feats:
            d = sig(w1 * fa + w2 * fs + b) - y
            g1 += round(d * fa, 12)
            g2 += round(d * fs, 12)
            gb += round(d, 12)
        w1, w2, b = (
            w1 - LOGREG_LR * g1 / n,
            w2 - LOGREG_LR * g2 / n,
            b - LOGREG_LR * gb / n,
        )
    sse = sum(
        round((sig(w1 * fa + w2 * fs + b) - y) ** 2, 12) for fa, fs, y in feats
    )
    row = x185_logreg_train(spark, sf_dir).collect()[0]
    assert abs(row.w1 - round(w1, 8)) < 1e-7
    assert abs(row.w2 - round(w2, 8)) < 1e-7
    assert abs(row.bias - round(b, 8)) < 1e-7
    assert abs(row.train_mse - round(sse / n, 8)) < 1e-7
    # the trainer must actually improve on the all-zero model, whose
    # per-row squared residual is exactly 0.25
    assert row.train_mse < 0.25


def test_calibration_bins_conserve_and_bound(spark, sf_dir):
    from go_mapreduce_spark.operators.text import x186_quality_calibration
    from go_mapreduce_spark.sources.registry import load_table

    rows = x186_quality_calibration(spark, sf_dir).collect()
    n_docs = load_table(spark, sf_dir, "documents").count()
    assert sum(r.n_docs for r in rows) == n_docs
    for r in rows:
        assert 0.0 <= r.pos_rate <= 1.0
        assert 0.0 <= r.bin_brier <= 1.0
        # mean score must sit inside the bin's nominal range (last bin
        # absorbs q = 1.0)
        lo, hi = r.bin / 10, (r.bin + 1) / 10 + (0.1 if r.bin == 9 else 0)
        assert lo - 1e-9 <= r.mean_score <= hi + 1e-9


def test_jl_projection_matches_numpy(spark, sf_dir):
    """Replay the sha256 sign matrix and the fold order in numpy."""
    import numpy as np

    from go_mapreduce_spark.operators.similarity import (
        JL_DIM,
        x187_jl_distortion,
    )
    from go_mapreduce_spark.sources.registry import load_table

    emb = {
        r.vec_id: np.array(r.embedding, dtype=np.float64)
        for r in load_table(spark, sf_dir, "embeddings").collect()
    }

    def project(a):
        out = []
        for j in range(JL_DIM):
            acc = 0.0
            for i, x in enumerate(a):
                h = hashlib.sha256(f"{j}:{i}".encode()).hexdigest()[0]
                acc = acc + (1.0 if h in "01234567" else -1.0) * float(x)
            out.append(acc)
        return np.array(out)

    for r in x187_jl_distortion(spark, sf_dir).collect():
        qp, np_ = project(emb[r.query_id]), project(emb[r.neighbor_id])
        pc = float(qp @ np_) / (
            math.sqrt(float(qp @ qp)) * math.sqrt(float(np_ @ np_))
        )
        assert abs(r.proj_cos - round(pc, 6)) < 1e-5
        assert abs(r.distortion - round(abs(r.proj_cos - r.orig_cos), 6)) < 1e-9


def test_twap_replay_and_bounds(spark, sf_dir):
    from go_mapreduce_spark.operators.analytics import x188_time_weighted_avg
    from go_mapreduce_spark.sources.registry import load_table

    ev = {}
    for r in (
        load_table(spark, sf_dir, "events")
        .select("user_id", F.unix_micros("ts").alias("t"), "event_id", "value")
        .collect()
    ):
        ev.setdefault(r.user_id, []).append((r.t, r.event_id, r.value))
    for row in x188_time_weighted_avg(spark, sf_dir).collect():
        pts = sorted(ev[row.user_id])
        area = sum(
            v * (pts[i + 1][0] - t) for i, (t, _, v) in enumerate(pts[:-1])
        )
        span = pts[-1][0] - pts[0][0]
        assert span > 0
        assert abs(row.twap - area / span) < 1e-4
        vals = [v for _, _, v in pts[:-1]]  # last value has zero weight
        assert min(vals) - 1e-6 <= row.twap <= max(vals) + 1e-6


def test_gini_matches_numpy_and_bounds(spark, sf_dir):
    import numpy as np

    from go_mapreduce_spark.operators.analytics import x189_revenue_gini
    from go_mapreduce_spark.sources.registry import load_table

    rev = (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(F.sum("o_totalprice").alias("rev"))
        .collect()
    )
    x = np.sort(np.array([r.rev for r in rev], dtype=np.float64))
    n = len(x)
    expected = 2.0 * float((np.arange(1, n + 1) * x).sum()) / (
        n * float(x.sum())
    ) - (n + 1) / n
    row = x189_revenue_gini(spark, sf_dir).collect()[0]
    assert row.n_customers == n
    assert abs(row.gini - expected) < 1e-6
    assert 0.0 <= row.gini < 1.0
