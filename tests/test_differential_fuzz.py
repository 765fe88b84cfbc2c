"""Differential fuzzing: hypothesis-generated inputs run through the
Spark operators AND an independent pure-Python reference; results
must match exactly.  Catches semantic drift that fixed fixtures and
the (self-written) DuckDB oracles could share."""

from __future__ import annotations

import re
from collections import Counter, defaultdict

from hypothesis import HealthCheck, given, settings, strategies as st
from pyspark.sql import functions as F

SLOW = settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

_WORDS = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta"]


def _write_events(spark, d, rows):
    """rows: list of (user_id, epoch_s, event_id)."""
    df = spark.createDataFrame(
        [(e, float(t), u, "a", 1.0, "{}") for u, t, e in rows],
        "event_id long, ts double, user_id long, event_type string, value double, props string",
    ).withColumn("ts", F.timestamp_seconds(F.col("ts")))
    df.write.mode("overwrite").parquet(f"{d}/events.parquet")


@SLOW
@given(
    st.lists(
        st.tuples(
            st.integers(0, 3),            # user_id
            st.integers(0, 10_000),       # epoch seconds
        ),
        min_size=1,
        max_size=40,
        unique=True,
    )
)
def test_sessionize_matches_python_reference(spark, tmp_path_factory, raw):
    from go_mapreduce_spark.operators.windows import (
        SESSION_GAP_SECONDS,
        x80_sessionize,
    )

    rows = [(u, t, i) for i, (u, t) in enumerate(raw)]
    d = str(tmp_path_factory.mktemp("fz"))
    _write_events(spark, d, rows)

    got = {
        (r.user_id, r.session_idx): (r.n_events, r.session_start.timestamp(), r.session_end.timestamp())
        for r in x80_sessionize(spark, d).collect()
    }

    by_user = defaultdict(list)
    for u, t, e in rows:
        by_user[u].append((t, e))
    want = {}
    for u, evs in by_user.items():
        evs.sort()
        idx = 0
        for i, (t, _e) in enumerate(evs):
            if i == 0 or t - evs[i - 1][0] > SESSION_GAP_SECONDS:
                idx += 1
                want[(u, idx)] = [0, t, t]
            want[(u, idx)][0] += 1
            want[(u, idx)][2] = t
    assert got == {k: (n, float(s), float(e2)) for k, (n, s, e2) in want.items()}


@SLOW
@given(
    st.lists(
        st.tuples(st.integers(1, 6), st.integers(10, 14)),  # (orderkey, partkey)
        min_size=0,
        max_size=40,
    )
)
def test_basket_pairs_matches_python_reference(spark, tmp_path_factory, rows):
    from go_mapreduce_spark.operators.analytics import (
        BASKET_MIN_SUPPORT,
        x87_basket_pairs,
    )

    d = str(tmp_path_factory.mktemp("fz"))
    spark.createDataFrame(
        [(ok, pk, 1, 1, 1.0, 1.0, 0.0, 0.0, "N", "O", None) for ok, pk in rows]
        or [(1, 10, 1, 1, 1.0, 1.0, 0.0, 0.0, "N", "O", None)][:0],
        "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber int, "
        "l_quantity double, l_extendedprice double, l_discount double, "
        "l_tax double, l_returnflag string, l_linestatus string, l_shipdate timestamp",
    ).write.mode("overwrite").parquet(f"{d}/lineitem.parquet")

    got = {
        (r.part_a, r.part_b): r.support for r in x87_basket_pairs(spark, d).collect()
    }

    baskets = defaultdict(set)
    for ok, pk in rows:
        baskets[ok].add(pk)
    support = Counter()
    for parts in baskets.values():
        ps = sorted(parts)
        for i in range(len(ps)):
            for j in range(i + 1, len(ps)):
                support[(ps[i], ps[j])] += 1
    want = {k: v for k, v in support.items() if v >= BASKET_MIN_SUPPORT}
    assert got == want


@SLOW
@given(
    st.lists(
        st.lists(st.sampled_from(_WORDS), min_size=0, max_size=12),
        min_size=1,
        max_size=8,
    )
)
def test_token_entropy_matches_python_reference(spark, tmp_path_factory, docs):
    import math

    from go_mapreduce_spark.operators.text import x81_token_entropy

    d = str(tmp_path_factory.mktemp("fz"))
    spark.createDataFrame(
        [(i, " ".join(words), "en", "s", 0) for i, words in enumerate(docs)],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.mode("overwrite").parquet(f"{d}/documents.parquet")

    got = {
        r.doc_id: (r.n_tokens, r.n_distinct, r.entropy)
        for r in x81_token_entropy(spark, d).collect()
    }

    want = {}
    for i, words in enumerate(docs):
        toks = [t for t in re.split(r"[^a-z]+", " ".join(words).lower()) if t]
        if not toks:
            continue
        c = Counter(toks)
        n = len(toks)
        ent = -sum((k / n) * math.log(k / n) for k in c.values())
        want[i] = (n, len(c), round(ent, 6))
    assert set(got) == set(want)
    for k in want:
        assert got[k][0] == want[k][0]
        assert got[k][1] == want[k][1]
        assert abs(got[k][2] - want[k][2]) < 2e-6


@SLOW
@given(
    st.lists(
        st.lists(st.sampled_from(_WORDS), min_size=0, max_size=10),
        min_size=1,
        max_size=10,
    )
)
def test_sorted_neighborhood_matches_python_reference(spark, tmp_path_factory, docs):
    from go_mapreduce_spark.operators.dedup import (
        SN_BLOCK_LEN,
        SN_MAX_DIST,
        SN_PREFIX_LEN,
        SN_WINDOW,
        x84_sorted_neighborhood,
    )

    d = str(tmp_path_factory.mktemp("fz"))
    spark.createDataFrame(
        [(i, " ".join(words), "en", "s", 0) for i, words in enumerate(docs)],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.mode("overwrite").parquet(f"{d}/documents.parquet")

    got = {
        (r.doc_id_a, r.doc_id_b): r.dist
        for r in x84_sorted_neighborhood(spark, d).collect()
    }

    def lev(a: str, b: str) -> int:
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(min(prev[j] + 1, cur[-1] + 1, prev[j - 1] + (ca != cb)))
            prev = cur
        return prev[-1]

    norms = {
        i: re.sub(r"[^a-z]", "", " ".join(words).lower())[:SN_PREFIX_LEN]
        for i, words in enumerate(docs)
    }
    blocks = defaultdict(list)
    for i in sorted(norms):
        blocks[norms[i][:SN_BLOCK_LEN]].append(i)
    want = {}
    for ids in blocks.values():
        for pos, a in enumerate(ids):
            for b in ids[pos + 1 : pos + 1 + SN_WINDOW]:
                dd = lev(norms[a], norms[b])
                if dd <= SN_MAX_DIST:
                    want[(a, b)] = dd
    assert got == want
