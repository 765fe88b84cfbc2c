"""Property tests for wave 22: cross-split leakage census (x195) and
media byte-frequency audit (x196)."""

from __future__ import annotations

import hashlib
import re
from collections import Counter


def test_split_leakage_matches_python_replay(spark, sf_dir):
    from go_mapreduce_spark.operators.curation import (
        SPLIT_TRAIN_LT,
        SPLIT_VAL_LT,
        x195_split_leakage,
    )
    from go_mapreduce_spark.sources.registry import load_table

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text").collect()

    def split_of(doc_id):
        p = hashlib.sha256(str(doc_id).encode()).hexdigest()[:2]
        return "train" if p < SPLIT_TRAIN_LT else ("val" if p < SPLIT_VAL_LT else "test")

    def shingles(text):
        toks = [t for t in re.split(r"[^a-z]+", text.lower()) if t]
        return {
            " ".join(toks[i : i + 3]) for i in range(len(toks) - 2)
        }

    train_sh: set = set()
    test_docs = {}
    for r in docs:
        s = split_of(r.doc_id)
        if s == "train":
            train_sh |= shingles(r.text)
        elif s == "test":
            test_docs[r.doc_id] = shingles(r.text)

    out = {r.doc_id: r for r in x195_split_leakage(spark, sf_dir).collect()}
    assert set(out) == set(test_docs)
    for d, sh in test_docs.items():
        leaked = len(sh & train_sh)
        assert out[d].n_shingles == len(sh)
        assert out[d].n_leaked == leaked
        if sh:
            assert abs(out[d].leak_frac - round(leaked / len(sh), 6)) < 1e-9


def test_byte_frequency_matches_python_replay(spark, sf_dir):
    from go_mapreduce_spark.operators.multimodal import (
        FIXTURE_PATH,
        x196_byte_frequency_audit,
    )

    media = {
        r.media_id: bytes(r.payload)
        for r in spark.read.parquet(FIXTURE_PATH).collect()
    }
    for r in x196_byte_frequency_audit(spark, sf_dir).collect():
        payload = media[r.media_id]
        c = Counter(payload)
        assert r.n_bytes == len(payload)
        assert r.n_distinct_bytes == len(c)
        mc = max(c.values())
        top = min(b for b, k in c.items() if k == mc)
        assert r.top_byte == f"{top:02X}"
        assert abs(r.top_share - round(mc / len(payload), 6)) < 1e-9
