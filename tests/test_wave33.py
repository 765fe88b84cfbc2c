"""Wave 33: greedy LM decode (x224)."""

from __future__ import annotations

import re
from collections import Counter


def test_greedy_decode_matches_python_lm(spark, sf_dir):
    """Replay the whole decode in Python: same tokenizer, same
    trigram counts, same argmax-with-lexicographic-ties policy."""
    from go_mapreduce_spark.operators.text import (
        DECODE_STEPS,
        x224_greedy_decode,
    )
    from go_mapreduce_spark.sources.registry import load_table

    tris: Counter = Counter()
    bis: Counter = Counter()
    for r in load_table(spark, sf_dir, "documents").select("text").collect():
        toks = [t for t in re.split(r"[^a-z]+", r.text.lower()) if t]
        for i in range(len(toks) - 2):
            tris[(f"{toks[i]} {toks[i+1]}", toks[i + 2])] += 1
        for i in range(len(toks) - 1):
            bis[f"{toks[i]} {toks[i+1]}"] += 1
    ctx = min(bis, key=lambda b: (-bis[b], b))
    expected = []
    for step in range(1, DECODE_STEPS + 1):
        cands = [(w, c) for (c2, w), c in tris.items() if c2 == ctx]
        if not cands:
            break
        w, c = min(cands, key=lambda p: (-p[1], p[0]))
        expected.append((step, ctx, w, c))
        ctx = ctx.split(" ")[1] + " " + w
    got = [
        (r.step, r.ctx, r.token, r.c3)
        for r in x224_greedy_decode(spark, sf_dir).collect()
    ]
    assert got == expected
    assert len(got) >= 1  # the decode actually produced text
