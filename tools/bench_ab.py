"""Same-HEAD A/B of a round's committed bench regressions.

Round-8 verdict discipline: the A/B set must be picked MECHANICALLY
from the committed diff's top regressions — every common query whose
committed wall grew by more than ``--min-delta`` seconds round-over-
round — not hand-picked.  Runs each selected query ``--reps`` times
(min = steady state) under the same harness conditions as bench.py
(tuned session, noop sink, cache cleared between runs, warmup at
sf0.001 first) and writes BENCH_AB_r{N}.json.

Usage:
    python tools/bench_ab.py 9 --prev /tmp/bench_r7.json \
        --curr BENCH_FULL.json [--min-delta 0.8] [--reps 5]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from go_mapreduce_spark.queries import QUERIES
from go_mapreduce_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
WARMUP = os.environ.get("SPARK_GRAFT_WARMUP_SF_DIR", "/root/testdata/sf0.001")


def pick_set(prev: dict, curr: dict, min_delta: float):
    pq, cq = prev["queries"], curr["queries"]
    regs = [
        (q, pq[q], cq[q])
        for q in cq
        if q in pq and cq[q] - pq[q] > min_delta
    ]
    regs.sort(key=lambda t: -(t[2] - t[1]))
    return regs


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("round_no", type=int)
    ap.add_argument("--prev", required=True, help="prior round BENCH_FULL detail")
    ap.add_argument("--curr", default="BENCH_FULL.json")
    ap.add_argument("--min-delta", type=float, default=0.8)
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument(
        "--force",
        nargs="*",
        default=[],
        help="query names to include regardless of the local delta "
        "(round-9 verdict ask #4: the selection must UNION the "
        "driver's committed regressions, which a differing local "
        "capture can miss)",
    )
    args = ap.parse_args()

    prev = json.load(open(args.prev))
    curr = json.load(open(args.curr))
    regs = pick_set(prev, curr, args.min_delta)
    picked = {q for q, _, _ in regs}
    for q in args.force:
        if q not in picked:
            regs.append(
                (q, prev["queries"].get(q, 0.0), curr["queries"].get(q, 0.0))
            )
    names = [q for q, _, _ in regs]
    print(f"mechanical A/B set ({len(names)} queries, delta>{args.min_delta}s):")
    for q, a, b in regs:
        print(f"  {q}: {a} -> {b}")

    spark = get_spark("bench-ab")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    calib = None
    for _ in range(3):
        t0 = time.perf_counter()
        spark.range(400_000_000).selectExpr("sum(id * 3 + 1)").collect()
        calib = min(calib or 9e9, round(time.perf_counter() - t0, 3))
    from go_mapreduce_spark.operators.relational import ensure_dpp_layout

    ensure_dpp_layout(spark, SF_DIR)
    for q in names:
        QUERIES[q](spark, WARMUP).write.format("noop").mode("overwrite").save()
        spark.catalog.clearCache()

    runs: dict[str, list[float]] = {}
    for q in names:
        samples = []
        for _ in range(args.reps):
            t0 = time.perf_counter()
            QUERIES[q](spark, SF_DIR).write.format("noop").mode("overwrite").save()
            samples.append(round(time.perf_counter() - t0, 3))
            spark.catalog.clearCache()
        runs[q] = samples
        print(f"  {q}: min {min(samples)} of {samples}")

    # calib normalization (round 12): the raw reproduces rule compares
    # this session's steady wall against the PREV capture's wall taken
    # on a possibly different host state.  When both captures carry a
    # calib probe, also adjudicate in calib-normalized units — the r12
    # A/B's two raw-rule "reproduces" (x65, x362) were both flat once
    # the 1.36× host-speed gap (calib 0.296 vs 0.217) was divided out.
    prev_calib = prev.get("calib_sec")
    verdicts = {}
    for q, prev_s, committed_s in regs:
        steady = min(runs[q])
        norm = (
            round(steady * prev_calib / calib, 3)
            if prev_calib and calib
            else None
        )
        verdicts[q] = {
            "prev_committed": prev_s,
            "curr_committed": committed_s,
            "steady_min_of_reps": steady,
            "steady_calib_norm": norm,
            "reproduces": steady > 1.2 * prev_s and steady - prev_s > 0.3,
            "reproduces_calib_norm": (
                norm > 1.2 * prev_s and norm - prev_s > 0.3
                if norm is not None
                else None
            ),
        }
    out = {
        "purpose": (
            f"round-{args.round_no} same-HEAD A/B of the committed bench's "
            f"top regressions, picked mechanically: every common query "
            f"with delta > {args.min_delta}s vs the prior round's detail"
        ),
        "selection_rule": (
            f"curr - prev > {args.min_delta}s, sorted by delta, "
            f"UNION forced driver regressions {sorted(args.force)}"
        ),
        "n": args.reps,
        "calib_sec": calib,
        "prev_calib_sec": prev_calib,
        "sf_dir": SF_DIR,
        "runs": runs,
        "verdicts": verdicts,
    }
    path = f"BENCH_AB_r{args.round_no:02d}.json"
    json.dump(out, open(path, "w"), indent=1)
    print(f"wrote {path}")
    spark.stop()


if __name__ == "__main__":
    main()
