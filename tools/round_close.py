"""Mechanical round-close gate (round-6 verdict ask #2).

Round-close bookkeeping lagged the final waves in rounds 5 AND 6:
committed sweeps / PLANS.md / COVERAGE.md / README counts recorded a
smaller registry than HEAD actually declared, so the newest queries
had no committed green record.  This script makes the checklist a
hard assert instead of a reminder:

    python tools/round_close.py <round-number>

Checks (all must pass, exit 1 otherwise):
  a. CORRECTNESS_LOCAL_r{N}.json and CORRECTNESS_LOCAL_r{N}_sf0001.json
     exist, cover EVERY query in the live registry, and have 0 failures
     (an entry fails if any *_match field is False or err is an error).
  b. PLANS.md has a `## <query>` section for every registry query.
  c. COVERAGE.md has a `| wave N ` row for every wave number that
     appears in `git log` subjects.
  d. README.md mentions the exact live registry / oracle counts.
  e. BENCH_FULL_PREV.json carries a recorded head that differs from
     the current HEAD (i.e. it was rotated, not this round's own run).

Round-close also runs the FULL plan-lint sweep (round 13: the default
pytest run lints a deterministic subset so the suite fits the external
driver's budget; the 432-query sweep moves here):

    SPARK_GRAFT_FULL_SWEEP=1 python -m pytest \
        tests/test_window_lint.py -q
"""

from __future__ import annotations

import json
import os
import re
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

FAILURES: list[str] = []


def check(ok: bool, msg: str) -> None:
    print(("PASS " if ok else "FAIL ") + msg)
    if not ok:
        FAILURES.append(msg)


def main() -> int:
    if len(sys.argv) != 2:
        print(__doc__)
        return 2
    rnd = int(sys.argv[1])

    from go_mapreduce_spark.queries import ORACLE_SQL, QUERIES

    n_q, n_o = len(QUERIES), len(ORACLE_SQL)
    print(f"live registry: {n_q} queries, {n_o} oracles")

    # (a) sweeps
    for path in (
        os.path.join(REPO, f"CORRECTNESS_LOCAL_r{rnd}.json"),
        os.path.join(REPO, f"CORRECTNESS_LOCAL_r{rnd}_sf0001.json"),
    ):
        name = os.path.basename(path)
        if not os.path.isfile(path):
            check(False, f"{name} exists")
            continue
        d = json.load(open(path))
        missing = sorted(set(QUERIES) - set(d))
        check(
            not missing,
            f"{name} covers all {n_q} registry queries"
            + (f" (missing {len(missing)}: {missing[:5]}...)" if missing else ""),
        )
        bad = {
            k: v
            for k, v in d.items()
            if any(v.get(f) is False for f in ("rows_match", "schema_match", "hash_match"))
            or (v.get("err") not in (None, "no_oracle"))
        }
        check(not bad, f"{name} has 0 failures" + (f" (bad: {sorted(bad)[:5]})" if bad else ""))

    # (b) PLANS.md
    plans = open(os.path.join(REPO, "PLANS.md")).read()
    plan_heads = set(re.findall(r"^## (\S+)", plans, re.M))
    missing = sorted(set(QUERIES) - plan_heads)
    check(
        not missing,
        f"PLANS.md has a section for all {n_q} queries"
        + (f" (missing {len(missing)}: {missing[:5]}...)" if missing else ""),
    )

    # (c) COVERAGE.md wave rows
    log = subprocess.run(
        ["git", "-C", REPO, "log", "--oneline"], capture_output=True, text=True
    ).stdout
    waves_in_log = {int(w) for w in re.findall(r"\b[Ww]ave (\d+)", log)}
    cov = open(os.path.join(REPO, "COVERAGE.md")).read()
    # wave rows appear as `| wave N (round R) |` table rows (round 5+)
    # or `Wave(s) N[–M][suffix] (round R):` headings (rounds 1-4) —
    # anchored to those two LINE-START shapes so a prose
    # cross-reference to "wave N" elsewhere cannot satisfy the gate
    # (round-7 ADVICE); range headings like `Waves 7–8` expand
    waves_in_cov = set()
    for lo, hi in re.findall(
        r"^(?:\| *)?[Ww]aves? (\d+)(?:[–-](\d+))?[a-z]{0,2} *\(",
        cov,
        re.M,
    ):
        lo = int(lo)
        for w in range(lo, (int(hi) if hi else lo) + 1):
            waves_in_cov.add(w)
    missing_w = sorted(waves_in_log - waves_in_cov)
    check(
        not missing_w,
        "COVERAGE.md has a row for every wave in git log"
        + (f" (missing waves: {missing_w})" if missing_w else ""),
    )

    # (d) README counts
    readme = open(os.path.join(REPO, "README.md")).read()
    check(
        f"QUERIES ({n_q})" in readme and f"ORACLE_SQL ({n_o}" in readme,
        f"README.md states QUERIES ({n_q}) + ORACLE_SQL ({n_o})",
    )
    check(f"{n_o}/{n_q}" in readme, f"README.md states oracle coverage {n_o}/{n_q}")

    # (f) BENCH_FULL timed set reconciles with the registry BY RULE
    # (round-11 verdict ask #5): every timed name is either a registry
    # query or one of bench.py's declared recall-gate timings — no
    # untracked bench-only entries, no registry query silently untimed.
    bench_full = os.path.join(REPO, "BENCH_FULL.json")
    if not os.path.isfile(bench_full):
        check(False, "BENCH_FULL.json exists")
    else:
        import bench as bench_mod

        timed = set(json.load(open(bench_full)).get("queries", {}))
        allowed = set(QUERIES) | set(bench_mod.BENCH_ONLY_TIMED)
        extra = sorted(timed - allowed)
        untimed = sorted(set(QUERIES) - timed)
        check(
            not extra,
            "BENCH_FULL.json has no timed names outside QUERIES ∪ BENCH_ONLY_TIMED"
            + (f" (extra: {extra[:5]})" if extra else ""),
        )
        check(
            not untimed,
            "BENCH_FULL.json times every registry query"
            + (f" (untimed: {untimed[:5]})" if untimed else ""),
        )

    # (e) bench prev rotation
    head = subprocess.run(
        ["git", "-C", REPO, "rev-parse", "HEAD"], capture_output=True, text=True
    ).stdout.strip()
    prev_path = os.path.join(REPO, "BENCH_FULL_PREV.json")
    if not os.path.isfile(prev_path):
        check(False, "BENCH_FULL_PREV.json exists")
    else:
        prev = json.load(open(prev_path))
        ph = prev.get("head")
        check(bool(ph), "BENCH_FULL_PREV.json records the head it ran at")
        check(ph != head, "BENCH_FULL_PREV.json head differs from current HEAD (rotated)")

    print()
    if FAILURES:
        print(f"round_close: {len(FAILURES)} CHECK(S) FAILED")
        return 1
    print("round_close: all checks passed")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
