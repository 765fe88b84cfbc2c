"""Scale validation at sf1 (10× the bench fixture): time the most
expensive registry queries at sf0.1 and at the key-shifted sf1 twin
(tools/make_scale_fixture.py) and record ratio + log-log exponent.

The fixture replicates sf0.1 with bijective content perturbations so
the data stays linear (see make_scale_fixture's docstring for the two
fixture-honesty lessons); a query whose wall grows superlinearly at
10× data is a PLAN defect worth a verdict line, not host noise —
min-of-N per (query, sf) keeps transient /tmp contention out of the
reading (the round-7 BENCH_AB lesson).

Usage::

    python tools/bench_sf1.py [sf1_dir] [n_runs] [query ...]

Default query set: the union of the top-15 by current BENCH_FULL cost
and any names passed on the command line.  Writes BENCH_SF1.json.
"""

from __future__ import annotations

import json
import math
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF01 = "/root/testdata/sf0.1"


def main() -> int:
    sf1_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/gms_sf1"
    n_runs = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    extra = sys.argv[3:]

    from go_mapreduce_spark.queries import QUERIES
    from go_mapreduce_spark.session import get_spark

    if not os.path.isdir(os.path.join(sf1_dir)) or not os.path.isfile(
        os.path.join(sf1_dir, "lineitem.parquet", "_SUCCESS")
    ):
        print(
            f"sf1 fixture missing at {sf1_dir}: run "
            f"`python tools/make_scale_fixture.py {sf1_dir} 10` first",
            file=sys.stderr,
        )
        return 2

    full = json.load(open(os.path.join(REPO, "BENCH_FULL.json")))
    costed = {
        k: v for k, v in full["queries"].items() if k in QUERIES
    }
    names = [k for k, _ in sorted(costed.items(), key=lambda kv: -kv[1])[:15]]
    for q in extra:
        if q not in names:
            names.append(q)

    spark = get_spark("bench-sf1")
    head = subprocess.run(
        ["git", "-C", REPO, "rev-parse", "HEAD"],
        capture_output=True, text=True,
    ).stdout.strip()

    runs: dict[str, dict] = {}
    for name in names:
        fn = QUERIES[name]
        walls = {}
        for label, d in (("sf0.1", SF01), ("sf1", sf1_dir)):
            best = None
            for _ in range(n_runs):
                t0 = time.perf_counter()
                fn(spark, d).write.format("noop").mode("overwrite").save()
                w = time.perf_counter() - t0
                best = w if best is None else min(best, w)
                spark.catalog.clearCache()
            walls[label] = round(best, 3)
        ratio = round(walls["sf1"] / walls["sf0.1"], 3)
        runs[name] = {
            "sf0.1_sec": walls["sf0.1"],
            "sf1_sec": walls["sf1"],
            "ratio": ratio,
            "exponent": round(math.log10(max(ratio, 1e-9)), 3),
        }
        print(
            f"{name}: sf0.1={walls['sf0.1']}s sf1={walls['sf1']}s "
            f"ratio={ratio} exp={runs[name]['exponent']}",
            file=sys.stderr,
        )

    worst = max(r["ratio"] for r in runs.values())
    out = {
        "purpose": (
            "scale validation: the most expensive registry queries at "
            "sf1 (10x the bench fixture) vs sf0.1, min-of-%d per cell, "
            "one warmed session" % n_runs
        ),
        "fixture": (
            "10x key-shifted replication of sf0.1 via "
            "tools/make_scale_fixture.py (bijective per-copy token "
            "mapping; embeddings rotated per copy)"
        ),
        "head": head,
        "runs": runs,
        "worst_ratio": worst,
        "gate": "ratio <= 10 is sublinear at 10x data; > 15 is the superlinear audit bar",
    }
    path = os.path.join(REPO, "BENCH_SF1.json")
    with open(path, "w") as fh:
        json.dump(out, fh, indent=1)
        fh.write("\n")
    print(json.dumps({"worst_ratio": worst, "n": len(runs), "file": "BENCH_SF1.json"}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
