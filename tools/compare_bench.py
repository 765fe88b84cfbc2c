"""Diff two BENCH_FULL.json files: per-query ratios, regressions,
and the common-set total — the comparison the round judge makes.

    python tools/compare_bench.py OLD.json NEW.json [ratio_threshold]
"""

from __future__ import annotations

import json
import sys


def main() -> None:
    old_path, new_path = sys.argv[1], sys.argv[2]
    thresh = float(sys.argv[3]) if len(sys.argv) > 3 else 1.3
    old = json.load(open(old_path))["queries"]
    new = json.load(open(new_path))["queries"]
    common = sorted(set(old) & set(new))
    tot_o = sum(old[k] for k in common)
    tot_n = sum(new[k] for k in common)
    print(
        f"common {len(common)} queries: {tot_o:.1f}s -> {tot_n:.1f}s "
        f"(ratio {tot_n / tot_o:.3f})"
    )
    print(f"only-old: {sorted(set(old) - set(new))}")
    print(f"only-new: {sorted(set(new) - set(old))}")
    regs = sorted(
        ((new[k] / max(old[k], 1e-9), k) for k in common if new[k] > old[k] * thresh),
        reverse=True,
    )
    wins = sorted(
        ((old[k] / max(new[k], 1e-9), k) for k in common if old[k] > new[k] * thresh),
        reverse=True,
    )
    for tag, rows in (("REGRESSION", regs), ("WIN", wins)):
        for r, k in rows:
            print(f"{tag} {k}: {old[k]:.2f}s -> {new[k]:.2f}s ({r:.2f}x)")


if __name__ == "__main__":
    main()
