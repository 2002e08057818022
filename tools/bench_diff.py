"""Compare two bench.py JSON lines with host-state context.

Usage: python tools/bench_diff.py OLD.json NEW.json [threshold_ratio]

Prints per-query ratios (new/old) exceeding the threshold (default 1.5x),
plus the host probes of both runs — because the documented ±20-40 %
single-thread and up-to-8x parallel host swings (tools/spin_check.py)
produce bigger deltas than most real regressions, a delta only matters if
the host ratios don't explain it. The decisive protocol when they don't:
isolated SPARK_GRAFT_BENCH_ONLY reruns, or the same queries at the old
commit in a git worktree on today's host (CLAUDE.md).
"""

from __future__ import annotations

import json
import sys


def load(path: str) -> dict:
    with open(path) as f:
        return json.loads(f.read().strip().splitlines()[-1])


def main() -> int:
    old, new = load(sys.argv[1]), load(sys.argv[2])
    thr = float(sys.argv[3]) if len(sys.argv) > 3 else 1.5
    print(f"old total {old['value']}s ({len(old['queries'])} queries), host {old.get('host')}")
    print(f"new total {new['value']}s ({len(new['queries'])} queries), host {new.get('host')}")
    oh, nh = old.get("host") or {}, new.get("host") or {}
    if oh.get("par16_sec") and nh.get("par16_sec"):
        print(f"host par16 ratio new/old: {nh['par16_sec'] / oh['par16_sec']:.2f} "
              "(deltas below this are host, not code)")
    rows = []
    for k, v in new["queries"].items():
        if k in old["queries"] and old["queries"][k] > 0:
            r = v / old["queries"][k]
            if r >= thr or r <= 1 / thr:
                rows.append((r, k, old["queries"][k], v))
    for r, k, o, n in sorted(rows, reverse=True):
        print(f"{r:6.2f}x  {k}: {o} -> {n}")
    only_new = sorted(set(new["queries"]) - set(old["queries"]))
    if only_new:
        print("new-only queries:", " ".join(only_new))
    return 0


if __name__ == "__main__":
    sys.exit(main())
