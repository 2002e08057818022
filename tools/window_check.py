"""Print the driver's 50-query correctness window and flag placement.

The driver correctness-checks only the FIRST 50 registered queries
(CLAUDE.md); any gate whose SEMANTICS changed this round must sit inside.
Usage: python tools/window_check.py [--suggest] [changed_gate ...]
Exits non-zero if a named gate is outside the window.

``--suggest`` computes the NEXT round's rotation from the
CORRECTNESS_r*.json union (the rotation policy, mechanically): gates with
no driver row in any round first (registration order — new gates land
here automatically), then everything else by ascending last-green round,
ties in registration order. Hand-copying the stale list is how the r6
backlog happened; this makes the policy a one-command computation. The
output is a SUGGESTION — keep families contiguous and pull in any gate
whose semantics the round edits before pasting into _WINDOW_FIRST.
"""

from __future__ import annotations

import glob
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from signalk_parquet_spark import registry  # noqa: E402


def last_green_rounds(repo_root: str) -> dict[str, int]:
    """gate -> latest round with a CORRECTNESS row (any result: the policy
    rotates on evidence AGE, and red rows get re-windowed as 'edited')."""
    last: dict[str, int] = {}
    for f in sorted(glob.glob(os.path.join(repo_root, "CORRECTNESS_r*.json"))):
        try:
            rnd = int("".join(ch for ch in os.path.basename(f) if ch.isdigit()))
            for k in json.load(open(f)):
                last[k] = max(last.get(k, 0), rnd)
        except (ValueError, json.JSONDecodeError):
            continue
    return last


def suggest(names: list[str], last: dict[str, int]) -> list[str]:
    # ties break in TRUE registration order, not the _WINDOW_FIRST-rotated
    # queries() order — the rotated order would rank currently-windowed
    # gates ahead of equally-stale siblings and split families
    reg_pos = {n: i for i, n in enumerate(registry.registration_order())}
    # .get fallback: a name registered by some future non-register() path
    # sorts last instead of crashing the suggester
    return sorted(
        names, key=lambda n: (last.get(n, -1), reg_pos.get(n, len(reg_pos)))
    )[:50]


def main() -> int:
    names = list(registry.queries())
    args = [a for a in sys.argv[1:] if a != "--suggest"]
    if "--suggest" in sys.argv[1:]:
        root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        last = last_green_rounds(root)
        print("suggested next window (never-checked first, then stalest):")
        for n in suggest(names, last):
            rnd = last.get(n)
            print(f"  {'never' if rnd is None else f'r{rnd:02d}':>5}  {n}")
        return 0
    print(f"{len(names)} registered; window = first 50")
    for i, n in enumerate(names):
        mark = "|" if i == 49 else " "
        print(f"{i:3d}{mark} {n}")
    rc = 0
    for arg in args:
        if arg not in names:
            print(f"UNKNOWN gate: {arg}")
            rc = 1
        elif names.index(arg) >= 50:
            print(f"OUTSIDE WINDOW: {arg} at {names.index(arg)}")
            rc = 1
    return rc


if __name__ == "__main__":
    sys.exit(main())
