"""Print the driver's 50-query correctness window and flag placement.

The driver correctness-checks only the FIRST 50 registered queries
(CLAUDE.md); any gate whose SEMANTICS changed this round must sit inside.
Usage: python tools/window_check.py [changed_gate ...]
Exits non-zero if a named gate is outside the window.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from signalk_parquet_spark import registry  # noqa: E402


def main() -> int:
    names = list(registry.queries())
    print(f"{len(names)} registered; window = first 50")
    for i, n in enumerate(names):
        mark = "|" if i == 49 else " "
        print(f"{i:3d}{mark} {n}")
    rc = 0
    for arg in sys.argv[1:]:
        if arg not in names:
            print(f"UNKNOWN gate: {arg}")
            rc = 1
        elif names.index(arg) >= 50:
            print(f"OUTSIDE WINDOW: {arg} at {names.index(arg)}")
            rc = 1
    return rc


if __name__ == "__main__":
    sys.exit(main())
