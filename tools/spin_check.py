"""Host-CPU sanity probe (the CLAUDE.md "spin check", now canonical).

Shared-tenancy hosts fluctuate ±20-40% — and, worse, PARALLEL throughput
degrades independently of single-thread speed (r4 observed identical Spark
queries swinging 8x while the single-thread spin moved only 1.4x). Before
chasing any bench delta, run this and compare BOTH numbers against the
session's own baseline — if either is high, the box is slow, not the code.
Prints one JSON line.

Usage: python tools/spin_check.py [n_reps]
"""

from __future__ import annotations

import json
import multiprocessing as mp
import sys
import time

N = 20_000_000
PAR = 16


def _spin(_=None) -> int:
    x = 0
    for i in range(N):
        x += i
    return x


def spin_once() -> float:
    t0 = time.perf_counter()
    assert _spin() == N * (N - 1) // 2
    return time.perf_counter() - t0


def spin_parallel() -> float:
    """Wall time for PAR processes spinning at once — on an unloaded
    32-core box this should be ~the single-proc time; a 2-3x ratio means
    all-core throughput is degraded and Spark (32 threads) will be hit far
    harder than any single-threaded probe suggests."""
    t0 = time.perf_counter()
    with mp.Pool(PAR) as p:
        p.map(_spin, range(PAR))
    return time.perf_counter() - t0


if __name__ == "__main__":
    reps = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    times = [round(spin_once(), 3) for _ in range(reps)]
    par = round(spin_parallel(), 3)
    print(
        json.dumps(
            {
                "spin_sec": times,
                "min": min(times),
                "par16_sec": par,
                "par_ratio": round(par / min(times), 2),
                "n": N,
            }
        )
    )
