"""In-session A/B bench: time gate variants toggled by an env var inside
ONE warm Spark session, interleaved A,B,A,B,... so shared-tenancy host
drift (CLAUDE.md: ±20-40% single-thread, up to 8x parallel across
minutes) hits both variants equally instead of whichever ran second.

Usage:
  python tools/ab_bench.py KEY=VAL_A:VAL_B name1,name2 [reps] [sf_dir]

Each rep builds the query fresh under the env value (variant resolution
must happen at query-construction time) and times .collect(). Session
memos shared by a family are warmed by one untimed pre-run of variant A
so neither variant is charged the family build. Reports per-gate
per-variant times and medians.
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from signalk_parquet_spark import registry  # noqa: E402
from signalk_parquet_spark.session import get_spark  # noqa: E402


def main() -> None:
    key, _, vals = sys.argv[1].partition("=")
    val_a, _, val_b = vals.partition(":")
    names = sys.argv[2].split(",")
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    sf_dir = sys.argv[4] if len(sys.argv) > 4 else "/root/testdata/sf0.1"
    spark = get_spark("ab-bench")
    for table in ("lineitem", "orders", "events", "documents", "embeddings"):
        try:
            registry.load(spark, sf_dir, table)
        except Exception:
            pass
    from signalk_parquet_spark.session import warm_worker_pool

    warm_worker_pool(spark)
    qs = registry.queries()

    # warm family memos once, untimed (variant A arbitrarily)
    os.environ[key] = val_a
    for n in names:
        qs[n](spark, sf_dir).collect()

    res: dict[tuple[str, str], list[float]] = {}
    for _ in range(reps):
        for val in (val_a, val_b):
            os.environ[val != val_a and key or key] = val
            for n in names:
                t0 = time.perf_counter()
                qs[n](spark, sf_dir).collect()
                res.setdefault((n, val), []).append(time.perf_counter() - t0)
    for (n, val), ts in res.items():
        print(
            f"{n:35s} {key}={val:>10s}  med={statistics.median(ts):6.3f}s "
            f" runs={[round(t, 3) for t in ts]}"
        )


if __name__ == "__main__":
    main()
