"""Per-query job-level profile: run named gates, then read the local
Spark UI REST API for per-job wall time and stage shapes.

Usage: python tools/profile_query.py name1,name2,... [sf_dir]

For each gate: wall-clock around .collect(), then the job list (id,
duration, #tasks, description) attributed to it via setJobDescription —
the §1.5/§7.1 measurement loop of the optimization guide, in a sandbox
with no browser. Warm-up mirrors bench.py (table cache + worker pool) so
numbers reflect the warmed per-query cost the bench reports."""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from signalk_parquet_spark import registry  # noqa: E402
from signalk_parquet_spark.session import get_spark  # noqa: E402


def main() -> None:
    names = sys.argv[1].split(",")
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    spark = get_spark("profile-query")
    sc = spark.sparkContext
    for table in ("lineitem", "orders", "events", "documents", "embeddings"):
        try:
            registry.load(spark, sf_dir, table)
        except Exception:
            pass
    from signalk_parquet_spark.session import warm_worker_pool

    warm_worker_pool(spark)

    qs = registry.queries()
    base = f"{sc.uiWebUrl}/api/v1/applications/{sc.applicationId}"
    for name in names:
        sc.setJobDescription(f"PROFILE:{name}")
        t0 = time.perf_counter()
        qs[name](spark, sf_dir).collect()
        wall = time.perf_counter() - t0
        sc.setJobDescription(None)
        with urllib.request.urlopen(f"{base}/jobs") as r:
            jobs = json.load(r)
        mine = [j for j in jobs if (j.get("description") or "").startswith(f"PROFILE:{name}")]
        mine.sort(key=lambda j: j["jobId"])
        print(f"\n=== {name}: wall {wall:.3f}s, {len(mine)} jobs ===")
        tot = 0.0
        for j in mine:
            t_sub = time.mktime(time.strptime(j["submissionTime"][:19], "%Y-%m-%dT%H:%M:%S"))
            t_end = time.mktime(time.strptime(j["completionTime"][:19], "%Y-%m-%dT%H:%M:%S"))
            ms = float(j["completionTime"][20:23]) - float(j["submissionTime"][20:23])
            dur = t_end - t_sub + ms / 1000.0
            tot += max(dur, 0.0)
            print(
                f"  job {j['jobId']:>4}  {dur:6.2f}s  tasks={j['numTasks']:<5}"
                f" stages={len(j['stageIds'])}"
            )
        print(f"  sum of job durations: {tot:.2f}s (gap to wall = driver/planning)")


if __name__ == "__main__":
    main()
