"""Measured scale ramp for cloud sync (SCALE.md source): N small files in
a hive-shaped tree (contexts x paths x days), listed, planned, and copied
to a second local root. Verifies the distcp-style claims: listing fans out
across seeds, the plan is join-only, copy throughput scales with files,
and a second plan is an exact no-op.

Run: python tools/cloudsync_ramp.py [sizes...]
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from signalk_parquet_spark.operators.cloudsync import (  # noqa: E402
    distributed_copy,
    list_files,
    sync_plan,
)
from signalk_parquet_spark.session import get_spark  # noqa: E402


def build_tree(root: str, n: int) -> None:
    """n files spread over 4 contexts x 25 paths x days — the lake shape."""
    for i in range(n):
        ctx, pth, day = i % 4, (i // 4) % 25, i // 100
        d = f"{root}/vessels.c{ctx}/path.p{pth}/2024/{day:03d}"
        os.makedirs(d, exist_ok=True)
        with open(f"{d}/f{i}.parquet", "wb") as f:
            f.write(b"x" * (100 + i % 400))


def main() -> None:
    sizes = [int(s) for s in sys.argv[1:]] or [2_000, 8_000, 32_000]
    spark = get_spark("cloudsync_ramp")
    spark.range(32).mapInPandas(lambda it: it, "id long").count()  # warm Arrow
    for n in sizes:
        base = tempfile.mkdtemp(prefix="sync_ramp_")
        src, dst = f"{base}/src", f"{base}/dst"
        build_tree(src, n)
        t0 = time.perf_counter()
        plan = sync_plan(list_files(spark, src), list_files(spark, dst))
        stats = distributed_copy(spark, plan, src, dst)
        wall = time.perf_counter() - t0
        t1 = time.perf_counter()
        re_uploads = (
            sync_plan(list_files(spark, src), list_files(spark, dst))
            .filter("action = 'upload'")
            .count()
        )
        re_wall = time.perf_counter() - t1
        seeds = list_files(spark, src).rdd.getNumPartitions()
        print(
            f"N={n}: list+plan+copy {wall:.1f}s ({n / wall:.0f} files/s, "
            f"{stats['bytes']} B, {seeds} listing partitions); "
            f"re-plan {re_wall:.1f}s, uploads={re_uploads} "
            f"[{'no-op OK' if re_uploads == 0 else 'NOT IDEMPOTENT'}]"
        )
        shutil.rmtree(base)


if __name__ == "__main__":
    main()
