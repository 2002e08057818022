"""Embedding-decontamination scale ramp: exact broadcast screen vs the
IVF-screened production twin on a PLANTED-TRUTH corpus (r8).

Why planted truth: at the gate's tau=0.4 on the near-uniform synthetic
embeddings, the cosine pair relation is just the bulk distribution's tail
(~5e-4 of ALL candidate pairs qualify), so any replication grows "true"
pairs quadratically and the ramp measures output size, not the engine —
two harness drafts hit exactly that (a component-0 "+i*7" nudge aligned
every high-replica vector: 2.8M pairs at x4; a plain cyclic shift left the
background rate intact: 14x pairs at x4). Real decontamination hunts
near-identical leakage (verbatim/paraphrase, cosine >= ~0.9), so the ramp
plants it: every test-split vector gets a jittered twin pushed into the
TRAIN side, and both screens run at tau=0.9 where the background is
empty — true pairs == planted pairs, linear in N by construction (the
media-ramp planted-truth method).

Corpus build per factor n: replicas get offset vec_ids (the md5 split
re-rolls) and a CYCLIC COMPONENT SHIFT by i (orthogonal — within-replica
cosines preserved exactly, cross-replica decorrelated; refuses n > dim,
the shift's period). Planted twins: component 0 scaled by 1.25 (cosine
~0.998 to the source), vec_id offset by 10M, kept only when the new id
hashes to the train split (~80% — the split is content-addressed, you
don't get to choose it).

One JSON line per factor: exact wall (BroadcastNestedLoopJoin), IVF wall
at 1 and 2 probes (cell equi-join), true/planted/screened pair counts and
recall (screened/true — the twin is subset-by-construction).

Run: python tools/semdecon_ramp.py            # factors 1,4,16
     SPARK_GRAFT_RAMP=1,4 python tools/semdecon_ramp.py
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from signalk_parquet_spark import registry  # noqa: E402
from signalk_parquet_spark.queries_curation import (  # noqa: E402
    decontaminate_semantic,
    decontaminate_semantic_ivf,
    hash_split,
)
from signalk_parquet_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
SCRATCH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".scratch_semdecon"
)
PLANT_OFF = 10_000_000
TAU = 0.9


def build_corpus(spark, n: int, out_dir: str) -> None:
    os.makedirs(out_dir, exist_ok=True)
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    dim = len(emb.select("embedding").first()[0])
    if n > dim:
        raise ValueError(f"replication factor {n} exceeds the cyclic shift's"
                         f" period (dim={dim}); extend build_corpus first")
    vec_ids = emb.agg(F.max("vec_id")).collect()[0][0] + 1
    parts = []
    for i in range(n):
        shifted = (
            F.col("embedding") if i == 0
            else F.concat(F.slice("embedding", i + 1, dim - i), F.slice("embedding", 1, i))
        )
        parts.append(
            emb.withColumn("vec_id", F.col("vec_id") + F.lit(i * vec_ids))
            .withColumn("embedding", shifted)
        )
    from functools import reduce

    base = reduce(lambda a, b: a.unionByName(b), parts)
    jitter = F.concat(
        F.array((F.col("embedding")[0] * F.lit(1.25)).cast("float")),
        F.slice("embedding", 2, dim - 1),
    )
    planted = (
        base.filter(hash_split("vec_id") == "test")
        .withColumn("vec_id", F.col("vec_id") + F.lit(PLANT_OFF))
        .withColumn("embedding", jitter)
        .filter(hash_split("vec_id") == "train")
    )
    base.unionByName(planted).coalesce(8).write.mode("overwrite").parquet(
        f"{out_dir}/embeddings.parquet"
    )
    open(f"{out_dir}/.done", "w").close()


def main() -> int:
    factors = [int(x) for x in os.environ.get("SPARK_GRAFT_RAMP", "1,4,16").split(",")]
    spark = get_spark("semdecon-ramp")
    for n in factors:
        step = f"{SCRATCH}/x{n}"
        if not os.path.exists(f"{step}/.done"):
            shutil.rmtree(step, ignore_errors=True)
            build_corpus(spark, n, step)
        registry._TABLE_CACHE.clear()
        spark.catalog.clearCache()
        e = registry.load(spark, step, "embeddings")
        n_vec = e.count()
        n_planted = e.filter(F.col("vec_id") >= PLANT_OFF).count()
        t0 = time.monotonic()
        n_true = decontaminate_semantic(spark, step, tau=TAU).count()
        t_exact = time.monotonic() - t0
        row = {
            "factor": n, "n_vectors": n_vec, "planted": n_planted,
            "true_pairs": n_true, "exact_s": round(t_exact, 2),
        }
        for assign in ("expr", "numpy"):
            for p in (1, 2):
                t0 = time.monotonic()
                n_screen = decontaminate_semantic_ivf(
                    spark, step, n_probe=p, tau=TAU, assign=assign
                ).count()
                row[f"ivf_{assign}_p{p}_s"] = round(time.monotonic() - t0, 2)
                row[f"recall_{assign}_p{p}"] = round(n_screen / n_true, 3) if n_true else None
        print(json.dumps(row), flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
