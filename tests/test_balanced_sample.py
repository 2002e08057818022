"""cluster_quota_sample: balance property, centrality, determinism, and the
WindowGroupLimit plan shape the 100 TB story rests on."""

from __future__ import annotations

import math
import random

from pyspark.sql import functions as F

from signalk_parquet_spark.operators.sampling import cluster_quota_sample
from signalk_parquet_spark.operators.similarity import stride_centroids


def _corpus(spark, n=300, dim=8, seed=3):
    rng = random.Random(seed)
    rows = [(i, [rng.uniform(-1, 1) for _ in range(dim)]) for i in range(n)]
    return rows, spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_quota_and_centrality(spark) -> None:
    rows, df = _corpus(spark)
    cent = stride_centroids(df, "vec_id", "embedding", 100)  # 3 cells
    out = cluster_quota_sample(df, cent, "vec_id", "embedding", quota=20).toPandas()
    assert out.groupby("cid").size().max() <= 20
    assert set(out.columns) == {"cid", "id", "rank"}
    # recompute assignment + within-cell distance order in plain python
    cents = {r["cid"]: [float(x) for x in r["cemb"]] for r in cent.collect()}

    def dist(v, c):
        cn2 = 0.0
        for x in c:
            cn2 += x * x
        return cn2 - 2 * sum(a * b for a, b in zip(v, c))

    assign = {}
    for i, v in rows:
        best = min((dist(v, c), cid) for cid, c in cents.items())
        assign[i] = (best[1], best[0])
    for cid in cents:
        members = sorted(
            ((d, i) for i, (c, d) in assign.items() if c == cid)
        )
        expect = [i for _, i in members[:20]]
        got = out[out.cid == cid].sort_values("rank")["id"].tolist()
        assert got == expect, f"cell {cid}: quota pick diverged"


def test_determinism_across_partitionings(spark) -> None:
    _, df = _corpus(spark, n=200, seed=9)
    cent = stride_centroids(df, "vec_id", "embedding", 70)
    a = cluster_quota_sample(df.repartition(1), cent, "vec_id", "embedding", 15)
    b = cluster_quota_sample(df.repartition(16), cent, "vec_id", "embedding", 15)
    pa = a.toPandas().sort_values(["cid", "rank"]).reset_index(drop=True)
    pb = b.toPandas().sort_values(["cid", "rank"]).reset_index(drop=True)
    assert pa.equals(pb)


def test_window_group_limit_plan(spark) -> None:
    """The shuffle must carry at most quota rows per cell per map task —
    Spark expresses that as a WindowGroupLimit below the Exchange."""
    _, df = _corpus(spark, n=200)
    cent = stride_centroids(df, "vec_id", "embedding", 70)
    out = cluster_quota_sample(df, cent, "vec_id", "embedding", 10)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in plan
    assert math.isfinite(out.count())  # plan actually executes
