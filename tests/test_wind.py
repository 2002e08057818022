"""True-wind derivation (functions/wind.py): physics invariants plus an
exact numpy differential on randomized instrument inputs."""

from __future__ import annotations

import math
import random

from pyspark.sql import functions as F

from signalk_parquet_spark.functions.wind import (
    true_wind_angle,
    true_wind_components,
    true_wind_speed,
)


def _derive(spark, rows):
    df = spark.createDataFrame(rows, "aws double, awa_deg double, stw double")
    u, v = true_wind_components(F.col("aws"), F.radians("awa_deg"), F.col("stw"))
    return df.select(
        "aws", "awa_deg", "stw",
        true_wind_speed(u, v).alias("tws"),
        true_wind_angle(u, v).alias("twa"),
    ).collect()


def test_physics_invariants(spark) -> None:
    rows = [
        (10.0, 45.0, 0.0),   # stationary: true == apparent
        (10.0, 0.0, 10.0),   # motoring dead into a following calm: zero true wind
        (10.0, 0.0, 4.0),    # beating upwind: true wind slower than apparent
        (6.0, 180.0, 4.0),   # running: wind from dead astern stays astern
    ]
    got = {(r["aws"], r["awa_deg"], r["stw"]): r for r in _derive(spark, rows)}
    still = got[(10.0, 45.0, 0.0)]
    assert abs(still["tws"] - 10.0) < 1e-12
    assert abs(still["twa"] - math.radians(45.0)) < 1e-12
    assert got[(10.0, 0.0, 10.0)]["tws"] < 1e-12
    beat = got[(10.0, 0.0, 4.0)]
    assert abs(beat["tws"] - 6.0) < 1e-12 and abs(beat["twa"]) < 1e-12
    run = got[(6.0, 180.0, 4.0)]
    assert run["tws"] > 6.0  # boat speed ADDS to a stern wind
    assert abs(abs(run["twa"]) - math.pi) < 1e-9


def test_streaming_derivation_matches_batch(spark, tmp_path) -> None:
    """Derived data runs LIVE in a SignalK install: the same map-only
    Column expressions must produce bit-identical rows on a stream (no
    state, no watermark — stateless derivation rides the micro-batch)."""
    rows = [(float(5 + i % 20), float((i * 37) % 360 - 180), float(i % 80) / 10.0)
            for i in range(200)]
    schema = "aws double, awa_deg double, stw double"
    src = str(tmp_path / "wind_src")
    spark.createDataFrame(rows, schema).coalesce(1).write.parquet(src)

    def derive(df):
        u, v = true_wind_components(F.col("aws"), F.radians("awa_deg"), F.col("stw"))
        return df.select(
            "aws", "awa_deg", "stw",
            true_wind_speed(u, v).alias("tws"),
            true_wind_angle(u, v).alias("twa"),
        )

    q = (
        derive(spark.readStream.schema(schema).parquet(src))
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("wind_out")
        .option("checkpointLocation", str(tmp_path / "wind_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["aws"], r["awa_deg"], r["stw"]): (r["tws"], r["twa"])
        for r in spark.sql("select * from wind_out").collect()
    }
    want = {
        (r["aws"], r["awa_deg"], r["stw"]): (r["tws"], r["twa"])
        for r in derive(spark.createDataFrame(rows, schema)).collect()
    }
    assert got == want  # bit-identical: same JVM expressions either way


def test_matches_numpy_exactly(spark) -> None:
    """Same formula in plain Python floats must agree to the last ulp of
    the +-*/sqrt chain (trig inputs are identical doubles; JVM StrictMath
    vs CPython libm may differ ~1 ulp on sin/cos, so the tolerance is a
    few ulps of the result, not exact-zero)."""
    rng = random.Random(7)
    rows = [
        (round(rng.uniform(0, 30), 6), round(rng.uniform(-180, 180), 6),
         round(rng.uniform(0, 9), 6))
        for _ in range(500)
    ]
    for r in _derive(spark, rows):
        awa = math.radians(r["awa_deg"])
        u = r["aws"] * math.cos(awa) - r["stw"]
        v = r["aws"] * math.sin(awa)
        assert abs(math.hypot(u, v) - r["tws"]) < 1e-9
        assert abs(math.atan2(v, u) - r["twa"]) < 1e-9
