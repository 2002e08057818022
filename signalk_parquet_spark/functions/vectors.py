"""Vector-similarity column expressions over `array<float>` embedding
columns — built-in higher-order functions only (zip_with/aggregate stay in
whole-stage codegen; no Python UDF in the scoring loop)."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def as_double(vec: Column | str) -> Column:
    c = F.col(vec) if isinstance(vec, str) else vec
    return F.transform(c, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x)


def norm_sq(a: Column) -> Column:
    return F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x)


def cosine(a: Column, b: Column) -> Column:
    """cos = dot / sqrt(|a|^2 * |b|^2) — written as one sqrt so the DuckDB
    oracle can mirror the exact expression shape."""
    return dot(a, b) / F.sqrt(norm_sq(a) * norm_sq(b))


def hyperplane_bits(vec: Column, planes: list[list[int]]) -> Column:
    """LSH random-hyperplane bucket id: bit_j = (vec · plane_j) >= 0.

    Planes carry small INTEGER weights, so each product and the running sum
    are exactly representable doubles — the sign (and therefore the bucket)
    is deterministic across engines and summation orders.
    """
    bucket = None
    for j, w in enumerate(planes):
        plane = F.array(*[F.lit(float(x)) for x in w])
        d = dot(vec, plane)
        term = F.when(d >= 0, F.lit(1 << j)).otherwise(F.lit(0))
        bucket = term if bucket is None else bucket + term
    return bucket.cast("long")


def make_planes(n_planes: int, dim: int) -> list[list[int]]:
    """Deterministic pseudo-random integer hyperplanes (no RNG, engine-free)."""
    return [[((i + 1) * (j + 2) * 2654435761 % 7) - 3 for i in range(dim)] for j in range(n_planes)]
