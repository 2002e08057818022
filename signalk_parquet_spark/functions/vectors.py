"""Vector-similarity column expressions over `array<float>` embedding
columns — pure built-in expressions, no Python UDF in the scoring loop.

Perf note (measured at sf0.1): Spark's higher-order functions
(aggregate/zip_with) are CodegenFallback — every lambda step is interpreted,
so a 64-dim dot product costs ~128 interpreted closure evals per row. When
the dimension is known (it always is for an embedding column) we emit an
UNROLLED multiply-add chain instead: plain GetArrayItem/Multiply/Add nodes
that whole-stage codegen compiles to a straight-line JVM loop body — ~10x
on the similarity family. The chain keeps the HOF's exact left-to-right
summation order, so results are bit-identical and oracle parity is
unaffected. Pass dim=None to fall back to the HOF form (unknown-length
arrays).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from .litfast import lit_array


def as_double(vec: Column | str) -> Column:
    c = F.col(vec) if isinstance(vec, str) else vec
    return F.transform(c, lambda x: x.cast("double"))


def dot(a: Column, b: Column, dim: int | None = None) -> Column:
    """a · b, summed left-to-right from +0.0 (same order as the HOF form)."""
    if dim is None:
        return F.aggregate(
            F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
        )
    acc = F.lit(0.0)
    for i in range(dim):
        acc = acc + a.getItem(i) * b.getItem(i)
    return acc


def norm_sq(a: Column, dim: int | None = None) -> Column:
    if dim is None:
        return F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x)
    acc = F.lit(0.0)
    for i in range(dim):
        acc = acc + a.getItem(i) * a.getItem(i)
    return acc


def cosine(a: Column, b: Column, dim: int | None = None) -> Column:
    """cos = dot / sqrt(|a|^2 * |b|^2) — written as one sqrt so the DuckDB
    oracle can mirror the exact expression shape."""
    return dot(a, b, dim) / F.sqrt(norm_sq(a, dim) * norm_sq(b, dim))


def int8_quantize(vec: Column | str) -> Column:
    """Symmetric int8 scalar quantization: q_i = floor(clamp(x,-1,1)*127+0.5)
    ∈ [-127, 127] — the 4x memory-compression path for embedding columns at
    scale (float32 → int8 before any PQ refinement). floor(x+0.5) instead of
    round(): the product and shift are exact IEEE doubles computed
    identically on both engines, while round()'s half-way rule differs
    between Spark (HALF_UP) and other engines (CLAUDE.md rule 2)."""
    c = F.col(vec) if isinstance(vec, str) else vec
    return F.transform(
        c,
        lambda x: F.floor(
            F.greatest(F.lit(-1.0), F.least(F.lit(1.0), x.cast("double"))) * 127
            + F.lit(0.5)
        ).cast("int"),
    )


def int_dot(a: Column, b: Column, dim: int | None = None) -> Column:
    """Integer dot product of two int-array columns as a long — EXACT, so
    quantized similarity scores need no rounding to hash-match an oracle."""
    # widen BEFORE multiplying (int32 x int32 silently wraps in non-ANSI
    # mode; the oracle multiplies BIGINTs, so the shapes match too)
    if dim is None:
        return F.aggregate(
            F.zip_with(a, b, lambda x, y: x.cast("long") * y.cast("long")),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        )
    acc = F.lit(0).cast("long")
    for i in range(dim):
        acc = acc + a.getItem(i).cast("long") * b.getItem(i).cast("long")
    return acc


def hyperplane_bits(vec: Column, planes: list[list[int]], unroll: bool = False) -> Column:
    """LSH random-hyperplane bucket id: bit_j = (vec · plane_j) >= 0.

    Planes carry small INTEGER weights, so each product and the running sum
    are exactly representable doubles — the sign (and therefore the bucket)
    is deterministic across engines and summation orders.

    unroll=True emits constant-folded multiply-add chains with zero-weight
    terms dropped (bit-identical: acc + x*0.0 adds ±0.0, which never changes
    the sum, and a ±0.0 total still passes >= 0). Only worth it at >~10^6
    rows — the ~8x440-node tree costs seconds of Catalyst/codegen time.
    """
    bucket = None
    for j, w in enumerate(planes):
        if unroll:
            d = F.lit(0.0)
            for i, x in enumerate(w):
                if x != 0:
                    d = d + vec.getItem(i) * F.lit(float(x))
        else:
            plane = lit_array([float(x) for x in w], "double")
            d = dot(vec, plane)
        term = F.when(d >= 0, F.lit(1 << j)).otherwise(F.lit(0))
        bucket = term if bucket is None else bucket + term
    return bucket.cast("long")


_M64 = (1 << 64) - 1


def _splitmix(x: int) -> int:
    """SplitMix64 finalizer — full-avalanche integer mixing (public domain
    constant set; Steele et al., 'Fast Splittable Pseudorandom Number
    Generators')."""
    x = (x + 0x9E3779B97F4A7C15) & _M64
    x = ((x ^ (x >> 30)) * 0xBF58476D1CE4E5B9) & _M64
    x = ((x ^ (x >> 27)) * 0x94D049BB133111EB) & _M64
    return x ^ (x >> 31)


def make_planes(n_planes: int, dim: int, seed: int = 0) -> list[list[int]]:
    """Deterministic pseudo-random integer hyperplanes (no RNG, engine-free:
    the weights are generated in Python and embedded as literals on BOTH
    engines). ``seed`` selects an independent plane family — multi-table LSH
    needs L genuinely independent tables. Per-weight SplitMix64 mixing
    matters: an earlier multiplicative-mod-7 scheme made every table an
    elementwise permutation of one base pattern (two seeds even collided),
    so OR-amplification bought zero recall."""
    return [
        [(_splitmix((seed << 40) ^ (j << 20) ^ i) % 7) - 3 for i in range(dim)]
        for j in range(n_planes)
    ]
