"""Skew mitigation — salting for hot keys (SCALE.md: "skewed keys → salting
or AQE skew-join").

AQE's skew-join handles storage-level skew automatically; these helpers
cover the case AQE can't: a GROUP BY or join where one key dominates the
input so badly that even a split shuffle block lands on one reducer (e.g.
one vessel context producing 90% of telemetry, one document language at
90% of a corpus).

Pattern: two-phase aggregation — salt the key with a random suffix, run the
partial aggregate on (key, salt), then merge partials per key. Works for
any algebraic aggregate (sum/count/min/max and their compositions: avg,
weighted mean — the same partial-state discipline the rollup tiers use).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted(df: DataFrame, buckets: int = 16, col: str = "__salt") -> DataFrame:
    """Uniform random salt column. rand() is fine here — the salt only
    balances partitions and never reaches results, so nondeterminism is
    contained by the merge phase."""
    return df.withColumn(col, (F.rand() * buckets).cast("int"))


def salted_agg(
    df: DataFrame,
    keys: Sequence[str],
    partials: dict[str, Column],
    merges: dict[str, Column],
    buckets: int = 16,
) -> DataFrame:
    """Two-phase skew-safe aggregation.

    ``partials``: alias -> aggregate over raw rows (runs per (keys, salt)).
    ``merges``: final alias -> aggregate over the partial columns.

    Example (skew-safe average):
        salted_agg(df, ["k"],
                   partials={"s": F.sum("v"), "n": F.count("v")},
                   merges={"avg_v": F.sum("s") / F.sum("n")})
    """
    stage1 = (
        salted(df, buckets)
        .groupBy(*keys, "__salt")
        .agg(*[c.alias(name) for name, c in partials.items()])
    )
    return stage1.groupBy(*keys).agg(*[c.alias(name) for name, c in merges.items()])


def salted_join_big_small(
    big: DataFrame,
    small: DataFrame,
    key: str,
    buckets: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skewed big⋈small equi-join without broadcast: salt the big side,
    EXPLODE the small side across every salt value, join on (key, salt).
    Each hot key's rows spread over ``buckets`` reducers; the small side is
    replicated buckets-fold (bounded — use only when broadcast won't fit)."""
    b = salted(big, buckets)
    s = small.withColumn("__salt", F.explode(F.array(*[F.lit(i) for i in range(buckets)])))
    return b.join(s, [key, "__salt"], how).drop("__salt")
