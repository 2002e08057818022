"""Hot/cold source federation with priority dedup (SURVEY §2.4 J1).

Reference plan shape (src/HistoryAPI.ts:1683-1693, 1829-1836): each source
(cold parquet, hot buffer, cloud) aggregates INDEPENDENTLY, the aggregated
series are UNION ALL-ed with a `priority` literal (buffer beats parquet),
and ``ROW_NUMBER() OVER (PARTITION BY bucket ORDER BY priority DESC)`` keeps
one row per bucket. Aggregating before the union is both the manual
aggregate-pushdown optimization and the correct semantics (priority pick,
not blend) — we keep the identical plan shape.

At scale: each source's partial aggregate shrinks the data by ~R (bucket
width) before the union's shuffle; the window partitions on the bucket key,
which is high-cardinality, so this stays balanced on 1000 executors.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def priority_dedup(
    sources: Sequence[tuple[DataFrame, int]],
    key_cols: Sequence[str],
) -> DataFrame:
    """Union pre-aggregated per-source frames, keep the highest-priority row
    per key. ``sources`` = [(df, priority), ...]; larger priority wins."""
    tagged = [df.withColumn("__priority", F.lit(p)) for df, p in sources]
    unioned = tagged[0]
    for t in tagged[1:]:
        unioned = unioned.unionByName(t, allowMissingColumns=True)
    w = Window.partitionBy(*key_cols).orderBy(F.col("__priority").desc())
    return (
        unioned.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn", "__priority")
    )


def blend_union(sources: Sequence[DataFrame]) -> DataFrame:
    """The v2 provider's federation — union RAW rows BEFORE aggregation
    (src/history-provider.ts:390-394), the deliberate semantic opposite of
    :func:`priority_dedup`: an overlap bucket averages over BOTH sources'
    rows (AVG(9, 11) = 10) instead of the buffer winning outright.

    At scale this is the cheaper plan when sources overlap heavily: one
    hash-aggregate over the concatenated scan (map-side partials absorb the
    duplication) vs per-source aggregates plus a window. The caller
    aggregates the returned frame."""
    out = sources[0]
    for s in sources[1:]:
        out = out.unionByName(s, allowMissingColumns=True)
    return out
