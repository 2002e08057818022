"""Distributed exact selection: global k-th smallest WITHOUT a global sort.

A global ORDER BY at 100 TB is a full range-exchange of the dataset — the
one shuffle shape this engine's gates otherwise never emit. Exact global
quantiles don't need it: bucket-count selection (the distributed
quickselect) finds the k-th smallest VALUE with log_B(n) histogram passes
over an un-shuffled scan plus one band-bounded finish:

  round r: one map pass histograms the active band of every wanted rank
           into B buckets (a (n_ks × B)-row aggregate — metadata-sized);
           cumulative counts locate each rank's bucket, which becomes its
           next band;
  finish:  when a rank's band holds ≤ band_limit rows, rank ONLY the
           band (one window job shared by every finishing rank, keyed by
           rank id) and pick each band's target row — bands are
           band_limit-bounded by construction, so the window is tiny.

Band membership is re-derived each round from the SAME deterministic
bucket expression (floor((v − lo)/width) chained as equality conditions),
never from float range compares against recomputed boundaries — so a
value sitting exactly on a bucket edge lands on one side consistently and
the rank arithmetic stays exact. Returned values are INPUT values
verbatim (no arithmetic touches them), so an oracle's row_number pick
matches bit-for-bit, ties included (the value at a fixed rank of the
multiset order is unique even when row orderings differ).

At bench scale (600k rows, B=1024, band_limit=65536) every rank resolves
in ONE histogram round; the operator loops for deeper n and splits
pathological buckets (all-equal values short-circuit: a zero-width band
IS the answer).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _bucket_expr(col: Column, lo: float, width: float, buckets: int) -> Column:
    """Deterministic bucket index in [0, buckets): identical arithmetic on
    every round so edge values re-bucket consistently."""
    raw = F.floor((col - F.lit(lo)) / F.lit(width)).cast("long")
    return F.least(F.greatest(raw, F.lit(0)), F.lit(buckets - 1))


def kth_smallest_values(
    df: DataFrame,
    col: str,
    ks: list[int],
    buckets: int = 1024,
    band_limit: int = 65536,
    max_rounds: int = 16,
) -> DataFrame:
    """Exact (k, value) for each 1-based rank in ``ks`` over ``df[col]``
    (nulls excluded, multiset order). Returns a DataFrame (k BIGINT,
    value DOUBLE). No global sort, no data-sized shuffle, no driver
    collect beyond scalars — and round-trips scale with ROUNDS (≤3 jobs
    each: stats, finishes, histogram), not with len(ks)."""
    if not ks:
        raise ValueError("ks must be non-empty")
    spark = df.sparkSession
    c = F.col(col)
    base = df.filter(c.isNotNull()).select(c.alias("v"))
    n = base.count()
    for k in ks:
        if not 1 <= k <= n:
            raise ValueError(f"rank {k} outside [1, {n}]")
    # state per rank: (condition chain, rank within band)
    state: dict[int, tuple[Column, int]] = {k: (F.lit(True), k) for k in ks}
    results: dict[int, float] = {}

    def _tagged_union(parts: list[DataFrame]) -> DataFrame:
        u = parts[0]
        for p in parts[1:]:
            u = u.unionByName(p)
        return u

    for _ in range(max_rounds):
        active = [k for k in ks if k not in results]
        if not active:
            break
        # ROUND-TRIPS SCALE WITH ROUNDS, NOT RANKS: every per-band probe of
        # this round is ONE job — a k-tagged union aggregated by k. (The
        # first cut ran a separate agg + finish job per rank per round:
        # 5 ranks cost ~12 tiny jobs whose latency dominated the gate wall.)
        stats = {
            r["k"]: r
            for r in _tagged_union(
                [
                    base.filter(state[k][0]).select(F.lit(k).alias("k"), "v")
                    for k in active
                ]
            )
            .groupBy("k")
            .agg(
                F.count("v").alias("cnt"),
                F.min("v").alias("vmin"),
                F.max("v").alias("vmax"),
            )
            .collect()
        }
        widths: dict[int, tuple[float, float]] = {}
        finish_ks = []
        for k in active:
            cnt, vmin, vmax = stats[k]["cnt"], stats[k]["vmin"], stats[k]["vmax"]
            if vmin == vmax:
                results[k] = float(vmin)  # all-equal band IS the answer
            elif cnt <= band_limit:
                finish_ks.append(k)
            else:
                widths[k] = (float(vmin), (float(vmax) - float(vmin)) / buckets)
        if finish_ks:
            # all small bands finish in ONE window job: rank within band,
            # pick each band's own target rank via a literal CASE
            rank_of = None
            for k in finish_ks:
                w = F.when(F.col("k") == k, F.lit(state[k][1]))
                rank_of = w if rank_of is None else rank_of.when(
                    F.col("k") == k, F.lit(state[k][1])
                )
            from pyspark.sql import Window

            win = Window.partitionBy("k").orderBy("v")
            picked = (
                _tagged_union(
                    [
                        base.filter(state[k][0]).select(F.lit(k).alias("k"), "v")
                        for k in finish_ks
                    ]
                )
                .withColumn("rn", F.row_number().over(win))
                .filter(F.col("rn") == rank_of)
                .select("k", "v")
                .collect()
            )
            for r in picked:
                results[r["k"]] = float(r["v"])
        if not widths:
            continue
        counts = {
            (r["k"], r["b"]): r["cnt"]
            for r in _tagged_union(
                [
                    base.filter(state[k][0]).select(
                        F.lit(k).alias("k"),
                        _bucket_expr(F.col("v"), *widths[k], buckets).alias("b"),
                    )
                    for k in widths
                ]
            )
            .groupBy("k", "b")
            .agg(F.count(F.lit(1)).alias("cnt"))
            .collect()
        }
        for k in list(widths):
            cond, rank = state[k]
            lo, width = widths[k]
            below = 0
            for b in range(buckets):
                cb = counts.get((k, b), 0)
                if below + cb >= rank:
                    state[k] = (
                        cond & (_bucket_expr(F.col("v"), lo, width, buckets) == b),
                        rank - below,
                    )
                    break
                below += cb
            else:  # pragma: no cover - rank validated against n above
                raise AssertionError("rank not reachable from bucket counts")
    missing = [k for k in ks if k not in results]
    if missing:
        raise RuntimeError(f"selection did not converge for ranks {missing}")
    return spark.createDataFrame(
        [(int(k), float(results[k])) for k in sorted(ks)], "k long, value double"
    )
