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


def _geo_bucket_expr(
    col: Column, lo: float, hi: float, buckets: int, negative: bool = False
) -> Column:
    """Log-domain bucket index for a single-sign band whose LINEAR histogram
    stalled (heavy-tailed values spanning many binades concentrate in
    linear bucket 0, removing only ~log2(buckets) binades per round —
    doubles span ~2100 binades, so linear alone can exhaust any sane round
    budget). Equal-RATIO buckets cover the whole binade span in one round.
    Ascending in value for both signs (negative bands reverse the index so
    cumulative rank arithmetic stays valid). Deterministic: same expression
    re-evaluated each round, like _bucket_expr."""
    import math

    if negative:
        a, b = -hi, -lo  # both > 0; ln(-v) DEcreases as v increases
        step = (math.log(b) - math.log(a)) / buckets
        if step <= 0.0:  # adjacent-double band: log span underflowed
            return _bucket_expr(col, lo, (hi - lo) / buckets, buckets)
        raw = F.floor((F.log(-col) - F.lit(math.log(a))) / F.lit(step)).cast("long")
        clamped = F.least(F.greatest(raw, F.lit(0)), F.lit(buckets - 1))
        return F.lit(buckets - 1) - clamped
    step = (math.log(hi) - math.log(lo)) / buckets
    if step <= 0.0:
        return _bucket_expr(col, lo, (hi - lo) / buckets, buckets)
    raw = F.floor((F.log(col) - F.lit(math.log(lo))) / F.lit(step)).cast("long")
    return F.least(F.greatest(raw, F.lit(0)), F.lit(buckets - 1))


def _sign_split_expr(col: Column) -> Column:
    """3-way split at zero for a stalled band that straddles (or touches)
    zero: after one round the surviving band is single-sign or all-zero,
    unlocking the geometric path. Ascending in value by construction."""
    return (
        F.when(col < 0, F.lit(0)).when(col == 0, F.lit(1)).otherwise(F.lit(2))
    ).cast("long")


def kth_smallest_values(
    df: DataFrame,
    col: str,
    ks: list[int],
    buckets: int = 1024,
    band_limit: int = 65536,
    max_rounds: int = 64,
) -> DataFrame:
    """Exact (k, value) for each 1-based rank in ``ks`` over ``df[col]``
    (nulls excluded, multiset order). Returns a DataFrame (k BIGINT,
    value DOUBLE). No global sort, no data-sized shuffle, no driver
    collect beyond scalars — and round-trips scale with ROUNDS, not with
    len(ks): one seed aggregate, then ONE histogram job per round (bucket
    counts carry min/max, so band stats never need their own scan) plus
    one shared finish window when bands get small."""
    if not ks:
        raise ValueError("ks must be non-empty")
    spark = df.sparkSession
    c = F.col(col)
    base = df.filter(c.isNotNull()).select(c.alias("v"))
    # ONE fused scan seeds everything: every rank starts from the same
    # (cond=True) band, so the global count/min/max is the whole round-0
    # stats pass (the first cut ran a separate count() + per-round stats
    # job; band stats now ride the histogram — see below — so the
    # steady-state cost is ONE job per round plus one finish window)
    g = base.agg(
        F.count("v").alias("cnt"), F.min("v").alias("vmin"), F.max("v").alias("vmax")
    ).first()
    n = g["cnt"]
    for k in ks:
        if not 1 <= k <= n:
            raise ValueError(f"rank {k} outside [1, {n}]")
    # state per rank: (condition chain, rank within band, band count,
    # band min, band max) — the band stats are carried forward from the
    # histogram that created the band, never re-scanned
    state: dict[int, tuple[Column, int, int, float, float]] = {
        k: (F.lit(True), k, n, g["vmin"], g["vmax"]) for k in ks
    }
    results: dict[int, float] = {}
    # band size at the previous histogram — a band that failed to shrink
    # below 90% marks its next histogram STALLED and escapes to the
    # log-domain / sign-split bucketing (heavy-tailed bands, ADVICE r9)
    prev_cnt: dict[int, int] = {}

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
        # this round is ONE job — a k-tagged union aggregated by k.
        # per-rank bucket expression for this round + its bucket count
        bexprs: dict[int, tuple[Column, int]] = {}
        finish_ks = []
        for k in active:
            _cond, _rank, cnt, vmin, vmax = state[k]
            if vmin == vmax:
                results[k] = float(vmin)  # all-equal band IS the answer
            elif cnt <= band_limit:
                finish_ks.append(k)
            else:
                lo, hi = float(vmin), float(vmax)
                stalled = k in prev_cnt and cnt * 10 > prev_cnt[k] * 9
                prev_cnt[k] = cnt
                if not stalled:
                    bexprs[k] = (
                        _bucket_expr(F.col("v"), lo, (hi - lo) / buckets, buckets),
                        buckets,
                    )
                elif lo > 0:
                    bexprs[k] = (_geo_bucket_expr(F.col("v"), lo, hi, buckets), buckets)
                elif hi < 0:
                    bexprs[k] = (
                        _geo_bucket_expr(F.col("v"), lo, hi, buckets, negative=True),
                        buckets,
                    )
                else:  # band straddles/touches zero: split signs first
                    bexprs[k] = (_sign_split_expr(F.col("v")), 3)
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
        if not bexprs:
            continue
        # the histogram carries each bucket's count AND min/max — exactly
        # the stats the next round needs for the selected bucket, so no
        # separate stats job ever runs again
        counts = {
            (r["k"], r["b"]): (r["cnt"], r["bmin"], r["bmax"])
            for r in _tagged_union(
                [
                    base.filter(state[k][0]).select(
                        F.lit(k).alias("k"), bexprs[k][0].alias("b"), "v"
                    )
                    for k in bexprs
                ]
            )
            .groupBy("k", "b")
            .agg(
                F.count(F.lit(1)).alias("cnt"),
                F.min("v").alias("bmin"),
                F.max("v").alias("bmax"),
            )
            .collect()
        }
        for k in list(bexprs):
            cond, rank = state[k][0], state[k][1]
            bexpr, n_buckets = bexprs[k]
            below = 0
            for b in range(n_buckets):
                cb, bmin, bmax = counts.get((k, b), (0, None, None))
                if below + cb >= rank:
                    state[k] = (
                        cond & (bexpr == b), rank - below, cb, bmin, bmax
                    )
                    break
                below += cb
            else:  # pragma: no cover - rank validated against n above
                raise AssertionError("rank not reachable from bucket counts")
    missing = [k for k in ks if k not in results]
    if missing:
        raise RuntimeError(
            f"selection did not converge for ranks {missing} within "
            f"{max_rounds} rounds (buckets={buckets}, band_limit={band_limit}) — "
            "raise max_rounds, or widen buckets/band_limit so each round "
            "shrinks the band further"
        )
    return spark.createDataFrame(
        [(int(k), float(results[k])) for k in sorted(ks)], "k long, value double"
    )
