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
    one shared finish window when bands get small. Thin wrapper over the
    tag-generic core shared with :func:`grouped_kth_smallest`."""
    if not ks:
        raise ValueError("ks must be non-empty")
    c = F.col(col)
    base = df.filter(c.isNotNull()).select(F.lit(0).alias("g"), c.alias("v"))
    results = _selection_core(base, {0: list(ks)}, buckets, band_limit, max_rounds)
    return df.sparkSession.createDataFrame(
        [(int(k), float(results[(0, k)])) for k in sorted(set(ks))],
        "k long, value double",
    )


def grouped_kth_smallest(
    df: DataFrame,
    col: str,
    group_col: str,
    ks_by_group: dict,
    buckets: int = 1024,
    band_limit: int = 65536,
    max_rounds: int = 64,
) -> DataFrame:
    """Exact PER-GROUP order statistics without per-group sorts: for each
    group g, the values at ranks ``ks_by_group[g]`` of that group's
    nulls-excluded multiset. The tag space is (group, rank) — every
    active tag rides the SAME seed aggregate, the SAME one histogram job
    per round and the SAME shared finish window, so round-trips scale
    with recursion depth, never with group count x rank count. The
    oracle formulation (row_number over PARTITION BY group ORDER BY col)
    is a per-group sort whose exchange the operator never pays at scale.

    Returns (group_col, k BIGINT, value DOUBLE); group values round-trip
    through the driver (str/int/bool group keys). Groups named in
    ``ks_by_group`` but absent from the data raise (rank validation),
    matching the ungrouped operator's loud contract."""
    if not ks_by_group:
        raise ValueError("ks_by_group must be non-empty")
    c = F.col(col)
    base = df.filter(c.isNotNull() & F.col(group_col).isNotNull()).select(
        F.col(group_col).alias("g"), c.alias("v")
    )
    results = _selection_core(base, ks_by_group, buckets, band_limit, max_rounds)
    rows = [
        (g, int(k), float(v))
        for (g, k), v in sorted(results.items(), key=lambda t: (str(t[0][0]), t[0][1]))
    ]
    return df.sparkSession.createDataFrame(rows, [group_col, "k", "value"])


def _selection_core(
    base: DataFrame,
    ks_by_group: dict,
    buckets: int,
    band_limit: int,
    max_rounds: int,
) -> dict:
    """Bucket-count selection over a (g, v) frame for tags (group, rank).
    ONE fused seed aggregate (per-group count/min/max — every tag starts
    from its group's full band), then per round: one histogram job whose
    buckets carry count AND min/max (so the selected bucket's band stats
    are known without a stats job) plus one shared finish window. Returns
    {(group, rank): value}."""
    seed = {
        r["g"]: r
        for r in base.groupBy("g")
        .agg(
            F.count("v").alias("cnt"),
            F.min("v").alias("vmin"),
            F.max("v").alias("vmax"),
        )
        .collect()
    }
    for g, ks in ks_by_group.items():
        if not ks:
            raise ValueError(f"empty rank list for group {g!r}")
        n = seed[g]["cnt"] if g in seed else 0
        for k in ks:
            if not 1 <= k <= n:
                raise ValueError(f"group {g!r}: rank {k} outside [1, {n}]")
    # state per tag: (condition chain, rank within band, band count,
    # band min, band max) — band stats carried from the histogram that
    # created the band, never re-scanned
    state: dict[tuple, tuple[Column, int, int, float, float]] = {}
    for g, ks in ks_by_group.items():
        s = seed[g]
        for k in set(ks):
            state[(g, k)] = (F.col("g") == F.lit(g), k, s["cnt"], s["vmin"], s["vmax"])
    results: dict[tuple, float] = {}
    # band size at the previous histogram — a band that failed to shrink
    # below 90% marks its next histogram STALLED and escapes to the
    # log-domain / sign-split bucketing (heavy-tailed bands, ADVICE r9)
    prev_cnt: dict[tuple, int] = {}

    def _tagged(tag: tuple, extra: list[Column]) -> DataFrame:
        g, k = tag
        return base.filter(state[tag][0]).select(
            F.lit(g).alias("g_"), F.lit(k).alias("k_"), *extra
        )

    def _tagged_union(parts: list[DataFrame]) -> DataFrame:
        u = parts[0]
        for p in parts[1:]:
            u = u.unionByName(p)
        return u

    for _ in range(max_rounds):
        active = [t for t in state if t not in results]
        if not active:
            break
        # ROUND-TRIPS SCALE WITH ROUNDS, NOT TAGS: every per-band probe of
        # this round is ONE job — a tag-tagged union aggregated by tag.
        # per-tag bucket expression for this round + its bucket count
        bexprs: dict[tuple, tuple[Column, int]] = {}
        finish_tags = []
        for t in active:
            _cond, _rank, cnt, vmin, vmax = state[t]
            if vmin == vmax:
                results[t] = float(vmin)  # all-equal band IS the answer
            elif cnt <= band_limit:
                finish_tags.append(t)
            else:
                lo, hi = float(vmin), float(vmax)
                stalled = t in prev_cnt and cnt * 10 > prev_cnt[t] * 9
                prev_cnt[t] = cnt
                if not stalled:
                    bexprs[t] = (
                        _bucket_expr(F.col("v"), lo, (hi - lo) / buckets, buckets),
                        buckets,
                    )
                elif lo > 0:
                    bexprs[t] = (_geo_bucket_expr(F.col("v"), lo, hi, buckets), buckets)
                elif hi < 0:
                    bexprs[t] = (
                        _geo_bucket_expr(F.col("v"), lo, hi, buckets, negative=True),
                        buckets,
                    )
                else:  # band straddles/touches zero: split signs first
                    bexprs[t] = (_sign_split_expr(F.col("v")), 3)
        if finish_tags:
            # all small bands finish in ONE window job: rank within band,
            # pick each band's own target rank via a literal CASE
            rank_of = None
            for t in finish_tags:
                cond = (F.col("g_") == F.lit(t[0])) & (F.col("k_") == t[1])
                w = (
                    F.when(cond, F.lit(state[t][1]))
                    if rank_of is None
                    else rank_of.when(cond, F.lit(state[t][1]))
                )
                rank_of = w
            from pyspark.sql import Window

            win = Window.partitionBy("g_", "k_").orderBy("v")
            picked = (
                _tagged_union([_tagged(t, [F.col("v")]) for t in finish_tags])
                .withColumn("rn", F.row_number().over(win))
                .filter(F.col("rn") == rank_of)
                .select("g_", "k_", "v")
                .collect()
            )
            for r in picked:
                results[(r["g_"], r["k_"])] = float(r["v"])
        if not bexprs:
            continue
        # the histogram carries each bucket's count AND min/max — exactly
        # the stats the next round needs for the selected bucket, so no
        # separate stats job ever runs
        counts = {
            (r["g_"], r["k_"], r["b"]): (r["cnt"], r["bmin"], r["bmax"])
            for r in _tagged_union(
                [_tagged(t, [bexprs[t][0].alias("b"), F.col("v")]) for t in bexprs]
            )
            .groupBy("g_", "k_", "b")
            .agg(
                F.count(F.lit(1)).alias("cnt"),
                F.min("v").alias("bmin"),
                F.max("v").alias("bmax"),
            )
            .collect()
        }
        for t in list(bexprs):
            cond, rank = state[t][0], state[t][1]
            bexpr, n_buckets = bexprs[t]
            below = 0
            for b in range(n_buckets):
                cb, bmin, bmax = counts.get((t[0], t[1], b), (0, None, None))
                if below + cb >= rank:
                    state[t] = (cond & (bexpr == b), rank - below, cb, bmin, bmax)
                    break
                below += cb
            else:  # pragma: no cover - rank validated against seed counts
                raise AssertionError("rank not reachable from bucket counts")
    missing = [t for t in state if t not in results]
    if missing:
        raise RuntimeError(
            f"selection did not converge for (group, rank) tags {missing} within "
            f"{max_rounds} rounds (buckets={buckets}, band_limit={band_limit}) — "
            "raise max_rounds, or widen buckets/band_limit so each round "
            "shrinks the band further"
        )
    return results
