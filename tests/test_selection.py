"""Distributed bucket-count selection vs sorted() ground truth — randomized,
duplicate-heavy, all-equal, and multi-round (tiny buckets/band_limit force
the recursion depth a 100 TB run would see)."""

from __future__ import annotations

import random

import pytest

from signalk_parquet_spark.operators.selection import kth_smallest_values


def _truth(vals: list[float], ks: list[int]) -> dict[int, float]:
    s = sorted(vals)
    return {k: s[k - 1] for k in ks}


def _run(spark, vals, ks, **kw):
    df = spark.createDataFrame([(v,) for v in vals], "x double").repartition(8)
    out = kth_smallest_values(df, "x", ks, **kw)
    return {r["k"]: r["value"] for r in out.collect()}


def test_randomized_differential(spark) -> None:
    rng = random.Random(4)
    for trial in range(3):
        vals = [round(rng.uniform(-100, 100), 3) for _ in range(2000)]
        ks = sorted({1, 7, 500, 1000, 1777, 2000})
        assert _run(spark, vals, ks) == _truth(vals, ks)


def test_duplicate_heavy_and_multi_round(spark) -> None:
    rng = random.Random(9)
    # 90% of mass on 5 distinct values -> buckets overflow band_limit and
    # the vmin==vmax short-circuit must fire inside recursion
    vals = [float(rng.choice([1.0, 1.0, 2.5, 2.5, 2.5, 7.0, 7.0, 9.0, 11.0]))
            for _ in range(3000)] + [rng.uniform(0, 12) for _ in range(300)]
    ks = [1, 1650, 3300]
    got = _run(spark, vals, ks, buckets=4, band_limit=50)
    assert got == _truth(vals, ks)


def test_all_equal(spark) -> None:
    vals = [3.25] * 500
    assert _run(spark, vals, [1, 250, 500], band_limit=10) == {
        1: 3.25, 250: 3.25, 500: 3.25
    }


def test_nulls_excluded_and_rank_validation(spark) -> None:
    df = spark.createDataFrame(
        [(1.0,), (None,), (2.0,), (None,), (3.0,)], "x double"
    )
    out = {r["k"]: r["value"] for r in kth_smallest_values(df, "x", [1, 3]).collect()}
    assert out == {1: 1.0, 3: 3.0}
    with pytest.raises(ValueError, match="outside"):
        kth_smallest_values(df, "x", [4])
    with pytest.raises(ValueError, match="non-empty"):
        kth_smallest_values(df, "x", [])


def test_heavy_tailed_binade_span_converges(spark) -> None:
    """>band_limit rows spanning ~600 binades (values 2^-i) stall a linear
    histogram — each round removed only ~log2(buckets) binades and 16
    rounds could exhaust (ADVICE r9). The stall-detected log-domain escape
    covers the whole binade span in one geometric round."""
    vals = [2.0 ** -(i % 600) for i in range(6000)]
    ks = [1, 3000, 6000]
    got = _run(spark, vals, ks, buckets=8, band_limit=40)
    assert got == _truth(vals, ks)


def test_heavy_tailed_mixed_sign_and_zero(spark) -> None:
    """Mixed-sign heavy tail: a stalled band straddling zero takes the
    3-way sign split, then each single-sign band takes the geometric path
    (negative bands reverse the bucket index). Zeros exercise the ==0
    bucket and the all-equal short-circuit inside the recursion."""
    vals = [((-1.0) ** i) * 2.0 ** -(i % 500) for i in range(5000)]
    vals += [0.0] * 30 + [-100.0, 100.0]
    ks = [1, 1000, 2516, 4000, len(vals)]
    # buckets=5 puts a linear boundary pair at -20/20 -> the middle bucket
    # genuinely straddles zero and stalls
    got = _run(spark, vals, ks, buckets=5, band_limit=40)
    assert got == _truth(vals, ks)


def test_grouped_matches_per_group_truth(spark) -> None:
    """grouped_kth_smallest vs sorted() per group — including a group
    whose ranks collide (n=1) and duplicate-heavy groups."""
    from signalk_parquet_spark.operators.selection import grouped_kth_smallest

    rng = random.Random(21)
    rows = []
    for g, n in (("en", 700), ("zh", 300), ("de", 1)):
        rows += [(g, round(rng.uniform(-50, 50), 3)) for _ in range(n)]
    rows += [("en", None)]  # nulls excluded per group
    df = spark.createDataFrame(rows, "lang string, x double").repartition(8)
    ks = {"en": [1, 350, 700], "zh": [1, 150, 300], "de": [1, 1]}
    got = {
        (r["lang"], r["k"]): r["value"]
        for r in grouped_kth_smallest(df, "x", "lang", ks).collect()
    }
    by_g: dict[str, list[float]] = {}
    for g, v in rows:
        if v is not None:
            by_g.setdefault(g, []).append(v)
    want = {
        (g, k): sorted(by_g[g])[k - 1] for g, kl in ks.items() for k in kl
    }
    assert got == want
    # multi-round under tiny buckets: every group still converges in the
    # same shared jobs
    got2 = {
        (r["lang"], r["k"]): r["value"]
        for r in grouped_kth_smallest(
            df, "x", "lang", ks, buckets=4, band_limit=20
        ).collect()
    }
    assert got2 == want


def test_grouped_validation(spark) -> None:
    import pytest

    from signalk_parquet_spark.operators.selection import grouped_kth_smallest

    df = spark.createDataFrame([("a", 1.0)], "g string, x double")
    with pytest.raises(ValueError, match="non-empty"):
        grouped_kth_smallest(df, "x", "g", {})
    with pytest.raises(ValueError, match="outside"):
        grouped_kth_smallest(df, "x", "g", {"a": [2]})
    with pytest.raises(ValueError, match="outside"):
        grouped_kth_smallest(df, "x", "g", {"missing": [1]})
    with pytest.raises(ValueError, match="empty rank list"):
        grouped_kth_smallest(df, "x", "g", {"a": []})


def test_grouped_callable_ranks(spark) -> None:
    """ks_by_group as a callable: ranks derive from the core's own seed
    counts (no caller-side counts job) and must equal the dict form."""
    from signalk_parquet_spark.operators.selection import grouped_kth_smallest

    rows = [("a", float(i)) for i in range(10)] + [("b", float(i)) for i in range(5)]
    df = spark.createDataFrame(rows, "g string, x double")
    via_fn = {
        (r["g"], r["k"]): r["value"]
        for r in grouped_kth_smallest(
            df, "x", "g", lambda n: sorted({1, n // 2, n})
        ).collect()
    }
    via_dict = {
        (r["g"], r["k"]): r["value"]
        for r in grouped_kth_smallest(
            df, "x", "g", {"a": [1, 5, 10], "b": [1, 2, 5]}
        ).collect()
    }
    assert via_fn == via_dict == {
        ("a", 1): 0.0, ("a", 5): 4.0, ("a", 10): 9.0,
        ("b", 1): 0.0, ("b", 2): 1.0, ("b", 5): 4.0,
    }


def test_max_groups_guard(spark) -> None:
    """Above max_groups the call must fail loudly (driver histogram
    traffic and the band CASE scale with G), naming the sorted path."""
    from signalk_parquet_spark.operators.selection import grouped_kth_smallest

    rows = [(f"g{i}", float(j)) for i in range(5) for j in range(3)]
    df = spark.createDataFrame(rows, "g string, x double")
    with pytest.raises(ValueError, match="grouped_kth_smallest_sorted"):
        grouped_kth_smallest(df, "x", "g", lambda n: [1], max_groups=3)
    # at the boundary it still runs
    got = grouped_kth_smallest(df, "x", "g", lambda n: [1], max_groups=5)
    assert got.count() == 5


RANKS_SQL = "array(1, greatest(1, n div 2), greatest(1, (9*n) div 10), n)"


def test_sorted_path_matches_banded(spark) -> None:
    """grouped_kth_smallest_sorted (the high-G hash-sort path) must be a
    drop-in twin of the banded operator: same schema, identical (group,
    k, value) picks on duplicate-heavy data with nulls in both columns."""
    from signalk_parquet_spark.operators.selection import (
        grouped_kth_smallest,
        grouped_kth_smallest_sorted,
    )

    rng = random.Random(33)
    rows = []
    for g, n in (("en", 400), ("zh", 37), ("de", 1)):
        rows += [(g, float(rng.choice([1.0, 2.5, 2.5, 7.0, rng.uniform(0, 9)])))
                 for _ in range(n)]
    rows += [("en", None), (None, 5.0)]
    df = spark.createDataFrame(rows, "lang string, x double").repartition(8)

    def per_group(n: int) -> list[int]:
        return sorted({1, max(1, n // 2), max(1, (9 * n) // 10), n})

    banded = {
        (r["lang"], r["k"]): r["value"]
        for r in grouped_kth_smallest(df, "x", "lang", per_group).collect()
    }
    srt = grouped_kth_smallest_sorted(df, "x", "lang", RANKS_SQL)
    assert srt.columns == ["lang", "k", "value"]
    assert {(r["lang"], r["k"]): r["value"] for r in srt.collect()} == banded


def test_sorted_path_single_exchange_no_driver(spark) -> None:
    """Plan shape: ONE hash exchange on the group key, no range exchange
    (the global-sort shape), nothing collected — the property that lets
    it scale to 10^5+ groups where the banded path's guard trips."""
    from signalk_parquet_spark.operators.selection import grouped_kth_smallest_sorted

    df = spark.createDataFrame(
        [(f"g{i % 50}", float(i)) for i in range(500)], "g string, x double"
    ).repartition(8)
    plan = (
        grouped_kth_smallest_sorted(df, "x", "g", RANKS_SQL)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.lower().count("hashpartitioning(g") == 1, plan
    assert "rangepartitioning" not in plan.lower(), plan


def test_small_groups_skip_histogram_rounds(spark) -> None:
    """Fast path: when every group's seed count is <= band_limit, the
    operator runs ONLY the seed aggregate + the shared finish window — no
    histogram round exists to charge. Pinned RELATIVELY: the same data
    under a tiny band_limit (forcing histogram rounds) must use strictly
    more jobs, and the small-group run at most the seed+finish pair
    (a job per AQE stage materialization at worst)."""
    from signalk_parquet_spark.operators.selection import grouped_kth_smallest

    rows = [(f"g{i % 4}", float(i)) for i in range(4000)]
    df = spark.createDataFrame(rows, "g string, x double").repartition(8)
    df.count()  # warm the frame so job counts below are the operator's own
    sc = spark.sparkContext

    def jobs(tag: str, **kw) -> tuple[int, dict]:
        sc.setJobGroup(tag, "selection job count")
        try:
            out = {
                (r["g"], r["k"]): r["value"]
                for r in grouped_kth_smallest(
                    df, "x", "g", lambda n: [1, n // 2, n], **kw
                ).collect()
            }
        finally:
            sc.setJobGroup("", "")
        tracker = sc.statusTracker()
        return len(tracker.getJobIdsForGroup(tag)), out

    fast_jobs, fast_out = jobs("selfast", band_limit=65536)
    slow_jobs, slow_out = jobs("selslow", band_limit=64, buckets=4)
    assert fast_out == slow_out
    assert fast_jobs < slow_jobs, (fast_jobs, slow_jobs)
    # two logical round-trips (seed aggregate, finish window) + the result
    # LocalTableScan collect; AQE materializes each shuffle stage as its
    # own job, so the ceiling is 3 jobs per query + 1 — any histogram
    # round would add >= 2 more (measured: fast 7 vs slow 13)
    assert fast_jobs <= 7, fast_jobs


def _py_mad_outliers(rows, c):
    """Brute-force MAD truth: rows = [(id, group, value)]; lower medians."""
    by_g = {}
    for _id, g, v in rows:
        if g is None or v is None:
            continue
        by_g.setdefault(g, []).append((_id, v))
    out = {}
    for g, items in by_g.items():
        vals = sorted(v for _, v in items)
        med = vals[(len(vals) + 1) // 2 - 1]
        devs = sorted(abs(v - med) for v in vals)
        mad = devs[(len(devs) + 1) // 2 - 1]
        for _id, v in items:
            if abs(v - med) > c * mad:
                out[(g, _id)] = (med, mad, abs(v - med))
    return out


def test_grouped_mad_outliers_matches_python_truth(spark):
    """Both selection paths (banded + sorted) against a brute-force truth,
    on groups engineered to hit the contract corners: an even-count group
    (lower median, not interpolation), a MAD=0 group (over half the values
    at the median -> every dev>0 row is an outlier, the documented
    degradation), NULL values and NULL groups excluded."""
    from signalk_parquet_spark.operators.selection import grouped_mad_outliers

    rows = (
        # en: clean group w/ an extreme outlier, even count
        [(i, "en", 100 + i) for i in range(8)] + [(90, "en", 10_000)]
        # de: MAD = 0 (6 of 9 at the median)
        + [(100 + i, "de", 50) for i in range(6)]
        + [(110, "de", 51), (111, "de", 49), (112, "de", 500)]
        # fr: MAD = 1, every deviation <= 2*MAD -> never fires
        + [
            (200 + i, "fr", v)
            for i, v in enumerate([70, 70, 70, 71, 71, 71, 72, 72, 73, 73])
        ]
        # nulls never count
        + [(300, None, 1), (301, "en", None)]
    )
    df = spark.createDataFrame(rows, "doc_id long, lang string, n_chars long")
    want = _py_mad_outliers(rows, 2)
    for sorted_path in (False, True):
        got = {
            (r["lang"], r["doc_id"]): (r["med"], r["mad"], r["dev"])
            for r in grouped_mad_outliers(
                df, "n_chars", "lang", c=2, sorted_path=sorted_path
            ).collect()
        }
        assert got == want, f"sorted_path={sorted_path}"
    # the MAD=0 group fired on every off-median row, nothing else
    de = {k for k in want if k[0] == "de"}
    assert de == {("de", 110), ("de", 111), ("de", 112)}
    assert not any(k[0] == "fr" for k in want)


def test_grouped_mad_outliers_sorted_plan_has_no_range_exchange(spark):
    from signalk_parquet_spark.operators.selection import grouped_mad_outliers

    rows = [(i, f"g{i % 5}", (i * 37) % 200) for i in range(100)]
    df = spark.createDataFrame(rows, "doc_id long, lang string, n_chars long")
    plan = (
        grouped_mad_outliers(df, "n_chars", "lang", c=2, sorted_path=True)
        ._jdf.queryExecution().executedPlan().toString().lower()
    )
    assert "rangepartitioning" not in plan  # per-group sorts hash-partition
    assert "cartesianproduct" not in plan
