"""mixture_epochs invariants: the rebalanced mix actually hits each
source's equal-share character budget (within one document — the rule
includes the budget-crossing doc whole), and the copy counts decompose as
epochs + a 0/1 remainder fill."""

from __future__ import annotations

import pyspark.sql.functions as F

from signalk_parquet_spark import registry


def test_budget_met_within_one_doc(spark, sf_smoke):
    df = registry.queries()["mixture_epochs"](spark, sf_smoke).persist()
    df.count()
    total = registry.load(spark, sf_smoke, "documents").agg(
        F.sum("n_chars").alias("t"),
        F.countDistinct("source").alias("s"),
    ).collect()[0]
    budget = total["t"] // total["s"]
    rows = (
        df.groupBy("source")
        .agg(
            F.sum(F.col("n_copies") * F.col("n_chars")).alias("served"),
            F.max("n_chars").alias("max_doc"),
            F.max("epochs").alias("ep_hi"),
            F.min("epochs").alias("ep_lo"),
        )
        .collect()
    )
    assert len(rows) > 1
    for r in rows:
        # served in [budget, budget + max_doc): the fill stops at the doc
        # that crosses the budget and includes it whole
        assert budget <= r["served"] < budget + r["max_doc"], r
        # epochs is a per-source constant
        assert r["ep_hi"] == r["ep_lo"], r
    bad = df.filter(
        (F.col("extra") < 0)
        | (F.col("extra") > 1)
        | (F.col("n_copies") != F.col("epochs") + F.col("extra"))
    ).count()
    assert bad == 0
    df.unpersist()


def test_approx_twin_matches_independent_python_rule(spark, sf_smoke):
    """mixture_epochs_approx: epochs identical to the exact gate per
    source, and the map-only remainder membership reproduces an
    INDEPENDENT Python md5 recomputation of frac(md5(doc_id)) < rem/t
    (the same differential style as the scrub fuzz tests)."""
    import hashlib

    from signalk_parquet_spark.queries_curation import mixture_epochs_approx

    exact = registry.queries()["mixture_epochs"](spark, sf_smoke)
    approx = mixture_epochs_approx(spark, sf_smoke)
    assert approx.columns == exact.columns
    je = {
        r["source"]: r["epochs"]
        for r in exact.select("source", "epochs").distinct().collect()
    }
    rows = approx.collect()
    per_src = {}
    for r in rows:
        per_src.setdefault(r["source"], []).append(r)
        assert r["epochs"] == je[r["source"]], r
        assert r["n_copies"] == r["epochs"] + r["extra"], r
    # independent recomputation of the threshold rule
    docs = registry.load(spark, sf_smoke, "documents").select(
        "doc_id", "source", "n_chars"
    ).collect()
    t_chars = {}
    total = 0
    for d in docs:
        t_chars[d["source"]] = t_chars.get(d["source"], 0) + d["n_chars"]
        total += d["n_chars"]
    budget = total // len(t_chars)
    got = {(r["doc_id"], r["source"]): r["extra"] for r in rows}
    n_extra = 0
    for d in docs:
        t = t_chars[d["source"]]
        rem = budget % t
        frac = (
            int(hashlib.md5(str(d["doc_id"]).encode()).hexdigest()[:8], 16)
            / float(1 << 32)
        )
        want = 1 if frac < rem / t else 0
        assert got[(d["doc_id"], d["source"])] == want, (d, want)
        n_extra += want
    assert 0 < n_extra < len(docs)  # the threshold separates, not degenerate


def test_registry_evict_tables_unpersists_scoped_entries(spark, tmp_path):
    """registry.evict_tables drops exactly the cached tables under one sf
    dir (the ramp-loop cleanup contract): the frame is unpersisted and a
    re-load rebuilds rather than returning the stale object."""
    import pyspark.sql.functions as F

    src = registry.load(spark, "/root/testdata/sf0.001", "documents")
    out = str(tmp_path / "corpus")
    src.limit(10).write.parquet(f"{out}/documents.parquet")
    df = registry.load(spark, out, "documents")
    assert df.storageLevel.useMemory  # load() persisted it
    other = registry.load(spark, "/root/testdata/sf0.001", "documents")
    registry.evict_tables(spark, out)
    assert not df.storageLevel.useMemory  # unpersisted
    assert other.storageLevel.useMemory  # other dirs untouched
    df2 = registry.load(spark, out, "documents")
    assert df2 is not df  # cache entry really dropped
    registry.evict_tables(spark, out)
