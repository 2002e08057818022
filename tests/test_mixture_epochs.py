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
