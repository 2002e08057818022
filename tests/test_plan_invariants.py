"""Fast plan-invariant net over a representative gate subset (the full
166-gate sweep is tools/plan_audit.py, part of the round-close battery):
no CartesianProduct, no row-at-a-time Python UDF (BatchEvalPython), and
no range exchange / nested-loop join outside the audited allowlists.
The subset covers each family's plan shape — scans, joins, windows,
dedup equi-joins, ANN (an allowlisted BNLJ), selection, sampling,
ordering — so a regression in a shared operator fails the suite in
seconds instead of waiting for the full audit."""

from __future__ import annotations

import pytest

from signalk_parquet_spark import registry

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"))

from plan_audit import audit_plan  # noqa: E402

SUBSET = [
    # new r11 gates
    "group_length_clip", "warc_dom_extract", "corpus_shuffle_rank",
    # one per family: bucket agg, priority-dedup join, window, episodes
    "bucket_avg_1h", "priority_dedup_1h", "sma_1h_w5", "episodes_error",
    # dedup equi-join family + connected components
    "dedup_minhash_lsh", "dedup_cluster_cc",
    # ANN exact rung (allowlisted BNLJ — must stay allowlisted, not grow)
    "knn_bruteforce",
    # selection + sampling + tpch join shape
    "group_kth_values", "weighted_sample_aes", "tpch_q3",
    # retrieval: broadcast-everything BM25 + WindowGroupLimit top-k
    # (allowlisted one-row-stats BNLJ — must stay a single one)
    "bm25_topk",
    # grouped MG 2-pass: map-only sketches + broadcast recount
    "grouped_heavy_hitters",
]


@pytest.mark.parametrize("name", SUBSET)
def test_plan_invariants(name, spark, sf_smoke) -> None:
    fn = registry.queries()[name]
    plan = fn(spark, sf_smoke)._jdf.queryExecution().executedPlan().toString()
    bad, _stale = audit_plan(name, plan.lower())
    assert not bad, f"{name}: {bad}\n{plan[:2000]}"
