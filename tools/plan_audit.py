"""Whole-registry plan-invariant audit: every registered gate's executed
plan is scanned for the three regressions that silently kill 100 TB
scale, with named allowlists for the documented exceptions:

  CARTESIAN  CartesianProduct — never acceptable; allowlist is empty.
  PYUDF      BatchEvalPython (row-at-a-time Python UDF) — never
             acceptable; Arrow paths (ArrowEvalPython, MapInPandas,
             FlatMapGroupsInPandas[WithState]) are the sanctioned UDF
             shapes and don't trip this.
  RANGE      rangepartitioning (global sort / repartitionByRange) —
             acceptable only where documented: result-sized or
             vocab-bounded orderings, never a data-sized exchange.
  BNLJ       BroadcastNestedLoopJoin — acceptable only where the
             broadcast side is metadata-sized by construction (exact-kNN
             query sets, recall-evaluation truth sets, scalar-subquery
             comparisons); those gates are enumerated.

The audit BUILDS each gate's DataFrame (driver-side stages of eager
operators run, data-sized execution doesn't) and inspects
executedPlan(). Exit 1 on any unallowlisted marker, so round-close
batteries can gate on it. A marker DISAPPEARING from an allowlisted
gate prints a note (trim the list) but doesn't fail.

Run: python tools/plan_audit.py [sf_dir]   (~2-4 min at sf0.001)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

#: gates whose BroadcastNestedLoopJoin side is metadata-sized by design
ALLOW_BNLJ = {
    # exact kNN / recall evaluations: the broadcast side is the bounded
    # query/truth set (bounded_collect contract in operators/similarity.py)
    "ann_ivf_kmeans", "ann_hard_negatives", "ann_recall", "ann_scalar_quant",
    "ivf_kmeans_recall",
    "ivf_recall", "ivfpq_recall", "knn_bruteforce", "pq_recall",
    "semdedup_recall", "curation_diverse", "decontaminate_semantic",
    # one-row scalar frames joined for normalization/thresholds
    "bm25_topk", "decontaminate_bm25", "dsir_weights", "heavy_hitters_2pass",
    "mixture_epochs",
    "source_divergence",
    # TPC-H scalar subqueries (avg threshold / substring country set)
    "tpch_q11", "tpch_q22",
}

#: gates with a documented range exchange (never data-sized at scale)
ALLOW_RANGE = {
    # reference response contract: time-ordered aligned series — the sort
    # is over BUCKETED result rows, not input rows
    "align_pivot_1h",
    # vocab-sized piece table ordering, bounded by MAX_SEED_ROWS
    "unigram_estep_counts",
}

MARKERS = (
    ("cartesianproduct", "CARTESIAN", frozenset()),
    ("batchevalpython", "PYUDF", frozenset()),
    ("rangepartitioning", "RANGE", ALLOW_RANGE),
    ("broadcastnestedloopjoin", "BNLJ", ALLOW_BNLJ),
)


def audit_plan(name: str, plan_lower: str) -> tuple[list[str], list[str]]:
    """Returns (violations, stale_allowlist_notes) for one gate's plan."""
    bad, stale = [], []
    for needle, label, allow in MARKERS:
        present = needle in plan_lower
        if present and name not in allow:
            bad.append(label)
        elif not present and name in allow:
            stale.append(label)
    return bad, stale


def main() -> int:
    from signalk_parquet_spark import registry
    from signalk_parquet_spark.session import get_spark

    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("plan-audit")
    failures: dict[str, list[str]] = {}
    notes: dict[str, list[str]] = {}
    qs = registry.queries()
    for name, fn in qs.items():
        try:
            plan = fn(spark, sf)._jdf.queryExecution().executedPlan().toString()
        except Exception as e:  # a gate that cannot even plan is a failure
            failures[name] = [f"PLAN-ERROR:{type(e).__name__}"]
            continue
        bad, stale = audit_plan(name, plan.lower())
        if bad:
            failures[name] = bad
        if stale:
            notes[name] = stale
    print(f"plan-audited {len(qs)} gates at {sf}")
    for name, labels in sorted(notes.items()):
        print(f"  note: {name} allowlisted for {','.join(labels)} but clean — trim")
    if failures:
        for name, labels in sorted(failures.items()):
            print(f"  FAIL {name}: {','.join(labels)}")
        return 1
    print("all plans clean (allowlists: "
          f"{len(ALLOW_BNLJ)} BNLJ, {len(ALLOW_RANGE)} RANGE)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
