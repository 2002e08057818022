"""BM25 retrieval + WindowGroupLimit top-k: python-truth differentials,
edge contracts (absent terms, NULL text, heavy ties), and the plan shapes
the 100 TB story rests on (both rewrite phases, single one-row BNLJ)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from signalk_parquet_spark.operators import retrieval


def _py_bm25(docs, queries, k1=1.2, b=0.75, rational=True):
    """Pure-python BM25 truth: docs = [(id, text)], queries = [(qid, term)].
    Mirrors the operator's fixed-order IEEE arithmetic exactly (same
    association order, python floats ARE doubles)."""
    toks = {d: t.split(" ") for d, t in docs}
    dl = {d: len(ts) for d, ts in toks.items()}
    n = len(docs)
    total = sum(dl.values())
    terms = {t for _, t in queries}
    tf = {}
    for d, ts in toks.items():
        for t in ts:
            if t in terms:
                tf[(d, t)] = tf.get((d, t), 0) + 1
    df = {}
    for (d, t) in tf:
        df[t] = df.get(t, 0) + 1
    scores = {}
    for qid, t in queries:
        for (d, tt), f in tf.items():
            if tt != t:
                continue
            idf = (float(n) - float(df[t]) + 0.5) / (float(df[t]) + 0.5)
            if not rational:
                idf = math.log(1.0 + idf)
            denom = float(f) + k1 * ((1.0 - b) + b * (float(dl[d]) / (float(total) / float(n))))
            c = idf * ((float(f) * (k1 + 1.0)) / denom)
            if rational:
                c = round(c * 1000000.0)  # ints: banker's-vs-half-up can't
                # disagree off the .5 boundary; boundary hits are asserted
                # absent below so python round() is a safe truth here
                assert abs(c - (idf * ((float(f) * (k1 + 1.0)) / denom)) * 1e6) != 0.5
            scores[(qid, d)] = scores.get((qid, d), 0) + c
    return scores


_DOCS = [
    (1, "join merge hash join"),
    (2, "stream window stream stream"),
    (3, "customer data query data"),
    (4, "join window data"),
    (5, "the a of and"),
    (6, "merge merge merge merge merge merge"),
    (7, "join"),
    (8, "data data data data window"),
]
_QUERIES = [
    ("qa", "join"),
    ("qa", "merge"),
    ("qb", "window"),
    ("qb", "data"),
    ("qc", "zebra"),  # absent from every doc -> no rows for qc
]


def test_bm25_rational_matches_python_truth(spark):
    docs = spark.createDataFrame(_DOCS, "doc_id long, text string")
    qs = spark.createDataFrame(_QUERIES, "query_id string, term string")
    got = {
        (r["query_id"], r["doc_id"]): r["score_micro"]
        for r in retrieval.bm25_scores(docs, qs, rational_idf=True).collect()
    }
    want = _py_bm25(_DOCS, _QUERIES, rational=True)
    assert got == want
    assert not any(q == "qc" for q, _ in got)


def test_bm25_log_idf_matches_python_truth(spark):
    docs = spark.createDataFrame(_DOCS, "doc_id long, text string")
    qs = spark.createDataFrame(_QUERIES, "query_id string, term string")
    got = {
        (r["query_id"], r["doc_id"]): r["score"]
        for r in retrieval.bm25_scores(docs, qs, rational_idf=False).collect()
    }
    want = _py_bm25(_DOCS, _QUERIES, rational=False)
    assert set(got) == set(want)
    for key in want:
        assert got[key] == pytest.approx(want[key], rel=1e-12)


def test_bm25_topk_rank_and_ties(spark):
    docs = spark.createDataFrame(_DOCS, "doc_id long, text string")
    qs = spark.createDataFrame(_QUERIES, "query_id string, term string")
    top = retrieval.bm25_topk(docs, qs, k=3, rational_idf=True).collect()
    by_q = {}
    for r in top:
        by_q.setdefault(r["query_id"], []).append(r)
    truth = _py_bm25(_DOCS, _QUERIES, rational=True)
    for qid, rows in by_q.items():
        rows.sort(key=lambda r: r["rank"])
        want = sorted(
            ((d, s) for (q, d), s in truth.items() if q == qid),
            key=lambda t: (-t[1], t[0]),
        )[:3]
        assert [(r["doc_id"], r["score_micro"]) for r in rows] == want
        assert [r["rank"] for r in rows] == list(range(1, len(rows) + 1))
    assert "qc" not in by_q


def test_topk_per_key_matches_python_truth(spark):
    # adversarial: heavy ties (score collisions) + skewed key sizes,
    # spread over many partitions so the WindowGroupLimit partial phase
    # really merges per-task survivors
    rows = [
        (k, i, (i * 7919) % 13)  # many duplicate scores per key
        for k in ("hot", "cold")
        for i in range(1, 401 if k == "hot" else 6)
    ]
    df = spark.createDataFrame(rows, "key string, id long, score long").repartition(16)
    order = [F.col("score").desc(), F.col("id").asc()]
    got = retrieval.topk_per_key(df, "key", order, 10)
    got_rows = {(r["key"], r["rank"], r["id"]) for r in got.collect()}
    want = set()
    for key in ("hot", "cold"):
        sub = sorted(
            (r for r in rows if r[0] == key), key=lambda r: (-r[2], r[1])
        )[:10]
        want |= {(key, i + 1, r[1]) for i, r in enumerate(sub)}
    assert got_rows == want


def test_topk_per_key_plans_window_group_limit(spark):
    """The operator's whole job is pinning Catalyst's bounded top-k
    rewrite: BOTH WindowGroupLimit phases must be present (Partial bounds
    the exchange to k rows per key per map task; Final re-limits after),
    so a refactor that defeats the rewrite — e.g. ranking with a
    non-rank-like expression — fails here instead of silently restoring
    the unbounded hot-key window."""
    df = spark.createDataFrame(
        [("a", i, i % 5) for i in range(100)], "key string, id long, score long"
    ).repartition(8)
    plan = (
        retrieval.topk_per_key(df, "key", [F.col("score").desc(), F.col("id")], 3)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "WindowGroupLimit" in plan
    assert "Partial" in plan and "Final" in plan


def test_topk_per_key_validates_params(spark):
    df = spark.createDataFrame([("a", 1, 1)], "key string, id long, score long")
    with pytest.raises(ValueError, match="k must be"):
        retrieval.topk_per_key(df, "key", [F.col("score")], 0)


def test_bm25_plan_shape(spark):
    """The 100 TB invariants: query-term/dfreq/stats sides broadcast (the
    only BNLJ is the one-row stats frame), no range exchange anywhere, no
    row-at-a-time python eval."""
    docs = spark.createDataFrame(_DOCS, "doc_id long, text string")
    qs = spark.createDataFrame(_QUERIES, "query_id string, term string")
    plan = (
        retrieval.bm25_topk(docs, qs, k=3, rational_idf=True)
        ._jdf.queryExecution().executedPlan().toString().lower()
    )
    assert "broadcasthashjoin" in plan
    assert "rangepartitioning" not in plan
    assert "cartesianproduct" not in plan
    assert "batchevalpython" not in plan
    # the stats cross-join is the single sanctioned one-row BNLJ
    assert plan.count("broadcastnestedloopjoin") <= 1
    # the top-k must ride Catalyst's bounded rewrite end-to-end
    assert "windowgrouplimit" in plan


def test_bm25_null_text_excluded_from_stats(spark):
    """A NULL-text doc must not count toward N (it has no postings and no
    length) — otherwise avgdl silently deflates. Scores with the null row
    present must equal scores on the corpus with it dropped."""
    docs = spark.createDataFrame(
        _DOCS + [(99, None)], "doc_id long, text string"
    )
    clean = spark.createDataFrame(_DOCS, "doc_id long, text string")
    qs = spark.createDataFrame(_QUERIES, "query_id string, term string")
    got = {
        (r["query_id"], r["doc_id"]): r["score_micro"]
        for r in retrieval.bm25_scores(docs, qs, rational_idf=True).collect()
    }
    want = {
        (r["query_id"], r["doc_id"]): r["score_micro"]
        for r in retrieval.bm25_scores(clean, qs, rational_idf=True).collect()
    }
    assert got == want


def test_bm25_duplicate_query_rows_deduped(spark):
    """A duplicated (query, term) row must not double-count that term —
    the query side is a term set, stated as a contract."""
    docs = spark.createDataFrame(_DOCS, "doc_id long, text string")
    qs = spark.createDataFrame(_QUERIES, "query_id string, term string")
    dup = spark.createDataFrame(
        _QUERIES + [("qa", "join"), ("qa", "join")], "query_id string, term string"
    )
    clean = {
        (r["query_id"], r["doc_id"]): r["score_micro"]
        for r in retrieval.bm25_scores(docs, qs, rational_idf=True).collect()
    }
    got = {
        (r["query_id"], r["doc_id"]): r["score_micro"]
        for r in retrieval.bm25_scores(docs, dup, rational_idf=True).collect()
    }
    assert got == clean


def test_topk_per_key_requires_order(spark):
    df = spark.createDataFrame([("a", 1, 1)], "key string, id long, score long")
    with pytest.raises(ValueError, match="order must be non-empty"):
        retrieval.topk_per_key(df, "key", [], 3)


def test_topk_per_key_composite_key(spark):
    rows = [
        (k, d, i, (i * 31) % 7)
        for k in ("a", "b")
        for d in ("d1", "d2")
        for i in range(1, 21)
    ]
    df = spark.createDataFrame(rows, "key string, day string, id long, score long")
    got = retrieval.topk_per_key(
        df, ["key", "day"], [F.col("score").desc(), F.col("id").asc()], 3
    )
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "WindowGroupLimit" in plan  # rewrite fires on composite keys too
    got_rows = {(r["key"], r["day"], r["rank"], r["id"]) for r in got.collect()}
    want = set()
    for k in ("a", "b"):
        for d in ("d1", "d2"):
            sub = sorted(
                (r for r in rows if r[0] == k and r[1] == d),
                key=lambda r: (-r[3], r[2]),
            )[:3]
            want |= {(k, d, i + 1, r[2]) for i, r in enumerate(sub)}
    assert got_rows == want


def test_topk_per_key_rejects_rank_collision(spark):
    """withColumn would silently REPLACE a caller's 'rank' column (and an
    order expression referencing the old one would resolve to the new) —
    the guard turns that corruption into an error (ADVICE r11)."""
    df = spark.createDataFrame(
        [("a", 1, 5)], "key string, id long, rank long"
    )
    with pytest.raises(ValueError, match="already has a 'rank' column"):
        retrieval.topk_per_key(df, "key", [F.col("id")], 3)


def test_bm25_mode_agreement_cross_sf(spark, sf_smoke, sf_oracle):
    """Gate-mode vs production-mode differential (VERDICT r11 #3): the
    driver gates the rational-idf mode (ln is cross-engine territory), a
    production caller runs the log-idf default. log(1+x) is strictly
    monotone in x, so per TERM the idf order is identical and single-term
    rankings agree exactly; multi-term score MIXES can reorder (the
    documented deviation, operators/retrieval.py module doc). This pins
    the agreement on the real fixture corpora at BOTH SFs: top-k SETS
    identical per query, ORDER identical except the known-divergent
    cases, which are enumerated — a new divergence is a real finding, not
    noise (scores are deterministic in both modes, so this cannot flake)."""
    from signalk_parquet_spark.queries_lm import _BM25_QUERIES
    from signalk_parquet_spark.registry import load

    # measured divergences (adjacent multi-term swaps only): sf0.001's
    # q_customer swaps (398,188) at ranks 5-6 and (128,37..205) at 7-9
    known_reorder = {(sf_smoke, "q_customer")}

    qs = spark.createDataFrame(_BM25_QUERIES, "query_id string, term string")
    for sf in (sf_smoke, sf_oracle):
        docs = load(spark, sf, "documents")
        per_mode = {}
        for rational in (True, False):
            rows = retrieval.bm25_topk(docs, qs, k=10, rational_idf=rational)
            per = {}
            for r in sorted(
                rows.collect(), key=lambda r: (r["query_id"], r["rank"])
            ):
                per.setdefault(r["query_id"], []).append(r["doc_id"])
            per_mode[rational] = per
        assert set(per_mode[True]) == set(per_mode[False])
        for q, gate_order in per_mode[True].items():
            prod_order = per_mode[False][q]
            assert set(gate_order) == set(prod_order), (sf, q)
            if (sf, q) not in known_reorder:
                assert gate_order == prod_order, (sf, q)
