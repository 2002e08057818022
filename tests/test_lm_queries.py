"""Engine invariants for the model-based curation gates (queries_lm) —
properties the oracle parity check can't express: conservation laws between
the gates' outputs and the raw corpus, and decision-rule consistency."""

from __future__ import annotations

from pyspark.sql import functions as F

from signalk_parquet_spark import registry


def test_doc_embed_buckets_conserve_token_count(spark, sf_smoke):
    """The hashed bag-of-words histogram must partition the tokens: bucket
    counts sum to the doc's token count for EVERY document (no token
    dropped or double-bucketed by the hash % mapping)."""
    qs = registry.queries()
    # bow ships as a comma-joined string since r5 (the driver's pandas
    # canonicalizer can't hash list cells) — split it back for the sum
    bow = qs["doc_embed_hashed"](spark, sf_smoke).select(
        "doc_id", F.split("bow", ",").cast("array<long>").alias("bow")
    )
    stats = qs["text_token_stats"](spark, sf_smoke).select("doc_id", "n_tokens")
    bad = (
        bow.select("doc_id", F.aggregate("bow", F.lit(0).cast("long"), lambda a, x: a + x).alias("s"))
        .join(stats, "doc_id")
        .filter(F.col("s") != F.col("n_tokens"))
        .count()
    )
    assert bad == 0


def test_quality_classifier_keep_matches_score_sign(spark, sf_smoke):
    """keep is defined on the integer sum; it must agree with the float
    score's sign everywhere (sign of mean == sign of sum), and both
    classes must be populated — a degenerate all-keep corpus would make
    the gate a 0-vs-0-style non-test."""
    df = registry.queries()["quality_classifier"](spark, sf_smoke)
    bad = df.filter(
        ((F.col("keep") == 1) & (F.col("clf_score") < 0))
        | ((F.col("keep") == 0) & (F.col("clf_score") >= 0))
    ).count()
    assert bad == 0
    kept = df.filter(F.col("keep") == 1).count()
    assert 0 < kept < df.count()


def test_source_divergence_is_a_bounded_distance(spark, sf_smoke):
    """L1 distance between two probability distributions lies in [0, 2);
    every source must show SOME divergence on a finite sample (exact zero
    would mean its empirical distribution equals the corpus', vanishingly
    unlikely), and the integer numerator must reproduce the float."""
    rows = registry.queries()["source_divergence"](spark, sf_smoke).collect()
    assert len(rows) > 1
    for r in rows:
        assert 0.0 < r["l1"] < 2.0
        assert r["l1"] == r["l1_num"] / (r["n_src_tokens"] * sum(x["n_src_tokens"] for x in rows))


def test_lm_bigram_score_bounds_and_boilerplate_ordering(spark, sf_smoke):
    """Every score lies in [1, total_bigrams] (a bigram's corpus count is
    at least its own occurrence), and documents DIFFER in score — the gate
    separates rote from rare rather than emitting a constant."""
    df = registry.queries()["lm_bigram_score"](spark, sf_smoke)
    total = df.agg(F.sum("n_bigrams")).collect()[0][0]
    bad = df.filter((F.col("lm_score") < 1) | (F.col("lm_score") > total)).count()
    assert bad == 0
    assert df.select("lm_score").distinct().count() > 1
