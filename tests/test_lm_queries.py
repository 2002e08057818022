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


def test_dsir_weights_separate_target_from_pool(spark, sf_smoke):
    """DSIR must do its one job: rank target-language (en) documents above
    the raw pool on average. Also: n_feats conserves the bigram count
    (every bigram hashed into exactly one bucket), and keep agrees with
    the integer score's sign everywhere."""
    qs = registry.queries()
    df = qs["dsir_weights"](spark, sf_smoke)
    docs = registry.load(spark, sf_smoke, "documents").select("doc_id", "lang")
    j = df.join(docs, "doc_id")
    means = (
        j.withColumn("is_en", (F.col("lang") == "en").cast("int"))
        .groupBy("is_en")
        .agg(F.avg("dsir_score").alias("m"))
        .collect()
    )
    by = {r["is_en"]: r["m"] for r in means}
    assert by[1] > by[0], by
    lm = qs["lm_bigram_score"](spark, sf_smoke).select("doc_id", "n_bigrams")
    bad = (
        df.join(lm, "doc_id")
        .filter(F.col("n_feats") != F.col("n_bigrams"))
        .count()
    )
    assert bad == 0
    sign_bad = df.filter(
        ((F.col("keep") == 1) & (F.col("score_num") <= 0))
        | ((F.col("keep") == 0) & (F.col("score_num") > 0))
    ).count()
    assert sign_bad == 0


def test_perplexity_buckets_are_balanced_ordered_terciles(spark, sf_smoke):
    """Per language: ntile(3) bucket sizes differ by at most 1, buckets are
    ordered by score (head's min >= middle's max is the DESC contract,
    modulo exact-tie splits, so assert on the non-strict boundary), and
    keep is exactly bucket <= 2."""
    df = registry.queries()["perplexity_buckets"](spark, sf_smoke)
    sizes = df.groupBy("lang", "bucket").count().collect()
    per_lang: dict[str, list[int]] = {}
    for r in sizes:
        per_lang.setdefault(r["lang"], []).append(r["count"])
    for lang, counts in per_lang.items():
        assert len(counts) == 3, (lang, counts)
        assert max(counts) - min(counts) <= 1, (lang, counts)
    bounds = (
        df.groupBy("lang", "bucket")
        .agg(F.min("lm_score").alias("lo"), F.max("lm_score").alias("hi"))
        .collect()
    )
    b = {(r["lang"], r["bucket"]): (r["lo"], r["hi"]) for r in bounds}
    for (lang, bucket), (lo, hi) in b.items():
        if bucket < 3:
            nxt = b[(lang, bucket + 1)]
            assert lo >= nxt[1], (lang, bucket)
    keep_bad = df.filter(
        F.col("keep") != (F.col("bucket") <= 2).cast("int")
    ).count()
    assert keep_bad == 0


def test_perplexity_buckets_approx_agrees_with_exact(spark, sf_smoke):
    """The map-only approx path (production form, no per-lang window) must
    reproduce the exact gate's semantics: same columns, same keep rule,
    monotone buckets, and per-doc bucket agreement outside the sketch's
    cutpoint band (>= 95% overall at test scale; with default accuracy the
    band is empty here, but the bound is what the operator promises)."""
    from signalk_parquet_spark.queries_lm import perplexity_buckets_approx

    exact = registry.queries()["perplexity_buckets"](spark, sf_smoke)
    approx = perplexity_buckets_approx(spark, sf_smoke)
    assert approx.columns == exact.columns
    j = exact.select(
        "doc_id", F.col("bucket").alias("b_exact")
    ).join(approx.select("doc_id", F.col("bucket").alias("b_approx")), "doc_id")
    n = j.count()
    agree = j.filter(F.col("b_exact") == F.col("b_approx")).count()
    assert n > 0 and agree / n >= 0.95, (agree, n)
    # keep must follow bucket in the approx path too
    bad = approx.filter(
        F.col("keep") != (F.col("bucket") <= 2).cast("int")
    ).count()
    assert bad == 0
    # monotone: a bucket-1 doc never scores below a bucket-2 doc of the
    # same lang (threshold construction guarantees it; assert anyway)
    b = (
        approx.groupBy("lang", "bucket")
        .agg(F.min("lm_score").alias("lo"), F.max("lm_score").alias("hi"))
        .collect()
    )
    bb = {(r["lang"], r["bucket"]): (r["lo"], r["hi"]) for r in b}
    for (lang, bucket), (lo, hi) in bb.items():
        nxt = bb.get((lang, bucket + 1))
        if nxt is not None:
            assert lo >= nxt[1], (lang, bucket, lo, nxt[1])
