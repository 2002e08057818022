"""Span-level dedup operators (BASELINE extension set): exact substring-span
duplication stats (the window-hash form of exact-substring dedup from
"Deduplicating Training Data Makes Language Models Better", Lee et al. 2022)
and winnowing fingerprints (Schleimer/Wilkerson/Aiken, SIGMOD 2003 — the
MOSS sketch).

Both reduce a document to a SMALL set of integer hashes and find duplication
through equality joins on those hashes — never a pairwise text comparison:

- substring spans: every K-word window, hashed; a span that appears in more
  than one document is literally copied text. The per-window frequency table
  shuffles on a 48-bit key space (balanced at any scale), and the per-doc
  roll-up is a second hash agg. Output is per-document duplication stats —
  the signal used to strip boilerplate/copypasta before training.
- winnowing: positional n-gram hashes, then the minimum of each w-wide
  window of hashes, de-duplicated. Guarantees any shared run of at least
  w+n-1 tokens produces at least one shared fingerprint, while storing only
  ~2/(w+1) of the hashes — the sketch that makes span-level matching
  affordable at corpus scale. Candidate pairs come from an equi-join on the
  fingerprint value.

Scale: both operators are explode -> hash-agg -> equi-join pipelines; no
cross joins, no windows over unbounded partitions, no Python. At 100 TB the
explode factor (~n_tokens per doc) is the same one every tokenizer pass
already pays, and the frequency tables shuffle-partition cleanly on the
hash keys.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import hashed_grams, shingles, tokens


def _window_hashes(text_col, k: int) -> F.Column:
    """Distinct 48-bit hashes of every k-word window of the document."""
    return F.array_distinct(hashed_grams(shingles(tokens(text_col), k)))


def substring_span_stats(
    df: DataFrame, id_col: str, text_col: str, k: int = 8
) -> DataFrame:
    """Per-document duplicated-span stats: of the document's distinct K-word
    windows, how many also occur in at least one OTHER document (or more than
    once — any window with corpus frequency > 1 is duplicated text).

    Returns (id, n_spans, n_dup_spans, dup_frac); documents shorter than K
    tokens have no windows and drop out (both engines agree: exploding an
    empty array yields no rows). dup_frac is an exact integer ratio.
    """
    ex = df.select(
        F.col(id_col).alias("id"), F.explode(_window_hashes(text_col, k)).alias("wh")
    )
    freq = ex.groupBy("wh").agg(F.count(F.lit(1)).alias("c"))
    return (
        ex.join(freq, "wh")
        .groupBy("id")
        .agg(
            F.count(F.lit(1)).alias("n_spans"),
            F.sum(F.when(F.col("c") > 1, 1).otherwise(0)).alias("n_dup_spans"),
        )
        .select(
            "id",
            "n_spans",
            "n_dup_spans",
            (F.col("n_dup_spans").cast("double") / F.col("n_spans")).alias("dup_frac"),
        )
    )


def winnowing_fingerprints(
    df: DataFrame, id_col: str, text_col: str, n: int = 3, w: int = 4
) -> DataFrame:
    """(id, fp) rows: the document's winnowed fingerprint set — the distinct
    minima of each w-wide window over the POSITIONAL n-gram hash sequence
    (order matters, so the grams are not de-duplicated before windowing).

    The hash sequence is projected into its own column BEFORE the window
    transform: a lambda body may only reference the outer value as a bound
    attribute. Inlining the tokenize→md5 chain into the lambda makes Spark's
    interpreted higher-order-function path re-evaluate the WHOLE chain once
    per window element — measured 186 s vs 3 s at sf0.1 (~50 windows/doc =
    ~50x recompute). The same rule does not bite transform(expr, f): there
    the input array is evaluated once and f maps its elements."""
    hs = F.col("hs")
    fps = F.when(
        F.size(hs) >= w,
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(1), F.size(hs) - (w - 1)),
                lambda i: F.array_min(F.slice(hs, i, w)),
            )
        ),
    ).otherwise(F.array().cast("array<long>"))
    return df.select(
        F.col(id_col).alias("id"),
        hashed_grams(shingles(tokens(text_col), n)).alias("hs"),
    ).select("id", F.explode(fps).alias("fp"))


def winnowing_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    w: int = 4,
    min_shared: int = 2,
    max_df: int | None = 30,
) -> DataFrame:
    """Document pairs sharing at least ``min_shared`` winnowed fingerprints
    — the candidate set for span-level plagiarism/copy detection. The join
    is an equality join on the fingerprint value; each unordered pair meets
    once per shared fingerprint (fingerprint sets are distinct per doc), so
    the group-count IS the shared-fingerprint count.

    ``max_df`` drops STOP-fingerprints appearing in more than that many
    documents before the self-join (the MOSS boilerplate filter). This is
    the scale guard, not a tuning knob: a fingerprint shared by d docs
    contributes d(d-1)/2 join pairs, so corpus-wide boilerplate makes the
    join quadratic in corpus size (measured: 30x docs -> 73x wall uncapped,
    -> ~10x capped, same output at bench scale where no bucket exceeds 24).
    A fingerprint in thousands of documents has no pair-discriminating
    value anyway — the signal near-dups share is their UNCOMMON spans. The
    hot set is tiny, so the guard is a broadcast anti-join."""
    fp = winnowing_fingerprints(df, id_col, text_col, n, w)
    if max_df is not None:
        hot = (
            fp.groupBy("fp")
            .agg(F.count(F.lit(1)).alias("df"))
            .filter(F.col("df") > max_df)
            .select("fp")
        )
        fp = fp.join(F.broadcast(hot), "fp", "left_anti")
    a, b = fp.alias("a"), fp.alias("b")
    return (
        a.join(b, (F.col("a.fp") == F.col("b.fp")) & (F.col("a.id") < F.col("b.id")))
        .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .agg(F.count(F.lit(1)).alias("n_shared"))
        .filter(F.col("n_shared") >= min_shared)
    )


def remove_duplicate_spans(
    df: DataFrame, id_col: str, text_col: str, k: int = 8
) -> DataFrame:
    """The TRANSFORM side of exact-substring dedup (Lee et al. 2022):
    rewrite each document with every corpus-duplicated K-word span removed.
    A word position is covered iff it lies inside at least one K-word
    window whose POSITIONAL hash occurs more than once corpus-wide (so
    intra-document repetition counts too, unlike substring_span_stats'
    distinct-per-doc frequencies). Documents shorter than K words pass
    through untouched.

    Returns (id, n_words, n_removed, cleaned) with n_removed the count of
    dropped word positions and ``cleaned`` the surviving words re-joined.

    Scale: explode → hash-agg frequency → explode covered positions →
    collect_set per doc — every shuffle keys on the 48-bit window hash or
    the doc id; the per-doc covered-position set is bounded by the doc's
    word count. The word filter runs as JVM higher-order functions over a
    PROJECTED coverage column (single-parameter lambdas touching only
    their own argument plus bound column attributes — the winnowing
    re-evaluation trap does not apply to column references)."""
    from pyspark.sql.window import Window

    base = df.select(F.col(id_col).alias("id"), tokens(text_col).alias("w"))
    whs = hashed_grams(shingles(F.col("w"), k))
    ex = base.select("id", F.posexplode(whs).alias("pos", "wh"))
    # corpus frequency as a WINDOW count over the hash: ONE evaluation of
    # the tokenize→shingle→md5 chain and one exchange serve both the
    # per-window count and the coverage filter (the count-table-join form
    # re-evaluates the exploded chain per branch — the lm_bigram_score
    # lesson, visible as twin Generate subtrees in the plan)
    dup = ex.withColumn(
        "c", F.count(F.lit(1)).over(Window.partitionBy("wh"))
    ).filter(F.col("c") > 1)
    cov = (
        dup.select(
            "id",
            F.explode(F.sequence(F.col("pos"), F.col("pos") + (k - 1))).alias("cidx"),
        )
        .groupBy("id")
        .agg(F.collect_set("cidx").alias("cov"))
    )
    return _apply_coverage(base, cov, k)


def _apply_coverage(base: DataFrame, cov: DataFrame, k: int) -> DataFrame:
    """Rewrite (id, w) docs dropping every word position in the per-doc
    coverage set — the shared tail of remove_duplicate_spans and
    redact_eval_spans. The word filter runs as JVM higher-order functions
    over a PROJECTED coverage column (single-parameter lambdas touching
    only their own argument plus bound column attributes — the winnowing
    re-evaluation trap does not apply to column references)."""
    joined = (
        base.join(cov, "id", "left")
        .withColumn("cov", F.coalesce("cov", F.array().cast("array<int>")))
        .withColumn("ix", F.sequence(F.lit(0), F.size("w") - 1))
    )
    kept = F.transform(
        F.filter(
            F.arrays_zip("w", "ix"),
            lambda z: ~F.array_contains(F.col("cov"), z["ix"]),
        ),
        lambda z: z["w"],
    )
    return joined.select(
        "id",
        F.size("w").cast("long").alias("n_words"),
        (F.size("w") - F.size(kept)).cast("long").alias("n_removed"),
        F.concat_ws(" ", kept).alias("cleaned"),
    )


def redact_eval_spans(
    train: DataFrame,
    eval_df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 8,
) -> DataFrame:
    """Eval-targeted SPAN redaction — the third decontamination response
    after drop-the-doc (decontaminate_ngram) and screen-then-verify
    (decontaminate_bloom): keep the training document but remove exactly
    the K-word spans that also occur in the eval/benchmark set, the way
    production pipelines salvage long documents contaminated by one
    quoted benchmark item. A train word position is covered iff it lies
    inside at least one K-window whose 48-bit hash is in the eval set's
    distinct window hashes.

    Returns (id, n_words, n_removed, cleaned) for every train doc.

    Removal is SINGLE-PASS (Lee et al.'s own construction): re-joining
    the words around a removed span can form a NEW junction K-gram, and
    on adversarial data that junction gram could itself be in the eval
    set — the operator does not iterate to fixpoint. Every gram that was
    in the ORIGINAL text is removed unconditionally; the test pins that
    any residue is junction-only (absent from the original's hash set).

    Scale: a true benchmark eval set's distinct hash list fits the
    broadcast threshold and Catalyst broadcasts the semi-join on its own;
    a corpus-sized eval side (like the gate's 10% test split at 100 TB)
    falls back to a hash-shuffle equi-join — which is why the hint is NOT
    forced here. The per-doc coverage rollup is the other exchange, same
    as remove_duplicate_spans. Both engines hash with the same md5 slice,
    so a hash collision (one in 2^48 per pair) redacts identically on
    both sides — membership is defined ON the hash."""
    base = train.select(F.col(id_col).alias("id"), tokens(text_col).alias("w"))
    whs = hashed_grams(shingles(F.col("w"), k))
    ex = base.select("id", F.posexplode(whs).alias("pos", "wh"))
    ev = (
        eval_df.select(
            F.explode(hashed_grams(shingles(tokens(text_col), k))).alias("wh")
        )
        .distinct()
    )
    cov = (
        ex.join(ev, "wh")
        .select(
            "id",
            F.explode(F.sequence(F.col("pos"), F.col("pos") + (k - 1))).alias("cidx"),
        )
        .groupBy("id")
        .agg(F.collect_set("cidx").alias("cov"))
    )
    return _apply_coverage(base, cov, k)
