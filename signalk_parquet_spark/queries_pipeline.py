"""Warehouse / training-data pipeline analytics beyond the reference's
surface (BASELINE extension set): cohort retention, conversion funnels,
embedding centroids, and IDF-weighted term scoring — the batch shapes an
LLM-data curation stack runs next to dedup/similarity.

Scale notes: every query is hash-aggregation + equi-join only (cohort and
funnel shuffle on user_id once; the centroid is a posexplode + two-level
agg; tf-idf is two hash aggs and a broadcast of the tiny vocabulary) — no
cross joins, no windows over unbounded partitions, no driver loops.
Exactness: counts are integers; every ratio/mean is integer-derived in a
fixed operation order, so the DuckDB oracle matches bit-for-bit (CLAUDE.md
rules 2/3/6 — micro-unit sums for float aggregation, BIGINT casts for
DuckDB's HUGEINT sums).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .registry import load, register

_WEEK_MS = 7 * 24 * 3600 * 1000
_HOUR_MS = 3600_000


# --- weekly cohort retention ---------------------------------------------------------
@register(
    "cohort_retention",
    f"""
    WITH act AS (
      SELECT DISTINCT user_id, date_trunc('week', ts) AS act_week FROM events
    ), cohort AS (
      SELECT user_id, min(act_week) AS cohort_week FROM act GROUP BY 1
    )
    SELECT strftime(c.cohort_week, '%Y-%m-%dT%H:%M:%SZ') AS cohort_week,
           (epoch_ms(a.act_week) - epoch_ms(c.cohort_week)) // {_WEEK_MS} AS week_n,
           count(*) AS n_users
    FROM cohort c JOIN act a USING (user_id)
    GROUP BY 1, 2
    """,
)
def cohort_retention(spark: SparkSession, sf: str) -> DataFrame:
    """Weekly cohort retention triangle: users bucketed by first-active ISO
    week, counted in each later week they return. Week offsets are exact
    integer divisions of millisecond differences (UTC, no DST — week
    boundaries are exact multiples), so the whole result is integer-exact."""
    e = load(spark, sf, "events").withColumn("ts", F.col("ts").cast("timestamp"))
    act = e.select("user_id", F.date_trunc("week", "ts").alias("act_week")).distinct()
    cohort = act.groupBy("user_id").agg(F.min("act_week").alias("cohort_week"))
    return (
        act.join(cohort, "user_id")
        .groupBy(
            F.date_format("cohort_week", "yyyy-MM-dd'T'HH:mm:ss'Z'").alias("cohort_week"),
            (
                (F.unix_millis("act_week") - F.unix_millis("cohort_week"))
                / F.lit(_WEEK_MS)
            ).cast("long").alias("week_n"),
        )
        .agg(F.count(F.lit(1)).alias("n_users"))
    )


# --- click -> purchase conversion funnel ----------------------------------------------
@register(
    "funnel_conversion",
    f"""
    WITH clicks AS (
      SELECT event_id, user_id, ts, date_trunc('day', ts) AS day
      FROM events WHERE event_type = 'click'
    ), purchases AS (
      SELECT user_id, ts FROM events WHERE event_type = 'purchase'
    ), converted AS (
      SELECT DISTINCT c.event_id
      FROM clicks c JOIN purchases p
        ON p.user_id = c.user_id
       AND epoch_ms(p.ts) >= epoch_ms(c.ts)
       AND epoch_ms(p.ts) < epoch_ms(c.ts) + {_HOUR_MS}
    )
    SELECT strftime(c.day, '%Y-%m-%dT%H:%M:%SZ') AS day,
           count(*) AS n_clicks,
           count(v.event_id) AS n_converted,
           CAST(count(v.event_id) AS DOUBLE) / count(*) AS conv_rate
    FROM clicks c LEFT JOIN converted v USING (event_id)
    GROUP BY 1
    """,
)
def funnel_conversion(spark: SparkSession, sf: str) -> DataFrame:
    """Conversion funnel: fraction of clicks followed by a purchase from the
    same user within one hour (half-open window), per day. The click⋈purchase
    pairing goes through the bucketized interval join (operators.asof.
    interval_join — never a theta/cross join), then collapses to EXISTS
    semantics via a distinct + left join. conv_rate is an int/int division —
    exact on both engines."""
    from .operators.asof import interval_join

    e = load(spark, sf, "events").withColumn("ts", F.col("ts").cast("timestamp"))
    clicks = e.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", F.col("ts").alias("cts"),
        F.date_trunc("day", "ts").alias("day"),
    )
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("ts").alias("pts")
    )
    pairs = interval_join(
        clicks.select("event_id", "user_id", "cts"), purchases,
        ["user_id"], "cts", "pts", _HOUR_MS,
    )
    dt = F.unix_millis("pts") - F.unix_millis("cts")
    converted = (
        pairs.filter((dt >= 0) & (dt < _HOUR_MS)).select("event_id").distinct()
        .withColumn("hit", F.lit(1))
    )
    return (
        clicks.join(converted, "event_id", "left")
        .groupBy(F.date_format("day", "yyyy-MM-dd'T'HH:mm:ss'Z'").alias("day"))
        .agg(
            F.count(F.lit(1)).alias("n_clicks"),
            F.count("hit").alias("n_converted"),
            (F.count("hit").cast("double") / F.count(F.lit(1))).alias("conv_rate"),
        )
    )


# --- per-label embedding centroid (exact micro-unit mean) ------------------------------
@register(
    "vector_centroid",
    """
    WITH ex AS (
      SELECT label, i - 1 AS pos,
             CAST(round(CAST(embedding[i] AS DOUBLE) * 1000000, 0) AS BIGINT) AS v_u
      FROM embeddings CROSS JOIN (SELECT unnest(generate_series(1, 64)) AS i)
    )
    SELECT label, pos,
           CAST(sum(v_u) AS DOUBLE) / count(*) / 1000000 AS mean_v,
           count(*) AS n_vecs
    FROM ex GROUP BY 1, 2
    """,
)
def vector_centroid(spark: SparkSession, sf: str) -> DataFrame:
    """Per-label embedding centroid, one row per (label, dimension) — the
    building block of cluster summaries / IVF codebooks. Element values sum
    as micro-unit integers (order-independent, engine-exact — CLAUDE.md
    rule 2), then one double division chain; the posexplode + two-key hash
    agg is a single shuffle at any scale."""
    e = load(spark, sf, "embeddings")
    ex = e.select(
        "label", F.posexplode(F.col("embedding").cast("array<double>")).alias("pos", "v")
    ).select(
        "label", "pos", F.round(F.col("v") * 1_000_000, 0).cast("long").alias("v_u")
    )
    return ex.groupBy("label", F.col("pos").cast("long").alias("pos")).agg(
        (F.sum("v_u").cast("double") / F.count(F.lit(1)) / F.lit(1_000_000)).alias("mean_v"),
        F.count(F.lit(1)).alias("n_vecs"),
    )


# --- IDF-weighted top terms per source -------------------------------------------------
@register(
    "tfidf_top_terms",
    """
    WITH tok AS (
      SELECT doc_id, source, unnest(string_split(text, ' ')) AS token FROM documents
    ), tf AS (
      SELECT source, token, CAST(count(*) AS BIGINT) AS tf FROM tok GROUP BY 1, 2
    ), df AS (
      SELECT token, CAST(count(DISTINCT doc_id) AS BIGINT) AS df FROM tok GROUP BY 1
    ), n AS (SELECT CAST(count(*) AS BIGINT) AS n_docs FROM documents),
    scored AS (
      SELECT tf.source, tf.token, tf.tf, df.df,
             CAST(tf.tf * n.n_docs AS DOUBLE) / df.df AS score
      FROM tf JOIN df USING (token) CROSS JOIN n
    )
    SELECT source, token, tf, df, score FROM (
      SELECT *, row_number() OVER (
        PARTITION BY source ORDER BY score DESC, token) AS rn
      FROM scored
    ) WHERE rn <= 3
    """,
)
def tfidf_top_terms(spark: SparkSession, sf: str) -> DataFrame:
    """Top-3 terms per source by inverse-document-frequency weight —
    tf x (N/df) with the classic log() dropped in favor of the exact
    integer-derived ratio (libm log differs across engines at ~1 ulp,
    CLAUDE.md rule 4; the RANKING is identical since log is monotone).
    Two hash aggs; the per-token document-frequency table is vocabulary-
    sized and broadcasts."""
    d = load(spark, sf, "documents")
    tok = d.select("doc_id", "source", F.explode(F.split("text", " ")).alias("token"))
    tf = tok.groupBy("source", "token").agg(F.count(F.lit(1)).alias("tf"))
    df_ = tok.groupBy("token").agg(F.countDistinct("doc_id").alias("df"))
    n_docs = d.count()
    scored = tf.join(F.broadcast(df_), "token").select(
        "source", "token", "tf", "df",
        ((F.col("tf") * F.lit(n_docs)).cast("double") / F.col("df")).alias("score"),
    )
    w = Window.partitionBy("source").orderBy(F.col("score").desc(), "token")
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("source", "token", "tf", "df", "score")
    )


# --- window functions beyond rank/dense_rank/ntile -------------------------------------
@register(
    "window_funcs_extended",
    """
    SELECT o_custkey, o_orderkey,
           percent_rank() OVER w AS prank,
           cume_dist() OVER w AS cdist,
           nth_value(o_orderkey, 2) OVER (PARTITION BY o_custkey
             ORDER BY o_totalprice DESC, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS second_best,
           first_value(o_orderkey) OVER w AS best,
           last_value(o_orderkey) OVER (PARTITION BY o_custkey
             ORDER BY o_totalprice DESC, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS worst
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey)
    """,
)
def window_funcs_extended(spark: SparkSession, sf: str) -> DataFrame:
    """percent_rank / cume_dist / nth_value / first_value / last_value —
    completes the §2.5 window surface beyond ranking_functions. The ORDER BY
    is made unique (orderkey tie-break) so every function is deterministic;
    percent_rank and cume_dist are integer-derived ratios, engine-exact.
    last_value/nth_value use an explicit unbounded frame (the default frame
    ends at CURRENT ROW on both engines, which would make them degenerate)."""
    orders = load(spark, sf, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.col("o_totalprice").desc(), "o_orderkey")
    wfull = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.percent_rank().over(w).alias("prank"),
        F.cume_dist().over(w).alias("cdist"),
        F.nth_value("o_orderkey", 2).over(wfull).alias("second_best"),
        F.first("o_orderkey").over(w).alias("best"),
        F.last("o_orderkey").over(wfull).alias("worst"),
    )


# --- stratified deterministic sampling -------------------------------------------------
#: per-language keep rates: downsample the over-represented languages, keep
#: the rest whole (the training-mix re-balancing knob). floor(rate * 2^32)
#: thresholds keep the compare in exact integer space.
_SAMPLE_RATES = {"en": 0.25, "zh": 0.5}


def _sample_thresholds_sql() -> str:
    cases = " ".join(
        f"WHEN '{s}' THEN {int(r * (1 << 32))}" for s, r in sorted(_SAMPLE_RATES.items())
    )
    return f"CASE lang {cases} ELSE {1 << 32} END"


@register(
    "sample_stratified",
    f"""
    SELECT doc_id AS id, lang AS stratum,
           CAST(concat('0x', substr(md5(concat(CAST(doc_id AS VARCHAR), '|', lang)), 1, 8))
                AS BIGINT) < {_sample_thresholds_sql()} AS kept
    FROM documents
    """,
)
def sample_stratified(spark: SparkSession, sf: str) -> DataFrame:
    """Per-language deterministic downsampling: keep a document iff the
    32-bit md5 prefix of ``doc_id|lang`` is below its language's
    floor(rate*2^32) threshold (en 25%, zh 50%, others kept whole) — the
    training-mix re-balancing step. Map-only, zero shuffle, and hash-stable
    under retries/re-runs, unlike a rand() sample
    (operators.sampling.stratified_sample)."""
    from .operators.sampling import stratified_sample

    return stratified_sample(
        load(spark, sf, "documents"), "doc_id", "lang", _SAMPLE_RATES
    )


# --- per-group distributed exact selection ---------------------------------------------
@register(
    "group_kth_values",
    """
    WITH c AS (
      SELECT lang, count(*) AS n FROM documents
      WHERE n_chars IS NOT NULL AND lang IS NOT NULL GROUP BY lang
    ),
    r AS (
      SELECT lang, n_chars AS value,
             row_number() OVER (PARTITION BY lang ORDER BY n_chars) AS rn
      FROM documents WHERE n_chars IS NOT NULL AND lang IS NOT NULL
    )
    SELECT r.lang, rn AS k, CAST(value AS DOUBLE) AS value
    FROM r JOIN c USING (lang)
    WHERE rn IN (1, GREATEST(1, n // 2), GREATEST(1, (9 * n) // 10), n)
    """,
)
def group_kth_values(spark: SparkSession, sf: str) -> DataFrame:
    """Exact PER-GROUP order statistics (min / median / p90 / max as fixed
    per-group RANKS) via the tag-generic bucket-count selection
    (operators/selection.grouped_kth_smallest): every (language, rank)
    tag shares each round's single histogram job, so round-trips scale
    with recursion depth — never with group count — where the oracle's
    row_number over PARTITION BY is exactly the per-group sort exchange
    the operator avoids at 100 TB. Values are input integers carried as
    doubles verbatim (rank picks — permutation-invariant, ties included);
    ranks derive from per-group nulls-excluded counts, mirroring the
    oracle's integer arithmetic. Both sides state the nulls-excluded
    contract explicitly: NULL values AND NULL groups are out (the
    operator filters group_col.isNotNull(); the oracle says
    lang IS NOT NULL — ADVICE r10's 'incidental null-freeness' class)."""
    from .operators.selection import grouped_kth_smallest

    d = load(spark, sf, "documents")
    # ranks derive from the core's own per-group seed counts (no separate
    # counts job); GREATEST(1, ·) on both sides so a 1-row group can't
    # produce rank 0 (the contract must not depend on incidental group
    # sizes — ADVICE r9)
    return grouped_kth_smallest(
        d.select("lang", F.col("n_chars").cast("double").alias("n_chars")),
        "n_chars",
        "lang",
        lambda n: sorted({1, max(1, n // 2), max(1, (9 * n) // 10), n}),
    )


@register(
    "group_length_clip",
    """
    WITH c AS (
      SELECT lang, count(*) AS n FROM documents
      WHERE n_chars IS NOT NULL AND lang IS NOT NULL GROUP BY lang
    ),
    r AS (
      SELECT lang, n_chars,
             row_number() OVER (PARTITION BY lang ORDER BY n_chars) AS rn
      FROM documents WHERE n_chars IS NOT NULL AND lang IS NOT NULL
    ),
    t AS (
      SELECT r.lang, CAST(n_chars AS DOUBLE) AS p99
      FROM r JOIN c USING (lang)
      WHERE rn = GREATEST(1, (99 * n) // 100)
    )
    SELECT d.lang, t.p99 AS p99, CAST(count(*) AS BIGINT) AS n_kept
    FROM documents d JOIN t ON d.lang = t.lang AND d.n_chars <= t.p99
    GROUP BY d.lang, t.p99
    """,
)
def group_length_clip(spark: SparkSession, sf: str) -> DataFrame:
    """Per-language length clipping — the standard pretraining-mix step
    "drop every document above its own language's p99 length" (a GLOBAL
    p99 over-clips short-form languages and under-clips long-form ones),
    as the first curation CONSUMER of grouped_kth_smallest: the p99
    thresholds come from the banded per-group selection (2-3 un-shuffled
    scans; the oracle pays a per-group sort exchange for the same ranks),
    then one broadcast join applies them — the threshold table is
    G rows, never data-sized. Threshold compares on a value continuum
    (rule 4: safe) and counts are integers, so the gate is engine-exact
    with no rounding anywhere."""
    from .operators.selection import grouped_kth_smallest

    d = load(spark, sf, "documents").filter(
        F.col("n_chars").isNotNull() & F.col("lang").isNotNull()
    )
    thr = grouped_kth_smallest(
        d.select("lang", F.col("n_chars").cast("double").alias("n_chars")),
        "n_chars",
        "lang",
        lambda n: [max(1, (99 * n) // 100)],
    ).select("lang", F.col("value").alias("p99"))
    return (
        d.join(F.broadcast(thr), "lang")
        .filter(F.col("n_chars").cast("double") <= F.col("p99"))
        .groupBy("lang", "p99")
        .agg(F.count(F.lit(1)).alias("n_kept"))
    )


@register(
    "group_mad_outliers",
    """
    WITH d AS (
      SELECT doc_id, lang, n_chars FROM documents
      WHERE lang IS NOT NULL AND n_chars IS NOT NULL
    ), m AS (
      SELECT lang, CAST(v AS BIGINT) AS med FROM (
        SELECT lang, n_chars AS v,
               row_number() OVER (PARTITION BY lang ORDER BY n_chars) AS rn,
               count(*) OVER (PARTITION BY lang) AS n
        FROM d) WHERE rn = (n + 1) // 2
    ), dv AS (
      SELECT d.doc_id, d.lang, d.n_chars, m.med,
             abs(d.n_chars - m.med) AS dev
      FROM d JOIN m USING (lang)
    ), md AS (
      SELECT lang, CAST(v AS BIGINT) AS mad FROM (
        SELECT lang, dev AS v,
               row_number() OVER (PARTITION BY lang ORDER BY dev) AS rn,
               count(*) OVER (PARTITION BY lang) AS n
        FROM dv) WHERE rn = (n + 1) // 2
    )
    SELECT dv.lang, dv.doc_id, dv.n_chars, dv.med, md.mad,
           CAST(dv.dev AS BIGINT) AS dev
    FROM dv JOIN md USING (lang)
    WHERE dv.dev > 2 * md.mad
    """,
)
def group_mad_outliers(spark: SparkSession, sf: str) -> DataFrame:
    """Per-language robust length outliers (|x − med| > 2·MAD) — the
    second curation consumer of grouped selection
    (operators/selection.grouped_mad_outliers): median and MAD are
    LOWER-median order statistics from the banded path (seed + one
    histogram job per round, never a per-group sort exchange — the
    oracle pays TWO of those exchanges, one per statistic), applied with
    two G-row broadcast joins. MAD is the estimator that doesn't move
    with the outliers it hunts (a mean/σ rule dissolves against one
    10^9-char doc); every decision quantity is an exact integer, so no
    rounding anywhere. c=2 because the synthetic corpus is too
    well-behaved for the textbook c=3 to fire at any SF (0 rows —
    a vacuous gate proves nothing); 2·MAD yields a stable non-empty
    outlier set at sf0.001/0.01/0.1."""
    from .operators.selection import grouped_mad_outliers

    d = load(spark, sf, "documents")
    out = grouped_mad_outliers(d, "n_chars", "lang", c=2)
    return out.select("lang", "doc_id", "n_chars", "med", "mad", "dev")


@register(
    "corpus_shuffle_rank",
    """
    SELECT doc_id,
           row_number() OVER (
             ORDER BY md5(concat(CAST(doc_id AS VARCHAR), 'shuffle')), doc_id
           ) AS pos
    FROM documents WHERE doc_id IS NOT NULL
    """,
)
def corpus_shuffle_rank(spark: SparkSession, sf: str) -> DataFrame:
    """Deterministic global corpus shuffle (operators/ordering.
    global_shuffle_rank): every document's exact 1-based position under
    ORDER BY (md5(id||salt), id) — the training-order permutation before
    sequence packing, reproducible across reruns/retries/engines because
    the key is a content hash, not rand(). The oracle IS the global
    window sort (a full range exchange at scale); the operator plans the
    identical permutation as a hash exchange on the key's 16-bit-prefix
    bucket + a buckets-row offset broadcast — no sampling, no range
    partitioner, plan-asserted in tests/test_ordering.py. Integer
    positions, no rounding anywhere."""
    from .operators.ordering import global_shuffle_rank

    return global_shuffle_rank(load(spark, sf, "documents"), "doc_id")


# --- weighted sampling without replacement (Efraimidis–Spirakis A-ES) -----------------
_WSAMPLE_K = 200  # strict subset at every SF (documents >= 500 at sf0.001)


@register(
    "weighted_sample_aes",
    f"""
    WITH keyed AS (
      SELECT doc_id, n_chars,
             ln((CAST(concat('0x', substr(md5(concat(CAST(doc_id AS VARCHAR), 'aes')), 1, 12))
                      AS BIGINT) + 1.0) / {float((1 << 48) + 1)!r}) / n_chars AS k_
      FROM documents
      WHERE n_chars IS NOT NULL AND n_chars > 0
    )
    SELECT doc_id, n_chars FROM keyed
    ORDER BY k_ DESC, doc_id
    LIMIT {_WSAMPLE_K}
    """,
)
def weighted_sample_aes(spark: SparkSession, sf: str) -> DataFrame:
    """Deterministic weighted sampling without replacement (Efraimidis &
    Spirakis 2006 A-ES; operators/sampling.weighted_sample): sample
    k=200 documents with probability proportional to length (n_chars)
    via content-hash keys ln(u)/w, top-k — executed as
    TakeOrderedAndProject (per-partition top-k heaps, k rows per
    partition in flight), where the oracle's formulation is the full
    ORDER BY the operator avoids at 100 TB. Emitted columns are integers;
    the float key ordering has ~range/N^2 separation between adjacent
    hash-derived keys, far above cross-libm ln ULP noise (rule 4)."""
    from .operators.sampling import weighted_sample

    return weighted_sample(
        load(spark, sf, "documents"), "doc_id", "n_chars", _WSAMPLE_K
    )


# --- token-stream packing (GPT-style sequence chunking) --------------------------------
_PACK_BUDGET = 512  # tokens per training chunk


@register(
    "pack_sequences",
    f"""
    WITH d AS (
      SELECT doc_id, lang, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok
      FROM documents
    ), c AS (
      SELECT doc_id, lang, n_tok,
             COALESCE(CAST(sum(n_tok) OVER (
               PARTITION BY lang ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT), 0)
               AS cum_before
      FROM d
    )
    SELECT doc_id AS id, lang AS shard, n_tok,
           cum_before // {_PACK_BUDGET} AS chunk_id,
           cum_before % {_PACK_BUDGET} AS tok_offset
    FROM c
    """,
)
def pack_sequences(spark: SparkSession, sf: str) -> DataFrame:
    """Token-stream chunking (GPT-style sequence packing): per language
    shard, documents concatenate in doc_id order and the stream is cut into
    512-token chunks; each document is tagged with the chunk it starts in
    and its offset within it. One window prefix-sum per shard + integer
    div/mod — exact and deterministic; partitioning by shard keeps every
    window bounded (no global ORDER BY at 100 TB). The DuckDB window sum is
    HUGEINT and must be cast (CLAUDE.md rule 6)
    (operators.sampling.pack_token_stream)."""
    from .operators.sampling import pack_token_stream

    d = load(spark, sf, "documents").select(
        "doc_id", "lang", F.size(F.split("text", " ")).cast("long").alias("n_tok")
    )
    return pack_token_stream(d, "doc_id", "lang", "n_tok", _PACK_BUDGET)


# --- skew-safe salted aggregation (driver-checked face of operators/skew) --------------
@register(
    "skew_salted_stats",
    """
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(CAST(sum(CAST(round(value * 1000000, 0) AS BIGINT)) AS DOUBLE)
                / count(*) / 1000000 AS DOUBLE) AS avg_v
    FROM events GROUP BY 1
    """,
)
def skew_salted_stats(spark: SparkSession, sf: str) -> DataFrame:
    """Per-event-type stats THROUGH the two-phase salted aggregation
    (operators.skew.salted_agg) — the manual skew path for keys so hot that
    even AQE's split shuffle blocks land on one reducer. The salt is random,
    but the result is EXACT anyway: values sum as micro-unit integers
    (order-free — CLAUDE.md rule 2), so any partial grouping merges to the
    same totals and the plain-GROUP-BY oracle hash-matches. That exactness
    under re-partitioning is precisely what makes the pattern safe to drop
    into a 100 TB pipeline."""
    from .operators.skew import salted_agg

    e = load(spark, sf, "events").withColumn(
        "v_u", F.round(F.col("value") * 1_000_000, 0).cast("long")
    )
    return salted_agg(
        e,
        ["event_type"],
        partials={"s": F.sum("v_u"), "n": F.count(F.lit(1))},
        merges={
            "n_events": F.sum("n"),
            "avg_v": (F.sum("s").cast("double") / F.sum("n") / F.lit(1_000_000)).cast(
                "double"
            ),
        },
        buckets=16,
    )


# --- set operation: INTERSECT ----------------------------------------------------------
@register(
    "intersect_buyers_clickers",
    """
    SELECT user_id FROM events WHERE event_type = 'click'
    INTERSECT
    SELECT user_id FROM events WHERE event_type = 'purchase'
    """,
)
def intersect_buyers_clickers(spark: SparkSession, sf: str) -> DataFrame:
    """INTERSECT set op (users who both clicked and purchased) — completes
    §2.6 alongside UNION ALL (union_by_name) and EXCEPT (anti_join_users).
    Catalyst plans it as a left-semi aggregate join, never a cross product."""
    e = load(spark, sf, "events")
    clicks = e.filter(F.col("event_type") == "click").select("user_id")
    buys = e.filter(F.col("event_type") == "purchase").select("user_id")
    return clicks.intersect(buys)


# --- distributed exact selection (global quantiles without a global sort) --------------
@register(
    "global_kth_values",
    """
    WITH n AS (
      SELECT count(*) AS total FROM lineitem
      WHERE l_extendedprice IS NOT NULL
    ),
    r AS (
      SELECT l_extendedprice AS value,
             row_number() OVER (ORDER BY l_extendedprice) AS rn
      FROM lineitem
      WHERE l_extendedprice IS NOT NULL
    )
    SELECT rn AS k, value FROM r, n
    WHERE rn IN (1, total // 4, total // 2, (9 * total) // 10, total)
    """,
)
def global_kth_values(spark: SparkSession, sf: str) -> DataFrame:
    """Exact global order statistics (min / p25 / p50 / p90 / max as fixed
    RANKS, so the contract is unambiguous across engines) via distributed
    bucket-count selection (operators/selection.py) — log_B(n) histogram
    passes over an UN-shuffled scan plus one band-bounded finish, where
    the oracle's formulation (row_number over a global ORDER BY) is
    exactly the full range-exchange sort the operator exists to avoid at
    100 TB. Returned values are input doubles verbatim — no arithmetic,
    so the rank pick matches bit-for-bit, ties included (the value at a
    fixed rank of the multiset order is permutation-invariant)."""
    from .operators.selection import kth_smallest_values

    li = load(spark, sf, "lineitem")
    # ranks over the NULLS-EXCLUDED multiset, matching both the operator's
    # null-exclusion and the oracle's explicit IS NOT NULL — the contract
    # must not depend on the column's incidental null-freeness (ADVICE r9)
    n = li.filter(F.col("l_extendedprice").isNotNull()).count()
    ks = sorted({1, n // 4, n // 2, (9 * n) // 10, n})
    return kth_smallest_values(li, "l_extendedprice", ks)
