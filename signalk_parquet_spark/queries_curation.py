"""Training-data curation gates (BASELINE extension set): deterministic
hash-split sharding and per-language quality quota sampling — the two
selection ops a 100 TB corpus pipeline runs after dedup/quality scoring.

Both are exactly oracle-able because the randomness is a content hash, not
an RNG: real pipelines do exactly this so splits are reproducible and
join-stable across reruns (no seed state to ship). Split thresholds compare
md5 HEX PREFIXES lexicographically ('cd' ~ 0.80, 'e6' ~ 0.90) — string
compares are engine-exact, no hex->int conversion needed on either side.

Scale: both are one shuffle. The split is map-side pure (hash + CASE) with
the groupBy rollup on (lang, split) — tiny key space, partial-agg absorbed.
The quota is one window per lang; at 100 TB you'd pre-filter with an
approximate per-lang score threshold before the exact window rank.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .functions.text import (
    EN_STOPWORDS,
    mean_token_len,
    stopword_ratio,
    tokens,
    type_token_ratio,
)
from .registry import load, register

_TRAIN_HI = "cd"  # md5 first byte < 0xcd -> train  (205/256 ~ 80.1%)
_VAL_HI = "e6"  # < 0xe6 -> val (another 25/256 ~ 9.8%), rest test


@register(
    "curation_hash_split",
    f"""
    WITH s AS (
      SELECT lang, n_chars,
             CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < '{_TRAIN_HI}' THEN 'train'
                  WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < '{_VAL_HI}' THEN 'val'
                  ELSE 'test' END AS split
      FROM documents
    )
    SELECT lang, split, count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS total_chars
    FROM s GROUP BY 1, 2
    """,
)
def curation_hash_split(spark: SparkSession, sf: str) -> DataFrame:
    """Deterministic train/val/test sharding by content hash, rolled up per
    (lang, split). Reproducible across engines and reruns by construction."""
    d = load(spark, sf, "documents")
    hx = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 2)
    split = (
        F.when(hx < _TRAIN_HI, "train").when(hx < _VAL_HI, "val").otherwise("test")
    )
    return (
        d.select("lang", "n_chars", split.alias("split"))
        .groupBy("lang", "split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
        )
    )


_QUOTA = 50


def _dd_quality() -> str:
    from .queries_text import _SW

    sr = f"CAST(len(list_filter(toks, x -> x IN ({_SW}))) AS DOUBLE) / len(toks)"
    ttr = "CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks)"
    return f"({sr}) * 0.5 + ({ttr}) * 0.5"


@register(
    "curation_quota",
    f"""
    WITH t AS (
      SELECT doc_id, lang, string_split(text, ' ') AS toks FROM documents
    ), scored AS (
      SELECT doc_id, lang, {_dd_quality()} AS quality_score FROM t
    ), r AS (
      SELECT *, row_number() OVER (
        PARTITION BY lang ORDER BY quality_score DESC, doc_id) AS rank
      FROM scored
    )
    SELECT lang, doc_id, quality_score, rank FROM r WHERE rank <= {_QUOTA}
    """,
)
def curation_quota(spark: SparkSession, sf: str) -> DataFrame:
    """Top-N documents per language by composite quality score (quota
    sampling with a doc_id tie-break). The score is a sum of integer-count
    ratios, so ordering is engine-exact without rounding."""
    d = load(spark, sf, "documents")
    toks = tokens("text")
    score = stopword_ratio(toks) * F.lit(0.5) + type_token_ratio(toks) * F.lit(0.5)
    scored = d.select("lang", "doc_id", score.alias("quality_score"))
    w = Window.partitionBy("lang").orderBy(F.col("quality_score").desc(), "doc_id")
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= _QUOTA)


# --- decontamination: train/test n-gram overlap ------------------------------
_NG = 8  # 8-token grams, the usual eval-decontamination unit

# DuckDB twins of functions.text shingles(n=8) + hashed_shingles
_TOKS_DD = "string_split(text, ' ')"
_SH8_DD = (
    f"list_transform(range(1, len({_TOKS_DD}) - {_NG - 2}), "
    f"i -> array_to_string(({_TOKS_DD})[i:i+{_NG - 1}], ' '))"
)
@register(
    "decontaminate_ngram",
    f"""
    WITH s AS (
      SELECT doc_id,
             CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < '{_TRAIN_HI}' THEN 'train'
                  WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < '{_VAL_HI}' THEN 'val'
                  ELSE 'test' END AS split,
             list_distinct({_SH8_DD}) AS sh
      FROM documents
    ), tr AS (SELECT doc_id, unnest(sh) AS g FROM s WHERE split = 'train'),
       te AS (SELECT doc_id, unnest(sh) AS g FROM s WHERE split = 'test')
    SELECT te.doc_id AS test_doc, tr.doc_id AS train_doc, count(*) AS shared_ngrams
    FROM te JOIN tr ON te.g = tr.g
    GROUP BY 1, 2
    """,
)
def decontaminate_ngram(spark: SparkSession, sf: str) -> DataFrame:
    """Eval-set decontamination: (test_doc, train_doc) pairs sharing >= 1
    distinct 8-gram, with the shared count. Candidates meet on an equi-key —
    at 100 TB the train side is the big one and this is exactly the shape
    you'd feed a bloom prefilter; the exact join here IS the verify step.

    Spark joins on the native 64-bit ``xxhash64`` of each shingle (codegen'd
    long key — no hex-string materialization); the oracle joins on the raw
    shingle string, which is the collision-free ground truth, so the gate
    ALSO proves the hash key introduced no collisions at test scale. The
    expensive shingle pass runs ONCE: val docs are dropped first (they join
    neither side) and the compact pre-explode (doc_id, split, sh) frame is
    persisted so the two join branches don't re-shingle the corpus."""
    from .functions.text import shingles

    d = load(spark, sf, "documents")
    hx = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 2)
    split = (
        F.when(hx < _TRAIN_HI, "train").when(hx < _VAL_HI, "val").otherwise("test")
    )
    hashed = F.array_distinct(
        F.transform(shingles(tokens("text"), _NG), lambda s: F.xxhash64(s))
    )
    s = (
        d.select("doc_id", split.alias("split"), "text")
        .filter(F.col("split") != "val")
        .select("doc_id", "split", hashed.alias("sh"))
        .persist()
    )
    s.count()  # materialize fully BEFORE the branches fork: the tr/te map
    # stages run concurrently, and racing an unbuilt cache recomputes the
    # whole shingle pass per stage with per-partition lock contention
    # (measured 69 s vs 15 s at 30x sf0.1 — see SCALE.md engine ramp)
    tr = s.filter(F.col("split") == "train").select(
        F.col("doc_id").alias("train_doc"), F.explode("sh").alias("g")
    )
    te = s.filter(F.col("split") == "test").select(
        F.col("doc_id").alias("test_doc"), F.explode("sh").alias("g")
    )
    return (
        te.join(tr, ["g"])
        .groupBy("test_doc", "train_doc")
        .agg(F.count(F.lit(1)).alias("shared_ngrams"))
    )


# --- intra-doc repetition score (Gopher-style quality rule) ------------------
@register(
    "repetition_score",
    f"""
    WITH t AS (
      SELECT doc_id,
             list_transform(range(1, len({_TOKS_DD}) - 1),
                            i -> array_to_string(({_TOKS_DD})[i:i+2], ' ')) AS sh
      FROM documents
    )
    SELECT doc_id,
           len(sh) AS n_3grams,
           len(list_distinct(sh)) AS n_distinct,
           1.0 - CAST(len(list_distinct(sh)) AS DOUBLE) / len(sh) AS rep_ratio,
           (1.0 - CAST(len(list_distinct(sh)) AS DOUBLE) / len(sh)) > 0.1 AS repetitive
    FROM t WHERE len(sh) > 0
    """,
)
def repetition_score(spark: SparkSession, sf: str) -> DataFrame:
    """Duplicate-3-gram fraction per document (1 - distinct/total), with a
    thresholded repetitive flag — the standard repetition quality rule.
    Integer-count ratio, so values are engine-exact unrounded."""
    from .functions.text import shingles

    d = load(spark, sf, "documents")
    sh = shingles(tokens("text"), 3)
    return (
        d.select("doc_id", sh.alias("sh"))
        .filter(F.size("sh") > 0)
        .select(
            "doc_id",
            F.size("sh").cast("long").alias("n_3grams"),
            F.size(F.array_distinct("sh")).cast("long").alias("n_distinct"),
            (F.lit(1.0) - F.size(F.array_distinct("sh")).cast("double") / F.size("sh")).alias("rep_ratio"),
            ((F.lit(1.0) - F.size(F.array_distinct("sh")).cast("double") / F.size("sh")) > 0.1).alias("repetitive"),
        )
    )


# --- diversity sampling: per-cluster quotas in embedding space ---------------
_CELL_STRIDE = 125
_CELL_QUOTA = 20


@register(
    "curation_diverse",
    f"""
    WITH e AS (
      SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb FROM embeddings
    ), c AS (
      SELECT vec_id AS cid, emb AS cemb, list_dot_product(emb, emb) AS cn2
      FROM e WHERE vec_id % {_CELL_STRIDE} = 0
    ), ad AS (
      SELECT e.vec_id, c.cid, c.cn2 - 2 * list_dot_product(e.emb, c.cemb) AS d
      FROM e CROSS JOIN c
    ), assign AS (
      SELECT vec_id, cid FROM (
        SELECT *, row_number() OVER (PARTITION BY vec_id ORDER BY d, cid) AS rn FROM ad
      ) WHERE rn = 1
    ), r AS (
      SELECT vec_id, cid, row_number() OVER (
        PARTITION BY cid ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) AS pick
      FROM assign
    )
    SELECT cid AS cell, vec_id, pick FROM r WHERE pick <= {_CELL_QUOTA}
    """,
)
def curation_diverse(spark: SparkSession, sf: str) -> DataFrame:
    """Cluster-balanced sampling: assign every embedding to its nearest
    coarse cell (same deterministic quantizer as ann_ivf), then keep a fixed
    quota per cell, ordered by content hash so the within-cell pick is
    unbiased and reproducible. This is the embedding-space diversity
    balancing step of a curation pipeline — over-dense clusters are capped,
    sparse ones survive whole. One broadcast cross-join (map-side argmin
    partial agg) + one window per cell."""
    from .functions.vectors import as_double, dot
    from .registry import load as _load

    e = _load(spark, sf, "embeddings").select("vec_id", as_double("embedding").alias("emb"))
    cent = F.broadcast(
        e.filter(F.col("vec_id") % _CELL_STRIDE == 0).select(
            F.col("vec_id").alias("cid"),
            F.col("emb").alias("cemb"),
        ).withColumn("cn2", dot(F.col("cemb"), F.col("cemb")))
    )
    d = F.col("cn2") - F.lit(2.0) * dot(F.col("emb"), F.col("cemb"))
    assign = (
        e.crossJoin(cent)
        .groupBy("vec_id")
        .agg(F.min(F.struct(d.alias("d"), F.col("cid").alias("cid"))).alias("m"))
        .select("vec_id", F.col("m.cid").alias("cell"))
    )
    w = Window.partitionBy("cell").orderBy(F.md5(F.col("vec_id").cast("string")), "vec_id")
    return (
        assign.withColumn("pick", F.row_number().over(w))
        .filter(F.col("pick") <= _CELL_QUOTA)
        .select("cell", "vec_id", "pick")
    )


# --- multimodal metadata accounting ------------------------------------------
@register(
    "multimodal_meta",
    """
    WITH m AS (
      SELECT source,
             CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS media_type,
             octet_length(CAST(text AS BLOB)) AS n_bytes
      FROM documents
    )
    SELECT source, media_type,
           count(*) AS n_items,
           CAST(sum(n_bytes) AS BIGINT) AS total_bytes,
           max(n_bytes) AS max_bytes
    FROM m GROUP BY 1, 2
    """,
)
def multimodal_meta(spark: SparkSession, sf: str) -> DataFrame:
    """Metadata-only accounting over opaque binary media columns: payload
    sizes per (source, media_type) without ever decoding. The payload here
    is utf-8-encoded text standing in for real image/audio bytes (the
    container has no decoders); the plan shape is the point — a real corpus
    runs this exact aggregation with payload bytes never leaving the scan
    projection (see operators/multimodal for the decode plumbing)."""
    d = load(spark, sf, "documents")
    payload = F.encode("text", "utf-8")
    media = (
        F.when(F.col("doc_id") % 3 == 0, "image")
        .when(F.col("doc_id") % 3 == 1, "audio")
        .otherwise("video")
    )
    return (
        d.select(
            "source",
            media.alias("media_type"),
            F.length(payload).cast("long").alias("n_bytes"),
        )
        .groupBy("source", "media_type")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.sum("n_bytes").alias("total_bytes"),
            F.max("n_bytes").alias("max_bytes"),
        )
    )


#: Gopher's published list is ("the","be","to","of","and","that","have",
#: "with"); the synthetic corpus's only function words are "the" and "a",
#: so we count against the repo's corpus-lexicon EN_STOPWORDS instead —
#: same rule ("contains at least 2 distinct stop words"), same threshold.
_GOPHER_STOPS = EN_STOPWORDS
_GS = ", ".join(f"'{w}'" for w in _GOPHER_STOPS)


@register(
    "quality_gopher",
    f"""
    WITH t AS (
      SELECT doc_id, text,
             string_split(text, ' ') AS toks,
             string_split(text, chr(10)) AS lines
      FROM documents
    ), m AS (
      SELECT doc_id,
        len(toks) AS n_words,
        CAST(list_sum(list_transform(toks, x -> length(x))) AS DOUBLE) / len(toks) AS mean_word_len,
        CAST(len(list_filter(toks, x -> regexp_matches(x, '[a-zA-Z]'))) AS DOUBLE) / len(toks) AS alpha_ratio,
        len(list_filter(list_distinct(toks), x -> x IN ({_GS}))) AS stop_hits,
        (length(text) - length(replace(text, '#', ''))) / len(toks) AS hash_ratio,
        ((length(text) - length(replace(text, '...', ''))) / 3) / len(toks) AS ell_ratio,
        CAST(len(list_filter(lines, x -> regexp_matches(x, '^[-*]'))) AS DOUBLE) / len(lines) AS bullet_ratio,
        CAST(len(list_filter(lines, x -> regexp_matches(x, '\\.\\.\\.$'))) AS DOUBLE) / len(lines) AS ell_end_ratio
      FROM t
    )
    SELECT doc_id, n_words, mean_word_len, alpha_ratio, stop_hits,
      CAST(n_words BETWEEN 25 AND 100000 AS INT) AS r_words,
      CAST(mean_word_len BETWEEN 3 AND 10 AS INT) AS r_mwl,
      CAST(alpha_ratio >= 0.8 AS INT) AS r_alpha,
      CAST(stop_hits >= 2 AS INT) AS r_stops,
      CAST(hash_ratio <= 0.1 AND ell_ratio <= 0.1 AS INT) AS r_symbol,
      CAST(bullet_ratio <= 0.9 AND ell_end_ratio <= 0.3 AS INT) AS r_lines,
      CAST(n_words BETWEEN 25 AND 100000 AND mean_word_len BETWEEN 3 AND 10
           AND alpha_ratio >= 0.8 AND stop_hits >= 2
           AND hash_ratio <= 0.1 AND ell_ratio <= 0.1
           AND bullet_ratio <= 0.9 AND ell_end_ratio <= 0.3 AS INT) AS keep
    FROM m
    """,
)
def quality_gopher(spark: SparkSession, sf: str) -> DataFrame:
    """Gopher quality-rule filtering (Rae et al. 2021, App. A — the
    published doc-level rule set real pretraining pipelines apply before
    dedup): word-count bounds, mean word length in [3,10], >=80% of words
    alphabetic, >=2 of the 8 Gopher stop words, hash/ellipsis
    symbol-to-word ratios <=0.1, and bullet-start / ellipsis-end line
    ratios. Emits the metrics, one 0/1 flag per rule, and the final keep
    decision. (Two corpus adaptations, both documented at their
    definitions: word-count lower bound 50 -> 25 for the ~25-60-word
    synthetic documents, and the stop-word lexicon swapped for the
    corpus's EN_STOPWORDS; every rule shape and other threshold is as
    published.)

    Engine-exact by construction: every ratio is an integer/integer IEEE
    quotient (no rounding anywhere), thresholds are continuum compares
    (CLAUDE.md rule 4), and flags are CAST to INT on both sides. Scale:
    map-only, zero shuffle — the filter a 100 TB corpus runs first,
    before any exchange."""
    d = load(spark, sf, "documents")
    t = d.select(
        "doc_id",
        "text",
        tokens("text").alias("toks"),
        F.split(F.col("text"), "\n").alias("lines"),
    )
    n_words = F.size("toks")
    n_lines = F.size("lines")
    m = t.select(
        "doc_id",
        n_words.alias("n_words"),
        mean_token_len(F.col("toks")).alias("mean_word_len"),
        (
            F.size(F.filter("toks", lambda x: x.rlike("[a-zA-Z]"))).cast("double")
            / n_words
        ).alias("alpha_ratio"),
        F.size(
            F.filter(F.array_distinct("toks"), lambda x: x.isin(*_GOPHER_STOPS))
        ).alias("stop_hits"),
        (
            (F.length("text") - F.length(F.replace(F.col("text"), F.lit("#"))))
            / n_words
        ).alias("hash_ratio"),
        (
            (F.length("text") - F.length(F.replace(F.col("text"), F.lit("..."))))
            / F.lit(3)
            / n_words
        ).alias("ell_ratio"),
        (
            F.size(F.filter("lines", lambda x: x.rlike("^[-*]"))).cast("double")
            / n_lines
        ).alias("bullet_ratio"),
        (
            F.size(F.filter("lines", lambda x: x.rlike("\\.\\.\\.$"))).cast("double")
            / n_lines
        ).alias("ell_end_ratio"),
    )
    r_words = F.col("n_words").between(25, 100000)
    r_mwl = F.col("mean_word_len").between(3, 10)
    r_alpha = F.col("alpha_ratio") >= 0.8
    r_stops = F.col("stop_hits") >= 2
    r_symbol = (F.col("hash_ratio") <= 0.1) & (F.col("ell_ratio") <= 0.1)
    r_lines = (F.col("bullet_ratio") <= 0.9) & (F.col("ell_end_ratio") <= 0.3)
    keep = r_words & r_mwl & r_alpha & r_stops & r_symbol & r_lines
    return m.select(
        "doc_id",
        "n_words",
        "mean_word_len",
        "alpha_ratio",
        "stop_hits",
        r_words.cast("int").alias("r_words"),
        r_mwl.cast("int").alias("r_mwl"),
        r_alpha.cast("int").alias("r_alpha"),
        r_stops.cast("int").alias("r_stops"),
        r_symbol.cast("int").alias("r_symbol"),
        r_lines.cast("int").alias("r_lines"),
        keep.cast("int").alias("keep"),
    )
