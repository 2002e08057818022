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

from .functions.text import stopword_ratio, tokens, type_token_ratio
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
