"""decontaminate_redact invariants: the rewrite actually decontaminates —
re-shingling the cleaned text finds zero eval-set window hashes (modulo
junction grams, asserted zero on this data) — and it only touches docs the
exact pair join implicates."""

from __future__ import annotations

import pyspark.sql.functions as F

from signalk_parquet_spark import registry
from signalk_parquet_spark.functions.text import hashed_grams, shingles, tokens


def test_redacted_text_has_no_eval_spans(spark, sf_smoke):
    qs = registry.queries()
    out = qs["decontaminate_redact"](spark, sf_smoke).persist()
    out.count()
    # eval window hashes, exactly as the operator defines membership
    from signalk_parquet_spark.queries_curation import _TRAIN_HI, _VAL_HI

    d = registry.load(spark, sf_smoke, "documents")
    hx = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 2)
    split = (
        F.when(hx < _TRAIN_HI, "train").when(hx < _VAL_HI, "val").otherwise("test")
    )
    ev = (
        d.select("text", split.alias("split"))
        .filter(F.col("split") == "test")
        .select(F.explode(hashed_grams(shingles(tokens("text"), 8))).alias("wh"))
        .distinct()
    )
    leftover = (
        out.select(
            F.explode(hashed_grams(shingles(tokens("cleaned"), 8))).alias("wh")
        )
        .join(ev, "wh", "left_semi")
        .count()
    )
    assert leftover == 0
    # redaction only touches docs the exact pair join implicates
    touched = out.filter(F.col("n_removed") > 0).select(
        F.col("id").alias("td")
    )
    exact_docs = (
        qs["decontaminate_ngram"](spark, sf_smoke)
        .select(F.col("train_doc").alias("td"))
        .distinct()
    )
    assert touched.join(exact_docs, "td", "left_anti").count() == 0
    assert touched.count() > 0  # the data really contains contamination
    out.unpersist()
