"""decontaminate_redact invariants. The operator is SINGLE-PASS (Lee et
al.'s construction): every eval K-gram present in the ORIGINAL text is
removed unconditionally, but re-joining words around a removed span can
form a new junction K-gram, which on adversarial data could itself be in
the eval set. So the precise invariant is: any eval gram surviving in
`cleaned` must be junction-only — ABSENT from the original text's window
hashes. (On this corpus the residue is zero, but the test must not depend
on that.) Also: redaction only touches docs the exact pair join
implicates."""

from __future__ import annotations

import pyspark.sql.functions as F

from signalk_parquet_spark import registry
from signalk_parquet_spark.functions.text import hashed_grams, shingles, tokens
from signalk_parquet_spark.queries_curation import hash_split
from signalk_parquet_spark.queries_transform import _K


def test_redaction_removes_every_original_eval_span(spark, sf_smoke):
    qs = registry.queries()
    out = qs["decontaminate_redact"](spark, sf_smoke).persist()
    out.count()
    d = registry.load(spark, sf_smoke, "documents").select(
        "doc_id", "text", hash_split().alias("split")
    )
    ev = (
        d.filter(F.col("split") == "test")
        .select(
            F.explode(hashed_grams(shingles(tokens("text"), _K))).alias("wh")
        )
        .distinct()
    )
    # eval grams still present in the cleaned text, per doc
    leftover = (
        out.select(
            "id",
            F.explode(
                hashed_grams(shingles(tokens("cleaned"), _K))
            ).alias("wh"),
        )
        .join(ev, "wh", "left_semi")
        .distinct()
    )
    # the single-pass guarantee: none of those grams existed in the
    # ORIGINAL text (they can only be junction artifacts of removal)
    orig = d.filter(F.col("split") == "train").select(
        F.col("doc_id").alias("id"),
        F.explode(hashed_grams(shingles(tokens("text"), _K))).alias("wh"),
    )
    non_junction = leftover.join(orig, ["id", "wh"], "left_semi").count()
    assert non_junction == 0
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
