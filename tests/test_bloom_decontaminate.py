"""Bloom-prefilter decontamination invariants.

The gates' exactness is proven by the oracle parity suite; these tests pin
the properties that make the screen SAFE to deploy in front of the exact
join at 100 TB:
  1. no false negatives — every doc the exact join flags, the bloom screen
     flags (a bloom filter can only over-approximate);
  2. the realized FP rate sits inside the standard (1 - e^(-Kn/m))^K
     envelope (loose factor for small-sample variance);
  3. the evidence columns are internally consistent (false_pos >= 0
     everywhere, corpus counts reconcile).
"""

from __future__ import annotations

import math

import pyspark.sql.functions as F
import pytest

from signalk_parquet_spark import registry
from signalk_parquet_spark.queries_curation import _BLOOM_BITS, _BLOOM_K


@pytest.fixture(scope="module")
def frames(spark, sf_smoke):
    qs = registry.queries()
    bloom = qs["decontaminate_bloom"](spark, sf_smoke).persist()
    bloom.count()
    exact_pairs = qs["decontaminate_ngram"](spark, sf_smoke)
    rate = qs["bloom_fp_rate"](spark, sf_smoke).collect()[0]
    yield bloom, exact_pairs, rate
    bloom.unpersist()


def test_no_false_negatives(frames):
    bloom, exact_pairs, _ = frames
    exact_docs = exact_pairs.select(
        F.col("train_doc").alias("td")
    ).distinct()
    missed = exact_docs.join(
        bloom.select(F.col("train_doc").alias("td")), "td", "left_anti"
    ).count()
    assert missed == 0
    # and per flagged doc the screen can only over-count, never under
    assert bloom.filter(F.col("false_pos") < 0).count() == 0
    assert bloom.filter(F.col("bloom_hits") < F.col("exact_hits")).count() == 0


def test_exact_hit_counts_agree_with_exact_join(frames):
    """decontaminate_bloom's exact_hits column is derived independently
    (distinct-shingle membership) from decontaminate_ngram's pair counts;
    a doc has exact_hits > 0 iff it appears in the exact pair list."""
    bloom, exact_pairs, _ = frames
    flagged = bloom.filter(F.col("exact_hits") > 0).select(
        F.col("train_doc").alias("td")
    )
    exact_docs = exact_pairs.select(F.col("train_doc").alias("td")).distinct()
    assert flagged.join(exact_docs, "td", "left_anti").count() == 0
    assert exact_docs.join(flagged, "td", "left_anti").count() == 0


def test_fp_rate_in_theoretical_envelope(spark, sf_smoke, frames):
    _, _, rate = frames
    assert rate["false_pos"] == rate["bloom_pos"] - rate["exact_pos"]
    assert 0.0 <= rate["fp_rate"] < 1.0
    # n distinct test shingles sizes the filter load
    from signalk_parquet_spark.queries_curation import _bloom_split

    s = _bloom_split(spark, sf_smoke)
    n = (
        s.filter(F.col("split") == "test")
        .select(F.explode("sh").alias("g"))
        .distinct()
        .count()
    )
    expected = (1.0 - math.exp(-_BLOOM_K * n / _BLOOM_BITS)) ** _BLOOM_K
    # loose envelope: small-sample variance + hash non-ideality
    assert rate["fp_rate"] <= 10 * expected + 1e-4, (rate["fp_rate"], expected)
