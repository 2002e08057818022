"""Media keep/drop end-product gate: image near-dup pairs → per-item
decisions, oracle-checked against a planted-duplicate corpus.

The text dedup family already verifies its keep policies against recursive
CTE oracles (dedup_keep_corpus); the media rungs were pytest-only because
DuckDB cannot hash image bytes. This gate closes that gap with a planted
plant the oracle CAN know: every ``doc_id // 4`` group shares one
pseudorandom picture, encoded as 24-bit BMP for even ids and grayscale PNG
for odd ids (functions/imagegen). The Spark side must genuinely decode two
codecs, dHash, band-join, transitively close the pair relation and apply
the keep-min-id policy to land exactly on the SQL's window-min answer —
any missed within-group pair (decode divergence, band bug) or false
cross-group pair (hash collapse) diverges from the oracle. Cross-group
dHashes are effectively uniform 64-bit draws (measured min Hamming 17 over
200 groups; verify radius is 3), so the plant is exact, not probabilistic.

Reference analogue: the reference has no media dedup at all — this is the
LLM-pipeline extension surface (image near-dup end product), mirroring
src/api.ts's dedup-decision shape for text.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from .registry import load, register

_GROUP = 4  # doc_id // _GROUP = planted content group


def synthetic_image_corpus(docs: DataFrame) -> DataFrame:
    """(doc_id, payload) with the planted group structure — generated
    executor-side in one Arrow map stage (at corpus scale the payloads
    would arrive from the lake; the generator stands in for the scan)."""
    out_schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("payload", T.BinaryType()),
        ]
    )

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from .functions.imagegen import payload_for

        for pdf in it:
            ids = [int(x) for x in pdf["doc_id"].tolist()]
            yield pd.DataFrame(
                {"doc_id": ids, "payload": [payload_for(i, _GROUP) for i in ids]}
            )

    return docs.select("doc_id").mapInPandas(_batches, schema=out_schema)


@register(
    "image_dedup_decisions",
    f"""
    SELECT doc_id AS id,
           min(doc_id) OVER (PARTITION BY doc_id // {_GROUP}) AS cluster_rep,
           doc_id = min(doc_id) OVER (PARTITION BY doc_id // {_GROUP}) AS kept
    FROM documents
    """,
)
def image_dedup_decisions(spark: SparkSession, sf: str) -> DataFrame:
    """Image dHash pairs → keep/drop decisions (pairs_to_decisions), the
    media mirror of dedup_keep_corpus: decode (BMP + PNG) → dHash → band
    equality join → Hamming verify → connected components → keep min id
    per cluster. The oracle knows the planted truth analytically (see
    module docstring), so a green row certifies the WHOLE media pipeline
    end-to-end, not just the pair stream. Scale shape: generation/decode/
    hash is one Arrow map stage; candidates come from 16-bit band equality
    joins with the max_df stop cap — never all-pairs; the decision step
    reuses the size-adaptive connected_components."""
    from .operators.dedup import pairs_to_decisions
    from .operators.multimodal import image_neardup_pairs

    docs = load(spark, sf, "documents")
    imgs = synthetic_image_corpus(docs)
    pairs = image_neardup_pairs(
        imgs, id_col="doc_id", payload_col="payload", max_hamming=3, bands=4
    )
    return pairs_to_decisions(docs.select("doc_id"), pairs, id_col="doc_id")
