"""Product-Quantization ANN gate (BASELINE extension set) — the
16x-compression rung of the ANN ladder, over the `embeddings` table.

Registered LAST in registry._import_all: the driver's 50-slot window is
fully committed to this round's semantically-changed gates (CLAUDE.md), so
this gate's correctness evidence is the local parity suite (sf0.01 +
sf0.001) and the operator tests, like the other post-window additions.

Everything in the pipeline is integer arithmetic (ann_scalar_quant's
discipline extended to the compressed rung): int8 quantization, encoding
distances, ADC lookup tables, and the final score — so the DuckDB oracle
hash-matches with zero rounding anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from .registry import load, register

_STRIDE = 125  # codewords = embeddings with vec_id % 125 == 0 (the IVF/SemDeDup quantizer contract)
_NSUB = 4  # subspaces of 16 dims: 64 floats -> 4 small codes (16x vs int8)
_NQ = 20
_TOPK = 5

_QV_DD = (
    "list_transform(embedding,"
    " x -> CAST(floor(greatest(-1.0, least(1.0, CAST(x AS DOUBLE))) * 127 + 0.5) AS BIGINT))"
)
_SUBDOT = "CAST(list_sum(list_transform(range(1,17), i -> {a}[i]*{b}[i])) AS BIGINT)"


def _dd_pq_sql() -> str:
    d_expr = f"c.cc - 2 * {_SUBDOT.format(a='s.sv', b='c.cv')}"
    return f"""
    WITH e AS (
      SELECT vec_id, {_QV_DD} AS qv FROM embeddings
    ), ms AS (SELECT unnest([{", ".join(str(m) for m in range(_NSUB))}]) AS m),
    sub AS (
      SELECT e.vec_id, ms.m, array_slice(e.qv, ms.m*16+1, ms.m*16+16) AS sv
      FROM e CROSS JOIN ms
    ), cw AS (
      SELECT vec_id AS cid, m, sv AS cv,
             {_SUBDOT.format(a="sv", b="sv")} AS cc
      FROM sub WHERE vec_id % {_STRIDE} = 0
    ), enc AS (
      SELECT vec_id, m, cid FROM (
        SELECT s.vec_id, s.m, c.cid,
               row_number() OVER (PARTITION BY s.vec_id, s.m ORDER BY {d_expr}, c.cid) AS rn
        FROM sub s JOIN cw c USING (m)
      ) WHERE rn = 1
    ), qs AS (SELECT vec_id AS query_id, m, sv AS qv FROM sub WHERE vec_id < {_NQ}),
    scores AS (
      SELECT q.query_id, enc.vec_id AS neighbor_id,
             CAST(sum({_SUBDOT.format(a="q.qv", b="c.cv")}) AS BIGINT) AS pq_score
      FROM enc JOIN cw c ON c.m = enc.m AND c.cid = enc.cid
      JOIN qs q ON q.m = enc.m AND q.query_id <> enc.vec_id
      GROUP BY 1, 2
    ), r AS (
      SELECT *, row_number() OVER (PARTITION BY query_id ORDER BY pq_score DESC, neighbor_id) AS rank
      FROM scores
    )
    SELECT query_id, neighbor_id, pq_score, rank FROM r WHERE rank <= {_TOPK}
    """


@register("ann_pq", _dd_pq_sql())
def ann_pq(spark: SparkSession, sf: str) -> DataFrame:
    """PQ/ADC top-k (operators.similarity.pq_topk): int8 vectors split into
    {nsub} subspaces, each encoded as its nearest stride-codeword; queries
    score candidates through integer lookup tables, reading 4 codes per
    vector instead of 64 floats. The oracle rebuilds codebook, encoding,
    and ADC scores in SQL — a full differential proof of the compressed
    index, exact because every value is an integer. The Spark plan is
    map-only encode + broadcast-LUT score + one top-k shuffle (the ann
    family shape); the oracle's join-per-subspace + group-sum is a
    DIFFERENT plan for the same integers, which is the point."""
    from .operators.similarity import pq_topk

    e = load(spark, sf, "embeddings")
    q = e.filter(e["vec_id"] < _NQ)
    # mode="numpy": fused encode+score (one Arrow map stage); integer-exact
    # equal to the expr path (test_pq_modes_agree), ~4x faster at sf0.1
    return pq_topk(e, q, "vec_id", "embedding", _STRIDE, n_sub=_NSUB, k=_TOPK,
                   mode="numpy")
