"""Distributed Unigram-LM tokenizer training and application (the
SentencePiece unigram model, Kudo 2018, arXiv:1804.10959 — here in its
deterministic Viterbi-EM form).

The second trainer of the tokenizer family (operators/bpe.py is the first):
where BPE greedily merges the most frequent adjacent pair, the unigram
model keeps a piece VOCABULARY with log-probabilities, segments each word
by maximum-likelihood Viterbi, re-estimates piece probabilities from the
segmentations (EM with hard counts), and prunes the weakest pieces until
the target vocabulary size. Reference scope note: the reference engine has
no text pipeline — this is the BASELINE-mandated LLM-extension set, same
charter as operators/bpe.py.

Spark-first shape (identical cost skeleton to train_bpe):

1. The only corpus-sized operation is the (word, freq) rollup —
   operators/tokenizer.word_freq, one shuffle. Everything after runs on the
   DISTINCT-WORD table (|V| rows ≪ corpus; Zipf makes this the
   production-scale trick too).
2. Seeding and each E-step are ONE Arrow-batched mapInPandas over the
   word table (a learned, variable-length piece lattice is the documented
   case where Column functions can't express the recursion — the
   smoothing.ema / apply_bpe justification), each followed by one TINY
   groupBy keyed by piece (key space = candidate vocabulary) whose
   result — vocab-sized, nowhere near corpus-sized — is the only thing
   the driver collects (bounded the same way as the ANN broadcast
   contract). The M-step and pruning are driver arithmetic over that
   vocab table; the new {piece: logp} map ships back inside the next
   stage's closure.
3. Everything is deterministic and engine-independent: seeding counts are
   integers; Viterbi ties break by (score DESC, piece-sequence ASC) — a
   total order; pruning orders by (count DESC, piece ASC); logp is
   ln(count)-ln(total) of integers, the same IEEE value everywhere.
   tests/test_unigram.py pins the whole trainer against an INDEPENDENT
   pure-Python reference whose segmenter enumerates every segmentation
   (no shared DP code), the same differential strategy as test_bpe.

Scale: per EM iteration the work is O(|V| · word_len · max_piece_len)
map-side + one vocab-keyed shuffle of pre-aggregated partial counts —
no corpus re-scan, no driver loop over data. Sampling before word_freq
is the corpus-size knob, exactly as documented in train_bpe.
"""

from __future__ import annotations

import math
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "seed_pieces",
    "seed_vocab",
    "e_step_counts",
    "train_unigram",
    "apply_unigram",
    "viterbi_segment",
]

#: driver-side cap for the candidate/count tables the trainer collects —
#: the tokenizer-vocab version of similarity.BROADCAST_MAX_ROWS
MAX_SEED_ROWS = 262_144


def viterbi_segment(
    word: str, logp: dict[str, float], max_piece_len: int
) -> tuple[str, ...] | None:
    """Maximum-likelihood segmentation of ``word`` under ``logp``.
    Ties (exact float equality of path scores) break to the
    lexicographically smallest piece sequence — with (score DESC, seq ASC)
    the choice is a total order, so every engine and the brute-force test
    reference pick the identical path. Returns None when no segmentation
    exists (a character absent from the vocab — the trainer protects
    single characters precisely so this cannot happen on training data).
    """
    n = len(word)
    # best[i] = (score, seq) for word[:i]
    best: list[tuple[float, tuple[str, ...]] | None] = [None] * (n + 1)
    best[0] = (0.0, ())
    for i in range(1, n + 1):
        cur: tuple[float, tuple[str, ...]] | None = None
        for length in range(1, min(max_piece_len, i) + 1):
            prev = best[i - length]
            if prev is None:
                continue
            piece = word[i - length : i]
            lp = logp.get(piece)
            if lp is None:
                continue
            score = prev[0] + lp
            seq = prev[1] + (piece,)
            if cur is None or score > cur[0] or (score == cur[0] and seq < cur[1]):
                cur = (score, seq)
        best[i] = cur
    return None if best[n] is None else best[n][1]


def seed_pieces(words: DataFrame, max_piece_len: int = 6) -> DataFrame:
    """(piece, count) over every substring occurrence of every word,
    substring length ≤ max_piece_len, weighted by word frequency — the
    unigram seed statistics. One Arrow map stage over the word table with
    per-batch pre-aggregation, then one piece-keyed shuffle."""

    def fn(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            acc: dict[str, int] = {}
            for w, f in zip(pdf["word"].tolist(), pdf["freq"].tolist()):
                n = len(w)
                for i in range(n):
                    for length in range(1, min(max_piece_len, n - i) + 1):
                        p = w[i : i + length]
                        acc[p] = acc.get(p, 0) + int(f)
            if acc:
                yield pd.DataFrame(
                    {"piece": list(acc.keys()), "count": list(acc.values())}
                )

    part = words.select("word", "freq").mapInPandas(fn, "piece string, count long")
    return part.groupBy("piece").agg(F.sum("count").alias("count"))


def _logp_from_counts(counts: dict[str, int]) -> dict[str, float]:
    total = sum(counts.values())
    lt = math.log(total)
    return {p: math.log(c) - lt for p, c in counts.items()}


def seed_vocab(
    words: DataFrame, seed_size: int, max_piece_len: int
) -> dict[str, int]:
    """The trainer's seeding step as a reusable unit: all single characters
    plus the top (seed_size − n_chars) multi-char substrings by (count DESC,
    piece ASC), counts from :func:`seed_pieces`. The collect is candidate-
    vocabulary-bounded (MAX_SEED_ROWS), the same contract train_unigram
    enforces."""
    seed_rows = (
        seed_pieces(words, max_piece_len)
        .orderBy(F.desc("count"), F.asc("piece"))
        .take(MAX_SEED_ROWS + 1)
    )
    if len(seed_rows) > MAX_SEED_ROWS:
        raise ValueError(
            f"unigram seed candidates exceed {MAX_SEED_ROWS} rows — lower"
            " max_piece_len, or pre-filter the word table (the production"
            " move: train on a corpus sample, the train_bpe note)"
        )
    seed_counts = {r["piece"]: int(r["count"]) for r in seed_rows}
    chars = {p for p in seed_counts if len(p) == 1}
    multi_sorted = [p for p, _ in sorted(
        ((p, c) for p, c in seed_counts.items() if len(p) > 1),
        key=lambda pc: (-pc[1], pc[0]),
    )]
    keep_multi = multi_sorted[: max(0, seed_size - len(chars))]
    counts = {p: seed_counts[p] for p in chars}
    counts.update({p: seed_counts[p] for p in keep_multi})
    return counts


def e_step_counts(
    words: DataFrame, logp: dict[str, float], max_piece_len: int
) -> DataFrame:
    """One distributed E-step, as a DataFrame: Viterbi-segment every
    distinct word under the current model (ties: lexicographically
    smallest piece sequence — a total order), weight piece counts by word
    frequency. One Arrow map stage with map-side pre-aggregation, then one
    vocab-keyed rollup — nothing corpus-sized past the word table."""

    def fn(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            acc: dict[str, int] = {}
            for w, f in zip(pdf["word"].tolist(), pdf["freq"].tolist()):
                seq = viterbi_segment(w, logp, max_piece_len)
                if seq is None:  # unreachable on training data (chars kept)
                    continue
                for p in seq:
                    acc[p] = acc.get(p, 0) + int(f)
            if acc:
                yield pd.DataFrame(
                    {"piece": list(acc.keys()), "count": list(acc.values())}
                )

    part = words.select("word", "freq").mapInPandas(fn, "piece string, count long")
    return part.groupBy("piece").agg(F.sum("count").alias("count"))


def _e_step(
    words: DataFrame, logp: dict[str, float], max_piece_len: int
) -> dict[str, int]:
    """:func:`e_step_counts` collected to the driver under the vocab bound
    (keys ⊆ current vocabulary, so the table can never exceed it)."""
    rows = e_step_counts(words, logp, max_piece_len).orderBy("piece").take(MAX_SEED_ROWS + 1)
    if len(rows) > MAX_SEED_ROWS:  # cannot happen: keys ⊆ current vocab
        raise ValueError("unigram E-step count table exceeded its vocab bound")
    return {r["piece"]: int(r["count"]) for r in rows}


def train_unigram(
    words: DataFrame,
    vocab_size: int,
    max_piece_len: int = 6,
    seed_size: int = 2048,
    n_iter: int = 3,
    shrink: float = 0.75,
) -> list[tuple[str, int, float]]:
    """Learn a unigram-LM piece vocabulary from a (word, freq) table.

    Returns [(piece, count, logp)] sorted by (count DESC, piece ASC),
    len == vocab_size (or fewer if the corpus has fewer distinct pieces).

    Deterministic spec (the pure-Python test reference implements exactly
    this, independently):
      seed    = all single characters + the top (seed_size - n_chars)
                multi-char substrings by (count DESC, piece ASC), counts
                from seed_pieces;
      iterate n_iter times:
        E     = Viterbi hard counts under current logp (ties: seq ASC);
        M     = counts → logp over surviving pieces; single characters
                are floored to count 1 so segmentation coverage never
                breaks (a char can receive 0 Viterbi count while still
                being needed for unseen words);
        prune = keep the best multi-char pieces by (count DESC, piece
                ASC): geometric shrink to max(target, ceil(cur*shrink)),
                forced to exactly target on the last iteration.
    """
    if vocab_size < 1:
        raise ValueError(f"vocab_size must be >= 1, got {vocab_size}")
    counts = seed_vocab(words, seed_size, max_piece_len)
    chars = {p for p in counts if len(p) == 1}

    target_multi = max(0, vocab_size - len(chars))
    logp = _logp_from_counts(counts)
    for it in range(n_iter):
        e_counts = _e_step(words, logp, max_piece_len)
        # M: chars floored to 1; multi-char pieces live on their counts
        counts = {p: max(1, e_counts.get(p, 0)) for p in chars}
        multi = {p: c for p, c in e_counts.items() if len(p) > 1}
        ranked = sorted(multi.items(), key=lambda pc: (-pc[1], pc[0]))
        if it == n_iter - 1:
            keep = target_multi
        else:
            keep = max(target_multi, math.ceil(len(ranked) * shrink))
        counts.update(dict(ranked[:keep]))
        logp = _logp_from_counts(counts)

    return sorted(
        ((p, c, logp[p]) for p, c in counts.items()),
        key=lambda t: (-t[1], t[0]),
    )


def apply_unigram(
    docs: DataFrame,
    vocab: list[tuple[str, int, float]] | dict[str, float],
    text_col: str = "text",
    max_piece_len: int = 6,
) -> DataFrame:
    """Tokenize with a learned unigram vocabulary: Arrow-batched
    mapInPandas with a per-batch distinct-word cache (the apply_bpe
    pattern — Zipfian batches make the cache hit rate the type-token
    ratio). Words with no segmentation (characters outside the trained
    vocab) fall back to per-character pieces with the unknown characters
    kept verbatim, so output always concatenates back to the input."""
    from pyspark.sql.types import ArrayType, StringType, StructField, StructType

    # word split mirrors functions.text.tokens (single-space separator),
    # the same python-side twin apply_bpe uses
    logp = (
        {p: lp for p, _, lp in vocab} if isinstance(vocab, list) else dict(vocab)
    )
    # fresh StructType — StructType.add mutates the frame's cached schema
    schema = StructType(
        list(docs.schema.fields)
        + [StructField("unigram_tokens", ArrayType(StringType()))]
    )
    cols = [f.name for f in docs.schema.fields]

    def seg(word: str) -> list[str]:
        out = viterbi_segment(word, logp, max_piece_len)
        if out is not None:
            return list(out)
        # mixed fallback: segment maximal in-vocab runs, pass unknown
        # characters through as single pieces
        pieces: list[str] = []
        run = ""
        for ch in word:
            if ch in logp:
                run += ch
            else:
                if run:
                    pieces.extend(viterbi_segment(run, logp, max_piece_len) or [run])
                    run = ""
                pieces.append(ch)
        if run:
            pieces.extend(viterbi_segment(run, logp, max_piece_len) or [run])
        return pieces

    def fn(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cache: dict[str, list[str]] = {}
        for pdf in it:
            toks = []
            for text in pdf[text_col].tolist():
                out: list[str] = []
                for w in (text or "").split(" "):
                    if not w:
                        continue
                    if w not in cache:
                        cache[w] = seg(w)
                    out.extend(cache[w])
                toks.append(out)
            pdf = pdf.copy()
            pdf["unigram_tokens"] = toks
            yield pdf[cols + ["unigram_tokens"]]

    return docs.mapInPandas(fn, schema)
