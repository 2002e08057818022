"""Unigram-LM tokenizer trainer differential (the test_bpe strategy).

The Spark trainer (operators/unigram.py) is pinned against an INDEPENDENT
pure-Python reference implementing the same written spec with a DIFFERENT
segmenter: where the engine runs left-to-right Viterbi DP, the reference
ENUMERATES every segmentation of each word and applies the tie rules to
the full candidate set — so a DP bug (wrong backpointer, wrong tie
handling, off-by-one in the piece-length loop) cannot cancel out, and a
spec ambiguity surfaces as a mismatch instead of being shared."""

from __future__ import annotations

import math

import pytest


# --- independent reference implementation (enumeration, no DP) ---------------
def _enum_segmentations(word, pieces, max_len):
    if not word:
        yield ()
        return
    for length in range(1, min(max_len, len(word)) + 1):
        head = word[:length]
        if head in pieces:
            for rest in _enum_segmentations(word[length:], pieces, max_len):
                yield (head,) + rest


def ref_segment(word, logp, max_len):
    best = None
    for seq in _enum_segmentations(word, logp, max_len):
        score = 0.0
        for p in seq:  # same accumulation order as the DP: left to right
            score += logp[p]
        if best is None or score > best[0] or (score == best[0] and seq < best[1]):
            best = (score, seq)
    return None if best is None else best[1]


def ref_train(word_freqs, vocab_size, max_piece_len=6, seed_size=2048, n_iter=3,
              shrink=0.75):
    """The written spec of train_unigram, re-implemented independently."""
    seed = {}
    for w, f in word_freqs.items():
        for i in range(len(w)):
            for ln in range(1, min(max_piece_len, len(w) - i) + 1):
                p = w[i : i + ln]
                seed[p] = seed.get(p, 0) + f
    chars = {p for p in seed if len(p) == 1}
    multi = sorted(((p, c) for p, c in seed.items() if len(p) > 1),
                   key=lambda pc: (-pc[1], pc[0]))
    counts = {p: seed[p] for p in chars}
    counts.update(dict(multi[: max(0, seed_size - len(chars))]))
    target_multi = max(0, vocab_size - len(chars))

    def logp_of(cs):
        tot = sum(cs.values())
        return {p: math.log(c) - math.log(tot) for p, c in cs.items()}

    logp = logp_of(counts)
    for it in range(n_iter):
        e = {}
        for w, f in word_freqs.items():
            seq = ref_segment(w, logp, max_piece_len)
            assert seq is not None
            for p in seq:
                e[p] = e.get(p, 0) + f
        counts = {p: max(1, e.get(p, 0)) for p in chars}
        ranked = sorted(((p, c) for p, c in e.items() if len(p) > 1),
                        key=lambda pc: (-pc[1], pc[0]))
        keep = target_multi if it == n_iter - 1 else max(
            target_multi, math.ceil(len(ranked) * shrink))
        counts.update(dict(ranked[:keep]))
        logp = logp_of(counts)
    return sorted(((p, c, logp[p]) for p, c in counts.items()),
                  key=lambda t: (-t[1], t[0]))


_CORPUS = (
    ["the cat sat on the mat"] * 6
    + ["the cats sat on the mats"] * 3
    + ["a catalog of cats and mats"] * 2
    + ["log the catalog", "on and on and on", "a mat a cat a hat"]
)


def _word_freqs(corpus):
    wf = {}
    for line in corpus:
        for w in line.split(" "):
            wf[w] = wf.get(w, 0) + 1
    return wf


def test_viterbi_matches_enumeration_exhaustively():
    """The DP segmenter == full enumeration for every prefix-closed vocab
    over a crafted word set, including exact-score ties (uniform logp makes
    every equal-length segmentation tie, so the seq-ASC rule is load-bearing)."""
    from signalk_parquet_spark.operators.unigram import viterbi_segment

    vocab = ["a", "b", "c", "ab", "bc", "abc", "cab", "abca"]
    uniform = {p: math.log(1.0 / len(vocab)) for p in vocab}
    weighted = {p: math.log((len(p) + 1) / 20.0) for p in vocab}
    for logp in (uniform, weighted):
        for word in ("abcabc", "aabbcc", "abcabca", "cababc", "aaaa", "b"):
            assert viterbi_segment(word, logp, 4) == ref_segment(word, logp, 4), (
                word, logp is uniform)
    # no segmentation exists -> None on both
    assert viterbi_segment("abz", uniform, 4) is None
    assert ref_segment("abz", uniform, 4) is None


def test_train_unigram_matches_reference(spark):
    """Full trainer differential: identical (piece, count, logp) table —
    logp compared exactly (both sides compute ln(int)-ln(int))."""
    from signalk_parquet_spark.operators.tokenizer import word_freq
    from signalk_parquet_spark.operators.unigram import train_unigram

    docs = spark.createDataFrame([(t,) for t in _CORPUS], "text string")
    words = word_freq(docs)
    got = train_unigram(words, vocab_size=24, max_piece_len=4,
                        seed_size=64, n_iter=3)
    want = ref_train(_word_freqs(_CORPUS), vocab_size=24, max_piece_len=4,
                     seed_size=64, n_iter=3)
    assert got == want
    assert len(got) == 24
    # the model actually learned multi-char pieces, with chars protected
    assert any(len(p) > 1 for p, _, _ in got)
    assert {p for p, _, _ in got if len(p) == 1} == set("".join(_word_freqs(_CORPUS)))


def test_apply_unigram_roundtrip_and_fallback(spark):
    """Tokenization concatenates back to the input for trained text AND for
    words with characters the vocab has never seen (the verbatim-char
    fallback), and segmentation prefers learned multi-char pieces."""
    from signalk_parquet_spark.operators.tokenizer import word_freq
    from signalk_parquet_spark.operators.unigram import apply_unigram, train_unigram

    docs = spark.createDataFrame([(t,) for t in _CORPUS], "text string")
    vocab = train_unigram(word_freq(docs), vocab_size=24, max_piece_len=4,
                          seed_size=64, n_iter=3)
    probe = spark.createDataFrame(
        [("the cat sat",), ("catalog mats",), ("zebra! cat",), ("",)],
        "text string",
    )
    rows = {r["text"]: r["unigram_tokens"]
            for r in apply_unigram(probe, vocab, max_piece_len=4).collect()}
    for text, toks in rows.items():
        assert "".join(toks) == text.replace(" ", "")
    assert rows[""] == []
    # 'zebra!' contains chars outside the corpus: verbatim single pieces
    assert "z" in rows["zebra! cat"] and "!" in rows["zebra! cat"]
    # learned pieces beat characters where the model supports them
    assert any(len(t) > 1 for t in rows["the cat sat"])


def test_train_unigram_validates_vocab_size(spark):
    from signalk_parquet_spark.operators.unigram import train_unigram

    with pytest.raises(ValueError, match=">= 1"):
        train_unigram(None, vocab_size=0)


def test_viterbi_matches_enumeration_randomized():
    """Hypothesis-randomized extension of the exhaustive differential:
    random words over a tiny alphabet + random sub-vocabularies with
    coarse-quantized logp (0.5 steps, so exact-score ties are COMMON —
    different piece multisets hit identical sums and the seq-ASC rule
    decides), DP vs full enumeration must agree on every draw."""
    import math

    from hypothesis import given, settings
    from hypothesis import strategies as st

    from signalk_parquet_spark.operators.unigram import viterbi_segment

    pieces = ["a", "b", "ab", "ba", "aa", "bb", "aba", "bab"]

    @settings(max_examples=200, deadline=None)
    @given(
        word=st.text(alphabet="ab", min_size=1, max_size=9),
        mask=st.integers(min_value=1, max_value=2 ** len(pieces) - 1),
        data=st.data(),
    )
    def check(word, mask, data):
        vocab = [p for i, p in enumerate(pieces) if mask >> i & 1]
        # quantized scores force frequent exact ties; draw per-piece levels
        logp = {
            p: -0.5 * data.draw(st.integers(min_value=1, max_value=4), label=p)
            for p in vocab
        }
        assert viterbi_segment(word, logp, 3) == ref_segment(word, logp, 3)

    check()
