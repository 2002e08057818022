"""BPE trainer differential: the distributed Spark trainer must learn the
IDENTICAL merge list as an independent pure-Python reference trainer (same
published semantics, same total tie-break order), on both a crafted corpus
with engineered ties/overlaps and the real sf0.001 table. Plus unit tests
for the JVM-side merge fold on the classic edge cases (overlapping runs,
merged-symbol adjacency) and a conservation property for apply_bpe."""

from __future__ import annotations

from collections import Counter

import pytest
from pyspark.sql import functions as F

from signalk_parquet_spark.operators.bpe import _encode_word, apply_bpe, train_bpe
from signalk_parquet_spark.operators.tokenizer import merge_pair, word_freq
from signalk_parquet_spark.registry import load


# --- independent reference trainer (pure Python, no Spark) -------------------
def _py_train(word_freqs: dict[str, int], n_merges: int) -> list[tuple[str, str]]:
    state = {tuple(w): f for w, f in word_freqs.items()}
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        counts: Counter = Counter()
        for syms, f in state.items():
            for i in range(len(syms) - 1):
                counts[(syms[i], syms[i + 1])] += f
        if not counts:
            break
        # total order: count DESC, then "a b" string ASC
        best = min(counts.items(), key=lambda kv: (-kv[1], f"{kv[0][0]} {kv[0][1]}"))[0]
        merges.append(best)
        a, b = best
        new_state: dict[tuple, int] = {}
        for syms, f in state.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new_state[tuple(out)] = new_state.get(tuple(out), 0) + f
        state = new_state
    return merges


def _spark_words(spark, rows):
    return spark.createDataFrame(rows, "word string, freq long")


# crafted lexicon: 'aaab' exercises overlapping-run merges, 'abab' exercises
# merged-symbol adjacency, equal-count ties force the lexicographic
# tie-break, and 'q' is a single-symbol word (no pairs)
CRAFTED = {"aaab": 10, "abab": 10, "banana": 7, "bandana": 7, "q": 99}


def test_merge_fold_overlap_and_adjacency(spark):
    df = spark.createDataFrame([(list("aaab"),), (list("abab"),)], "syms array<string>")
    got = {tuple(r[0]): r[1] for r in df.select("syms", merge_pair(F.col("syms"), "a", "a")).collect()}
    # left-to-right non-overlapping: aaa -> [aa, a]
    assert got[tuple("aaab")] == ["aa", "a", "b"]
    assert got[tuple("abab")] == ["a", "b", "a", "b"]
    # a second fold on the merged symbol
    df2 = spark.createDataFrame([(["aa", "a", "b"],)], "syms array<string>")
    assert df2.select(merge_pair(F.col("syms"), "aa", "a")).first()[0] == ["aaa", "b"]


def test_merge_fold_matches_python_reference(spark):
    words = ["aaab", "abab", "banana", "bandana", "aaaa", "abba"]
    for a, b in [("a", "a"), ("a", "b"), ("b", "a"), ("n", "a")]:
        df = spark.createDataFrame([(list(w),) for w in words], "syms array<string>")
        got = [r[0] for r in df.select(merge_pair(F.col("syms"), a, b)).collect()]
        want = [_encode_word(w, [(a, b)]) for w in words]
        assert got == want, (a, b)


def test_trainer_differential_crafted(spark):
    # three-way: DISTRIBUTED loop (local=False) vs the engine's driver-local
    # rung (tiny default since r12) vs the independent reference above
    words = _spark_words(spark, list(CRAFTED.items()))
    want = _py_train(CRAFTED, 10)
    assert train_bpe(words, 10, tiny=True, local=False) == want
    assert train_bpe(words, 10, tiny=True) == want


def test_trainer_differential_corpus(spark, sf_smoke):
    d = load(spark, sf_smoke, "documents")
    wf = {r["word"]: r["freq"] for r in word_freq(d).collect()}
    want = _py_train(wf, 12)
    # distributed and driver-local backends against the reference on the
    # real table (the gate runs the local rung; the distributed loop stays
    # pinned here so the backends can't drift apart)
    assert train_bpe(word_freq(d), 12, tiny=True, local=False) == want
    got = train_bpe(word_freq(d), 12, tiny=True)
    assert got == want
    # the trainer actually crossed into multi-char subwords
    assert any(len(a + b) > 2 for a, b in got)


def test_trainer_exhausts_and_stops(spark):
    # 1 word of 3 chars -> 2 merges collapse it; iteration 3 finds no pairs
    merges = train_bpe(_spark_words(spark, [("abc", 5)]), 10, tiny=True)
    assert len(merges) == 2


def test_apply_bpe_conservation_and_cache(spark, sf_smoke):
    d = load(spark, sf_smoke, "documents").limit(50)
    merges = [("e", "r"), ("i", "n"), ("er", "s")]
    out = apply_bpe(d, merges).select("text", "bpe_tokens").collect()
    assert len(out) == 50
    for r in out:
        # concatenating the learned tokens reproduces the text minus spaces
        assert "".join(r["bpe_tokens"]) == r["text"].replace(" ", "")
        # and each token set matches the per-word python encoder
        want = [t for w in r["text"].split(" ") for t in _encode_word(w, merges)]
        assert r["bpe_tokens"] == want
