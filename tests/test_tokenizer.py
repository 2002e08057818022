"""The unified tokenizer contract (operators/tokenizer.py) and the
three-trainer cross-differential the r9 verdict asked for: BPE, WordPiece
and Unigram trained side-by-side from ONE shared word_freq stage on ONE
crafted corpus, with each trainer's distinguishing invariant checked
against the others (raw-count argmax vs likelihood-score argmax vs
ML segmentation), plus the uniform apply contract (same out_col, all
outputs reconstruct the input)."""

from __future__ import annotations

from signalk_parquet_spark.operators.tokenizer import (
    TokenizerModel,
    apply_tokenizer,
    train_tokenizer,
    word_freq,
)

# crafted so BPE and WordPiece pick DIFFERENT first merges:
#   (a,b) adjacency count 6 — the raw-count argmax (BPE)
#   (x,y) count 3 but x/y occur ONLY together -> likelihood score
#         3/(3*3)=0.333 beats (a,##b)'s 6/(8*6)=0.125 (WordPiece)
_DOCS = ["ab ab ab xy", "ab ab ab xy", "xy a b", "a b"]


def _docs_df(spark):
    return spark.createDataFrame([(i, t) for i, t in enumerate(_DOCS)],
                                 "doc_id long, text string")


def _freqs() -> dict[str, int]:
    out: dict[str, int] = {}
    for d in _DOCS:
        for w in d.split(" "):
            out[w] = out.get(w, 0) + 1
    return out


def test_shared_stage_feeds_all_three(spark) -> None:
    wf = {r["word"]: r["freq"] for r in word_freq(_docs_df(spark)).collect()}
    assert wf == _freqs() == {"ab": 6, "xy": 3, "a": 2, "b": 2}


def test_cross_differential_first_merge_diverges(spark) -> None:
    """The algorithmic signature of each trainer, on the same word table:
    BPE's first merge is the raw-count argmax, WordPiece's the
    likelihood-score argmax — crafted to DIFFER here. Both full merge
    lists must equal the independent pure-Python reference trainers."""
    from tests.test_bpe import _py_train as py_bpe
    from tests.test_wordpiece import _py_train as py_wp

    words = word_freq(_docs_df(spark))
    m_bpe = train_tokenizer(words, "bpe", 3, tiny=True)
    m_wp = train_tokenizer(words, "wordpiece", 3, tiny=True)
    assert m_bpe.merges[0] == ("a", "b")
    assert m_wp.merges[0] == ("x", "##y")
    assert m_bpe.merges == py_bpe(_freqs(), 3)
    assert m_wp.merges == py_wp(_freqs(), 3)


def test_uniform_apply_contract_and_roundtrip(spark) -> None:
    """apply_tokenizer: same out_col for every algorithm, and every
    algorithm's pieces concatenate back to the input words (## stripped
    for WordPiece) — the lossless-segmentation invariant all three share
    on their own training corpus."""
    docs = _docs_df(spark)
    words = word_freq(docs)
    models = [
        train_tokenizer(words, "bpe", 3, tiny=True),
        train_tokenizer(words, "wordpiece", 3, tiny=True),
        train_tokenizer(words, "unigram", 8, max_piece_len=2),
    ]
    for m in models:
        out = apply_tokenizer(docs, m, out_col="toks")
        rows = {r["doc_id"]: r["toks"] for r in out.collect()}
        assert set(rows) == {0, 1, 2, 3}
        for i, text in enumerate(_DOCS):
            joined = "".join(t.removeprefix("##") for t in rows[i])
            assert joined == text.replace(" ", ""), (m.algo, i, rows[i])
    # unigram keeps every single character (segmentation coverage)
    ug = models[2]
    assert {p for p, _, _ in ug.vocab if len(p) == 1} == set("abxy")


def test_unknown_algo_raises(spark) -> None:
    import pytest

    words = word_freq(_docs_df(spark))
    with pytest.raises(ValueError, match="unknown tokenizer algo"):
        train_tokenizer(words, "sentencepiece", 4)
    with pytest.raises(ValueError, match="unknown tokenizer algo"):
        apply_tokenizer(_docs_df(spark), TokenizerModel("nope"))
