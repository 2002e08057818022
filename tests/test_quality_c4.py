"""quality_c4 (queries_curation.c4_metrics) — the quality_gopher testing
pattern: the driver corpus has no punctuation/newlines so most C4 rules are
constant there; this three-way differential (Spark vs DuckDB vs a
pure-Python reference) runs a crafted corpus where EVERY rule varies."""

import re

import duckdb
import pandas as pd

from signalk_parquet_spark.queries_curation import C4_BLOCKLIST, c4_metrics
from signalk_parquet_spark.registry import REGISTRY, _import_all

DOCS = [
    # keeps: 3 proper sentences across kept lines
    (0, "This is a fine sentence with words.\nAnother good line is here today!\nAnd a third one ends properly?"),
    # line-level: short line dropped, no-terminal line dropped
    (1, "Too short a line.\nthis line has plenty of words but no terminal punctuation\nA good long line ends with punctuation. And another! Plus a third."),
    # javascript line dropped -> only 2 sentences -> page dropped
    (2, "Please enable javascript to view this page now.\nOne good sentence sits here fine.\nA second good sentence sits here too."),
    # lorem ipsum page dropped despite good sentences
    (3, "Lorem ipsum dolor sit amet is boilerplate.\nA perfectly good sentence lives here.\nAnd another good one follows it."),
    # brace page dropped
    (4, "This page contains code { return 1; } somewhere.\nA good sentence number one is long.\nA good sentence number two is long."),
    # blocklist page dropped
    (5, "This page mentions spamword right in the text.\nA good sentence number one is long.\nA good sentence number two is long."),
    # multi-sentence single line counts 3 sentences
    (6, "One good line holds it. All of it! Yes really?"),
    # empty-ish page
    (7, "nothing here"),
]


def _py_metrics(doc_id: int, text: str) -> tuple:
    lines = text.split("\n")
    kept = [
        ln for ln in lines
        if re.search(r'[.!?"]$', ln) and len(ln.split(" ")) >= 5
        and "javascript" not in ln.lower()
    ]
    n_sent = sum(len(re.findall(r"[.!?]", ln)) for ln in kept)
    low = text.lower()
    f_lorem = int("lorem ipsum" in low)
    f_brace = int("{" in text)
    toks = re.split(r"[ \n]", low)
    f_bad = int(any(w in toks for w in C4_BLOCKLIST))
    keep = int(not (f_lorem or f_brace or f_bad) and n_sent >= 3)
    return (doc_id, len(lines), len(kept), n_sent, f_lorem, f_brace, f_bad, keep)


COLS = ["doc_id", "n_lines", "n_kept_lines", "n_sentences",
        "f_lorem", "f_brace", "f_badword", "keep"]


def test_c4_three_way_differential(spark):
    want = pd.DataFrame([_py_metrics(i, t) for i, t in DOCS], columns=COLS)
    # the crafted corpus must actually vary every flag and the keep bit
    assert set(want["keep"]) == {0, 1}
    for c in ("f_lorem", "f_brace", "f_badword"):
        assert set(want[c]) == {0, 1}, c
    # Spark
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    got = (
        c4_metrics(docs).toPandas().sort_values("doc_id").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got[COLS], want, check_dtype=False)
    # DuckDB: the registered oracle over the same docs
    _import_all()
    sql = REGISTRY["quality_c4"][1]
    con = duckdb.connect()
    con.register("documents", pd.DataFrame(DOCS, columns=["doc_id", "text"]))
    dd = con.execute(sql).fetchdf().sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(dd[COLS], want, check_dtype=False)


def test_c4_keep_reasons():
    rows = {r[0]: r for r in (_py_metrics(i, t) for i, t in DOCS)}
    assert rows[0][-1] == 1           # clean page keeps
    assert rows[1][2] == 1            # two bad lines dropped, one kept
    assert rows[2][-1] == 0 and rows[2][3] == 2  # js line gone -> <3 sentences
    assert rows[6][-1] == 1 and rows[6][3] == 3  # one line, three sentences
    assert rows[7][2] == 0 and rows[7][-1] == 0
