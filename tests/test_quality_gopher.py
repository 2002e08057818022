"""Gopher quality-rule gate (`quality_gopher`) on a CRAFTED corpus.

The driver corpus only varies r_words and r_stops (its synthetic text has
no symbols, bullets, ellipses, or degenerate word shapes), so the sf0.01
parity row cannot exercise the other four rules. This test builds documents
that trip each rule, runs the registered Spark gate AND its DuckDB oracle
on the same parquet, and checks both against an independent pure-Python
reference implementation of the published rules — a three-way differential.
"""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest

from signalk_parquet_spark.queries_curation import _GOPHER_STOPS
from signalk_parquet_spark.registry import REGISTRY

W = "dataset the a system join merge filter window column vector stream batch group"

DOCS = {
    # every rule satisfied: 26 mid-length alpha words incl. two stop words
    "good": W + " dataset the a system join merge filter window column vector stream batch group",
    # 13 words < 25 -> r_words trips
    "short": W,
    # words of length 12 -> mean_word_len > 10 -> r_mwl trips
    "longwords": " ".join(["organization"] * 24 + ["the", "a"]),
    # 10 of 26 words numeric -> alpha_ratio 16/26 < 0.8 -> r_alpha trips
    "numeric": W + " the a 10 20 30 40 50 60 70 80 90 11 3",
    # no stop words at all -> r_stops trips
    "nostops": " ".join(["dataset", "system", "join"] * 9),
    # 4 hash marks over 26 words = 0.153 > 0.1 -> r_symbol trips
    "hashy": W + " data# set# the a col# row# merge join scan sort batch value join",
    # 4 ellipses over 26 words = 0.153 > 0.1 -> r_symbol trips
    "dotty": W + " data... set... the a col... row... merge join scan sort batch value",
    # every line starts with a bullet -> bullet_ratio 1.0 > 0.9 -> r_lines
    "bullets": "\n".join(["- dataset the a system"] * 7),
    # 4 of 10 lines end with an ellipsis -> 0.4 > 0.3 -> r_lines trips
    # (ellipsis-to-word ratio stays 4/130 = 0.03 <= 0.1, isolating the rule)
    "ellend": "\n".join([W + " ..."] * 4 + [W] * 6),
}

EXPECT_TRIPPED = {
    "good": set(),
    "short": {"r_words"},
    "longwords": {"r_mwl"},
    "numeric": {"r_alpha"},
    "nostops": {"r_stops"},
    "hashy": {"r_symbol"},
    "dotty": {"r_symbol"},
    "bullets": {"r_lines"},
    "ellend": {"r_lines"},
}

FLAGS = ("r_words", "r_mwl", "r_alpha", "r_stops", "r_symbol", "r_lines")


def _py_reference(text: str) -> dict[str, int]:
    """Independent rule implementation (pure Python, no Spark/DuckDB)."""
    import re

    toks = text.split(" ")
    lines = text.split("\n")
    n = len(toks)
    mean_len = sum(len(t) for t in toks) / n
    alpha = sum(1 for t in toks if re.search(r"[a-zA-Z]", t)) / n
    stops = len({t for t in toks} & set(_GOPHER_STOPS))
    hash_ratio = text.count("#") / n
    ell_ratio = text.count("...") / n
    bullet = sum(1 for ln in lines if re.match(r"^[-*]", ln)) / len(lines)
    ell_end = sum(1 for ln in lines if ln.endswith("...")) / len(lines)
    r = {
        "r_words": int(25 <= n <= 100000),
        "r_mwl": int(3 <= mean_len <= 10),
        "r_alpha": int(alpha >= 0.8),
        "r_stops": int(stops >= 2),
        "r_symbol": int(hash_ratio <= 0.1 and ell_ratio <= 0.1),
        "r_lines": int(bullet <= 0.9 and ell_end <= 0.3),
    }
    r["keep"] = int(all(r.values()))
    return r


@pytest.fixture(scope="module")
def crafted_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("gopher")
    pdf = pd.DataFrame(
        {
            "doc_id": range(len(DOCS)),
            "text": list(DOCS.values()),
            "lang": "en",
            "source": "crafted",
            "n_chars": [len(t) for t in DOCS.values()],
        }
    )
    pdf.to_parquet(d / "documents.parquet")
    return str(d), list(DOCS.keys())


def test_gopher_three_way_differential(spark, crafted_dir):
    d, names = crafted_dir
    q, sql = REGISTRY["quality_gopher"]
    got = {int(r["doc_id"]): r.asDict() for r in q(spark, d).collect()}

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{d}/documents.parquet')"
    )
    want = {
        int(r["doc_id"]): dict(r)
        for _, r in con.execute(sql).fetchdf().iterrows()
    }

    for i, name in enumerate(names):
        ref = _py_reference(DOCS[name])
        for eng, row in (("spark", got[i]), ("duckdb", want[i])):
            flags = {k: int(row[k]) for k in (*FLAGS, "keep")}
            assert flags == ref, f"{name}: {eng} {flags} != python {ref}"
        tripped = {k for k in FLAGS if ref[k] == 0}
        assert tripped == EXPECT_TRIPPED[name], (
            f"{name}: crafted doc trips {tripped}, intended {EXPECT_TRIPPED[name]}"
        )
        assert ref["keep"] == int(not EXPECT_TRIPPED[name])

    # metrics (not just flags) agree exactly across engines
    for i in got:
        for col in ("n_words", "mean_word_len", "alpha_ratio", "stop_hits"):
            assert got[i][col] == want[i][col], (i, col)
