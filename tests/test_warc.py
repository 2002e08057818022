"""WARC source: Content-Length framing, multi-member gzip, quarantine
policy, HTML text extraction, and the distributed import's row contract."""

from __future__ import annotations

import gzip

from signalk_parquet_spark.sources.warc import (
    html_to_text,
    import_warc_files,
    parse_warc_bytes,
)


def _rec(rid: str, rtype: str, payload: bytes, extra: dict | None = None) -> bytes:
    head = [
        "WARC/1.0",
        f"WARC-Type: {rtype}",
        f"WARC-Record-ID: <{rid}>",
        *(f"{k}: {v}" for k, v in (extra or {}).items()),
        f"Content-Length: {len(payload)}",
    ]
    return "\r\n".join(head).encode() + b"\r\n\r\n" + payload + b"\r\n\r\n"


def test_framing_survives_crlf_crlf_in_payload() -> None:
    tricky = b"a\r\n\r\nb\r\n\r\nc"
    data = _rec("r1", "resource", tricky) + _rec("r2", "resource", b"zz")
    recs, bad = parse_warc_bytes(data)
    assert bad == 0
    assert [r["record_id"] for r in recs] == ["<r1>", "<r2>"]
    assert recs[0]["payload_len"] == len(tricky)


def test_truncated_payload_quarantines_remainder() -> None:
    good = _rec("ok", "resource", b"fine")
    head = b"WARC/1.0\r\nWARC-Type: resource\r\nContent-Length: 9999\r\n\r\nshort"
    recs, bad = parse_warc_bytes(good + head)
    assert [r["record_id"] for r in recs] == ["<ok>"]
    assert bad == 1


def test_missing_content_length_quarantines() -> None:
    data = b"WARC/1.0\r\nWARC-Type: resource\r\n\r\npayload\r\n\r\n"
    recs, bad = parse_warc_bytes(data)
    assert recs == [] and bad == 1


def test_non_warc_prefix_quarantines() -> None:
    recs, bad = parse_warc_bytes(b"HTTP/1.1 200 OK\r\n\r\n")
    assert recs == [] and bad == 1


def test_multi_member_gzip_reassembles_framing() -> None:
    rec = _rec("gz", "resource", b"x" * 100)
    half = len(rec) // 2
    data = gzip.compress(rec[:half]) + gzip.compress(rec[half:])
    recs, bad = parse_warc_bytes(data)
    assert bad == 0 and [r["record_id"] for r in recs] == ["<gz>"]


def test_http_status_and_text_extraction() -> None:
    body = "<html><script>ignored<div></script><body>A &amp; B</body></html>"
    payload = b"HTTP/1.1 301 Moved\r\nLocation: x\r\n\r\n" + body.encode()
    recs, bad = parse_warc_bytes(_rec("r", "response", payload))
    assert bad == 0
    assert recs[0]["http_status"] == 301
    assert recs[0]["text"] == "A & B"


def test_html_to_text_rules() -> None:
    assert html_to_text("<style>.a{}</style><p>x</p>") == "x"
    assert html_to_text("a<br>b") == "a\nb"  # block boundary -> real line
    assert html_to_text("&lt;tag&gt; &amp; more") == "<tag> & more"
    assert html_to_text("  already   plain  ") == "already plain"
    # block elements make lines; raw source newlines are just whitespace
    assert html_to_text("<p>one para.</p><p>two\npara.</p>") == "one para.\ntwo para."
    assert html_to_text("<h2>T</h2><div>a</div><div></div>") == "T\na"


def test_import_warc_files_rows_and_quarantine_column(spark, tmp_path) -> None:
    clean = _rec("a", "resource", b"one") + _rec("b", "resource", b"two")
    dirty = _rec("c", "resource", b"three") + b"WARC/1.0\r\nbroken"
    p1, p2 = str(tmp_path / "clean.warc"), str(tmp_path / "dirty.warc")
    open(p1, "wb").write(clean)
    open(p2, "wb").write(dirty)
    out = import_warc_files(spark, [p1, p2]).toPandas()
    assert len(out) == 3
    by_file = out.groupby(out["source_file"].str.contains("dirty"))["quarantined"].max()
    assert by_file[False] == 0 and by_file[True] == 1


def test_url_policy_blocklist_and_host_cap(spark) -> None:
    from signalk_parquet_spark.sources.warc import apply_url_policy

    rows = [
        (1, "http://spam.example.com/a", 5),
        (2, "https://EXAMPLE.com/b", 1),       # suffix root, case-folded
        (3, "http://ok.org:8080/x", 9),        # port stripped
        (4, "http://ok.org/y", 2),
        (5, "http://ok.org/z", 7),
        (6, "http://fine.net/only", 3),
        (7, "http://notexample.com/c", 4),     # NOT a suffix match
    ]
    df = spark.createDataFrame(rows, "doc_id long, url string, quality long")
    out = apply_url_policy(
        df, "url",
        blocked_suffixes=("example.com",),
        max_per_host=2,
        order_col="quality",
    ).toPandas().set_index("doc_id")
    assert out.loc[1, "reason"] == "blocklist" and not out.loc[1, "kept"]
    assert out.loc[2, "reason"] == "blocklist"
    assert out.loc[7, "kept"]  # notexample.com must survive a suffix rule
    # ok.org capped at 2 by quality asc (docs 4 then 1? -> quality 2,7,9)
    ok = out[out.host == "ok.org"]
    assert set(ok[ok.kept].index) == {4, 5} and ok.loc[3, "reason"] == "host_cap"
    assert out.loc[6, "kept"]
    # audit contract: every input row survives with a decision
    assert len(out) == len(rows)


def test_warc_to_c4_composition(spark) -> None:
    """The real-user pipeline: Common Crawl WARC -> text extraction -> C4
    line-level quality rules. The r9 verdict found the old extractor
    squeezed every page to ONE line, degenerating C4's per-line keep rule
    to a whole-page check. Expectations are hand-computed from the fixture
    pages' rendered line structure, independent of both components."""
    from signalk_parquet_spark.queries_curation import (
        _write_warc_fixture,
        c4_metrics,
    )

    pages = (
        import_warc_files(spark, _write_warc_fixture())
        .filter("warc_type = 'response' AND http_status = 200")
        .selectExpr("target_uri AS doc_id", "text")
    )
    got = {
        r["doc_id"]: (r["n_lines"], r["n_kept_lines"], r["n_sentences"], r["keep"])
        for r in c4_metrics(pages).collect()
    }
    assert got == {
        # title + body line; 'Hello & world !' ends in ! but has 4 words
        "http://example.com/alpha": (2, 0, 0, 0),
        "http://example.com/framing": (1, 0, 0, 0),
        "http://example.org/gz": (1, 0, 0, 0),
        # h1 + 3 sentence paragraphs + short div: 5 lines, 3 kept, 3
        # sentences -> the only page that PASSES the C4 keep bar
        "http://example.com/story": (5, 3, 3, 1),
    }, got


def test_dom_extractor_on_fixture_pages() -> None:
    """The DOM extractor's own hand-computed truth on every gate fixture
    page: identical line structure to the regex path, except inline
    elements contribute no whitespace (rendered-text semantics:
    '<b>world</b>!' -> 'world!')."""
    from signalk_parquet_spark.queries_curation import _WARC_PAGES
    from signalk_parquet_spark.sources.warc import html_to_text_dom

    expected = {
        "http://example.com/alpha": "Alpha\nHello & world!",  # no '<b>' space
        "http://example.com/missing": "Not Found",
        "http://example.com/framing": "line1 line2 tricky",
        "http://example.org/gz": "Gzipped <member>",
        "http://example.com/story": (
            "Story Time\nThis is a good sentence with many words.\n"
            "Another fine sentence follows here naturally.\n"
            "Reading every word here is quite rewarding indeed.\nshort bit"
        ),
    }
    for uri, _status, body, _regex_text in _WARC_PAGES:
        assert html_to_text_dom(body) == expected[uri], uri


def test_dom_extractor_tag_soup_wins() -> None:
    """The cases a tag regex cannot handle — each asserted against the
    DOM extractor's correct output (and shown to break the regex path
    where the divergence is the point)."""
    from signalk_parquet_spark.sources.warc import html_to_text, html_to_text_dom

    # attribute value containing '>': regex truncates the tag match
    soup = '<img alt="a > b">text'
    assert html_to_text_dom(soup) == "text"
    assert html_to_text(soup) != "text"  # documented regex limitation
    # comment wrapping markup: regex leaves residue
    assert html_to_text_dom("x<!-- <p>gone</p> -->y") == "xy"
    # hidden subtrees
    assert html_to_text_dom(
        '<div style="display:none">secret<p>deep</p></div><div>shown</div>'
    ) == "shown"
    assert html_to_text_dom("<span hidden>no</span>yes") == "yes"
    assert html_to_text_dom('<p style="visibility: hidden">no</p><p>yes</p>') == "yes"
    # sloppy nesting: implicit close of the first <p>
    assert html_to_text_dom("<p>a<p>b") == "a\nb"
    # <pre> keeps raw newlines as line boundaries
    assert html_to_text_dom("<pre>line1\n   line2</pre>after") == "line1\nline2\nafter"
    # script containing markup-like strings (CDATA content model)
    assert html_to_text_dom('<script>if(a<b){x="</div>"}</script>ok') == "ok"
    # entity INSIDE attribute + in text
    assert html_to_text_dom('<a href="?a=1&amp;b=2">A &amp; B</a>') == "A & B"
    # unmatched end tags are ignored, not crashes
    assert html_to_text_dom("</div></p>text</span>") == "text"


def test_import_warc_files_dom_mode(spark, tmp_path) -> None:
    from signalk_parquet_spark.queries_curation import _write_warc_fixture
    from signalk_parquet_spark.sources.warc import import_warc_files

    import pytest

    out = (
        import_warc_files(spark, _write_warc_fixture(), extractor="dom")
        .filter("target_uri = 'http://example.com/alpha'")
        .select("text")
        .collect()
    )
    texts = {r["text"] for r in out if r["text"] is not None}
    assert texts == {"Alpha\nHello & world!"}
    with pytest.raises(ValueError, match="unknown extractor"):
        import_warc_files(spark, _write_warc_fixture(), extractor="bs4")


def test_extractor_fuzz_differential() -> None:
    """Regex and DOM extractors must agree EXACTLY on the well-formed
    subset of HTML where their documented semantics coincide: properly
    closed block elements containing space-separated inline content
    (inline wraps whole words; entities allowed). Divergences outside
    this subset (tag soup, implicit closes, inline spacing) are the DOM
    mode's documented wins, covered by the targeted tests above."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from signalk_parquet_spark.sources.warc import html_to_text, html_to_text_dom

    word = st.one_of(
        st.text(alphabet="abcdefg", min_size=1, max_size=6),
        st.just("&amp;"),
        st.just("x&lt;y"),
    )

    @st.composite
    def inline(draw):
        parts = []
        for w in draw(st.lists(word, min_size=1, max_size=6)):
            tag = draw(st.sampled_from([None, "b", "i", "em", "span", "a"]))
            parts.append(w if tag is None else f"<{tag}>{w}</{tag}>")
        return " ".join(parts)

    @st.composite
    def block(draw, depth=0):
        tag = draw(st.sampled_from(["p", "div", "h2", "li", "blockquote"]))
        if depth < 1 and draw(st.booleans()):
            inner = "".join(
                draw(st.lists(block(depth=depth + 1), min_size=1, max_size=3))
            )
        else:
            inner = draw(inline())
        return f"<{tag}>{inner}</{tag}>"

    @given(st.lists(block(), min_size=1, max_size=5))
    @settings(max_examples=150, deadline=None)
    def check(blocks):
        doc = "<html><body>" + "".join(blocks) + "</body></html>"
        assert html_to_text(doc) == html_to_text_dom(doc)

    check()
