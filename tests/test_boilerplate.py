"""jusText-style boilerplate removal (sources/warc.py): block segmentation
with link-char tracking on the DOM walker, core classification (link
density / length / stopword density), the simplified context pass, and the
Spark block/main-content operators."""

from __future__ import annotations

from signalk_parquet_spark.sources.warc import (
    _finalize_blocks,
    classify_block,
    extract_content_blocks,
    extract_main_content,
    html_content_blocks,
)

#: stopword lexicon for the crafted corpus (the engine default EN_STOPWORDS)
STOPS = ("the", "a", "of", "and", "to", "in", "is", "it")

P1 = ("The story of the voyage is one of the great tales and it is told in "
      "the islands to anyone willing to listen when the evening is calm and "
      "the harbour is quiet.")
P2 = ("It is a tale of the sea and of the people in it, and the journey is "
      "the point of it all in the end, told again and again to the children "
      "of the town.")

PAGE = (
    "<html><body>"
    '<nav><a href="/">Home</a> <a href="/a">About</a> <a href="/c">Contact</a></nav>'
    "<h1>The Voyage</h1>"
    f"<p>{P1}</p>"
    f"<p>{P2}</p>"
    "<div>Fig. 1: the ship</div>"
    "<p>Buy now discount offer click here today for great savings</p>"
    '<footer><a href="/t">Terms</a> <a href="/p">Privacy</a></footer>'
    "<div>v1.2</div>"
    "</body></html>"
)


def test_core_classifier_thresholds() -> None:
    assert classify_block(200, 40, 0.5, 0.5) == "bad"      # link farm
    assert classify_block(10, 2, 0.0, 0.5) == "short"      # too short to judge
    assert classify_block(200, 40, 0.0, 0.25) == "good"    # long prose
    assert classify_block(80, 15, 0.0, 0.25) == "neargood" # prose, midsize
    assert classify_block(80, 15, 0.0, 0.12) == "neargood"
    assert classify_block(200, 40, 0.0, 0.05) == "bad"     # keyword stuffing
    assert classify_block(0, 0, 0.0, 0.0) == "bad"


def test_context_pass() -> None:
    assert _finalize_blocks(["bad", "short", "good"]) == ["bad", "good", "good"]
    assert _finalize_blocks(["bad", "short", "bad"]) == ["bad", "bad", "bad"]
    assert _finalize_blocks(["good", "neargood", "bad"]) == ["good", "good", "bad"]
    assert _finalize_blocks(["neargood"]) == ["bad"]


def test_page_blocks_and_decisions() -> None:
    blocks = extract_content_blocks(PAGE, STOPS)
    by_text = {b["text"]: b for b in blocks}
    nav = by_text["Home About Contact"]
    assert nav["cls"] == "bad" and nav["link_density"] > 0.8
    assert by_text[P1]["cls"] == "good" and by_text[P1]["keep"]
    assert by_text[P2]["cls"] == "good" and by_text[P2]["keep"]
    # short title adjacent to good prose: kept by the context pass
    title = by_text["The Voyage"]
    assert title["cls"] == "short" and title["keep"] == 1
    # short caption adjacent to good prose: kept
    assert by_text["Fig. 1: the ship"]["keep"] == 1
    # stopword-free sales line: bad despite zero links
    assert by_text["Buy now discount offer click here today for great savings"]["cls"] == "bad"
    # footer link farm and trailing version stamp: dropped
    assert by_text["Terms Privacy"]["keep"] == 0
    assert by_text["v1.2"]["keep"] == 0
    # block order is document order
    assert [b["block_idx"] for b in blocks] == list(range(len(blocks)))


def test_spark_operators_blocks_and_main_content(spark) -> None:
    df = spark.createDataFrame(
        [(1, PAGE), (2, '<nav><a href="/">only links</a></nav>')],
        "doc_id long, html string",
    )
    blocks = html_content_blocks(df, "html", stopwords=STOPS).toPandas()
    assert set(blocks[blocks.keep == 1].doc_id) == {1}
    main = {
        r["doc_id"]: r["text"]
        for r in extract_main_content(df, "html", stopwords=STOPS).collect()
    }
    # boilerplate-only page drops out entirely
    assert set(main) == {1}
    assert main[1] == "\n".join(
        ["The Voyage", P1, P2, "Fig. 1: the ship"]
    )


def test_custom_id_col_resolves(spark) -> None:
    """A non-default id_col must survive into the block rows and resolve
    in extract_main_content's groupBy (regression: the id used to come
    back hardcoded as 'doc_id', leaving groupBy(id_col) unresolved)."""
    df = spark.createDataFrame([(7, PAGE)], "page_id long, html string")
    blocks = html_content_blocks(df, "html", id_col="page_id", stopwords=STOPS)
    assert "page_id" in blocks.columns and "doc_id" not in blocks.columns
    main = extract_main_content(df, "html", id_col="page_id", stopwords=STOPS).collect()
    assert [r["page_id"] for r in main] == [7]
    assert main[0]["text"].startswith("The Voyage")
