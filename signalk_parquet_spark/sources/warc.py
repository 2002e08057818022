"""WARC ingestion — the Common Crawl input edge of a training-data pipeline.

WARC (ISO 28500) is how web corpora arrive: concatenated records, each a
`WARC/1.x` header block, a blank line, then EXACTLY `Content-Length` bytes
of payload (for `response` records: an HTTP response whose body is the
HTML). Framing MUST come from Content-Length — payloads legally contain
`\\r\\n\\r\\n` — and Common Crawl ships each record as its own gzip member
concatenated into one `.warc.gz`, which Python's GzipFile reads through
transparently (multi-member).

Spark shape: `spark.read.format("binaryFile")` hands each WARC file to one
task as bytes (CC segments are ~1 GB — one task per segment is exactly how
CC is processed in practice; a 100 TB crawl is ~100k files, i.e. ~100k
tasks, no shuffle at all until the downstream dedup/quality stages). The
parse is a single forward pass; records that violate framing are counted
into a quarantine column set, not raised — one rotten record must not kill
a segment task (same policy as sources/formats.py's PERMISSIVE quarantine).

HTML -> text ships in two modes behind one column contract
(``extractor=`` on import_warc_files): "regex" — drop script/style
blocks, mark block boundaries, strip tags, decode entities, squeeze
per line; engine-free, so the gate oracle carries hand-computed
literals — and "dom" (html_to_text_dom) — a real tree-walking extractor
on stdlib html.parser: tolerant tag-stack tracking with implicit closes,
script/style/template/noscript subtree drops that survive tag soup the
regexes cannot (attributes containing '>', comments wrapping markup),
hidden-element drops (hidden attr, display:none/visibility:hidden),
<pre> newline preservation, and the same block-boundary line semantics
C4's line rules consume. On top of extraction, boilerplate REMOVAL is
implemented jusText-style (Pomikálek 2011 thresholds): classify_block /
extract_content_blocks score each DOM block by link density, length and
stopword density, a context pass rescues short blocks adjacent to good
prose, and extract_main_content re-joins the kept blocks into page-level
main content (tests/test_boilerplate.py).

No reference parity claim: the reference has no web-corpus surface; this
is a beyond-reference LLM-pipeline source (BASELINE extension set).
"""

from __future__ import annotations

import gzip
import html as _html
import io
import re
from collections.abc import Iterator
from html.parser import HTMLParser as _HTMLParser
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

WARC_SCHEMA = T.StructType(
    [
        T.StructField("source_file", T.StringType()),
        T.StructField("record_id", T.StringType()),
        T.StructField("warc_type", T.StringType()),
        T.StructField("target_uri", T.StringType()),
        T.StructField("warc_date", T.StringType()),  # ISO-8601 as shipped
        T.StructField("content_type", T.StringType()),
        T.StructField("http_status", T.IntegerType()),
        T.StructField("payload_len", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("quarantined", T.IntegerType()),  # bad records this file
    ]
)

_SCRIPT_RE = re.compile(r"(?is)<(script|style)\b.*?</\1\s*>")
_TAG_RE = re.compile(r"(?s)<[^>]*>")
_WS_RE = re.compile(r"\s+")
#: tags whose END marks a rendered line boundary — the extractor emits \n
#: there so C4's LINE-level keep rules (queries_curation.c4_metrics) see
#: real lines on crawl-extracted text instead of one squeezed page
#: (the r9 verdict's composition finding). <br> is the self-line-break.
_BLOCK_BOUNDARY_RE = re.compile(
    r"(?i)<br\s*/?>"
    r"|</(?:p|div|li|h[1-6]|tr|title|head|body|blockquote|ul|ol|table)\s*>"
)


def _normalize_lines(s: str) -> str:
    """Shared final step of both extractors: squeeze whitespace PER LINE,
    strip, drop empty lines — so line structure is exactly the block
    structure the extractor emitted."""
    lines = (_WS_RE.sub(" ", ln).strip() for ln in s.split("\n"))
    return "\n".join(ln for ln in lines if ln)


def html_to_text(body: str) -> str:
    """Regex text extraction: drop script/style subtrees, mark block-element
    boundaries (</p>, <br>, </div>, </li>, </h1-6>, </tr>, ...) as line
    breaks, strip tags, decode entities, squeeze whitespace PER LINE and
    drop empty lines. Raw newlines in the HTML source are insignificant
    whitespace (HTML semantics) — only block structure makes lines, so the
    output's line structure is the page's rendered paragraph structure and
    composes with C4's line-based keep rules. Deterministic and
    engine-free, so the gate oracle can carry the expected literals.
    Known limits vs html_to_text_dom (tested): attribute values containing
    '>' truncate the tag match; comments wrapping markup leave residue."""
    s = _SCRIPT_RE.sub(" ", body)
    s = _WS_RE.sub(" ", s)  # source newlines are just whitespace
    s = _BLOCK_BOUNDARY_RE.sub("\n", s)
    s = _TAG_RE.sub(" ", s)
    s = _html.unescape(s)
    return _normalize_lines(s)


#: subtrees whose content never renders
_DOM_SKIP_TAGS = frozenset({"script", "style", "template", "noscript"})
#: elements whose start AND end mark rendered line boundaries
_DOM_BLOCK_TAGS = frozenset(
    {
        "p", "div", "li", "h1", "h2", "h3", "h4", "h5", "h6", "tr", "title",
        "head", "body", "blockquote", "ul", "ol", "table", "section",
        "article", "header", "footer", "pre", "dd", "dt", "figcaption",
        "nav", "aside", "form", "fieldset",
    }
)
#: void elements — no end tag ever comes, so they must not enter the stack
_DOM_VOID_TAGS = frozenset(
    {"br", "hr", "img", "input", "meta", "link", "area", "base", "col",
     "embed", "source", "track", "wbr"}
)
_STYLE_HIDDEN_RE = re.compile(r"display\s*:\s*none|visibility\s*:\s*hidden")


class _DomTextExtractor(_HTMLParser):
    """Tolerant tree-walking text extractor. Maintains an open-tag stack
    with browser-style implicit closes (an end tag pops back to its
    nearest open match; unmatched end tags are ignored), suppressing data
    inside skip subtrees and hidden elements (hidden attribute,
    style display:none / visibility:hidden). <pre> content keeps its raw
    newlines as line boundaries; everywhere else source newlines are
    insignificant whitespace. convert_charrefs decodes entities in-stream
    — including inside attribute values, which is where the regex
    extractor's tag pattern breaks."""

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.parts: list[str] = []
        #: (tag, suppresses: bool) open-element stack
        self._stack: list[tuple[str, bool]] = []
        self._suppress = 0
        self._pre = 0

    @staticmethod
    def _hidden(attrs: list[tuple[str, str | None]]) -> bool:
        for k, v in attrs:
            if k == "hidden":
                return True
            if k == "style" and v and _STYLE_HIDDEN_RE.search(v.lower()):
                return True
        return False

    def handle_starttag(self, tag: str, attrs) -> None:
        if tag in _DOM_BLOCK_TAGS or tag == "br":
            self._block_boundary()
        if tag in _DOM_VOID_TAGS:
            return
        suppresses = tag in _DOM_SKIP_TAGS or self._hidden(attrs)
        self._stack.append((tag, suppresses))
        if suppresses:
            self._suppress += 1
        self._on_push(tag)

    def handle_endtag(self, tag: str) -> None:
        if tag in _DOM_VOID_TAGS:
            return
        # pop to the nearest matching open tag (implicit closes); an
        # unmatched end tag pops nothing — the browser-tolerant behavior
        for i in range(len(self._stack) - 1, -1, -1):
            if self._stack[i][0] == tag:
                for popped, suppresses in self._stack[i:]:
                    if suppresses:
                        self._suppress -= 1
                    self._on_pop(popped)
                del self._stack[i:]
                break
        if tag in _DOM_BLOCK_TAGS:
            self._block_boundary()

    # hooks the block-segmenting subclass observes
    def _block_boundary(self) -> None:
        self.parts.append("\n")

    def _on_push(self, tag: str) -> None:
        if tag == "pre":
            self._pre += 1

    def _on_pop(self, tag: str) -> None:
        if tag == "pre":
            self._pre -= 1

    def handle_data(self, data: str) -> None:
        if self._suppress:
            return
        if self._pre:
            self.parts.append(data)  # raw newlines are real line breaks
        else:
            self.parts.append(data.replace("\r", " ").replace("\n", " "))


def html_to_text_dom(body: str) -> str:
    """DOM-grade text extraction on stdlib html.parser — the real-parser
    upgrade of the regex path (same line semantics, same normalization,
    same column contract). Handles the tag-soup cases regexes cannot:
    attribute values containing '>', comments wrapping markup, sloppy
    nesting with implicit closes, hidden subtrees, <pre> preformatting.
    Inline elements contribute NO whitespace (
    "<b>world</b>!" -> "world!"), matching rendered text where the regex
    path inserts a space per stripped tag."""
    p = _DomTextExtractor()
    try:
        p.feed(body)
        p.close()
    except Exception:
        # html.parser is already tolerant; a pathological page falls back
        # to the regex path rather than killing a segment task
        return html_to_text(body)
    return _normalize_lines("".join(p.parts))


def _maybe_gunzip(data: bytes) -> bytes:
    if data[:2] == b"\x1f\x8b":
        # GzipFile reads CONCATENATED members — the Common Crawl layout
        with gzip.GzipFile(fileobj=io.BytesIO(data)) as fh:
            return fh.read()
    return data


#: text-extraction modes accepted by parse_warc_bytes / import_warc_files
_EXTRACTORS = {"regex": html_to_text, "dom": html_to_text_dom}


# --- boilerplate removal (jusText-style main-content extraction) -----------------------
class _BlockExtractor(_DomTextExtractor):
    """DOM walk segmented into BLOCKS at block-element boundaries, each
    carrying the link-character count boilerplate classification needs
    (navigation/footer link farms are text too — only link DENSITY tells
    them apart from prose)."""

    def __init__(self) -> None:
        super().__init__()
        self.blocks: list[dict[str, Any]] = []
        self._runs: list[tuple[str, bool]] = []  # (text, inside <a>)
        self._link = 0

    def _on_push(self, tag: str) -> None:
        super()._on_push(tag)
        if tag == "a":
            self._link += 1

    def _on_pop(self, tag: str) -> None:
        super()._on_pop(tag)
        if tag == "a":
            self._link -= 1

    def handle_data(self, data: str) -> None:
        if self._suppress:
            return
        t = data if self._pre else data.replace("\r", " ").replace("\n", " ")
        self._runs.append((t, self._link > 0))

    def _block_boundary(self) -> None:
        text = _WS_RE.sub(" ", "".join(t for t, _ in self._runs)).strip()
        if text:
            link_chars = sum(
                len(_WS_RE.sub(" ", t).strip()) for t, in_a in self._runs if in_a
            )
            self.blocks.append(
                {
                    "text": text,
                    "n_chars": len(text),
                    "link_chars": min(link_chars, len(text)),
                }
            )
        self._runs = []

    def close(self) -> None:
        super().close()
        self._block_boundary()  # flush trailing text


def classify_block(
    n_chars: int,
    n_words: int,
    link_density: float,
    stop_density: float,
    max_link_density: float = 0.33,
    length_low: int = 40,
    length_high: int = 120,
    stop_low: float = 0.10,
    stop_high: float = 0.20,
) -> str:
    """Core block classification, the jusText scheme (Pomikálek 2011) with
    its published default shape: link-dense blocks are bad outright; very
    short blocks are context-dependent ('short'); otherwise stopword
    density separates prose ('good'/'neargood') from keyword lists
    ('bad'). Pure integer/ratio compares — deterministic everywhere."""
    if n_words == 0:
        return "bad"
    if link_density > max_link_density:
        return "bad"
    if n_chars < length_low:
        return "short"
    if stop_density >= stop_high:
        return "good" if n_chars > length_high else "neargood"
    if stop_density >= stop_low:
        return "neargood"
    return "bad"


def _finalize_blocks(core: list[str]) -> list[str]:
    """Context pass (simplified from jusText's edge-distance rule,
    documented deviation): a context-dependent block ('short'/'neargood')
    is kept iff an IMMEDIATE neighbor is core-good; core labels stand."""
    final = []
    for i, c in enumerate(core):
        if c in ("good", "bad"):
            final.append(c)
            continue
        prev_good = i > 0 and core[i - 1] == "good"
        next_good = i + 1 < len(core) and core[i + 1] == "good"
        final.append("good" if prev_good or next_good else "bad")
    return final


def extract_content_blocks(body: str, stopwords: tuple[str, ...]) -> list[dict]:
    """One page -> classified blocks: the DOM block walk + core
    classification + context pass, as a pure function (the executor-side
    unit html_content_blocks maps over pages)."""
    p = _BlockExtractor()
    try:
        p.feed(body)
        p.close()
    except Exception:
        return []
    stops = set(stopwords)
    feats = []
    for b in p.blocks:
        words = b["text"].lower().split(" ")
        n_words = len(words)
        feats.append(
            {
                **b,
                "n_words": n_words,
                "link_density": b["link_chars"] / b["n_chars"],
                "stop_density": sum(1 for w in words if w in stops) / n_words
                if n_words
                else 0.0,
            }
        )
    core = [
        classify_block(
            f["n_chars"], f["n_words"], f["link_density"], f["stop_density"]
        )
        for f in feats
    ]
    final = _finalize_blocks(core)
    return [
        {
            "block_idx": i,
            "text": f["text"],
            "n_chars": f["n_chars"],
            "n_words": f["n_words"],
            "link_density": f["link_density"],
            "stop_density": f["stop_density"],
            "cls": c,
            "keep": 1 if fin == "good" else 0,
        }
        for i, (f, c, fin) in enumerate(zip(feats, core, final))
    ]


_BLOCK_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("block_idx", T.IntegerType()),
        T.StructField("text", T.StringType()),
        T.StructField("n_chars", T.IntegerType()),
        T.StructField("n_words", T.IntegerType()),
        T.StructField("link_density", T.DoubleType()),
        T.StructField("stop_density", T.DoubleType()),
        T.StructField("cls", T.StringType()),
        T.StructField("keep", T.IntegerType()),
    ]
)


def html_content_blocks(
    df: DataFrame,
    html_col: str,
    id_col: str = "doc_id",
    stopwords: tuple[str, ...] | None = None,
) -> DataFrame:
    """Boilerplate classification over an HTML column: one Arrow map stage
    (map-only, rides the ingest scan — zero exchange like the quality
    filters), one output row per block with features + the jusText-style
    keep decision. ``id_col`` must be integral (the block row's join key
    back to the page) and is emitted under its OWN name — a caller's
    custom id column survives into the block rows."""
    import pandas as pd

    from ..functions.text import EN_STOPWORDS

    stops = tuple(stopwords) if stopwords is not None else EN_STOPWORDS

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [f.name for f in _BLOCK_SCHEMA.fields]
        for pdf in batches:
            rows = []
            for i, body in zip(pdf[id_col].tolist(), pdf[html_col].tolist()):
                for blk in extract_content_blocks(body or "", stops):
                    rows.append({"doc_id": i, **blk})
            yield pd.DataFrame(rows, columns=cols)

    out = df.select(
        F.col(id_col).cast("long").alias(id_col), html_col
    ).mapInPandas(fn, _BLOCK_SCHEMA)
    # _BLOCK_SCHEMA names the id field 'doc_id'; hand the caller's name back
    # so downstream groupBy(id_col)/joins resolve for custom id columns
    return out.withColumnRenamed("doc_id", id_col) if id_col != "doc_id" else out


def extract_main_content(
    df: DataFrame,
    html_col: str,
    id_col: str = "doc_id",
    stopwords: tuple[str, ...] | None = None,
) -> DataFrame:
    """Page-level main-content text: kept blocks re-joined with newlines in
    block order (deterministic via sort_array over (idx, text) structs —
    no orderBy-in-agg dependence). Pages with no kept block drop out —
    the boilerplate-only pages a crawl pipeline wants gone."""
    blocks = html_content_blocks(df, html_col, id_col, stopwords)
    arr = F.sort_array(
        F.collect_list(F.struct(F.col("block_idx").alias("i"), F.col("text").alias("t")))
    )
    one_param = F.transform(arr, lambda s: s["t"])  # single-param lambda (rule 7)
    return (
        blocks.filter(F.col("keep") == 1)
        .groupBy(id_col)
        .agg(F.array_join(one_param, "\n").alias("text"))
    )


def parse_warc_bytes(
    data: bytes, extractor: str = "regex"
) -> tuple[list[dict[str, Any]], int]:
    """One forward pass over a (possibly gzipped) WARC byte string.
    Returns (records, quarantined_count). Framing is strictly
    Content-Length-driven; a record with an unparsable header block or a
    length overrunning the buffer quarantines the REMAINDER of the file
    (framing is lost beyond it — resync heuristics hide corruption).
    ``extractor``: "regex" (engine-free, oracle-literal-friendly) or
    "dom" (html_to_text_dom, the real-parser upgrade)."""
    to_text = _EXTRACTORS.get(extractor)
    if to_text is None:
        raise ValueError(
            f"unknown extractor {extractor!r}; choose from {sorted(_EXTRACTORS)}"
        )
    data = _maybe_gunzip(data)
    out: list[dict[str, Any]] = []
    bad = 0
    pos = 0
    n = len(data)
    while pos < n:
        # skip the two inter-record CRLFs (and tolerate extras)
        while data[pos : pos + 2] == b"\r\n":
            pos += 2
        if pos >= n:
            break
        head_end = data.find(b"\r\n\r\n", pos)
        if head_end < 0 or not data[pos : pos + 5] == b"WARC/":
            bad += 1
            break
        headers: dict[str, str] = {}
        for line in data[pos:head_end].split(b"\r\n")[1:]:
            k, _, v = line.partition(b":")
            headers[k.strip().decode("latin-1").lower()] = v.strip().decode(
                "latin-1"
            )
        try:
            length = int(headers["content-length"])
        except (KeyError, ValueError):
            bad += 1
            break
        body_start = head_end + 4
        if body_start + length > n:
            bad += 1
            break
        payload = data[body_start : body_start + length]
        pos = body_start + length
        rec: dict[str, Any] = {
            "record_id": headers.get("warc-record-id"),
            "warc_type": headers.get("warc-type"),
            "target_uri": headers.get("warc-target-uri"),
            "warc_date": headers.get("warc-date"),
            "content_type": headers.get("content-type"),
            "http_status": None,
            "payload_len": length,
            "text": None,
        }
        if rec["warc_type"] == "response" and payload[:5] == b"HTTP/":
            http_head_end = payload.find(b"\r\n\r\n")
            if http_head_end >= 0:
                status_line = payload[: payload.find(b"\r\n")].decode(
                    "latin-1", "replace"
                )
                parts = status_line.split()
                if len(parts) >= 2 and parts[1].isdigit():
                    rec["http_status"] = int(parts[1])
                body = payload[http_head_end + 4 :].decode("utf-8", "replace")
                rec["text"] = to_text(body)
        out.append(rec)
    return out, bad


def import_warc_files(
    spark: SparkSession, paths: list[str], extractor: str = "regex"
) -> DataFrame:
    """Distributed WARC import: binaryFile scan (one task per file — the
    Common Crawl per-segment unit of work), executor-side single-pass parse,
    one output row per record. The per-file quarantine count rides on every
    row of its file so downstream quality accounting can aggregate it
    without a second pass. ``extractor`` picks the HTML->text mode
    ("regex" | "dom") — validated up front, not per task."""
    import pandas as pd

    if extractor not in _EXTRACTORS:
        raise ValueError(
            f"unknown extractor {extractor!r}; choose from {sorted(_EXTRACTORS)}"
        )
    bin_df = spark.read.format("binaryFile").load(paths)

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [f.name for f in WARC_SCHEMA.fields]
        for pdf in batches:
            rows = []
            for path, content in zip(pdf["path"].tolist(), pdf["content"].tolist()):
                recs, bad = parse_warc_bytes(bytes(content), extractor)
                for r in recs:
                    rows.append({"source_file": path, **r, "quarantined": bad})
            yield pd.DataFrame(rows, columns=cols)

    return bin_df.select("path", "content").mapInPandas(parse, WARC_SCHEMA)


# --- URL policy filtering (the step a crawl pipeline runs right after parse) -----------
def url_host(url):
    """Registrable host of a URL Column (lowercased; port stripped) via
    Spark's built-in parse_url — JVM-side, no UDF."""
    from pyspark.sql import Column
    from pyspark.sql import functions as F

    c = url if isinstance(url, Column) else F.col(url)
    return F.lower(F.split(F.parse_url(c, F.lit("HOST")), ":")[0])


def apply_url_policy(
    df: DataFrame,
    url_col: str,
    blocked_hosts: tuple[str, ...] = (),
    blocked_suffixes: tuple[str, ...] = (),
    max_per_host: int | None = None,
    order_col: str | None = None,
) -> DataFrame:
    """RefinedWeb-style URL curation over parsed crawl rows: drop
    blocklisted hosts (exact match or domain suffix, so `example.com`
    blocks `www.example.com`), then optionally cap each host at
    ``max_per_host`` rows (rank by ``order_col`` with the URL as
    tie-break — deterministic across reruns, the same keep-policy
    discipline as the dedup family). Returns the input plus (host, kept,
    reason) so decisions are auditable/joinable rather than silently
    applied — the contract every screen in this engine follows.

    Scale: the blocklist is a literal expression (policy lists are
    thousands of entries — far below broadcast scale; past ~100k entries
    swap in a broadcast join on host). The host cap is one window keyed by
    host; WHERE rank <= cap plans a WindowGroupLimit, so the exchange
    carries at most cap rows per host per map task. Host skew (one domain
    = half the crawl) is exactly what the cap EXISTS to cut, and the
    group-limit truncates it before the shuffle."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    host = url_host(url_col)
    blocked = F.lit(False)
    if blocked_hosts:
        blocked = blocked | F.col("host").isin(*[h.lower() for h in blocked_hosts])
    for suf in blocked_suffixes:
        s = suf.lower().lstrip(".")
        blocked = blocked | (F.col("host") == s) | F.col("host").endswith("." + s)
    out = df.withColumn("host", host).withColumn(
        "reason", F.when(blocked, F.lit("blocklist"))
    )
    if max_per_host is not None:
        order = F.col(order_col) if order_col else F.col(url_col)
        w = Window.partitionBy("host").orderBy(order, F.col(url_col))
        out = out.withColumn(
            "reason",
            F.coalesce(
                F.col("reason"),
                F.when(
                    F.row_number().over(w) > max_per_host, F.lit("host_cap")
                ),
            ),
        )
    return out.withColumn("kept", F.col("reason").isNull())
