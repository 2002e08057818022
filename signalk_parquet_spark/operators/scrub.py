"""Pattern-based content scrubbing (PII redaction and policy filtering) —
the safety-filtering stage of an LLM training-data pipeline (the C4 /
Dolma-style "remove emails, phone numbers, IPs before training" pass),
re-expressed as pure JVM-side Column transforms.

No reference analogue (the reference engine has no text surface); this is a
BASELINE-mandated large-scale-training-pipeline extension, same charter as
functions/text.py.

Engine-portability discipline: every pattern below stays inside the regex
subset where Java's engine (Spark) and RE2 (DuckDB) produce identical
matches — explicit character classes, greedy quantifiers, alternation, no
lookaround (RE2 has none), no backreferences, no word-boundary ``\\b``
(Java and RE2 agree on it, but the explicit classes make the contract
auditable). Both engines use leftmost, non-overlapping global replacement,
so sequential ``regexp_replace`` chains are deterministic and identical.

Scale: map-only — scrubbing N documents is one projection with zero
shuffle; counts ride the same stage. At 100 TB this is the cheapest kind
of operator there is, and it composes with partition pruning and column
pruning like any other narrow transform (the scan reads only the text
column plus whatever the caller keeps).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: PII patterns in the Java∩RE2-portable subset. Kept deliberately
#: conservative (high precision): each one anchors on structure that does
#: not occur in natural prose, the standard trade for a no-human-review
#: scrub pass.
PII_PATTERNS: dict[str, str] = {
    # local@domain.tld — explicit classes, no lookaround
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    # dotted quad; over-matches invalid octets (999.…) on purpose — scrub
    # passes prefer false positives over leaked addresses
    "ipv4": r"[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}",
    # NANP-ish phone: optional +1, separators -, ., space
    "phone": r"\+?1?[-. ]?\(?[0-9]{3}\)?[-. ][0-9]{3}[-. ][0-9]{4}",
    # US SSN shape
    "ssn": r"[0-9]{3}-[0-9]{2}-[0-9]{4}",
}

#: Default replacement token. Pattern-specific tokens (e.g. ``<EMAIL>``)
#: preserve more structure for the model; a single token is the simplest
#: deterministic contract.
SCRUB_TOKEN = "<SCRUBBED>"

#: Policy-lexicon pattern used by the pii_scrub GATE so it redacts real text
#: on the synthetic word corpus (the PII patterns above correctly find
#: nothing there): greedy prefix-through-'er' of a lowercase word — fires on
#: customer/filter/order and the mid-word 'mer' of merge, exercising the
#: exact greedy-backtracking semantics both engines must share.
_POLICY_GATE_PATTERNS: dict[str, str] = {"er_words": "[a-z]+er"}


def pattern_hits(text: Column | str, pattern: str) -> Column:
    """Number of non-overlapping matches of ``pattern`` in ``text`` —
    ``size(regexp_extract_all(...))``, exact-integer and identical to
    DuckDB's ``len(regexp_extract_all(...))``."""
    c = F.col(text) if isinstance(text, str) else text
    return F.size(F.regexp_extract_all(c, F.lit(pattern), F.lit(0)))


def scrub_text(
    text: Column | str,
    patterns: dict[str, str] | None = None,
    token: str = SCRUB_TOKEN,
) -> Column:
    """Replace every match of every pattern with ``token``, applying the
    patterns in dict order (sequential ``regexp_replace`` chain — order
    matters when patterns overlap, so it is part of the contract)."""
    c = F.col(text) if isinstance(text, str) else text
    pats = PII_PATTERNS if patterns is None else patterns
    for pat in pats.values():
        c = F.regexp_replace(c, F.lit(pat), F.lit(token))
    return c


def scrub_report(
    df: DataFrame,
    text_col: str = "text",
    patterns: dict[str, str] | None = None,
    token: str = SCRUB_TOKEN,
) -> DataFrame:
    """Per-document scrub: adds ``scrubbed`` (the redacted text),
    ``hits_<name>`` per pattern, and ``chars_removed`` (original length
    minus the length after replacing matches with the EMPTY string — an
    exact integer independent of the token's own length).

    One map-only projection; callers aggregate or filter downstream
    (e.g. drop documents where hits exceed a density threshold — heavy-PII
    documents are usually scrapes worth dropping whole).

    Cost note: ``chars_removed`` (empty-token chain) and ``scrubbed``
    (token chain) are two regex-replace passes by semantics (overlap
    behavior makes one underivable from the other), but Catalyst prunes
    whichever a downstream plan doesn't reference — the pii_scrub gate's
    physical plan carries only the empty-token chain.
    """
    pats = PII_PATTERNS if patterns is None else patterns
    out = df
    for name, pat in pats.items():
        out = out.withColumn(f"hits_{name}", pattern_hits(text_col, pat))
    return out.withColumn(
        "chars_removed",
        F.length(text_col) - F.length(scrub_text(text_col, pats, token="")),
    ).withColumn("scrubbed", scrub_text(text_col, pats, token=token))
