"""Text-analysis column expressions for the LLM-data-pipeline operator set
(BASELINE north star: dedup / quality / language-ID / token counting over the
`documents` table). All built-in-function compositions — no Python UDFs in
the hot path; shingling and hashing stay JVM-side.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# tiny function-word list used by the ratio heuristics (public knowledge)
EN_STOPWORDS = ("the", "a", "of", "and", "to", "in", "is", "it")


def tokens(text: Column | str, sep: str = " ") -> Column:
    """Whitespace tokenization (documents are single-space separated)."""
    c = F.col(text) if isinstance(text, str) else text
    return F.split(c, sep)


def shingles(toks: Column, n: int = 3) -> Column:
    """Word n-gram shingles as strings; empty array when the doc is shorter
    than n tokens. Stays JVM-side via higher-order functions.

    Formulated as arrays_zip of the n shifted slices, NOT as a transform
    over an index sequence whose lambda slices ``toks``: a lambda body that
    references an outer EXPRESSION re-evaluates it once per element in
    Spark's interpreted HOF path (the winnowing operator measured ~50x on
    exactly this shape), which for a tokenizer would mean re-splitting the
    document once per window — O(tokens²) on long documents. Each slice
    here is evaluated exactly once and the lambda touches only its own
    struct argument."""
    m = F.size(toks) - (n - 1)
    zipped = F.arrays_zip(*[F.slice(toks, k + 1, m) for k in range(n)])
    return F.when(
        F.size(toks) >= n,
        F.transform(zipped, lambda s: F.concat_ws(" ", *[s[str(k)] for k in range(n)])),
    ).otherwise(F.array().cast("array<string>"))


def distinct_shingles(text: Column | str, n: int = 3) -> Column:
    return F.array_distinct(shingles(tokens(text), n))


def hashed_grams(gram_arr: Column) -> Column:
    """POSITIONAL 48-bit integer hashes of a gram array — order- and
    multiplicity-preserving (no distinct), for operators that window over
    the hash SEQUENCE (winnowing)."""
    return F.transform(
        gram_arr,
        lambda s: F.conv(F.substring(F.md5(s), 1, 12), 16, 10).cast("long"),
    )


def hashed_shingles(shingle_arr: Column) -> Column:
    """Shingle set as 48-bit integer hashes (md5 prefix) — pairwise
    intersection on longs is several times cheaper than on strings, which is
    the inner loop of every pairwise-verify dedup join. Collision odds at 48
    bits are negligible for per-doc set sizes, and both engines derive the
    same values so differential parity is exact."""
    return F.array_distinct(hashed_grams(shingle_arr))


def stopword_ratio(toks: Column, stopwords: tuple[str, ...] = EN_STOPWORDS) -> Column:
    """Fraction of tokens that are function words — the quality/language
    heuristic (exact integer ratio, engine-portable)."""
    hits = F.size(F.filter(toks, lambda t: t.isin(*stopwords)))
    return hits.cast("double") / F.size(toks)


def type_token_ratio(toks: Column) -> Column:
    """Lexical diversity: distinct tokens / total tokens."""
    return F.size(F.array_distinct(toks)).cast("double") / F.size(toks)


def mean_token_len(toks: Column) -> Column:
    total = F.aggregate(toks, F.lit(0), lambda acc, t: acc + F.length(t))
    return total.cast("double") / F.size(toks)


def fingerprint(text: Column | str) -> Column:
    """Document fingerprint: md5 of the sorted distinct token set — the
    canonical-form fingerprint used for near-canonical dedup."""
    toks = tokens(text)
    return F.md5(F.concat_ws(" ", F.sort_array(F.array_distinct(toks))))


def minhash_signature(shingle_arr: Column, k: int = 8) -> list[Column]:
    """MinHash signature as k min-of-hash-hex strings over the shingle set.

    The k hashes are 8-hex (32-bit) slices of ceil(k/4) seeded md5 digests —
    2 md5 calls per shingle instead of k, which quarters both the hash work
    and the generated codegen (first-run JIT was the dominant cost).
    String-min is engine-portable and order-free."""
    # NB: higher-order-function lambdas MUST be single-parameter here — a
    # two-parameter lambda makes PySpark pass the ARRAY INDEX as the second
    # argument, silently clobbering a default-bound loop variable.
    def digest(j: int):
        seed = f"seed{j}|"
        return F.transform(shingle_arr, lambda s: F.md5(F.concat(F.lit(seed), s)))

    seeds = (k + 3) // 4
    digests = [digest(j) for j in range(seeds)]

    def minhash(i: int):
        pos = (i % 4) * 8 + 1
        return F.array_min(F.transform(digests[i // 4], lambda h: F.substring(h, pos, 8)))

    return [minhash(i) for i in range(k)]


def jaccard(a: Column, b: Column) -> Column:
    """Exact Jaccard similarity of two string-array SET columns (arrays must
    be distinct). |A∪B| is derived as |A|+|B|-|A∩B| so only ONE hash-set
    build runs per pair — array_union would build a second one, doubling the
    inner-loop cost of every pairwise dedup join."""
    inter = F.size(F.array_intersect(a, b))
    return inter.cast("double") / (F.size(a) + F.size(b) - inter)
