"""Dry-run the DRIVER's result canonicalization over the 50-query window.

r4's only red row (doc_embed_hashed) was not a logic bug: the driver
canonicalizes results with a pandas column sort + factorize hash, which
throws on unhashable cells (lists) — a failure class the local comparator
masked by tuple-izing lists first. This tool replays the driver-shaped
canonicalization (sort columns by name, lexsort rows by every column,
hash_pandas_object) against each window query's collected result, so an
unsortable/unhashable output shape is caught locally BEFORE it burns a
driver row.

Usage: python tools/canon_check.py [sf_dir] [--all]
(default sf_dir /root/testdata/sf0.01; --all checks EVERY registered
query, not just the current window — run it after adding gates so future
window rotations are pre-validated). Exits non-zero listing any checked
query whose result the driver-shaped canonicalizer cannot process.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pandas as pd  # noqa: E402

from signalk_parquet_spark import registry  # noqa: E402
from signalk_parquet_spark.session import get_spark  # noqa: E402


def canon(pdf: pd.DataFrame) -> int:
    cols = sorted(pdf.columns)
    pdf = pdf[cols]
    if len(pdf):
        pdf = pdf.sort_values(cols).reset_index(drop=True)
    return int(pd.util.hash_pandas_object(pdf, index=False).sum())


def main() -> int:
    args = [a for a in sys.argv[1:] if a != "--all"]
    check_all = "--all" in sys.argv[1:]
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    spark = get_spark("canon-check")
    qs = registry.queries()
    window = list(qs) if check_all else list(qs)[:50]
    bad: list[tuple[str, str]] = []
    for name in window:
        try:
            canon(qs[name](spark, sf_dir).toPandas())
        except Exception as e:  # the whole point: find what the driver can't canon
            bad.append((name, f"{type(e).__name__}: {e}"))
    scope = "registered" if check_all else "window"
    print(f"canon-checked {len(window)} {scope} queries at {sf_dir}")
    for name, err in bad:
        print(f"CANON-FAIL {name}: {err.splitlines()[0]}")
    if not bad:
        print(f"all {scope} results canonicalize cleanly")
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
