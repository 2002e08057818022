"""Dry-run the DRIVER's result canonicalization over the 50-query window.

r4's only red row (doc_embed_hashed) was not a logic bug: the driver
canonicalizes results with a pandas column sort + factorize hash, which
throws on unhashable cells (lists) — a failure class the local comparator
masked by tuple-izing lists first. This tool replays the driver-shaped
canonicalization (sort columns by name, lexsort rows by every column,
hash_pandas_object) against each window query's collected result, so an
unsortable/unhashable output shape is caught locally BEFORE it burns a
driver row.

Usage: python tools/canon_check.py [sf_dir]   (default /root/testdata/sf0.01)
Exits non-zero listing any window query whose result the driver-shaped
canonicalizer cannot process.
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
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark("canon-check")
    qs = registry.queries()
    window = list(qs)[:50]
    bad: list[tuple[str, str]] = []
    for name in window:
        try:
            canon(qs[name](spark, sf_dir).toPandas())
        except Exception as e:  # the whole point: find what the driver can't canon
            bad.append((name, f"{type(e).__name__}: {e}"))
    print(f"canon-checked {len(window)} window queries at {sf_dir}")
    for name, err in bad:
        print(f"CANON-FAIL {name}: {err.splitlines()[0]}")
    if not bad:
        print("all window results canonicalize cleanly")
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
