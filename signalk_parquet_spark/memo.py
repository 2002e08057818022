"""Session-scoped DataFrame memos.

Several gate-query families share one expensive intermediate (the shingled
corpus, CC labels, the multitable ANN top-k): computing it once per
(session, SF) and reusing the persisted frame is the difference between
N pipelines and one. Keys use ``sparkContext.applicationId`` — stable and
unique per session — NOT ``id(spark)``: CPython reuses addresses after a
stopped session is garbage-collected, which could hand a new session a
frame bound to a dead one. Entries from other (dead) applications are
evicted on every store, so cached frames don't pin executor memory past
their session's life.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame, SparkSession


class SessionMemo:
    """Memo of DataFrames keyed by (applicationId, tag)."""

    def __init__(self) -> None:
        self._store: dict[tuple[str, str], DataFrame] = {}

    def get_or_build(
        self,
        spark: SparkSession,
        tag: str,
        build: Callable[[], DataFrame],
        materialize: bool = True,
    ) -> DataFrame:
        app = spark.sparkContext.applicationId
        key = (app, tag)
        if key not in self._store:
            # entries of dead sessions can't be unpersisted (their context
            # is gone); dropping them frees the driver-side references
            for stale in [k for k in self._store if k[0] != app]:
                del self._store[stale]
            df = build()
            if materialize:
                df = df.persist()
                df.count()  # fully materialize BEFORE any self-join reuse
            self._store[key] = df
        return self._store[key]

    def evict(self, spark: SparkSession, tag: str) -> None:
        """Unpersist and drop one live entry (ramp/tool loops that cycle
        many one-shot corpora through a family memo call this between
        iterations so cached frames don't accumulate)."""
        key = (spark.sparkContext.applicationId, tag)
        df = self._store.pop(key, None)
        if df is not None:
            df.unpersist()
