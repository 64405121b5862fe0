"""Shared persisted-DataFrame registry for operator modules.

Spark's ContextCleaner does NOT reclaim DataFrame caches on GC (the
CacheManager keeps a strong reference to the InMemoryRelation), so an
operator that persists an intermediate frame must release it
explicitly. The idiom — a module-scoped registry drained on the next
call or via the module's ``release_caches()`` — is shared by
``operators.dedup`` and ``operators.curation``; this class is the one
implementation so the semantics (and any future locking, if serving
ever calls these concurrently) stay in one place.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


class PersistRegistry:
    """Tracks frames persisted by an operator module; bounded in
    practice at one corpus-scale cached frame per module because every
    entry point drains before persisting anew."""

    def __init__(self) -> None:
        self._frames: list[DataFrame] = []

    def add(self, df: DataFrame) -> None:
        self._frames.append(df)

    def drain(self) -> None:
        """Unpersist every tracked frame. Safe while their results are
        still referenced — downstream frames lazily recompute."""
        while self._frames:
            self._frames.pop().unpersist()

    def __len__(self) -> int:
        return len(self._frames)
