"""Cache lifetime management for operators that persist intermediates.

The near-dup operators persist frames that are read several times within
one returned plan (shingle sets, band/block tables). Because the returned
DataFrame is lazy, the operator itself can never know when it is safe to
unpersist — only the caller does, after materializing the result. Without
a handle, every invocation leaks cached blocks for the session's lifetime
and a long-lived service accumulates executor storage pressure until LRU
eviction starts thrashing.

``CacheScope`` is that handle::

    with CacheScope() as scope:
        pairs = minhash_near_duplicates(docs, cache_scope=scope)
        pairs.write.parquet(out)          # materialize INSIDE the scope
    # all intermediate caches are unpersisted here

Operators that accept ``cache_scope=None`` keep the fire-and-forget
behavior (caches linger until evicted) — acceptable for one-shot jobs,
not for services.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


class CacheScope:
    """Collects persisted DataFrames; ``release()`` unpersists them all.

    Context-manager use unpersists on exit. ``release`` is idempotent and
    non-blocking (``unpersist(blocking=False)``): the blocks are dropped
    asynchronously, which is safe because nothing references them after
    the scope ends.
    """

    def __init__(self) -> None:
        self._frames: list[DataFrame] = []

    def persist(self, df: DataFrame) -> DataFrame:
        """Persist ``df`` and track it for release."""
        self._frames.append(df)
        return df.persist()

    def release(self) -> None:
        for f in self._frames:
            f.unpersist(blocking=False)
        self._frames.clear()

    def __enter__(self) -> "CacheScope":
        return self

    def __exit__(self, *exc) -> bool:
        self.release()
        return False


def persist_in(df: DataFrame, scope: CacheScope | None) -> DataFrame:
    """Persist ``df``, tracked in ``scope`` when one is given."""
    return scope.persist(df) if scope is not None else df.persist()
