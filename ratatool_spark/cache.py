"""Shared registry for operator-internal cached intermediates.

Operators that must materialize a shared subplan (minhash signatures,
shingle sets, the shuffle-rank partition tags, …) persist it here so
long-lived sessions have ONE release point: DataFrame cache entries are
held by the session's CacheManager and are NOT freed by driver GC, so a
service calling these operators in a loop should call
:func:`unpersist_intermediates` after materializing each result."""

from __future__ import annotations

from pyspark.sql import DataFrame

_CACHED: list[DataFrame] = []


def persist_tracked(df: DataFrame) -> DataFrame:
    """persist(MEMORY_AND_DISK) + register for unpersist_intermediates()."""
    from pyspark import StorageLevel

    df = df.persist(StorageLevel.MEMORY_AND_DISK)
    _CACHED.append(df)
    return df


def unpersist_intermediates() -> int:
    """Unpersist every tracked intermediate since the last call. Returns
    how many relations were released."""
    return release_since(0)


def registry_mark() -> int:
    """Snapshot the registry position; pass to :func:`release_since` to
    release the intermediates registered after this point. This protects
    caches registered BEFORE the mark; entries a concurrent operator
    registers after the mark are released too (the registry is a stack,
    not per-owner — an early unpersist only forces that operator to
    recompute, never changes results). Callers needing true ownership
    scoping should persist/unpersist their frames directly."""
    return len(_CACHED)


def release_since(mark: int) -> int:
    """Unpersist intermediates registered after ``mark`` (a
    :func:`registry_mark` snapshot). Returns how many were released."""
    n = 0
    while len(_CACHED) > mark:
        try:
            _CACHED.pop().unpersist(blocking=False)
            n += 1
        except Exception:  # session already stopped — nothing to release
            pass
    return n
