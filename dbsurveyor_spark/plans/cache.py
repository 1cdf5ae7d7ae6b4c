"""Session-scoped tracked caches shared by the operator modules.

A registry query that caches an intermediate (dedup's candidate frames,
ANN's cell assignment) registers it here; the NEXT query that calls
`release_caches()` on entry frees the predecessor's blocks. Running the
whole registry in one session therefore holds at most one query's cached
frames in executor storage — the memory-hygiene contract the driver's
full registry sweep relies on.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_TRACKED: list[DataFrame] = []


def release_caches() -> None:
    """Unpersist every cache still tracked (call on query entry)."""
    while _TRACKED:
        _TRACKED.pop().unpersist()


def tracked_cache(df: DataFrame) -> DataFrame:
    """Cache `df` and track it for the next `release_caches()`."""
    df = df.cache()
    _TRACKED.append(df)
    return df
