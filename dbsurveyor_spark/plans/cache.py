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


def clear_index_memos() -> None:
    """Evict the session-pinned INDEX-STATE memos (k-NN graph, audio
    aligned pairs, co-purchase graph, trained quantizer codebooks).

    These deliberately live OUTSIDE the tracked registry so per-query
    `release_caches()` hygiene can't evict what every retrieval query
    shares; the cost is that a long session keeps |V|·K-row frames in
    executor storage even when no ANN/graph query will run again. This
    hook is the documented reclamation path — the bench harness calls it
    between unrelated suites, and any long-lived service can call it on
    idle. Safe to call at any time: the next consumer simply rebuilds
    (or re-warms from the persisted index artifacts, see plans/index_store).
    """
    from ..multimodal import audio as _audio
    from ..operators import graph as _graph
    from ..operators import similarity as _sim

    for lock, cache in (
        (_sim._KNN_LOCK, _sim._KNN_CACHE),
        (_audio._PAIR_LOCK, _audio._PAIR_CACHE),
    ):
        with lock:
            while cache:
                _, df = cache.popitem()
                try:
                    df.unpersist()
                except Exception:  # pragma: no cover - session already gone
                    pass
    with _graph._GRAPH_LOCK:
        while _graph._GRAPH_CACHE:
            _, dfs = _graph._GRAPH_CACHE.popitem()
            for df in dfs:
                try:
                    df.unpersist()
                except Exception:  # pragma: no cover - session already gone
                    pass
    # Driver-side model memos (plain Python lists — no executor storage,
    # but clearing keeps the "fresh session" semantics exact).
    with _sim._CENTROID_LOCK:
        _sim._CENTROID_CACHE.clear()
        _sim._PQ_CACHE.clear()
        _sim._RESID_PQ_CACHE.clear()
        _sim._SQ_RESID_CACHE.clear()
    from ..operators import textstats as _ts
    from ..survey import sampling as _samp

    with _ts._BM25_STATS_LOCK:
        _ts._BM25_STATS_CACHE.clear()
    with _ts._QCLS_LOCK:
        _ts._QCLS_CACHE.clear()
    with _samp._DSIR_LOCK:
        _samp._DSIR_CACHE.clear()
