"""Central query registry: merges every operator module's QUERIES/ORACLES.

``__spark_entry__.py`` (the driver contract) is a thin shim over this module.
Each entry key appears in SURVEY.md §2's coverage checklist.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from .catalog import harden_session
from .multimodal import audio as multimodal_audio
from .multimodal import codec as multimodal_codec
from .operators import (
    asof,
    dbsource,
    dedup,
    funnel,
    graph,
    layout,
    pipeline,
    relational,
    similarity,
    sketches,
    textstats,
    tpch_extra,
)
from .streaming import events as streaming_events
from .survey import infostats, jsonschema, profile, quality, sampling

_MODULES = [
    relational,
    tpch_extra,
    profile,
    infostats,
    jsonschema,
    sampling,
    quality,
    textstats,
    dedup,
    graph,
    layout,
    pipeline,
    similarity,
    sketches,
    asof,
    funnel,
    dbsource,
    streaming_events,
    multimodal_codec,
    multimodal_audio,
]


def _hardened(
    fn: Callable[[SparkSession, str], DataFrame],
) -> Callable[[SparkSession, str], DataFrame]:
    """Assert runtime session configs before running — the driver hands us an
    externally-built SparkSession with none of session.py's settings."""

    def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
        harden_session(spark)
        return fn(spark, sf_dir)

    wrapped.__name__ = getattr(fn, "__name__", "query")
    wrapped.__doc__ = fn.__doc__
    wrapped.__wrapped__ = fn
    return wrapped


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for mod in _MODULES:
        for key, fn in mod.QUERIES.items():
            if key in out:
                raise ValueError(f"duplicate query key {key!r}")
            out[key] = _hardened(fn)
    return out


def oracle_sql() -> dict[str, str]:
    out: dict[str, str] = {}
    for mod in _MODULES:
        out.update(getattr(mod, "ORACLES", {}))
    return out
