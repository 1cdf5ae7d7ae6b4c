"""Per-table ordering-strategy detection for relational collectors.

Reference: `dbsurveyor-core/src/models.rs:362` ``OrderingStrategy``
(AutoIncrement / PrimaryKey / Timestamp / SystemRowId / Unordered) and
`adapters/postgres/sampling.rs`'s detection — the sampler records the best
monotone ordering it can page MostRecent samples on. Precedence mirrors
what a sampler would prefer: a serial/identity/auto-increment column is
the strongest insertion-order proxy, then an explicit primary key, then a
well-known timestamp column (shared name list with the document-lake
analog, `documents.detect_ordering_strategy` / `sampling.rs:22
TIMESTAMP_FIELD_NAMES`), then — SQLite rowid tables only — the implicit
system rowid, else Unordered.
"""

from __future__ import annotations

from typing import Any

from .documents import TIMESTAMP_FIELD_NAMES


def _is_temporal(col: dict[str, Any]) -> bool:
    ut = col.get("unified_type")
    if isinstance(ut, dict) and ("DateTime" in ut or "Time" in ut):
        return True
    if ut == "Date":
        return True
    dt = str(col.get("data_type") or "").upper()
    return any(k in dt for k in ("TIMESTAMP", "DATETIME", "DATE"))


def relational_ordering_strategy(
    columns: list[dict[str, Any]],
    pk_cols: list[str],
    has_rowid: bool = False,
) -> dict[str, Any] | str:
    """Detect the table's OrderingStrategy from collected column metadata.

    ``columns`` are document-shaped column dicts (name / data_type /
    unified_type / is_auto_increment); ``has_rowid`` is the SQLite
    rowid-table flag (always False for server engines, whose system row
    ids are not stable orderings).
    """
    for c in columns:
        if c.get("is_auto_increment"):
            return {"AutoIncrement": {"column": c["name"]}}
    if pk_cols:
        return {"PrimaryKey": {"columns": list(pk_cols)}}
    temporal = [c for c in columns if _is_temporal(c)]
    names = {c["name"] for c in temporal}
    for name in TIMESTAMP_FIELD_NAMES:
        if name in names:
            return {"Timestamp": {"column": name, "direction": "Descending"}}
    if temporal:
        first = min(temporal, key=lambda c: c.get("ordinal_position") or 0)
        return {
            "Timestamp": {"column": first["name"], "direction": "Descending"}
        }
    if has_rowid:
        return {"SystemRowId": {"column": "rowid"}}
    return "Unordered"
