"""Schema drift: structural diff between two schema documents.

The reference toolchain surveys a database into a portable document
(`dbsurveyor/src/output.rs` analyze/validate verbs operate on one document);
operationally the next question is always "what changed since the last
survey?". This module diffs two `collect_database_schema` documents (same
shape the reference serializes) into a typed change report — driver-side
only: documents are metadata-scale, so no Spark job is involved.

Change kinds reported:
- tables added / removed
- columns added / removed / retyped / nullability-changed (per table)
- primary-key changes
- foreign-key edges added / removed
- row-count drift beyond a relative threshold (for documents collected with
  row counts)
"""

from __future__ import annotations

from typing import Any

ROWCOUNT_DRIFT_MIN_REL = 0.1  # report row drift beyond ±10%


def _table_key(t: dict[str, Any]) -> str:
    """Schema-qualified table label: in a multi-schema JDBC document
    (public.users vs app.users) a name-only key would silently overwrite
    one table with the other and mis-report every change list. Lake
    documents carry no schema → bare name, keeping their labels stable."""
    schema = t.get("schema")
    return f"{schema}.{t['name']}" if schema else t["name"]


def _tables(doc: dict[str, Any]) -> dict[str, dict[str, Any]]:
    return {_table_key(t): t for t in doc.get("tables", [])}


def _columns(table: dict[str, Any]) -> dict[str, dict[str, Any]]:
    return {c["name"]: c for c in table.get("columns", [])}


def _fk_edges(table: dict[str, Any]) -> set[tuple]:
    return {
        (
            tuple(fk.get("columns", [])),
            fk.get("referenced_table"),
            tuple(fk.get("referenced_columns", [])),
        )
        for fk in table.get("foreign_keys", []) or []
    }


def diff_schema_documents(
    old: dict[str, Any],
    new: dict[str, Any],
    rowcount_drift_min_rel: float = ROWCOUNT_DRIFT_MIN_REL,
) -> dict[str, Any]:
    """Structural diff old → new. Returns a report dict; `has_changes` is
    False iff every change list is empty (row-count drift included)."""
    ot, nt = _tables(old), _tables(new)
    report: dict[str, Any] = {
        "old_database": old.get("database_info", {}).get("name"),
        "new_database": new.get("database_info", {}).get("name"),
        "tables_added": sorted(set(nt) - set(ot)),
        "tables_removed": sorted(set(ot) - set(nt)),
        "table_changes": [],
        "row_drift": [],
    }
    for name in sorted(set(ot) & set(nt)):
        o, n = ot[name], nt[name]
        oc, nc = _columns(o), _columns(n)
        entry: dict[str, Any] = {
            "table": name,
            "columns_added": sorted(set(nc) - set(oc)),
            "columns_removed": sorted(set(oc) - set(nc)),
            "columns_retyped": [],
            "nullability_changed": [],
            "pk_changed": None,
            "fks_added": [],
            "fks_removed": [],
        }
        for cname in sorted(set(oc) & set(nc)):
            co, cn = oc[cname], nc[cname]
            if co.get("data_type") != cn.get("data_type"):
                entry["columns_retyped"].append(
                    {
                        "column": cname,
                        "old_type": co.get("data_type"),
                        "new_type": cn.get("data_type"),
                    }
                )
            if co.get("is_nullable") != cn.get("is_nullable"):
                entry["nullability_changed"].append(
                    {
                        "column": cname,
                        "old_nullable": co.get("is_nullable"),
                        "new_nullable": cn.get("is_nullable"),
                    }
                )
        opk = (o.get("primary_key") or {}).get("columns") or []
        npk = (n.get("primary_key") or {}).get("columns") or []
        if list(opk) != list(npk):
            entry["pk_changed"] = {"old": list(opk), "new": list(npk)}
        ofk, nfk = _fk_edges(o), _fk_edges(n)
        entry["fks_added"] = [
            {"columns": list(c), "referenced_table": rt, "referenced_columns": list(rc)}
            for c, rt, rc in sorted(nfk - ofk)
        ]
        entry["fks_removed"] = [
            {"columns": list(c), "referenced_table": rt, "referenced_columns": list(rc)}
            for c, rt, rc in sorted(ofk - nfk)
        ]
        if any(
            entry[k]
            for k in (
                "columns_added",
                "columns_removed",
                "columns_retyped",
                "nullability_changed",
                "pk_changed",
                "fks_added",
                "fks_removed",
            )
        ):
            report["table_changes"].append(entry)
        orc, nrc = o.get("row_count"), n.get("row_count")
        if orc is not None and nrc is not None and orc != nrc:
            rel = abs(nrc - orc) / orc if orc else float("inf")
            if rel >= rowcount_drift_min_rel:
                report["row_drift"].append(
                    {
                        "table": name,
                        "old_rows": orc,
                        "new_rows": nrc,
                        "rel_change": round((nrc - orc) / orc, 6)
                        if orc
                        else None,
                    }
                )
    report["quality_drift"] = diff_quality_metrics(
        old.get("quality_metrics"), new.get("quality_metrics")
    )
    report["has_changes"] = bool(
        report["tables_added"]
        or report["tables_removed"]
        or report["table_changes"]
        or report["row_drift"]
        or report["quality_drift"]
    )
    return report


QUALITY_DRIFT_MIN_ABS = 0.01  # report component-score moves beyond ±0.01
_QUALITY_COMPONENTS = ("completeness", "consistency", "uniqueness")


def diff_quality_metrics(
    old: list[dict[str, Any]] | None,
    new: list[dict[str, Any]] | None,
    min_abs: float = QUALITY_DRIFT_MIN_ABS,
) -> list[dict[str, Any]]:
    """Quality regression/improvement per table between two documents
    collected with --enable-quality (TableQualityMetrics lists). Reports
    overall and per-component score deltas beyond ``min_abs``, plus
    threshold violations that appeared or cleared. Empty when either side
    lacks metrics (schema-only documents diff cleanly)."""
    if not old or not new:
        return []
    om = {m["table_name"]: m for m in old}
    nm = {m["table_name"]: m for m in new}
    out = []
    for t in sorted(set(om) & set(nm)):
        o, n = om[t], nm[t]
        entry: dict[str, Any] = {"table": t}
        changed = False
        delta = round(
            (n.get("quality_score") or 0) - (o.get("quality_score") or 0), 6
        )
        if abs(delta) >= min_abs:
            entry["quality_score_delta"] = delta
            changed = True
        for comp in _QUALITY_COMPONENTS:
            od = (o.get(comp) or {}).get("score")
            nd = (n.get(comp) or {}).get("score")
            if od is not None and nd is not None and abs(nd - od) >= min_abs:
                entry[f"{comp}_delta"] = round(nd - od, 6)
                changed = True
        # violations identified by metric name (ThresholdViolation shape,
        # quality/models.rs:22 — metric/threshold/actual/severity)
        ov = {v.get("metric") or str(v) for v in o.get("threshold_violations") or []}
        nv = {v.get("metric") or str(v) for v in n.get("threshold_violations") or []}
        if nv - ov:
            entry["violations_appeared"] = sorted(nv - ov)
            changed = True
        if ov - nv:
            entry["violations_cleared"] = sorted(ov - nv)
            changed = True
        if changed:
            out.append(entry)
    return out


def drift_to_markdown(report: dict[str, Any]) -> str:
    """Human-readable drift report (same audience as to_markdown docs)."""
    lines = [
        f"# Schema drift: {report.get('old_database')} → "
        f"{report.get('new_database')}",
        "",
    ]
    if not report.get("has_changes"):
        lines.append("No structural changes detected.")
        return "\n".join(lines) + "\n"
    if report["tables_added"]:
        lines.append(f"**Tables added:** {', '.join(report['tables_added'])}")
    if report["tables_removed"]:
        lines.append(f"**Tables removed:** {', '.join(report['tables_removed'])}")
    for tc in report["table_changes"]:
        lines += ["", f"## {tc['table']}"]
        if tc["columns_added"]:
            lines.append(f"- columns added: {', '.join(tc['columns_added'])}")
        if tc["columns_removed"]:
            lines.append(f"- columns removed: {', '.join(tc['columns_removed'])}")
        for rc in tc["columns_retyped"]:
            lines.append(
                f"- `{rc['column']}` retyped {rc['old_type']} → {rc['new_type']}"
            )
        for nc in tc["nullability_changed"]:
            lines.append(
                f"- `{nc['column']}` nullable {nc['old_nullable']} → "
                f"{nc['new_nullable']}"
            )
        if tc["pk_changed"]:
            lines.append(
                f"- primary key {tc['pk_changed']['old']} → "
                f"{tc['pk_changed']['new']}"
            )
        for fk in tc["fks_added"]:
            lines.append(
                f"- FK added: {fk['columns']} → {fk['referenced_table']}"
                f"{fk['referenced_columns']}"
            )
        for fk in tc["fks_removed"]:
            lines.append(
                f"- FK removed: {fk['columns']} → {fk['referenced_table']}"
                f"{fk['referenced_columns']}"
            )
    if report.get("quality_drift"):
        lines += ["", "## Quality drift"]
        for qd in report["quality_drift"]:
            parts = []
            for k, v in qd.items():
                if k == "table":
                    continue
                if k.endswith("_delta"):
                    parts.append(f"{k[:-6]} {v:+.4f}")
                else:
                    parts.append(f"{k.replace('_', ' ')}: {', '.join(v)}")
            lines.append(f"- {qd['table']}: " + "; ".join(parts))
    if report["row_drift"]:
        lines += ["", "## Row-count drift"]
        for rd in report["row_drift"]:
            lines.append(
                f"- {rd['table']}: {rd['old_rows']} → {rd['new_rows']} rows "
                f"({rd['rel_change']:+.1%})"
                if rd["rel_change"] is not None
                else f"- {rd['table']}: {rd['old_rows']} → {rd['new_rows']} rows"
            )
    return "\n".join(lines) + "\n"
