"""Storage-layout survey: parquet physical structure and scan-parallelism
hazards.

A database surveyor reports b-tree/index health; the lake-engine analog is
parquet FILE LAYOUT, because Spark's scan parallelism is bounded by row
groups: a single-row-group file is decoded by exactly ONE task no matter
how many executors the cluster has (observed on this repo's own test lake —
sf0.1 lineitem is one 10.8 MB row group, so every scan stage's decode is
single-threaded; at 100 TB the same mistake in an ingest job silently
serializes the cluster). This module reads ONLY footers/metadata
(driver-side, metadata-scale — no data pages), like the reference's
database_info size collection.

Reported per table file: rows, row groups, bytes, avg row-group bytes,
columns, compression codecs, and hazard flags:

- ``single_row_group``: only one row group but non-trivial rows — scan
  cannot parallelize;
- ``oversized_row_groups``: avg row-group size above the 1 GiB planner
  guidance (memory spikes per task);
- ``tiny_file``: file under 4 MiB in a table with many files (listing +
  task-scheduling overhead dominates — the small-files problem).
"""

from __future__ import annotations

import os
from typing import Any

from ..catalog import TABLES, table_path

SINGLE_ROW_GROUP_MIN_ROWS = 100_000  # below this a single group is fine
OVERSIZED_ROW_GROUP_BYTES = 1 << 30  # 1 GiB
TINY_FILE_BYTES = 4 << 20  # 4 MiB


def _file_report(path: str) -> dict[str, Any]:
    import pyarrow.parquet as pq

    pf = pq.ParquetFile(path)
    md = pf.metadata
    total_bytes = os.path.getsize(path)
    codecs = set()
    for rg in range(md.num_row_groups):
        g = md.row_group(rg)
        for c in range(g.num_columns):
            codecs.add(g.column(c).compression)
    avg_rg = total_bytes / max(1, md.num_row_groups)
    hazards = []
    if md.num_row_groups == 1 and md.num_rows >= SINGLE_ROW_GROUP_MIN_ROWS:
        hazards.append("single_row_group")
    if avg_rg > OVERSIZED_ROW_GROUP_BYTES:
        hazards.append("oversized_row_groups")
    return {
        "path": path,
        "rows": md.num_rows,
        "row_groups": md.num_row_groups,
        "bytes": total_bytes,
        "avg_row_group_bytes": int(avg_rg),
        "columns": md.num_columns,
        "codecs": sorted(codecs),
        "hazards": hazards,
    }


def storage_report(sf_dir: str, tables: list[str] | None = None) -> list[dict]:
    """Per-table storage reports over the lake's parquet files. A table may
    be a single file or a directory of part files; directory tables also
    get the tiny-file hazard check."""
    out = []
    for name in tables or TABLES:
        root = table_path(sf_dir, name)
        if os.path.isdir(root):
            files = sorted(
                os.path.join(root, f)
                for f in os.listdir(root)
                if f.endswith(".parquet")
            )
        else:
            files = [root] if os.path.exists(root) else []
        reports = [_file_report(f) for f in files]
        rows = sum(r["rows"] for r in reports)
        total = sum(r["bytes"] for r in reports)
        groups = sum(r["row_groups"] for r in reports)
        hazards = sorted({h for r in reports for h in r["hazards"]})
        if len(reports) > 4 and any(r["bytes"] < TINY_FILE_BYTES for r in reports):
            hazards.append("tiny_files")
        out.append(
            {
                "table_name": name,
                "files": len(reports),
                "rows": rows,
                "row_groups": groups,
                "bytes": total,
                "avg_row_group_bytes": int(total / max(1, groups)),
                "codecs": sorted({c for r in reports for c in r["codecs"]}),
                "hazards": hazards,
                "max_scan_tasks": groups,  # the hard parallelism ceiling
            }
        )
    return out


def storage_to_markdown(reports: list[dict]) -> str:
    lines = [
        "# Storage layout",
        "",
        "| table | files | rows | row groups | bytes | codecs | hazards |",
        "|---|---|---|---|---|---|---|",
    ]
    for r in reports:
        lines.append(
            f"| {r['table_name']} | {r['files']} | {r['rows']} | "
            f"{r['row_groups']} | {r['bytes']} | {','.join(r['codecs'])} | "
            f"{','.join(r['hazards']) or '—'} |"
        )
    return "\n".join(lines) + "\n"
