"""Full-coverage correctness artifact (round-8 verdict item #3).

The round driver's CORRECTNESS_r{N}.json samples a fixed 50 relational
queries, so operators added after round 4 had no machine-readable
correctness evidence on the record — only SURVEY prose and judge drives.
This script IS the builder's closing drive, emitted as an artifact: every
`queries()` entry runs against its `oracle_sql()` in DuckDB at the given
SF, and the per-query verdict (rows / schema / values, row counts, error,
wall seconds) lands in one committed JSON the next judge can diff.

Usage:
    python scripts/correctness_full.py <sf_dir> <out_json>

Verdict semantics mirror the driver exactly (tests/conftest.py
`assert_frames_match`): sorted column names must match; row counts must
match; values compare exactly after sorting rows by all columns and
normalizing timezones. A query with no oracle entry records
oracle="rows_only" and its row count (the documented weaker check).
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))
os.environ.setdefault("SPARK_GRAFT_CPUS", "8")

import duckdb  # noqa: E402
import pandas as pd  # noqa: E402


def _verdict(spark_df, duck_df: pd.DataFrame) -> dict:
    from conftest import _normalize

    sp = _normalize(spark_df.toPandas())
    du = _normalize(duck_df)
    out = {
        "spark_rows": int(len(sp)),
        "oracle_rows": int(len(du)),
        "schema_match": list(sp.columns) == list(du.columns),
        "rows_match": len(sp) == len(du),
        "value_match": False,
    }
    if not (out["schema_match"] and out["rows_match"]):
        return out
    for col in sp.columns:
        for x, y in zip(sp[col].tolist(), du[col].tolist()):
            xn = x is None or (
                not isinstance(x, (list, tuple)) and pd.isna(x)
            )
            yn = y is None or (
                not isinstance(y, (list, tuple)) and pd.isna(y)
            )
            if xn or yn:
                if not (xn and yn):
                    return out
                continue
            if x != y:
                return out
    out["value_match"] = True
    return out


def main(sf_dir: str, out_path: str) -> None:
    from dbsurveyor_spark import registry
    from dbsurveyor_spark.catalog import TABLES, table_path
    from dbsurveyor_spark.session import get_session

    spark = get_session("correctness-full", shuffle_partitions=16)
    duck = duckdb.connect()
    for name in TABLES:
        duck.execute(
            f"CREATE VIEW {name} AS SELECT * FROM '{table_path(sf_dir, name)}'"
        )
    qs, oracles = registry.queries(), registry.oracle_sql()
    record: dict = {
        "sf_dir": sf_dir,
        "n_queries": len(qs),
        "queries": {},
    }
    n_pass = 0
    t_all = time.time()
    for i, key in enumerate(sorted(qs)):
        t0 = time.time()
        row: dict = {"oracle": "full" if key in oracles else "rows_only"}
        try:
            sdf = qs[key](spark, sf_dir)
            if key not in oracles:
                n = sdf.count()
                row.update({"spark_rows": int(n), "value_match": None})
                ok = n > 0
            else:
                ddf = duck.execute(oracles[key]).fetchdf()
                row.update(_verdict(sdf, ddf))
                ok = bool(row["value_match"])
            row["err"] = None
        except Exception as exc:  # record, keep driving
            row["err"] = f"{type(exc).__name__}: {str(exc)[:500]}"
            ok = False
        row["sec"] = round(time.time() - t0, 1)
        row["pass"] = ok
        n_pass += ok
        record["queries"][key] = row
        print(
            f"[{i + 1}/{len(qs)}] {'PASS' if ok else 'FAIL'} {key} "
            f"{row['sec']}s",
            flush=True,
        )
    record["n_pass"] = n_pass
    record["total_sec"] = round(time.time() - t_all, 1)
    with open(out_path, "w", encoding="utf-8") as fh:
        json.dump(record, fh, indent=1, sort_keys=True)
    print(f"TOTAL {n_pass}/{len(qs)} → {out_path}")
    spark.stop()
    sys.exit(0 if n_pass == len(qs) else 1)


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
