"""Drive ONE (or a few) registry queries against their DuckDB oracles.

The per-operator pre-commit discipline: every new operator is driven
individually at both SFs through the same comparator as the full artifact
before it lands. Thin wrapper over `scripts/correctness_full.py`'s
verdict machinery, filtered to the named keys.

Usage:
    python scripts/drive_one.py <sf_dir> <key> [<key> ...]
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))
sys.path.insert(0, os.path.join(REPO, "scripts"))
os.environ.setdefault("SPARK_GRAFT_CPUS", "8")


def main(sf_dir: str, keys: list[str]) -> None:
    import duckdb

    from correctness_full import _verdict
    from dbsurveyor_spark import registry
    from dbsurveyor_spark.catalog import TABLES, table_path
    from dbsurveyor_spark.session import get_session

    qs, oracles = registry.queries(), registry.oracle_sql()
    unknown = [k for k in keys if k not in qs]
    if unknown:
        sys.exit(f"unknown keys: {unknown}")
    spark = get_session("drive-one", shuffle_partitions=16)
    duck = duckdb.connect()
    for name in TABLES:
        duck.execute(
            f"CREATE VIEW {name} AS SELECT * FROM '{table_path(sf_dir, name)}'"
        )
    failed = []
    for key in keys:
        t0 = time.time()
        sdf = qs[key](spark, sf_dir)
        if key not in oracles:
            n = sdf.count()
            ok = n > 0
            detail = f"rows_only spark_rows={n}"
        else:
            row = _verdict(sdf, duck.execute(oracles[key]).fetchdf())
            ok = bool(row["value_match"])
            detail = (
                f"rows {row['spark_rows']}/{row['oracle_rows']} "
                f"schema={row['schema_match']} values={row['value_match']}"
            )
        print(
            f"{'PASS' if ok else 'FAIL'} {key} {detail} "
            f"{time.time() - t0:.1f}s",
            flush=True,
        )
        if not ok:
            failed.append(key)
    spark.stop()
    sys.exit(1 if failed else 0)


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2:])
