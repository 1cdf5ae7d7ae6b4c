"""Dump .explain("formatted") for named registry queries.

The optimization-round evidence trail: before touching an operator, dump
its physical plan; after, dump it again — the judge checks plan claims
(Exchange counts, join strategies, PushedFilters, Python-eval nodes)
against these files because it cannot run Spark.

Usage:
    python scripts/dump_plans.py <sf_dir> <outdir> <suffix> <key> [...]

Writes <outdir>/<key>_<suffix>.txt per key. Iterative operators execute
their per-round plans eagerly at construction; the dump is the final
stitched plan (per-round plans are covered by the round_inspector gate).
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
os.environ.setdefault("SPARK_GRAFT_CPUS", "8")


def main(sf_dir: str, outdir: str, suffix: str, keys: list[str]) -> None:
    from dbsurveyor_spark import registry
    from dbsurveyor_spark.session import get_session

    qs = registry.queries()
    unknown = [k for k in keys if k not in qs]
    if unknown:
        sys.exit(f"unknown keys: {unknown}")
    os.makedirs(outdir, exist_ok=True)
    spark = get_session("dump-plans", shuffle_partitions=16)
    for key in keys:
        df = qs[key](spark, sf_dir)
        text = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
        path = os.path.join(outdir, f"{key}_{suffix}.txt")
        with open(path, "w", encoding="utf-8") as fh:
            fh.write(text)
        print(f"{path}: {text.count('Exchange')} Exchange refs", flush=True)
    spark.stop()


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2], sys.argv[3], sys.argv[4:])
