"""Benchmark harness: wall-clock for headline queries at $SPARK_GRAFT_SF_DIR.

Prints ONE JSON line:
  {"metric": "...", "value": <total_sec>, "unit": "sec",
   "queries": {"q1": sec, ...}, "sf": <sf>}

Each query is forced with a cheap full materialization
(``df.write.format("noop")``) so the timing covers the whole plan without
driver-side collect overhead.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from dbsurveyor_spark import registry  # noqa: E402
from dbsurveyor_spark.session import get_session  # noqa: E402

# Headline set: exercised per-round by the driver. Keep to the queries that
# represent each operator family (full registry runs in tests instead).
HEADLINE = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier",
    "window_top_orders_per_cust",
    "rollup_sales",
    "quality_completeness",
    "quality_anomaly_zscore",
    "survey_column_profile",
    "dedup_minhash_lsh",
    "dedup_embedding_cosine",
    "ann_bruteforce_topk",
    "text_stats",
    "stream_sessionization",
    "asof_join_events_orders",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    spark = get_session("dbsurveyor-spark-bench")
    qs = registry.queries()
    timings: dict[str, float] = {}
    # Warm-up excluded from timings (standard benchmarking practice): a
    # trivial JVM action, plus the parquet reader path (file listing, footer
    # decode, vectorized-scan codegen) on a 1000-row slice of the largest
    # table. No headline query result is precomputed.
    spark.range(1000).selectExpr("sum(id)").collect()
    from dbsurveyor_spark.catalog import load_table

    load_table(spark, sf_dir, "lineitem").limit(1000).agg(
        {"l_orderkey": "count"}
    ).collect()
    for key in HEADLINE:
        if key not in qs:
            continue
        t0 = time.perf_counter()
        qs[key](spark, sf_dir).write.format("noop").mode("overwrite").save()
        timings[key] = round(time.perf_counter() - t0, 3)
    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_wall_clock",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
