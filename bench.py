"""Benchmark harness: wall-clock for headline queries at $SPARK_GRAFT_SF_DIR.

Prints TWO JSON lines: the full per-query record, then a compact headline
  {"metric": "...", "value": <total_sec>, "unit": "sec",
   "steady_value": <sec>, "sf": <sf>, "n_items": N}
as the LAST line — sized to survive the round driver's bounded stdout tail.

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
    "dedup_ngram_jaccard",
    "dedup_minhash_lsh",
    "dedup_minhash_incremental",
    "dedup_substring",
    "dedup_embedding_cosine",
    "split_leakage_neardup",
    "ann_bruteforce_topk",
    "ann_ivf_topk",
    "ann_pq_topk",
    "ann_sq8_topk",
    "ann_ivfpq_topk",
    "ann_ivfsq_topk",
    "ann_recall_report",
    "knn_graph",
    "text_stats",
    "text_repetition",
    "corpus_decontamination",
    "embed_cluster_report",
    "survey_numeric_histogram",
    "stream_sessionization",
    "stream_dedup_events",
    "stream_late_data_report",
    "quality_distribution_psi",
    "survey_join_cardinality",
    "scd2_user_state",
    "basket_copurchase_lift",
    "asof_join_events_orders",
    "dedup_containment",
    "dedup_semantic_corpus",
    "graph_pagerank_parts",
    "graph_triangle_count",
    "corpus_decontamination_semantic",
    "sample_importance_dsir",
    "stream_click_attribution",
    "sketch_cm_heavy_hitters",
    "mm_image_neardup",
    "mm_frame_neardup",
    "rfm_segmentation",
    "active_users_report",
    "text_cooccurrence_pmi",
    "funnel_conversion",
    "event_transitions",
    # round 6 additions: the audio family's decision step (the round's
    # heaviest new op) and the two-level-prefix rewrites
    "mm_audio_dedup_corpus",
    "text_zipf_fit",
    "abc_part_classification",
    # round 6 continuation: retrieval + backbone segmentation
    "text_bm25_search",
    "ann_hybrid_search",
    "ann_graph_search",
    "graph_connected_components",
    "quality_cross_table_checks",
    "sample_kcenter_greedy",
    # round 7: substring-excision survivor corpus + k-core peel + refine
    "dedup_substring_corpus",
    "graph_kcore",
    "ann_rerank_topk",
    # round 8: trained quality classifier (scores + evaluation)
    "text_quality_classifier",
    "text_quality_classifier_report",
    # round 8 continuation: live sqlite executor-parallel read, wedge-join
    # link prediction, lexical-diversity gate
    "source_sqlite_roundtrip",
    "graph_link_prediction",
    "text_lexical_diversity",
    "text_lm_perplexity_bigram",
    "graph_modularity",
    "orders_forecast_ses",
]

STEADY_PASSES = 3  # steady = per-query MIN over this many post-warm passes

# Drift canaries: untouched pure-JVM scan/agg/join queries whose code has
# been frozen since the early rounds. Host-scale timing drift (this VM
# moves 15-25% day to day) shows up on them exactly as on everything else,
# so the ratio Σcanary/Σbaseline(canary) IS the drift factor, and
# dividing the common-item comparison by it separates code regressions
# from machine drift MECHANICALLY — rounds 6 and 7 both had to argue this
# from q1 after the fact.
#
# r8 verdict item: session-wide config changes (the AQE coalesce floor)
# moved `survey_join_cardinality`, contaminating the drift signal. Fix:
# canaries are now timed in a dedicated pass under FROZEN_CONF — literal
# constants, never session defaults — so an engine-config diff between
# rounds cannot move them; only the machine can. The frozen numbers land
# in "canaries_frozen" on the detail line; `_drift_fields` prefers them
# whenever the committed baseline record also carries them (records
# written before this fix fall back to the old steady-based ratio).
CANARY = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "rollup_sales",
    "survey_join_cardinality",
]
CANARY_PASSES = 2  # frozen canary value = MIN over this many passes
FROZEN_CONF = {
    # Pinned literals (Spark's own defaults where applicable) — NOT
    # read from the session, so session.py evolution can't leak in.
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.minPartitionSize": "1m",
    "spark.sql.adaptive.advisoryPartitionSizeInBytes": "64m",
    "spark.sql.shuffle.partitions": "32",
}
# Committed settled record of the previous round (full per-query map —
# the driver's own BENCH_r{N}.json keeps only a 2,000-char stdout tail).
BASELINE_RECORD = os.environ.get(
    "SPARK_GRAFT_BENCH_BASELINE",
    os.path.join(os.path.dirname(os.path.abspath(__file__)),
                 "bench_records", "latest.json"),
)


def _drift_fields(
    steady: dict[str, float], frozen: dict[str, float]
) -> dict:
    """canary_ratio + raw and drift-normalized common-item sums vs the
    committed baseline record; {} when no baseline is readable.

    The canary ratio uses the FROZEN-CONF canary timings when the
    baseline record carries them ("canaries_frozen"); older records fall
    back to the steady-pass values (which were config-sensitive)."""
    try:
        with open(BASELINE_RECORD) as fh:
            rec = json.load(fh)
            base = rec["queries_steady"]
    except (OSError, ValueError, KeyError):
        return {}
    base_frozen = rec.get("canaries_frozen") or {}
    if frozen and base_frozen:
        canary_now = [frozen[k] for k in CANARY if k in frozen and k in base_frozen]
        canary_base = [base_frozen[k] for k in CANARY if k in frozen and k in base_frozen]
    else:
        canary_now = [steady[k] for k in CANARY if k in steady and k in base]
        canary_base = [base[k] for k in CANARY if k in steady and k in base]
    if not canary_now or sum(canary_base) <= 0:
        return {}
    ratio = sum(canary_now) / sum(canary_base)
    common = [
        k for k in steady
        if k in base and not k.endswith("_build")
    ]
    now_sum = sum(steady[k] for k in common)
    base_sum = sum(base[k] for k in common)
    out = {
        "canary_ratio": round(ratio, 3),
        "common_items": len(common),
        "common_sum": round(now_sum, 2),
        "common_sum_baseline": round(base_sum, 2),
    }
    if base_sum > 0:
        out["common_ratio_raw"] = round(now_sum / base_sum, 3)
        out["common_ratio_drift_normalized"] = round(
            now_sum / base_sum / ratio, 3
        )
    return out


def _machine_state() -> dict:
    """Loadavg / free memory / process count at measurement time, embedded
    in the bench record so a CONTENDED run is self-labeling: the round-6
    driver snapshot showed +41% on 52 unchanged queries that the same code
    measured idle did not reproduce, and nothing on the record could prove
    the machine (not the code) was at fault. Now the record carries it."""
    state: dict = {}
    try:
        l1, l5, _ = os.getloadavg()
        state["load1"] = round(l1, 2)
        state["load5"] = round(l5, 2)
    except OSError:  # pragma: no cover - non-POSIX
        pass
    try:
        with open("/proc/meminfo") as fh:
            for line in fh:
                if line.startswith("MemAvailable:"):
                    state["mem_avail_gb"] = round(int(line.split()[1]) / 1048576, 1)
                    break
    except OSError:  # pragma: no cover - non-Linux
        pass
    try:
        state["n_procs"] = sum(1 for p in os.listdir("/proc") if p.isdigit())
    except OSError:  # pragma: no cover - non-Linux
        pass
    return state


def _warmup(spark, sf_dir: str) -> None:
    """Exclude one-time JVM/codegen costs from the timings (standard
    benchmarking practice). Three warmups, none precomputing a headline
    result:

    - a trivial JVM action (executor spin-up);
    - the parquet reader path (file listing, footer decode, vectorized-scan
      codegen) on a 1000-row slice of the largest table;
    - a q1-SHAPED throwaway aggregate (filter → project → groupBy with
      decimal sum/avg chains) with DIFFERENT predicates/keys, so Janino +
      JIT compile the same operator shapes q1 uses (~2 s of round-1's q1
      number was this compile, not the query);
    - one tiny Arrow-batched pandas-UDF call over synthetic `range` data,
      so the Python worker pool + Arrow serialization machinery are up
      before any vector query is timed (worker spawn is infrastructure,
      not query work).
    """
    from pyspark.sql import functions as F

    from dbsurveyor_spark.catalog import load_table
    from dbsurveyor_spark.functions.vectors import cosine_rounded_arrow

    spark.range(1000).selectExpr("sum(id)").collect()
    (
        # repartition to CPU count so the FULL Python worker pool spawns
        # here, not inside the first timed vector query.
        spark.range(2048)
        .repartition(int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
        .select(F.array(F.rand(7), F.rand(8)).alias("v"))
        .select(cosine_rounded_arrow(F.col("v"), F.col("v")).alias("c"))
        .agg({"c": "sum"})
        .collect()
    )
    # Shingle/dedup-SHAPED throwaway on synthetic data (different inputs):
    # posexplode → lead windows → concat_ws → collect_set → array_intersect
    # are the operator shapes the dedup queries codegen; Janino+JIT compile
    # them here so the first timed dedup pass isn't ~2/3 compiler time.
    from pyspark.sql.window import Window as _W

    syn = spark.range(2000).select(
        (F.col("id") % 100).alias("g"),
        F.posexplode(F.split(F.lit("a b c d e f g h"), " ")).alias("pos", "t"),
    )
    w_ = _W.partitionBy("g").orderBy("pos")
    # ranking + frame window shapes (row_number / rank / sum-over-frame)
    # compile here so the first timed window query isn't mostly Janino
    (
        syn.select(
            F.row_number().over(w_).alias("rn"),
            F.rank().over(w_).alias("rk"),
            F.sum(F.length("t").cast("decimal(30,6)"))
            .over(w_.rowsBetween(_W.unboundedPreceding, _W.currentRow))
            .alias("rs"),
        )
        .agg({"rn": "max", "rk": "max", "rs": "max"})
        .collect()
    )
    tri = syn.select(
        "g",
        F.concat_ws(" ", "t", F.lead("t", 1).over(w_), F.lead("t", 2).over(w_)).alias(
            "s"
        ),
    ).dropDuplicates(["g", "s"])
    sets = tri.groupBy("g").agg(F.collect_set("s").alias("ss"))
    (
        sets.alias("x")
        .join(sets.alias("y"), F.col("x.g") < F.col("y.g"))
        .select(F.size(F.array_intersect(F.col("x.ss"), F.col("y.ss"))).alias("c"))
        .agg({"c": "sum"})
        .collect()
    )
    # PPJoin-SHAPED throwaway (the prefix-filter dedup family: global-df
    # ranking window over a join, inequality self-join with length-filter
    # residuals, set verify) — measured 9-11 s of janino+JIT on the first
    # real ngram pass when these shapes compile cold.
    dfq = tri.groupBy("s").agg(F.count(F.lit(1)).alias("df"))
    rk = (
        tri.join(dfq, "s")
        .withColumn("rn", F.row_number().over(_W.partitionBy("g").orderBy("df", "s")))
        .withColumn("n_sh", F.count(F.lit(1)).over(_W.partitionBy("g")))
    )
    pf = rk.filter(F.col("rn") <= F.col("n_sh") - (4 * F.col("n_sh") + 4) / 5 + 1)
    cand = (
        pf.alias("x")
        .join(
            pf.alias("y"),
            (F.col("x.s") == F.col("y.s"))
            & (F.col("x.g") < F.col("y.g"))
            & (F.col("y.n_sh") * 5 >= F.col("x.n_sh") * 4),
        )
        .select(F.col("x.g").alias("ga"), F.col("y.g").alias("gb"))
        .distinct()
    )
    (
        cand.join(sets.select(F.col("g").alias("ga"), F.col("ss").alias("sa")), "ga")
        .join(sets.select(F.col("g").alias("gb"), F.col("ss").alias("sb")), "gb")
        .select(F.size(F.array_intersect("sa", "sb")).alias("c"))
        .agg({"c": "sum"})
        .collect()
    )
    # parallel exact-distinct branches (survey_column_profile's shape):
    # N single-column count_distinct jobs submitted concurrently compile
    # their plans under JIT contention — warm that path too.
    from concurrent.futures import ThreadPoolExecutor

    syn2 = spark.range(5000).select(
        (F.col("id") % 97).alias("a"), (F.col("id") % 89).alias("b"),
        (F.col("id") % 83).alias("c"), (F.col("id") % 79).alias("d"),
    )
    with ThreadPoolExecutor(max_workers=4) as pool:
        list(
            pool.map(
                lambda c: syn2.select(F.count_distinct(F.col(c))).collect(),
                ["a", "b", "c", "d"],
            )
        )
    li = load_table(spark, sf_dir, "lineitem")
    li.limit(1000).agg({"l_orderkey": "count"}).collect()
    dec = "decimal(30,6)"
    (
        li.filter(F.col("l_shipdate") >= "1996-06-01")  # not q1's predicate
        .groupBy("l_linestatus")  # not q1's grouping
        .agg(
            F.sum(F.col("l_extendedprice").cast(dec)).alias("s1"),
            F.sum(
                (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(dec)
            ).alias("s2"),
            F.avg(F.col("l_quantity").cast(dec)).alias("a1"),
            F.count(F.lit(1)).alias("n"),
        )
        .write.format("noop")
        .mode("overwrite")
        .save()
    )


def compact_last_line(
    total: float, steady: dict[str, float], sf_val, n_items: int
) -> str:
    """The driver-tail-sized LAST stdout line: headline totals plus the
    per-query steady map at 1 dp. Must stay under 2,000 chars (the round
    driver keeps exactly the final 2,000 chars of stdout and parses JSON
    from them); a hard guard degrades to integer seconds rather than ever
    letting the tail truncate mid-line."""

    def _enc(v: float) -> str:
        r = round(v, 1)
        if r < 0.05:
            return "0"
        if r == int(r):
            return str(int(r))
        return f"{r:.1f}"

    compact_q = {
        k: _enc(v) for k, v in steady.items() if not k.endswith("_build")
    }
    head = (
        '{"metric":"headline_queries_wall_clock",'
        f'"value":{round(total, 2)},"unit":"sec",'
        f'"steady_value":{round(sum(steady.values()), 1)},'
        f'"sf":{json.dumps(sf_val)},"n_items":{n_items},"queries":{{'
    )
    def _render(entries: dict[str, str], dropped: int) -> str:
        body = ",".join(f'"{k}":{v}' for k, v in entries.items())
        tail = "}" + (f',"dropped":{dropped}' if dropped else "") + "}"
        return head + body + tail

    line = _render(compact_q, 0)
    if len(line) > 1990:  # never let the tail truncate mid-line
        # Degrade in two steps: integer seconds first; if the map is
        # still too wide, drop the SMALLEST-steady entries (the heavy
        # queries are the regression signal) and say how many were cut.
        compact_q = {
            k: str(int(round(float(v)))) for k, v in compact_q.items()
        }
        order = sorted(compact_q, key=lambda k: (steady[k], k))
        dropped = 0
        line = _render(compact_q, dropped)
        while len(line) > 1990 and order:
            compact_q.pop(order.pop(0))
            dropped += 1
            line = _render(compact_q, dropped)
    return line


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    spark = get_session("dbsurveyor-spark-bench")
    qs = registry.queries()
    _warmup(spark, sf_dir)
    # Pass 1 → "queries" (first run — comparable to earlier rounds).
    # Passes 2..1+STEADY_PASSES → "queries_steady" is the per-query MIN
    # across them: plan-compile costs amortized, and a single GC pause or
    # driver hiccup in one pass (observed in round-3's recorded run: one
    # 22 s outlier on a query that steadily times ~2 s) can't contaminate
    # the number that projects to a long-lived cluster session.
    from dbsurveyor_spark.operators.similarity import (
        trained_centroid_rows,
        trained_pq_codebooks,
        trained_residual_codebooks,
    )

    def _gc() -> None:
        # Old-gen pauses land on whichever query happens to be running
        # (observed: 11-21 s on queries that steadily time ~2 s). A GC at
        # every query BOUNDARY costs ~0.1 s outside all timing windows and
        # keeps multi-second pauses out of individual numbers — including
        # the first-pass "queries" totals the round record keeps.
        try:
            spark.sparkContext._jvm.System.gc()
        except Exception:
            pass

    machine_pre = _machine_state()
    timings: dict[str, float] = {}
    steady: dict[str, float] = {}
    passes = [timings] + [dict() for _ in range(STEADY_PASSES)]
    for i, out in enumerate(passes):
        # Start every timed pass (including the first — warmup allocates
        # heavily too) with no stale cached blocks to evict mid-query, a
        # full GC, and a short settle so one pass's allocation tail (old-gen
        # promotion, lazy block eviction) can't bleed into the next pass's
        # first queries.
        spark.catalog.clearCache()
        _gc()
        if i > 0:
            time.sleep(1.0)
        # One-time model state (the IVF coarse quantizer) is timed as its
        # own line item, like any ANN benchmark's build/search split: the
        # first pass pays the training, later passes show ~0 because the
        # index is session-memoized (similarity.trained_centroid_rows).
        t0 = time.perf_counter()
        trained_centroid_rows(spark, sf_dir)
        out["ivf_index_build"] = round(time.perf_counter() - t0, 3)
        t0 = time.perf_counter()
        trained_pq_codebooks(spark, sf_dir)
        out["pq_index_build"] = round(time.perf_counter() - t0, 3)
        t0 = time.perf_counter()
        trained_residual_codebooks(spark, sf_dir)
        out["ivfpq_index_build"] = round(time.perf_counter() - t0, 3)
        # The shared co-purchase graph (memoized edge+degree frames used by
        # pagerank/triangle/degree-distribution) is likewise a build/search
        # split: clearCache() above dropped its cached blocks, so
        # re-materialize and time the build as its own line item — the
        # graph QUERIES then measure query work, not the shared build.
        from dbsurveyor_spark.operators.graph import copurchase_graph

        t0 = time.perf_counter()
        half, deg = copurchase_graph(spark, sf_dir)
        half.count()
        deg.count()
        out["graph_edge_build"] = round(time.perf_counter() - t0, 3)
        for key in HEADLINE:
            if key not in qs:
                continue
            _gc()
            t0 = time.perf_counter()
            qs[key](spark, sf_dir).write.format("noop").mode("overwrite").save()
            out[key] = round(time.perf_counter() - t0, 3)
    # Frozen-conf canary pass (drift measurement only — OUTSIDE every
    # reported total): the same 4 queries, timed under FROZEN_CONF
    # literals, so engine-config changes between rounds cannot move the
    # drift denominator. ~10 s per bench run.
    canaries_frozen: dict[str, float] = {}
    conf = spark.conf
    saved_conf = {k: conf.get(k) for k in FROZEN_CONF}
    try:
        for k, v in FROZEN_CONF.items():
            conf.set(k, v)
        spark.catalog.clearCache()
        for _ in range(CANARY_PASSES):
            for key in CANARY:
                if key not in qs:
                    continue
                _gc()
                t0 = time.perf_counter()
                qs[key](spark, sf_dir).write.format("noop").mode(
                    "overwrite"
                ).save()
                dt = round(time.perf_counter() - t0, 3)
                canaries_frozen[key] = min(
                    canaries_frozen.get(key, dt), dt
                )
    finally:
        for k, v in saved_conf.items():
            conf.set(k, v)
    cov: dict[str, float] = {}
    for key in passes[1]:
        vals = [p[key] for p in passes[1:]]
        steady[key] = min(vals)
        # Coefficient of variation across the steady passes: a quiet
        # machine keeps this near zero, so a contended record flags
        # itself per-query. Skip near-zero means (memo-hit build items).
        m = sum(vals) / len(vals)
        if m >= 0.05:
            var = sum((v - m) ** 2 for v in vals) / len(vals)
            cov[key] = round(var**0.5 / m, 3)
    machine_post = _machine_state()
    drift = _drift_fields(steady, canaries_frozen)
    cov_sorted = sorted(cov.values())
    cov_p50 = round(cov_sorted[len(cov_sorted) // 2], 3) if cov_sorted else 0.0
    cov_max = max(cov_sorted) if cov_sorted else 0.0
    total = round(sum(timings.values()), 3)
    sf_val = float(sf) if sf.replace(".", "").isdigit() else sf
    # Detailed per-query record first (2dp — r4's 3dp line hit ~3.3 KB)…
    print(
        json.dumps(
            {
                "metric": "headline_queries_wall_clock",
                "value": total,
                "unit": "sec",
                "queries": {k: round(v, 2) for k, v in timings.items()},
                "steady_value": round(sum(steady.values()), 3),
                "queries_steady": {k: round(v, 2) for k, v in steady.items()},
                "queries_cov": cov,
                "canaries_frozen": canaries_frozen,
                "machine_pre": machine_pre,
                "machine_post": machine_post,
                "drift": drift,
                "cov_p50": cov_p50,
                "cov_max": cov_max,
                "sf": sf_val,
            }
        )
    )
    # …then the LAST line: the round driver keeps EXACTLY the final 2,000
    # chars of stdout and parses JSON from them. r8's last line carried no
    # per-query map at all, so the driver's PERF per_query/scaling blocks
    # came out empty (r8 verdict item #1). This line now carries the full
    # per-query STEADY map (1 dp; min-of-3 passes — the number that
    # projects to a long-lived session, far less noisy than pass 1) in a
    # compact encoding sized to fit the tail with margin. The 4 `*_build`
    # index-build line items stay on the detail line above (their steady
    # values are memo-hit ~0s; the headline QUERY set is complete here).
    # A hard guard degrades gracefully rather than ever overflowing.
    print(compact_last_line(total, steady, sf_val, len(timings)))
    # Reclaim the session-pinned index memos (k-NN graph, audio pairs,
    # co-purchase graph) — the documented evict hook for suite boundaries.
    from dbsurveyor_spark.plans.cache import clear_index_memos

    clear_index_memos()
    spark.stop()


if __name__ == "__main__":
    main()
