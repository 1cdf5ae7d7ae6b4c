"""Scale smoke: run the most expensive operators at a synthetic sf1.

The per-round bench measures at sf0.1; every 100 TB claim in SURVEY §6
rests on the plans scaling linearly from there. This harness validates one
10× point: it synthesizes an sf1-shaped lake from the sf0.1 tables (10
replicas with shifted keys), runs the top-cost operators once at each SF
in the same session, and prints per-op wall-clock ratios. A plan that is
secretly quadratic in corpus size shows up as ratio >> 10.

Replica construction keeps the WORKLOAD shape linear — the point is to
scale the data, not to inject 100× more duplicate pairs:
- documents: every token gets a per-replica suffix, so shingles/hashes are
  DISTINCT across replicas (near-dup structure replicates within each
  copy; no cross-replica pair explosion). doc_ids shift by 10^8 per
  replica, far above the dedup suite's 10^6 injection offset.
- embeddings: per-replica dimension rotation — norms and within-replica
  geometry preserved (IVF/PQ workload replicates), cross-replica cosines
  decorrelate to the random-vector baseline.
- lineitem/part: keys shift per replica → 10 disjoint co-purchase graphs.

Output: ONE JSON line {op: {"sf01_sec", "sf1_sec", "ratio"}, ...}.
Usage: python scripts/scale_smoke.py [ops_csv]
Data lands in .tmp/sf1 (gitignored); ~170 MB, rebuilt only when absent.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from dbsurveyor_spark import registry  # noqa: E402
from dbsurveyor_spark.session import get_session  # noqa: E402

SRC = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
DST = os.path.join(REPO, ".tmp", "sf1")
DST3 = os.path.join(REPO, ".tmp", "sf3")
REPLICAS = 10
REPLICAS3 = 30
KEY_OFF = 100_000_000

DEFAULT_OPS = [
    "graph_pagerank_parts",
    "graph_triangle_count",
    "dedup_ngram_jaccard",
    "dedup_semantic_corpus",
    "dedup_containment",
    "dedup_lsh_quality_report",
    "split_leakage_neardup",
    "knn_graph",
    "ann_ivfpq_topk",
    "ann_ivfsq_topk",
    "sample_importance_dsir",
    "corpus_decontamination_semantic",
    "dedup_substring",
    "dedup_winnowing",
    "dedup_neardup_clusters",
    # round 6: the de-broadcast / two-level-prefix rewrites + new audio op
    "basket_copurchase_lift",
    "text_zipf_fit",
    "abc_part_classification",
    "mm_audio_dedup_corpus",
    # round 6 continuation: retrieval + iterative-selection operators
    "text_bm25_search",
    "ann_hybrid_search",
    "ann_graph_search",
    "graph_connected_components",
    "sample_kcenter_greedy",
    # round 7: the substring-excision survivor corpus + k-core peel
    "dedup_substring_corpus",
    "graph_kcore",
    # round 8 continuation: wedge-join link prediction (the new hub-capped
    # quadratic) + lexical diversity (two linear token shuffles)
    "graph_link_prediction",
    "text_lexical_diversity",
]

# Ops whose OUTPUT is the index build itself: timed COLD at both SFs
# (memos cleared after the compile-warming pass) so the row is a real
# build-scaling ratio, not memo-hit vs fresh-build (VERDICT r6 item 8).
MEMO_FRESH_OPS = {"knn_graph"}

# Third scale point (30×) for the highest-ratio ops: a 10× point alone
# can't distinguish a curve that is bending (Σ|cell|²-style terms growing
# toward quadratic) from one flattening toward linear — the second decade
# shows the trend. Opt-in via --sf3 (the sf3 lake is ~510 MB).
SF3_OPS = [
    "graph_triangle_count",
    "dedup_substring",
    "basket_copurchase_lift",
    "dedup_semantic_corpus",
    "dedup_containment",
]


def _replicate(spark, dst: str = DST, replicas: int = REPLICAS) -> None:
    docs = spark.read.parquet(f"{SRC}/documents.parquet")
    embs = spark.read.parquet(f"{SRC}/embeddings.parquet")
    li = spark.read.parquet(f"{SRC}/lineitem.parquet")
    part = spark.read.parquet(f"{SRC}/part.parquet")

    def doc_rep(k: int):
        text = (
            F.col("text")
            if k == 0
            else F.regexp_replace(F.col("text"), r"(\S+)", f"$1x{k}")
        )
        return docs.select(
            (F.col("doc_id") + k * KEY_OFF).alias("doc_id"),
            text.alias("text"),
            "lang",
            "source",
            F.length(text).cast("int").alias("n_chars"),
        )

    def emb_rep(k: int):
        e = F.col("embedding")
        rot = (
            e
            if k == 0
            else F.concat(F.slice(e, k + 1, 4096), F.slice(e, 1, k))
        )
        return embs.select(
            (F.col("vec_id") + k * KEY_OFF).alias("vec_id"),
            rot.alias("embedding"),
            "label",
        )

    def li_rep(k: int):
        return li.withColumn(
            "l_orderkey", F.col("l_orderkey") + k * KEY_OFF
        ).withColumn("l_partkey", F.col("l_partkey") + k * KEY_OFF)

    def part_rep(k: int):
        return part.withColumn("p_partkey", F.col("p_partkey") + k * KEY_OFF)

    for name, rep in (
        ("documents", doc_rep),
        ("embeddings", emb_rep),
        ("lineitem", li_rep),
        ("part", part_rep),
    ):
        frames = rep(0)
        for k in range(1, replicas):
            frames = frames.unionByName(rep(k))
        (
            frames.repartition(32)
            .write.mode("overwrite")
            .parquet(f"{dst}/{name}.parquet")
        )


def _time_op(spark, fn, sf_dir: str) -> float:
    try:
        spark.sparkContext._jvm.System.gc()
    except Exception:
        pass
    t0 = time.perf_counter()
    fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
    return round(time.perf_counter() - t0, 2)


def main() -> None:
    args = [a for a in sys.argv[1:] if a != "--sf3"]
    with_sf3 = "--sf3" in sys.argv[1:]
    ops = args[0].split(",") if args else DEFAULT_OPS
    # cold-build timings must be genuine rebuilds: if the persisted index
    # store is configured, clearing the in-memory memos alone would let
    # the timed "cold" run silently warm from the on-disk artifact and
    # the build-scaling ratio would measure a store read, not the build.
    os.environ.pop("DBSURVEYOR_INDEX_DIR", None)
    spark = get_session("dbsurveyor-spark-scale-smoke")
    if not os.path.isdir(f"{DST}/documents.parquet"):
        _replicate(spark)
    if with_sf3 and not os.path.isdir(f"{DST3}/documents.parquet"):
        _replicate(spark, DST3, REPLICAS3)
    from dbsurveyor_spark.plans.cache import clear_index_memos

    qs = registry.queries()
    out = {}
    for key in ops:
        fn = qs[key]

        def timed(sf_dir: str) -> float:
            # warm pass at THIS SF absorbs plan-compile costs (and, for
            # memo consumers, the shared index build — the production
            # posture is index built once, queries ride it), so the
            # ratio compares like against like at both SFs. Build-ops
            # instead get their memo cleared so the timed run IS the
            # cold build at each SF.
            _time_op(spark, fn, sf_dir)
            if key in MEMO_FRESH_OPS:
                clear_index_memos()
            return _time_op(spark, fn, sf_dir)

        s01 = timed(SRC)
        s1 = timed(DST)
        out[key] = {
            "sf01_sec": s01,
            "sf1_sec": s1,
            "ratio": round(s1 / s01, 1) if s01 > 0 else None,
        }
        if with_sf3 and key in SF3_OPS:
            s3 = timed(DST3)
            out[key]["sf3_sec"] = s3
            # second decade: 3× more data than sf1 — linear would be 3.0
            out[key]["ratio3_vs_sf1"] = (
                round(s3 / s1, 1) if s1 > 0 else None
            )
        print(f"# {key}: {s01}s -> {s1}s ({out[key]['ratio']}x)"
              + (f" -> sf3 {out[key].get('sf3_sec')}s"
                 f" ({out[key].get('ratio3_vs_sf1')}x/3x)"
                 if with_sf3 and key in SF3_OPS else ""), flush=True)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
