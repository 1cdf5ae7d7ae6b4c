"""Iterative graph analytics over relational-derived graphs (SURVEY §2.D+).

PageRank over the co-purchase part graph — the iterative linear-algebra
operator family (beyond the connected-components fixpoint the dedup suite
ships). The Spark shape is the standard Pregel-on-DataFrame loop: a cached
edge+degree frame, and per iteration ONE join (ranks → edges on src) + ONE
groupBy(dst) partial-summed shuffle + ONE left join back onto the node
spine. Per-iteration shuffle volume is |E| slim (node, contribution) pairs;
vectors/payloads never move.

Cross-engine exactness: PageRank in doubles is merge-order-dependent, so
ranks are FIXED-POINT integers (PR_SCALE = 1e12): contributions use integer
division r div deg, the damping 0.85 is the exact fraction 17/20, and the
teleport term is (3·SCALE) div (20·N). Every operation is associative
integer math → bit-identical under any partitioning, any engine. The DuckDB
oracle unrolls the same ITERS iterations as chained CTEs (recursive CTEs
forbid aggregates in the recursive term).

Total rank mass is ≤ SCALE (floor divisions only lose mass), so every
intermediate fits comfortably in int64 at any corpus size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..plans.cache import release_caches, tracked_cache as _tracked_cache

PAGERANK_ITERS = 5
PR_SCALE = 10**12
DAMP_NUM, DAMP_DEN = 17, 20  # 0.85 as an exact fraction
TELE_NUM = DAMP_DEN - DAMP_NUM  # (1 - d) numerator = 3


def _pagerank_step(
    edges_deg: DataFrame, ranks: DataFrame, teleport: int
) -> DataFrame:
    """One PageRank iteration: join ranks onto the cached src-partitioned
    edge frame, sum contributions per dst, apply damping + teleport.

    The rank side carries a SHUFFLE_HASH hint, NOT a broadcast: at 100×
    scale |V| grows linearly and an O(|V|) per-iteration broadcast OOMs
    every executor. A shuffled hash join moves only the slim (node, r)
    frame — `edges_deg` is cached already repartition()-ed on src, so its
    exchange is reused across all iterations and only the rank rows
    shuffle each round. (An explicit hint is still required: estimated-size
    stats on the unmaterialized cache are unreliable and the planner was
    observed broadcasting the 2.4M-row EDGE side at sf0.1, OOMing the
    driver.) Fixed-point integer math makes the result bit-identical under
    either join strategy, which is what lets this swap keep the oracle
    green.
    """
    damp = F.expr(f"({DAMP_NUM} * c) div {DAMP_DEN}")
    return (
        edges_deg.join(
            ranks.hint("SHUFFLE_HASH"), edges_deg["src"] == ranks["node"]
        )
        .select(F.col("dst").alias("node"), F.expr("r div deg").alias("c"))
        .groupBy("node")
        .agg(F.sum("c").alias("c"))
        .select("node", (F.lit(teleport) + damp).alias("r"))
    )


def graph_pagerank_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank over the undirected co-purchase graph (parts are adjacent
    iff some order contains both): the standard product-affinity /
    centrality score next to `basket_copurchase_lift`'s pairwise lift.
    Isolated parts (never co-ordered) keep the teleport-only rank.

    Edge construction never self-joins the fact table: distinct
    (order, part) lines → per-order basket arrays (fan-out bounded by
    basket size, ≤7 at TPC-H ratios) → in-array pair expansion → distinct
    directed edges both ways. Degrees join once; the edge+degree frame is
    cached and reused by all ITERS iterations.

    Reference analog: none — dbsurveyor has no graph ops; this extends
    §2.D with the iterative-algorithm family (CC already ships in §2.E).
    """
    release_caches()
    from .dedup import _bucket_pairs

    nodes = load_table(spark, sf_dir, "part").select(
        F.col("p_partkey").alias("node")
    )
    # no distinct before the groupBy: collect_set dedupes parts within an
    # order anyway, so the pre-distinct would only add a shuffle.
    lines = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey"
    )
    baskets = lines.groupBy("l_orderkey").agg(
        F.sort_array(F.collect_set("l_partkey")).alias("parts")
    )
    half = (
        baskets.select(F.explode(_bucket_pairs(F.col("parts"))).alias("p"))
        .select(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
        .distinct()
    )
    edges = half.select(
        F.col("a").alias("src"), F.col("b").alias("dst")
    ).unionByName(half.select(F.col("b").alias("src"), F.col("a").alias("dst")))
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    # repartition the cached frame to full parallelism: AQE coalesces the
    # slim edge shuffle to a handful of partitions, which would serialize
    # every iteration's scan onto a few cores (measured at sf0.1).
    edges_deg = _tracked_cache(
        edges.join(deg, "src").repartition(
            spark.sparkContext.defaultParallelism, "src"
        )
    )
    n_nodes = nodes.count()  # metadata-scale driver scalar
    teleport = (TELE_NUM * PR_SCALE) // (DAMP_DEN * n_nodes)
    # Isolated nodes are INVARIANT: no in-edges → rank = teleport every
    # iteration, and no out-edges → they contribute nothing. So iterate
    # over edge-incident nodes only — in an undirected graph every edge
    # node has in-degree ≥ 1, so `contrib` covers exactly the iterating
    # node set and the per-iteration "node spine left join + coalesce"
    # disappears (measured: it was 2 of 3 jobs per iteration). Isolated
    # nodes rejoin once, at the end, at the constant teleport rank.
    ranks = edges_deg.select("src").distinct().select(
        F.col("src").alias("node"), F.lit(PR_SCALE // n_nodes).alias("r")
    )
    for _ in range(PAGERANK_ITERS):
        # Each round ends in a localCheckpoint (§6 iterative doctrine): the
        # next iteration's join then reads materialized rows, not a
        # deepening logical plan.
        ranks = _pagerank_step(edges_deg, ranks, teleport).localCheckpoint(
            eager=False
        )
    isolated = nodes.join(ranks.select("node"), "node", "left_anti").select(
        "node", F.lit(teleport).alias("r")
    )
    return ranks.unionByName(isolated).select(
        F.col("node").alias("part_id"),
        F.col("r").alias("rank_scaled"),
        F.round(F.col("r").cast("double") / F.lit(float(PR_SCALE)), 9).alias(
            "rank_value"
        ),
    )


def _pagerank_sql() -> str:
    iters = []
    prev = "r0"
    for i in range(1, PAGERANK_ITERS + 1):
        iters.append(f"""r{i} AS (
  SELECT n.node,
         (({TELE_NUM} * CAST({PR_SCALE} AS BIGINT)) // ({DAMP_DEN} * nn.n))
         + ({DAMP_NUM} * COALESCE(s.c, 0)) // {DAMP_DEN} AS r
  FROM nodes n CROSS JOIN nn LEFT JOIN (
    SELECT ed.dst AS node, CAST(SUM({prev}.r // ed.deg) AS BIGINT) AS c
    FROM ed JOIN {prev} ON ed.src = {prev}.node GROUP BY ed.dst
  ) s ON s.node = n.node
)""")
        prev = f"r{i}"
    chain = ",\n".join(iters)
    return f"""
WITH lines AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
pairs AS (
  SELECT DISTINCT a.l_partkey AS src, b.l_partkey AS dst
  FROM lines a JOIN lines b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey <> b.l_partkey
),
deg AS (SELECT src, CAST(COUNT(*) AS BIGINT) AS deg FROM pairs GROUP BY src),
ed AS (SELECT p.src, p.dst, d.deg FROM pairs p JOIN deg d USING (src)),
nodes AS (SELECT p_partkey AS node FROM part),
nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM nodes),
r0 AS (
  SELECT node, CAST({PR_SCALE} AS BIGINT) // nn.n AS r
  FROM nodes CROSS JOIN nn
),
{chain}
SELECT node AS part_id, r AS rank_scaled,
       ROUND(CAST(r AS DOUBLE) / {float(PR_SCALE)}, 9) AS rank_value
FROM {prev}
"""


QUERIES = {
    "graph_pagerank_parts": graph_pagerank_parts,
}

ORACLES = {
    "graph_pagerank_parts": _pagerank_sql(),
}
