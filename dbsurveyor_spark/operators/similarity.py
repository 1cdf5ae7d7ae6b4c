"""Similarity search over the embeddings table (SURVEY.md §2.F).

- ann_bruteforce_topk: exact top-k cosine neighbors for a probe set. The
  probe side is tiny and broadcast; the corpus streams past it — the right
  shape when k·|probes| ≪ |corpus| (at 100 TB the corpus scan dominates and
  parallelizes perfectly; no shuffle of the corpus).
- ann_ivf_topk: IVF-style ANN. Deterministic seed centroids (first
  N_CELLS vectors), one broadcast-join pass to assign every vector to its
  nearest cell, then probes search ONLY their own cell — the classic
  inverted-file trade: recall for a |corpus|/N_CELLS scan reduction.
  (IVF as in Jégou et al., "Product Quantization for Nearest Neighbor
  Search", public literature — we use the coarse quantizer idea only.)

Vector math is JVM-side higher-order functions (functions/vectors.py); the
DuckDB oracle replays the identical left-fold arithmetic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..catalog import load_table
from ..functions.vectors import cosine_rounded, cosine_rounded_sql

N_PROBES = 10  # probe set: vec_id < 10
TOP_K = 5
N_CELLS = 8  # IVF cells: centroids = vec_id < 8
IVF_K = 3
NPROBE = 2  # cells searched per query (the standard IVF recall lever)


def ann_bruteforce_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    probes = emb.filter(F.col("vec_id") < N_PROBES).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_emb")
    )
    cos = cosine_rounded(
        F.col("q_emb").cast("array<double>"),
        F.col("embedding").cast("array<double>"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cos_sim"), F.asc("neighbor_id")
    )
    return (
        emb.join(F.broadcast(probes), F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            cos.alias("cos_sim"),
        )
        .withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= TOP_K)
    )


def _bruteforce_sql() -> str:
    cos = cosine_rounded_sql("p.embedding", "e.embedding")
    return f"""
WITH probes AS (SELECT vec_id AS query_id, embedding FROM embeddings
                WHERE vec_id < {N_PROBES}),
scored AS (
  SELECT p.query_id, e.vec_id AS neighbor_id, {cos} AS cos_sim
  FROM probes p JOIN embeddings e ON e.vec_id <> p.query_id
)
SELECT query_id, neighbor_id, cos_sim, rank FROM (
  SELECT *, ROW_NUMBER() OVER (
    PARTITION BY query_id ORDER BY cos_sim DESC, neighbor_id ASC) AS rank
  FROM scored
) t WHERE rank <= {TOP_K}
"""


def ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF search: assign all vectors to their nearest seed centroid (one
    broadcast-join pass), then each probe scans its NPROBE nearest cells —
    multi-cell probing recovers the neighbors that straddle a cell
    boundary, the standard IVF recall/cost dial."""
    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    centroids = emb.filter(F.col("vec_id") < N_CELLS).select(
        F.col("vec_id").alias("cell_id"), F.col("embedding").alias("c_emb")
    )
    cos_c = cosine_rounded(
        F.col("c_emb").cast("array<double>"),
        F.col("embedding").cast("array<double>"),
    )
    w_assign = Window.partitionBy("vec_id").orderBy(
        F.desc("cell_cos"), F.asc("cell_id")
    )
    ranked_cells = (
        emb.crossJoin(F.broadcast(centroids))
        .select("vec_id", "embedding", "cell_id", cos_c.alias("cell_cos"))
        .withColumn("rn", F.row_number().over(w_assign))
    )
    assigned = ranked_cells.filter(F.col("rn") == 1).select(
        "vec_id", "embedding", "cell_id"
    )
    # probes keep their NPROBE nearest cells (not just the assignment cell)
    probes = ranked_cells.filter(
        (F.col("vec_id") < N_PROBES) & (F.col("rn") <= NPROBE)
    ).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_emb"),
        F.col("cell_id").alias("q_cell"),
    )
    cos = cosine_rounded(
        F.col("q_emb").cast("array<double>"),
        F.col("embedding").cast("array<double>"),
    )
    w_rank = Window.partitionBy("query_id").orderBy(
        F.desc("cos_sim"), F.asc("neighbor_id")
    )
    return (
        assigned.join(
            F.broadcast(probes),
            (F.col("cell_id") == F.col("q_cell"))
            & (F.col("vec_id") != F.col("query_id")),
        )
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            cos.alias("cos_sim"),
        )
        .withColumn("rank", F.row_number().over(w_rank).cast("bigint"))
        .filter(F.col("rank") <= IVF_K)
    )


def _ivf_sql() -> str:
    cos_c = cosine_rounded_sql("c.embedding", "e.embedding")
    cos = cosine_rounded_sql("p.q_emb", "a.embedding")
    return f"""
WITH centroids AS (SELECT vec_id AS cell_id, embedding FROM embeddings
                   WHERE vec_id < {N_CELLS}),
ranked_cells AS (
  SELECT e.vec_id, e.embedding, c.cell_id,
         ROW_NUMBER() OVER (
           PARTITION BY e.vec_id
           ORDER BY {cos_c} DESC, c.cell_id ASC) AS rn
  FROM embeddings e CROSS JOIN centroids c
),
assigned AS (
  SELECT vec_id, embedding, cell_id FROM ranked_cells WHERE rn = 1
),
probes AS (
  SELECT vec_id AS query_id, embedding AS q_emb, cell_id AS q_cell
  FROM ranked_cells WHERE vec_id < {N_PROBES} AND rn <= {NPROBE}
),
scored AS (
  SELECT p.query_id, a.vec_id AS neighbor_id, {cos} AS cos_sim
  FROM probes p JOIN assigned a
    ON a.cell_id = p.q_cell AND a.vec_id <> p.query_id
)
SELECT query_id, neighbor_id, cos_sim, rank FROM (
  SELECT *, ROW_NUMBER() OVER (
    PARTITION BY query_id ORDER BY cos_sim DESC, neighbor_id ASC) AS rank
  FROM scored
) t WHERE rank <= {IVF_K}
"""


QUERIES = {
    "ann_bruteforce_topk": ann_bruteforce_topk,
    "ann_ivf_topk": ann_ivf_topk,
}

ORACLES = {
    "ann_bruteforce_topk": _bruteforce_sql(),
    "ann_ivf_topk": _ivf_sql(),
}
