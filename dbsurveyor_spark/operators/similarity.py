"""Similarity search over the embeddings table (SURVEY.md §2.F).

- ann_bruteforce_topk: exact top-k cosine neighbors for a probe set. The
  probe side is tiny and broadcast; the corpus streams past it — the right
  shape when k·|probes| ≪ |corpus| (at 100 TB the corpus scan dominates and
  parallelizes perfectly; no shuffle of the corpus).
- ann_ivf_topk: IVF ANN with a TRAINED coarse quantizer. Centroids are
  k-means-refined from a deterministic hash-ordered sample (seeds = the
  √n vectors with the smallest md5(vec_id), KMEANS_ITERS Lloyd steps with
  exact-decimal means so both engines derive bit-identical centroids),
  then one broadcast-join pass assigns every vector to its nearest cell
  and probes search their NPROBE nearest cells — the classic
  inverted-file trade: recall for a |corpus|/√n scan reduction.
  (IVF as in Jégou et al., "Product Quantization for Nearest Neighbor
  Search"; k-means coarse quantizer per Lloyd — public literature.)

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
MIN_CELLS = 8  # floor on the cell count for tiny corpora
KMEANS_ITERS = 2  # fixed Lloyd refinements (determinism > convergence here)
IVF_K = 3
NPROBE = 2  # cells searched per query (the standard IVF recall lever)
# Exact-decimal accumulator for centroid means: decimal addition is
# order-independent, so Spark and DuckDB derive bit-identical centroids
# regardless of partitioning (same convention as functions/aggregates.py).
_DEC = "decimal(30,9)"


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


def _n_cells(n: int) -> int:
    """√n cells (the standard IVF sizing: cell scan cost ≈ assignment cost),
    floored for tiny corpora. Double sqrt to match the SQL mirror exactly."""
    import math

    return max(MIN_CELLS, int(math.floor(math.sqrt(n))))


def _train_centroids(emb: DataFrame, k: int, dim: int) -> DataFrame:
    """Deterministic sampled k-means: seeds = k smallest md5(vec_id) (a
    uniform, reproducible sample), then KMEANS_ITERS Lloyd steps. Means use
    exact decimal sums so the result is engine- and partitioning-invariant.

    Training cost per step is one broadcast cross join (corpus × k) plus a
    k-group aggregate — the same shape Faiss uses for coarse-quantizer
    training, and embarrassingly parallel over the corpus.
    """
    md5_order = F.md5(F.col("vec_id").cast("string"))
    seeds = emb.orderBy(md5_order).limit(k)
    # row_number over the k-row seed frame only (never the corpus)
    w_seed = Window.orderBy(F.md5(F.col("vec_id").cast("string")))
    centroids = seeds.select(
        F.row_number().over(w_seed).cast("bigint").alias("cell_id"),
        F.col("embedding").cast("array<double>").alias("c_emb"),
    )
    e = F.col("embedding").cast("array<double>")
    mean_vec = F.array(
        *[
            F.sum(F.element_at(e, i + 1).cast(_DEC)).cast("double")
            / F.count(F.lit(1))
            for i in range(dim)
        ]
    )
    for _ in range(KMEANS_ITERS):
        assigned = _rank_cells(emb, centroids).filter(F.col("rn") == 1)
        centroids = assigned.groupBy("cell_id").agg(mean_vec.alias("c_emb"))
    return centroids


def _rank_cells(emb: DataFrame, centroids: DataFrame) -> DataFrame:
    """(vec_id, embedding, cell_id, cell_cos, rn): every vector's cells by
    descending cosine — one broadcast cross join, window per vector."""
    cos_c = cosine_rounded(
        F.col("c_emb"), F.col("embedding").cast("array<double>")
    )
    w_assign = Window.partitionBy("vec_id").orderBy(
        F.desc("cell_cos"), F.asc("cell_id")
    )
    return (
        emb.crossJoin(F.broadcast(centroids))
        .select("vec_id", "embedding", "cell_id", cos_c.alias("cell_cos"))
        .withColumn("rn", F.row_number().over(w_assign))
    )


def ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF search: train the coarse quantizer, assign all vectors to their
    nearest centroid (one broadcast-join pass), then each probe scans its
    NPROBE nearest cells — multi-cell probing recovers the neighbors that
    straddle a cell boundary, the standard IVF recall/cost dial.

    The corpus count / dimension lookups are metadata-scale driver reads
    (two tiny jobs) used to SIZE the plan, like AQE statistics.
    """
    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    n = emb.count()
    dim = emb.select(F.size("embedding").alias("d")).first()["d"]
    centroids = _train_centroids(emb, _n_cells(n), dim)
    ranked_cells = _rank_cells(emb, centroids)
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


IVF_SQL_DIM = 64  # test-table embedding dim; Spark introspects, SQL is static


def _ivf_sql(dim: int = IVF_SQL_DIM) -> str:
    """Mirror of ann_ivf_topk incl. quantizer training, Lloyd loop unrolled.

    Means use the identical decimal-sum-then-double-divide so centroids are
    bit-equal to Spark's; cosine is rounded to 9 decimals on both sides, so
    assignment tie-breaks agree too.
    """
    cos_assign = cosine_rounded_sql("c.c_emb", "e.embedding")
    mean_exprs = ", ".join(
        f"CAST(SUM(CAST(CAST(embedding[{j + 1}] AS DOUBLE) AS DECIMAL(30,9)))"
        f" AS DOUBLE) / COUNT(*)"
        for j in range(dim)
    )
    iters = []
    prev = "seeds"
    for i in range(1, KMEANS_ITERS + 1):
        iters.append(
            f"""a{i} AS (
  SELECT e.vec_id, e.embedding, c.cell_id,
         ROW_NUMBER() OVER (
           PARTITION BY e.vec_id
           ORDER BY {cos_assign} DESC, c.cell_id ASC) AS rn
  FROM embeddings e CROSS JOIN {prev} c
),
c{i} AS (
  SELECT cell_id, list_value({mean_exprs}) AS c_emb
  FROM a{i} WHERE rn = 1 GROUP BY cell_id
)"""
        )
        prev = f"c{i}"
    iter_sql = ",\n".join(iters)
    cos = cosine_rounded_sql("p.q_emb", "a.embedding")
    return f"""
WITH cells AS (
  SELECT GREATEST({MIN_CELLS}, CAST(FLOOR(SQRT(COUNT(*))) AS BIGINT)) AS k
  FROM embeddings
),
seeds_ranked AS (
  SELECT CAST(ROW_NUMBER() OVER (
           ORDER BY md5(CAST(vec_id AS VARCHAR))) AS BIGINT) AS cell_id,
         CAST(embedding AS DOUBLE[]) AS c_emb
  FROM embeddings
),
seeds AS (
  SELECT cell_id, c_emb FROM seeds_ranked, cells WHERE cell_id <= k
),
{iter_sql},
final AS (
  SELECT e.vec_id, e.embedding, c.cell_id,
         ROW_NUMBER() OVER (
           PARTITION BY e.vec_id
           ORDER BY {cos_assign} DESC, c.cell_id ASC) AS rn
  FROM embeddings e CROSS JOIN {prev} c
),
assigned AS (
  SELECT vec_id, embedding, cell_id FROM final WHERE rn = 1
),
probes AS (
  SELECT vec_id AS query_id, embedding AS q_emb, cell_id AS q_cell
  FROM final WHERE vec_id < {N_PROBES} AND rn <= {NPROBE}
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
