"""Deterministic data-sketch operators (SURVEY §2.A+): Count-Min heavy
hitters and Bloom-filter membership — the two workhorse sketches next to the
HLL distinct-count path (`survey_profile_approx`).

Unlike HLL (whose estimates can't hash-match an exact oracle), both sketches
here are DETERMINISTIC given the hash family, so the DuckDB oracle replays
the exact same construction bit-for-bit: md5-derived bucket/bit positions
(functions/hashing.py), identical in both engines. The correctness gate
therefore checks the sketch MACHINERY (hashing, bucketing, min/all-bits
estimation), not just row counts.

Scale notes: the Count-Min sketch is additive, so it builds from any
partial-count frame with map-side combine (agg state = d×w counters); the
Bloom filter materializes as a distinct bit-POSITION frame (≤ M rows, the
relational encoding of the bitmap) broadcast to the probe side — exactly the
runtime-filter / semi-join-pruning pattern engines use for dynamic partition
pruning, expressed as data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..functions.hashing import portable_hash64, portable_hash64_sql

# Count-Min geometry: d independent hash rows × w buckets. With the ~2k-20k
# part keys of the test lake, w=256 forces real collisions so the
# overestimate property is exercised, not vacuous.
CM_D = 4
CM_W = 256
CM_TOP_K = 10

# Bloom geometry: k bit positions per member over an m-bit space.
BLOOM_K = 3
BLOOM_M = 4096


def sketch_cm_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-Min heavy hitters over lineitem part keys: the top-K most
    frequent keys with their TRUE count, the CM estimate, and the
    overestimate (always ≥ 0 — CM never undercounts; Cormode &
    Muthukrishnan 2005). The sketch is the bounded-memory frequency
    structure for unbounded key spaces (d×w counters regardless of
    cardinality); the exact pass here doubles as ground truth so the gate
    PROVES the one-sided error bound instead of assuming it.

    Build exploits CM's additivity: one exact groupBy(key) pass (needed
    for ground truth anyway) → the sketch aggregates the count frame into
    d×w cells (map-side combinable; a pure-sketch deployment would feed
    raw rows through the same d-way expansion and never hold per-key
    state). Estimation is min over the key's d cells.
    """
    lines = load_table(spark, sf_dir, "lineitem").select("l_partkey")
    counts = lines.groupBy("l_partkey").agg(
        F.count(F.lit(1)).cast("bigint").alias("true_count")
    )
    cells = counts.select(
        "true_count",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).alias("j"),
                        (
                            portable_hash64(
                                F.concat(
                                    F.lit(f"cm{j}_"),
                                    F.col("l_partkey").cast("string"),
                                )
                            )
                            % CM_W
                        ).alias("bucket"),
                    )
                    for j in range(CM_D)
                ]
            )
        ).alias("c"),
    ).select("true_count", "c.j", "c.bucket")
    sketch = cells.groupBy("j", "bucket").agg(
        F.sum("true_count").cast("bigint").alias("cell")
    )
    top = (
        counts.orderBy(F.desc("true_count"), F.asc("l_partkey"))
        .limit(CM_TOP_K)
        .select("l_partkey", "true_count")
    )
    probes = top.select(
        "l_partkey",
        "true_count",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(j).alias("j"),
                        (
                            portable_hash64(
                                F.concat(
                                    F.lit(f"cm{j}_"),
                                    F.col("l_partkey").cast("string"),
                                )
                            )
                            % CM_W
                        ).alias("bucket"),
                    )
                    for j in range(CM_D)
                ]
            )
        ).alias("c"),
    ).select("l_partkey", "true_count", "c.j", "c.bucket")
    return (
        probes.join(F.broadcast(sketch), ["j", "bucket"])
        .groupBy("l_partkey", "true_count")
        .agg(F.min("cell").cast("bigint").alias("cm_estimate"))
        .select(
            "l_partkey",
            "true_count",
            "cm_estimate",
            (F.col("cm_estimate") - F.col("true_count")).alias("overestimate"),
        )
    )


def _cm_sql() -> str:
    def bucket(j: int) -> str:
        return (
            portable_hash64_sql(f"'cm{j}_' || CAST(l_partkey AS VARCHAR)")
            + f" % {CM_W}"
        )

    cell_rows = "\nUNION ALL\n".join(
        f"SELECT true_count, {j} AS j, {bucket(j)} AS bucket FROM counts"
        for j in range(CM_D)
    )
    probe_rows = "\nUNION ALL\n".join(
        f"SELECT l_partkey, true_count, {j} AS j, {bucket(j)} AS bucket FROM top"
        for j in range(CM_D)
    )
    return f"""
WITH counts AS (
  SELECT l_partkey, CAST(COUNT(*) AS BIGINT) AS true_count
  FROM lineitem GROUP BY l_partkey
),
cells AS ({cell_rows}),
sketch AS (
  SELECT j, bucket, CAST(SUM(true_count) AS BIGINT) AS cell
  FROM cells GROUP BY j, bucket
),
top AS (
  SELECT l_partkey, true_count FROM counts
  ORDER BY true_count DESC, l_partkey ASC LIMIT {CM_TOP_K}
),
probes AS ({probe_rows})
SELECT p.l_partkey, p.true_count,
       CAST(MIN(s.cell) AS BIGINT) AS cm_estimate,
       CAST(MIN(s.cell) AS BIGINT) - p.true_count AS overestimate
FROM probes p JOIN sketch s ON s.j = p.j AND s.bucket = p.bucket
GROUP BY p.l_partkey, p.true_count
"""


def sketch_bloom_membership(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter membership probe — the runtime-filter / semi-join-
    pruning pattern (dynamic partition pruning, join pre-filters) expressed
    as data: BUILDING-segment customers form the filter (k md5-derived bit
    positions each, materialized as the ≤ M-row distinct bit-position
    frame — the relational encoding of the bitmap), then EVERY customer
    probes it. Emits (custkey, in_set, bloom_pass): no false negatives by
    construction (the gate proves it), false positives measurable at the
    chosen k/M.

    Plan: the bit frame is bounded by M and broadcast; the probe side is
    one scan expanded ×k with a left join + per-key AND — the big side
    never shuffles, exactly why engines ship this pattern.
    """
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment"
    )

    def positions(key_col):
        return [
            portable_hash64(
                F.concat(F.lit(f"bf{i}_"), key_col.cast("string"))
            )
            % BLOOM_M
            for i in range(BLOOM_K)
        ]

    members = cust.filter(F.col("c_mktsegment") == "BUILDING")
    bits = (
        members.select(
            F.explode(F.array(*positions(F.col("c_custkey")))).alias("pos")
        )
        .distinct()
        .withColumn("hit", F.lit(1))
    )
    probe_pos = cust.select(
        "c_custkey",
        (F.col("c_mktsegment") == "BUILDING").alias("in_set"),
        F.explode(F.array(*positions(F.col("c_custkey")))).alias("pos"),
    )
    return (
        probe_pos.join(F.broadcast(bits), "pos", "left")
        .groupBy("c_custkey", "in_set")
        .agg((F.min(F.coalesce(F.col("hit"), F.lit(0))) == 1).alias("bloom_pass"))
    )


def _bloom_sql() -> str:
    def pos(i: int) -> str:
        return (
            portable_hash64_sql(f"'bf{i}_' || CAST(c_custkey AS VARCHAR)")
            + f" % {BLOOM_M}"
        )

    member_bits = "\nUNION ALL\n".join(
        f"SELECT {pos(i)} AS pos FROM customer WHERE c_mktsegment = 'BUILDING'"
        for i in range(BLOOM_K)
    )
    probe_rows = "\nUNION ALL\n".join(
        f"SELECT c_custkey, c_mktsegment = 'BUILDING' AS in_set, {pos(i)} AS pos "
        "FROM customer"
        for i in range(BLOOM_K)
    )
    return f"""
WITH bits AS (SELECT DISTINCT pos, 1 AS hit FROM ({member_bits})),
probes AS ({probe_rows})
SELECT p.c_custkey, p.in_set,
       (MIN(COALESCE(b.hit, 0)) = 1) AS bloom_pass
FROM probes p LEFT JOIN bits b ON b.pos = p.pos
GROUP BY p.c_custkey, p.in_set
"""




# ------------------------------------------------------------ KMV distinct

KMV_K = 64
KMV_SPACE = float(1 << 60)  # portable_hash64 range


def sketch_kmv_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K-minimum-values distinct-count estimation (Bar-Yossef et al. 2002)
    per column: keep the K smallest distinct hash values; if the K-th
    smallest normalized hash is R, the estimate is (K−1)/R. This is the
    ORACLE-CHECKABLE member of the approx-distinct family — unlike HLL
    (`survey_profile_approx`, rows-only by construction), KMV over a
    deterministic hash replays bit-for-bit in both engines, so the gate
    checks the sketch machinery itself. Exact distinct rides along so the
    row also PROVES the estimator's accuracy.

    Plan per column: pruned scan → hash → distinct-hash dedup (one
    map-side-combinable shuffle; at 100 TB the production variant keeps a
    bounded K-heap per partition instead — same result, no dedup shuffle)
    → TakeOrderedAndProject for the K minima → 1-row arithmetic.
    """
    targets = [
        ("lineitem", "l_partkey"),
        ("lineitem", "l_suppkey"),
        ("orders", "o_custkey"),
    ]
    outs = []
    for tbl, col in targets:
        vals = (
            load_table(spark, sf_dir, tbl)
            .select(F.col(col))
            .filter(F.col(col).isNotNull())
        )
        hashes = vals.select(portable_hash64(F.col(col)).alias("h")).distinct()
        kth = (
            hashes.orderBy("h")
            .limit(KMV_K)
            .agg(
                F.count(F.lit(1)).cast("bigint").alias("k_seen"),
                F.max("h").alias("kth_hash"),
            )
        )
        exact = vals.agg(
            F.count_distinct(F.col(col)).cast("bigint").alias("exact_distinct")
        )
        est = F.when(
            F.col("k_seen") < KMV_K,
            # fewer than K distinct values: the sketch IS the exact count
            F.col("k_seen").cast("double"),
        ).otherwise(
            F.lit(float(KMV_K - 1))
            / (F.col("kth_hash").cast("double") / F.lit(KMV_SPACE))
        )
        outs.append(
            kth.join(F.broadcast(exact)).select(
                F.lit(tbl).alias("table_name"),
                F.lit(col).alias("column_name"),
                "exact_distinct",
                F.round(est, 6).alias("kmv_estimate"),
                F.round(
                    F.abs(est - F.col("exact_distinct").cast("double"))
                    / F.col("exact_distinct").cast("double"),
                    6,
                ).alias("rel_error"),
            )
        )
    res = outs[0]
    for o in outs[1:]:
        res = res.unionByName(o)
    return res


def _kmv_sql() -> str:
    parts = []
    for tbl, col in [
        ("lineitem", "l_partkey"),
        ("lineitem", "l_suppkey"),
        ("orders", "o_custkey"),
    ]:
        h = portable_hash64_sql(col)
        parts.append(f"""
SELECT '{tbl}' AS table_name, '{col}' AS column_name, exact_distinct,
  ROUND(CASE WHEN k_seen < {KMV_K} THEN CAST(k_seen AS DOUBLE)
             ELSE {float(KMV_K - 1)}
                  / (CAST(kth_hash AS DOUBLE) / {KMV_SPACE}) END, 6)
    AS kmv_estimate,
  ROUND(ABS(CASE WHEN k_seen < {KMV_K} THEN CAST(k_seen AS DOUBLE)
                 ELSE {float(KMV_K - 1)}
                      / (CAST(kth_hash AS DOUBLE) / {KMV_SPACE}) END
            - CAST(exact_distinct AS DOUBLE))
        / CAST(exact_distinct AS DOUBLE), 6) AS rel_error
FROM (
  SELECT CAST(COUNT(*) AS BIGINT) AS k_seen, MAX(h) AS kth_hash
  FROM (
    SELECT DISTINCT {h} AS h FROM {tbl} WHERE {col} IS NOT NULL
    ORDER BY h LIMIT {KMV_K}
  )
) CROSS JOIN (
  SELECT CAST(COUNT(DISTINCT {col}) AS BIGINT) AS exact_distinct
  FROM {tbl} WHERE {col} IS NOT NULL
)""")
    return "\nUNION ALL\n".join(parts)


# ------------------------------------------------------- theta set ops

THETA_K = 64
THETA_SPACE_I = 1 << 60  # portable_hash64 range, exact int (2^60)


def sketch_theta_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theta-sketch SET OPERATIONS (union / intersection / difference
    cardinality estimates between two key sets) — the cross-period /
    cross-tenant distinct-overlap question ("how many of last year's
    customers came back?") answered from two bounded K-row sketches
    instead of a distinct-join of both full key sets. KMV
    (`sketch_kmv_distinct`) estimates ONE set's cardinality; the theta
    framework (Dasgupta et al., "Theta Sketch Framework", 2016 — the
    DataSketches model) composes sketches: with θ = min(θ_A, θ_B), every
    retained hash < θ is a uniform sample of the underlying set, so
    |A∘B| ≈ |{h ∈ sketch_A ∘ sketch_B : h < θ}| / θ for ∘ ∈
    {∪, ∩, \\}. The difference estimate is sound because sketch_B contains
    ALL of B's hashes below θ_B ≥ θ — membership below θ is decidable
    from the sketch alone.

    Sets: customers who ordered in 1995 (A) vs 1996 (B). Exact counts
    ride along, so the gate proves the estimator, not just row counts.

    Plan: each sketch is one pruned scan → distinct-hash dedup →
    TakeOrderedAndProject(K); all set arithmetic then runs on two ≤K-row
    frames (broadcast joins, metadata-scale). At 100 TB the sketches are
    additionally MERGEABLE (union-of-sketches = sketch-of-union), so
    per-partition/per-day sketches roll up without touching raw keys
    again. All hashing is md5-derived, so the DuckDB oracle replays the
    exact construction bit-for-bit.
    """

    def sketch(year: int) -> DataFrame:
        keys = (
            load_table(spark, sf_dir, "orders")
            .filter(F.year("o_orderdate") == year)
            .select(portable_hash64(F.col("o_custkey")).alias("h"))
            .distinct()
        )
        return keys.orderBy("h").limit(THETA_K)

    from ..plans.cache import release_caches, tracked_cache

    release_caches()
    sk_a = tracked_cache(sketch(1995))
    sk_b = tracked_cache(sketch(1996))

    def theta_h(sk: DataFrame) -> DataFrame:
        # θ in hash units: the K-th smallest hash when saturated, else the
        # full space (an unsaturated sketch retains everything → exact).
        return sk.agg(
            F.when(
                F.count(F.lit(1)) == THETA_K, F.max("h")
            )
            .otherwise(F.lit(THETA_SPACE_I).cast("bigint"))
            .alias("th")
        )

    thetas = (
        theta_h(sk_a)
        .withColumnRenamed("th", "th_a")
        .crossJoin(theta_h(sk_b))
        .select(F.least("th_a", "th").alias("theta_h"))
    )

    a_ret = sk_a.crossJoin(F.broadcast(thetas)).filter(F.col("h") < F.col("theta_h"))
    b_ret = sk_b.crossJoin(F.broadcast(thetas)).filter(F.col("h") < F.col("theta_h"))
    n_union = (
        a_ret.select("h")
        .union(b_ret.select("h"))
        .distinct()
        .agg(F.count(F.lit(1)).cast("bigint").alias("retained"))
    )
    n_inter = (
        a_ret.join(sk_b, "h", "left_semi")
        .agg(F.count(F.lit(1)).cast("bigint").alias("retained"))
    )
    n_diff = (
        a_ret.join(sk_b, "h", "left_anti")
        .agg(F.count(F.lit(1)).cast("bigint").alias("retained"))
    )

    def keys_of(year: int) -> DataFrame:
        return (
            load_table(spark, sf_dir, "orders")
            .filter(F.year("o_orderdate") == year)
            .select("o_custkey")
            .distinct()
        )

    ka, kb = keys_of(1995), keys_of(1996)
    exacts = {
        "union": ka.union(kb).distinct(),
        "intersection": ka.join(kb, "o_custkey", "left_semi"),
        "a_only": ka.join(kb, "o_custkey", "left_anti"),
    }
    retained = {"union": n_union, "intersection": n_inter, "a_only": n_diff}

    outs = []
    for op in ("union", "intersection", "a_only"):
        ex = exacts[op].agg(
            F.count(F.lit(1)).cast("bigint").alias("exact_count")
        )
        est = (
            F.col("retained").cast("double")
            * F.lit(float(THETA_SPACE_I))
            / F.col("theta_h").cast("double")
        )
        outs.append(
            retained[op]
            .crossJoin(F.broadcast(thetas))
            .crossJoin(F.broadcast(ex))
            .select(
                F.lit(op).alias("set_op"),
                "exact_count",
                "retained",
                F.round(est, 4).alias("theta_estimate"),
                F.round(
                    F.abs(est - F.col("exact_count").cast("double"))
                    / F.col("exact_count").cast("double"),
                    4,
                ).alias("rel_error"),
            )
        )
    res = outs[0]
    for o in outs[1:]:
        res = res.unionByName(o)
    return res


def _theta_sql() -> str:
    h = portable_hash64_sql("o_custkey")
    space = float(THETA_SPACE_I)
    ops = {
        "union": "SELECT h FROM a_ret UNION SELECT h FROM b_ret",
        "intersection": "SELECT h FROM a_ret WHERE h IN (SELECT h FROM sk_b)",
        "a_only": "SELECT h FROM a_ret WHERE h NOT IN (SELECT h FROM sk_b)",
    }
    exacts = {
        "union": "SELECT o_custkey FROM keys_a UNION SELECT o_custkey FROM keys_b",
        "intersection": (
            "SELECT o_custkey FROM keys_a "
            "WHERE o_custkey IN (SELECT o_custkey FROM keys_b)"
        ),
        "a_only": (
            "SELECT o_custkey FROM keys_a "
            "WHERE o_custkey NOT IN (SELECT o_custkey FROM keys_b)"
        ),
    }
    branches = "\nUNION ALL\n".join(
        f"""
SELECT '{op}' AS set_op,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM ({exacts[op]})) AS exact_count,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM ({ops[op]})) AS retained,
       ROUND(CAST((SELECT COUNT(*) FROM ({ops[op]})) AS DOUBLE) * {space}
             / (SELECT CAST(theta_h AS DOUBLE) FROM thetas), 4)
         AS theta_estimate,
       ROUND(ABS(CAST((SELECT COUNT(*) FROM ({ops[op]})) AS DOUBLE) * {space}
                 / (SELECT CAST(theta_h AS DOUBLE) FROM thetas)
                 - (SELECT CAST(COUNT(*) AS DOUBLE) FROM ({exacts[op]})))
             / (SELECT CAST(COUNT(*) AS DOUBLE) FROM ({exacts[op]})), 4)
         AS rel_error"""
        for op in ("union", "intersection", "a_only")
    )
    return f"""
WITH keys_a AS (
  SELECT DISTINCT o_custkey FROM orders WHERE year(o_orderdate) = 1995
),
keys_b AS (
  SELECT DISTINCT o_custkey FROM orders WHERE year(o_orderdate) = 1996
),
sk_a AS (
  SELECT h FROM (SELECT DISTINCT {h} AS h FROM keys_a) ORDER BY h LIMIT {THETA_K}
),
sk_b AS (
  SELECT h FROM (SELECT DISTINCT {h} AS h FROM keys_b) ORDER BY h LIMIT {THETA_K}
),
thetas AS (
  SELECT LEAST(
    (SELECT CASE WHEN COUNT(*) = {THETA_K} THEN MAX(h)
                 ELSE CAST({THETA_SPACE_I} AS BIGINT) END FROM sk_a),
    (SELECT CASE WHEN COUNT(*) = {THETA_K} THEN MAX(h)
                 ELSE CAST({THETA_SPACE_I} AS BIGINT) END FROM sk_b)
  ) AS theta_h
),
a_ret AS (SELECT h FROM sk_a WHERE h < (SELECT theta_h FROM thetas)),
b_ret AS (SELECT h FROM sk_b WHERE h < (SELECT theta_h FROM thetas))
{branches}
"""


# Sampled-quantile geometry: keep rows whose portable key-hash falls in
# one residue class (rate = 1/SQ_MOD) — deterministic, rerun-stable, and
# correlated with NOTHING in the measures (md5 of the PK).
SQ_MOD = 100
SQ_PROBS = (0.5, 0.9, 0.99)
SQ_COLS = ("l_extendedprice", "l_quantity", "l_discount")


def sketch_sampled_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantile ESTIMATION from a deterministic hash sample, accuracy
    proven in-query — the quantile member of the sketch family (the role
    KLL/t-digest plays in DataSketches; `survey_numeric_quantiles`
    documents `approx_percentile` as the built-in path, this op MEASURES
    what sampling costs): per measure column, p50/p90/p99 from a 1%
    hash-Bernoulli row sample next to the exact full-data quantiles, with
    relative errors. The `join_size_estimate` doctrine applied to
    order statistics — at 100 TB you estimate from the sample; this
    operator is the calibration table that says how far off that is.

    Plan: ONE aggregate over one scan computes both sides — the sample
    quantile is `percentile(CASE WHEN sampled THEN x END)` (percentile
    ignores NULLs in both engines), so no second pass and no shuffle
    beyond the 1-row agg exchange. Exact percentile ↔ quantile_cont
    parity and the round-6-dp edge are the established conventions.
    """
    df = load_table(spark, sf_dir, "lineitem").select(
        *SQ_COLS,
        (
            portable_hash64(
                F.concat_ws(
                    "_",
                    F.col("l_orderkey").cast("string"),
                    F.col("l_linenumber").cast("string"),
                )
            )
            % SQ_MOD
            == 0
        ).alias("__in_sample"),
    )
    probs = F.array(*[F.lit(p) for p in SQ_PROBS])
    aggs = [
        F.sum(F.when(F.col("__in_sample"), 1).otherwise(0))
        .cast("bigint")
        .alias("__n_sample")
    ]
    for c in SQ_COLS:
        x = F.col(c).cast("double")
        aggs.append(F.percentile(x, probs).alias(f"{c}__exact"))
        aggs.append(
            F.percentile(
                F.when(F.col("__in_sample"), x), probs
            ).alias(f"{c}__samp")
        )
    one = df.agg(*aggs)
    entries = []
    for c in SQ_COLS:
        for i, p in enumerate(SQ_PROBS):
            ex = F.col(f"{c}__exact")[i]
            sa = F.col(f"{c}__samp")[i]
            entries.append(
                F.struct(
                    F.lit(c).alias("column_name"),
                    F.lit(p).alias("p"),
                    F.round(ex, 6).alias("exact_q"),
                    F.round(sa, 6).alias("sample_q"),
                    F.round(
                        F.abs(sa - ex) / F.abs(F.nullif(ex, F.lit(0.0))), 6
                    ).alias("rel_error"),
                    F.col("__n_sample").alias("sample_n"),
                )
            )
    return one.select(F.inline(F.array(*entries)))


def _sampled_quantiles_sql() -> str:
    h = portable_hash64_sql(
        "CAST(l_orderkey AS VARCHAR) || '_' || CAST(l_linenumber AS VARCHAR)"
    )
    probs = ", ".join(str(p) for p in SQ_PROBS)
    cols = []
    for c in SQ_COLS:
        cols.append(
            f"quantile_cont(CAST({c} AS DOUBLE), [{probs}]) AS {c}__exact"
        )
        cols.append(
            f"quantile_cont(CASE WHEN __in_sample THEN CAST({c} AS DOUBLE) "
            f"END, [{probs}]) AS {c}__samp"
        )
    rows = []
    for c in SQ_COLS:
        for i, p in enumerate(SQ_PROBS, start=1):
            rows.append(
                f"""SELECT '{c}' AS column_name, {p} AS p,
  round({c}__exact[{i}], 6) AS exact_q,
  round({c}__samp[{i}], 6) AS sample_q,
  round(abs({c}__samp[{i}] - {c}__exact[{i}])
        / abs(NULLIF({c}__exact[{i}], 0.0)), 6) AS rel_error,
  __n_sample AS sample_n
FROM agg"""
            )
        # noqa: keep per-column ordering identical to the Spark inline
    union = "\nUNION ALL\n".join(rows)
    return f"""
WITH base AS (
  SELECT *, ({h}) % {SQ_MOD} = 0 AS __in_sample FROM lineitem
),
agg AS (
  SELECT CAST(SUM(CASE WHEN __in_sample THEN 1 ELSE 0 END) AS BIGINT)
           AS __n_sample,
         {', '.join(cols)}
  FROM base
)
{union}
"""


QUERIES = {
    "sketch_cm_heavy_hitters": sketch_cm_heavy_hitters,
    "sketch_bloom_membership": sketch_bloom_membership,
    "sketch_kmv_distinct": sketch_kmv_distinct,
    "sketch_theta_set_ops": sketch_theta_set_ops,
    "sketch_sampled_quantiles": sketch_sampled_quantiles,
}

ORACLES = {
    "sketch_cm_heavy_hitters": _cm_sql(),
    "sketch_bloom_membership": _bloom_sql(),
    "sketch_kmv_distinct": _kmv_sql(),
    "sketch_theta_set_ops": _theta_sql(),
    "sketch_sampled_quantiles": _sampled_quantiles_sql(),
}
