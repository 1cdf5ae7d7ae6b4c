"""Information-theoretic profile statistics + Benford's-law quality check.

Three oracle-checked operators extending the §2.A/§2.C statistics families:

- ``survey_column_entropy`` — Shannon entropy / normalized entropy / Gini
  impurity per categorical column (the selectivity-planning statistic next
  to distinct counts: two columns with equal cardinality but different skew
  have very different filter selectivities).
- ``survey_mutual_information`` — mutual information + symmetric uncertainty
  between column pairs (the categorical counterpart of
  ``survey_correlation``'s Pearson matrix; feeds FD discovery and feature
  redundancy pruning).
- ``quality_benford`` — Benford first-significant-digit conformity per
  numeric column (chi-square + Nigrini MAD), the classic fabricated-data /
  unit-mixing detector alongside the z-score/IQR/MAD outlier triad
  (reference anomaly family: ``dbsurveyor-core/src/quality/anomaly.rs``).

Cross-engine determinism follows the repo discipline: every transcendental
term is rounded at 12 decimals and summed in DECIMAL(38,12) (partition- and
order-independent), divisions happen in doubles on identical expression
trees, and final values round at the edge. First significant digits come
from C/Java-common ``%.6e`` scientific formatting — a first digit can only
change under a 9.999…→10 rounding carry, which both engines decide
identically (the tie case is not representable in binary doubles).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..catalog import load_table

# ------------------------------------------------------------------ entropy

# (table, [categorical columns]) — bounded-cardinality survey targets.
_ENTROPY_COLS: dict[str, list[str]] = {
    "lineitem": ["l_returnflag", "l_linestatus"],
    "orders": ["o_orderstatus", "o_orderpriority"],
    "customer": ["c_mktsegment"],
    "documents": ["lang", "source"],
}

_TERM_DEC = "decimal(38,12)"


def survey_column_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-column Shannon entropy (nats), normalized entropy and Gini
    impurity for the pinned categorical columns.

    Plan: per table ONE unpivot projection (inline array of structs —
    map-side, fan-out bounded by the column count) → one
    groupBy(table, column, value) with map-side partial counts (agg state
    bounded by Σ per-column distincts) → all entropy arithmetic runs over
    the bounded counts frame, never the data. Entropy terms
    −(c/n)·ln(c/n) round at 12 and sum in DECIMAL; Gini uses exact
    Σc² in DECIMAL(38,0) (c² overflows int64 at 100 TB row counts), so
    both engines agree bit-for-bit.

    Reference analog: extends `adapters/postgres/batch_collection.rs`
    sampled statistics (catalogs expose n_distinct; entropy/Gini are the
    skew-aware upgrades an optimizer actually wants).
    """
    per_table = []
    for tbl, cols in _ENTROPY_COLS.items():
        df = load_table(spark, sf_dir, tbl)
        per_table.append(
            df.select(
                F.explode(
                    F.array(
                        *[
                            F.struct(
                                F.lit(tbl).alias("table_name"),
                                F.lit(c).alias("column_name"),
                                F.col(c).cast("string").alias("value"),
                            )
                            for c in cols
                        ]
                    )
                ).alias("p")
            ).select("p.*")
        )
    pairs = per_table[0]
    for other in per_table[1:]:
        pairs = pairs.unionByName(other)
    counts = pairs.groupBy("table_name", "column_name", "value").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    w = Window.partitionBy("table_name", "column_name")
    c = F.col("cnt").cast("double")
    n = F.col("n").cast("double")
    enriched = counts.withColumn("n", F.sum("cnt").over(w)).select(
        "table_name",
        "column_name",
        "cnt",
        "n",
        F.round(-(c / n) * F.log(c / n), 12).cast(_TERM_DEC).alias("h_term"),
        (F.col("cnt").cast("decimal(38,0)") * F.col("cnt")).alias("cnt_sq"),
    )
    agg = enriched.groupBy("table_name", "column_name").agg(
        F.max("n").cast("bigint").alias("n_rows"),
        F.count(F.lit(1)).cast("bigint").alias("distinct_vals"),
        F.sum("h_term").cast("double").alias("h"),
        F.sum("cnt_sq").cast("double").alias("sumsq"),
    )
    nr = F.col("n_rows").cast("double")
    dv = F.col("distinct_vals").cast("double")
    return agg.select(
        "table_name",
        "column_name",
        "n_rows",
        "distinct_vals",
        F.round(F.col("h"), 9).alias("entropy_nats"),
        F.round(
            F.when(F.col("distinct_vals") > 1, F.col("h") / F.log(dv)).otherwise(
                F.lit(0.0)
            ),
            9,
        ).alias("norm_entropy"),
        F.round(F.lit(1.0) - F.col("sumsq") / (nr * nr), 9).alias(
            "gini_impurity"
        ),
    )


def _entropy_sql() -> str:
    unpivots = []
    for tbl, cols in _ENTROPY_COLS.items():
        for c in cols:
            unpivots.append(
                f"SELECT '{tbl}' AS table_name, '{c}' AS column_name, "
                f"CAST({c} AS VARCHAR) AS value FROM {tbl}"
            )
    pairs = "\nUNION ALL\n".join(unpivots)
    return f"""
WITH pairs AS ({pairs}),
counts AS (
  SELECT table_name, column_name, value, CAST(count(*) AS BIGINT) AS cnt
  FROM pairs GROUP BY table_name, column_name, value
),
en AS (
  SELECT table_name, column_name, cnt,
         CAST(SUM(cnt) OVER (PARTITION BY table_name, column_name) AS DOUBLE) AS n,
         CAST(cnt AS DECIMAL(38,0)) * cnt AS cnt_sq
  FROM counts
),
terms AS (
  SELECT table_name, column_name, cnt, n, cnt_sq,
         CAST(ROUND(-(CAST(cnt AS DOUBLE) / n) * LN(CAST(cnt AS DOUBLE) / n), 12)
              AS DECIMAL(38,12)) AS h_term
  FROM en
),
agg AS (
  SELECT table_name, column_name,
         CAST(MAX(n) AS BIGINT) AS n_rows,
         CAST(COUNT(*) AS BIGINT) AS distinct_vals,
         CAST(SUM(h_term) AS DOUBLE) AS h,
         CAST(SUM(cnt_sq) AS DOUBLE) AS sumsq
  FROM terms GROUP BY table_name, column_name
)
SELECT table_name, column_name, n_rows, distinct_vals,
  ROUND(h, 9) AS entropy_nats,
  ROUND(CASE WHEN distinct_vals > 1
             THEN h / LN(CAST(distinct_vals AS DOUBLE)) ELSE 0.0 END, 9)
    AS norm_entropy,
  ROUND(1.0 - sumsq / (CAST(n_rows AS DOUBLE) * CAST(n_rows AS DOUBLE)), 9)
    AS gini_impurity
FROM agg
"""


# ------------------------------------------------------- mutual information

# (table, col_x, col_y) pairs — the categorical-dependency survey targets.
_MI_PAIRS: list[tuple[str, str, str]] = [
    ("lineitem", "l_returnflag", "l_linestatus"),
    ("orders", "o_orderstatus", "o_orderpriority"),
    ("documents", "lang", "source"),
]


def survey_mutual_information(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mutual information I(X;Y) (nats), marginal entropies, and symmetric
    uncertainty 2·I/(H(X)+H(Y)) for the pinned categorical column pairs —
    the categorical analog of the Pearson matrix (``survey_correlation``)
    and the soft generalization of exact FD discovery
    (``survey_fd_inference``: A→B holds exactly iff I(A;B) = H(B)).

    Plan per pair: ONE data-sized groupBy(x, y) joint-count aggregate
    (map-side combinable, state bounded by |X|·|Y|); marginals, entropies
    and MI all derive from that bounded frame with decimal-summed rounded
    terms — no second scan, no data-sized shuffle beyond the joint agg.
    """
    outs = []
    for tbl, cx, cy in _MI_PAIRS:
        df = load_table(spark, sf_dir, tbl)
        joint = df.groupBy(
            F.col(cx).cast("string").alias("x"),
            F.col(cy).cast("string").alias("y"),
        ).agg(F.count(F.lit(1)).alias("cxy"))
        wall = Window.partitionBy()
        wx = Window.partitionBy("x")
        wy = Window.partitionBy("y")
        en = joint.select(
            "x",
            "y",
            "cxy",
            F.sum("cxy").over(wall).alias("n"),
            F.sum("cxy").over(wx).alias("cx"),
            F.sum("cxy").over(wy).alias("cy"),
        )
        d = lambda col: F.col(col).cast("double")  # noqa: E731
        mi_term = F.round(
            (d("cxy") / d("n"))
            * F.log(d("n") * d("cxy") / (d("cx") * d("cy"))),
            12,
        ).cast(_TERM_DEC)
        # marginal-entropy terms must count once per distinct x (resp. y):
        # gate them on the first row of each marginal partition.
        rx = F.row_number().over(wx.orderBy("y"))
        ry = F.row_number().over(wy.orderBy("x"))
        hx_term = F.when(
            rx == 1,
            F.round(-(d("cx") / d("n")) * F.log(d("cx") / d("n")), 12),
        ).otherwise(F.lit(0.0)).cast(_TERM_DEC)
        hy_term = F.when(
            ry == 1,
            F.round(-(d("cy") / d("n")) * F.log(d("cy") / d("n")), 12),
        ).otherwise(F.lit(0.0)).cast(_TERM_DEC)
        one = (
            en.select(
                F.col("n"),
                mi_term.alias("mi_term"),
                hx_term.alias("hx_term"),
                hy_term.alias("hy_term"),
            )
            .groupBy()
            .agg(
                F.max("n").cast("bigint").alias("n_rows"),
                F.sum("mi_term").cast("double").alias("mi"),
                F.sum("hx_term").cast("double").alias("hx"),
                F.sum("hy_term").cast("double").alias("hy"),
            )
            .select(
                F.lit(tbl).alias("table_name"),
                F.lit(cx).alias("col_x"),
                F.lit(cy).alias("col_y"),
                "n_rows",
                F.round("mi", 9).alias("mi_nats"),
                F.round("hx", 9).alias("entropy_x"),
                F.round("hy", 9).alias("entropy_y"),
                F.round(
                    F.when(
                        (F.col("hx") + F.col("hy")) > 0,
                        F.lit(2.0) * F.col("mi") / (F.col("hx") + F.col("hy")),
                    ).otherwise(F.lit(0.0)),
                    9,
                ).alias("symmetric_uncertainty"),
            )
        )
        outs.append(one)
    res = outs[0]
    for other in outs[1:]:
        res = res.unionByName(other)
    return res


def _mi_sql() -> str:
    parts = []
    for tbl, cx, cy in _MI_PAIRS:
        parts.append(f"""
SELECT '{tbl}' AS table_name, '{cx}' AS col_x, '{cy}' AS col_y,
       n_rows, ROUND(mi, 9) AS mi_nats, ROUND(hx, 9) AS entropy_x,
       ROUND(hy, 9) AS entropy_y,
       ROUND(CASE WHEN hx + hy > 0 THEN 2.0 * mi / (hx + hy)
                  ELSE 0.0 END, 9) AS symmetric_uncertainty
FROM (
  WITH joint AS (
    SELECT CAST({cx} AS VARCHAR) AS x, CAST({cy} AS VARCHAR) AS y,
           CAST(count(*) AS BIGINT) AS cxy
    FROM {tbl} GROUP BY 1, 2
  ),
  en AS (
    SELECT x, y, cxy,
           SUM(cxy) OVER () AS n,
           SUM(cxy) OVER (PARTITION BY x) AS cx,
           SUM(cxy) OVER (PARTITION BY y) AS cy,
           row_number() OVER (PARTITION BY x ORDER BY y) AS rx,
           row_number() OVER (PARTITION BY y ORDER BY x) AS ry
    FROM joint
  )
  SELECT CAST(MAX(n) AS BIGINT) AS n_rows,
    CAST(SUM(CAST(ROUND((CAST(cxy AS DOUBLE) / CAST(n AS DOUBLE))
      * LN(CAST(n AS DOUBLE) * CAST(cxy AS DOUBLE)
           / (CAST(cx AS DOUBLE) * CAST(cy AS DOUBLE))), 12)
      AS DECIMAL(38,12))) AS DOUBLE) AS mi,
    CAST(SUM(CAST(CASE WHEN rx = 1 THEN
      ROUND(-(CAST(cx AS DOUBLE) / CAST(n AS DOUBLE))
        * LN(CAST(cx AS DOUBLE) / CAST(n AS DOUBLE)), 12) ELSE 0.0 END
      AS DECIMAL(38,12))) AS DOUBLE) AS hx,
    CAST(SUM(CAST(CASE WHEN ry = 1 THEN
      ROUND(-(CAST(cy AS DOUBLE) / CAST(n AS DOUBLE))
        * LN(CAST(cy AS DOUBLE) / CAST(n AS DOUBLE)), 12) ELSE 0.0 END
      AS DECIMAL(38,12))) AS DOUBLE) AS hy
  FROM en
) t""")
    return "\nUNION ALL\n".join(parts)


# ------------------------------------------------------------------ Benford

# (table, numeric column) — positive-valued measures to conformity-check.
_BENFORD_COLS: list[tuple[str, str]] = [
    ("orders", "o_totalprice"),
    ("lineitem", "l_extendedprice"),
    ("events", "value"),
]

# Nigrini's first-digit MAD conformity ceiling (mean absolute deviation of
# digit shares from Benford expectation; < 0.015 = acceptable conformity).
BENFORD_MAD_MAX = 0.015


def quality_benford(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford first-significant-digit conformity per numeric column:
    chi-square statistic, Nigrini MAD, and a conforms flag — the classic
    fabricated-data / unit-mixing / truncation detector that value-level
    outlier checks (z-score/IQR/MAD triad) cannot see, because Benford
    violations are DISTRIBUTIONAL, not individual rows.

    Plan per column: pruned scan → map-side first-digit extraction
    (C/Java-common ``%.6e`` formatting, see module docstring) → 9-bucket
    groupBy (agg state = 9 rows) → right-join onto the digit spine so
    zero-count digits surface → all χ²/MAD arithmetic on the 9-row frame.
    The digit histogram is map-side combinable; nothing data-sized
    shuffles.

    TPC-H-style uniform prices genuinely do NOT conform (the flag is
    doing its job); multi-order-of-magnitude measures do.
    """
    outs = []
    for tbl, col in _BENFORD_COLS:
        df = load_table(spark, sf_dir, tbl)
        y = F.abs(F.col(col).cast("double"))
        digits = (
            df.filter(F.col(col).isNotNull() & (y > 0))
            .select(
                F.substring(F.format_string("%.6e", y), 1, 1)
                .cast("int")
                .alias("d")
            )
            .groupBy("d")
            .agg(F.count(F.lit(1)).alias("cnt"))
        )
        spine = spark.range(1, 10).select(F.col("id").cast("int").alias("d"))
        full = spine.join(digits, "d", "left").select(
            "d", F.coalesce("cnt", F.lit(0)).alias("cnt")
        )
        wall = Window.partitionBy()
        dd = F.col("d").cast("double")
        p = F.log(F.lit(1.0) + F.lit(1.0) / dd) / F.log(F.lit(10.0))
        en = full.withColumn("n", F.sum("cnt").over(wall)).select(
            "cnt",
            "n",
            (F.col("cnt").cast("double") / F.col("n").cast("double")).alias(
                "share"
            ),
            p.alias("p"),
        )
        chi_term = F.round(
            (F.col("share") - F.col("p"))
            * (F.col("share") - F.col("p"))
            / F.col("p"),
            12,
        ).cast(_TERM_DEC)
        mad_term = F.round(F.abs(F.col("share") - F.col("p")), 12).cast(
            _TERM_DEC
        )
        one = (
            en.select(
                "n", chi_term.alias("chi_term"), mad_term.alias("mad_term")
            )
            .groupBy()
            .agg(
                F.max("n").cast("bigint").alias("n_values"),
                F.sum("chi_term").cast("double").alias("chi_sum"),
                F.sum("mad_term").cast("double").alias("mad_sum"),
            )
            .select(
                F.lit(tbl).alias("table_name"),
                F.lit(col).alias("column_name"),
                "n_values",
                F.round(
                    F.col("n_values").cast("double") * F.col("chi_sum"), 6
                ).alias("chi_square"),
                F.round(F.col("mad_sum") / F.lit(9.0), 6).alias("mad"),
                (F.col("mad_sum") / F.lit(9.0) < BENFORD_MAD_MAX).alias(
                    "conforms"
                ),
            )
        )
        outs.append(one)
    res = outs[0]
    for other in outs[1:]:
        res = res.unionByName(other)
    return res


def _benford_sql() -> str:
    parts = []
    for tbl, col in _BENFORD_COLS:
        parts.append(f"""
SELECT '{tbl}' AS table_name, '{col}' AS column_name, n_values,
       ROUND(CAST(n_values AS DOUBLE) * chi_sum, 6) AS chi_square,
       ROUND(mad_sum / 9.0, 6) AS mad,
       (mad_sum / 9.0 < {BENFORD_MAD_MAX}) AS conforms
FROM (
  WITH digits AS (
    SELECT CAST(SUBSTRING(printf('%.6e', ABS(CAST({col} AS DOUBLE))), 1, 1)
                AS INTEGER) AS d,
           CAST(count(*) AS BIGINT) AS cnt
    FROM {tbl}
    WHERE {col} IS NOT NULL AND ABS(CAST({col} AS DOUBLE)) > 0
    GROUP BY 1
  ),
  spine AS (SELECT UNNEST(range(1, 10)) AS d),
  full_hist AS (
    SELECT s.d, COALESCE(g.cnt, 0) AS cnt
    FROM spine s LEFT JOIN digits g ON s.d = g.d
  ),
  en AS (
    SELECT cnt, SUM(cnt) OVER () AS n,
           CAST(cnt AS DOUBLE) / CAST(SUM(cnt) OVER () AS DOUBLE) AS share,
           LN(1.0 + 1.0 / CAST(d AS DOUBLE)) / LN(10.0) AS p
    FROM full_hist
  )
  SELECT CAST(MAX(n) AS BIGINT) AS n_values,
    CAST(SUM(CAST(ROUND((share - p) * (share - p) / p, 12)
             AS DECIMAL(38,12))) AS DOUBLE) AS chi_sum,
    CAST(SUM(CAST(ROUND(ABS(share - p), 12)
             AS DECIMAL(38,12))) AS DOUBLE) AS mad_sum
  FROM en
) t""")
    return "\nUNION ALL\n".join(parts)


QUERIES = {
    "survey_column_entropy": survey_column_entropy,
    "survey_mutual_information": survey_mutual_information,
    "quality_benford": quality_benford,
}

ORACLES = {
    "survey_column_entropy": _entropy_sql(),
    "survey_mutual_information": _mi_sql(),
    "quality_benford": _benford_sql(),
}
