"""Core relational/OLAP operator queries (SURVEY.md §2.D).

These exercise the engine's scan → filter → project → aggregate → join →
window → rollup → set-op surface on the TPC-H-shaped test tables. Shapes
follow the public TPC-H specification (Q1/Q3/Q5 analogs, adapted to the
columns present in the driver-generated tables).

Scale notes (100 TB):
- region/nation are bounded-cardinality dims → explicit broadcast.
- supplier/customer/part grow with SF but stay orders of magnitude below
  lineitem; joins against lineitem shuffle on the join key and AQE handles
  skew. Broadcast is applied where cardinality is provably bounded.
- Top-N uses orderBy().limit() which Spark plans as TakeOrderedAndProject
  (per-partition heap + driver merge of N rows — no global sort).
- All float aggregates are exact-decimal (see functions/aggregates.py), so
  results are independent of partitioning and reducer order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..catalog import load_table
from ..functions.aggregates import DECIMAL_T, davg, davg_sql, dsum, dsum_sql

Q1_CUTOFF = "1998-09-02"


def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-shaped pricing summary (flagship query).

    Single-pass scan with map-side partial aggregation; the shipdate filter
    and 6-column projection both push into the parquet scan.
    """
    li = load_table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit(Q1_CUTOFF).cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum(F.col("l_quantity"), "sum_qty"),
            dsum(F.col("l_extendedprice"), "sum_base_price"),
            dsum(disc_price, "sum_disc_price"),
            dsum(charge, "sum_charge"),
            davg(F.col("l_quantity"), "avg_qty"),
            davg(F.col("l_extendedprice"), "avg_price"),
            davg(F.col("l_discount"), "avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


Q1_SQL = f"""
SELECT
  l_returnflag,
  l_linestatus,
  {dsum_sql("l_quantity", "sum_qty")},
  {dsum_sql("l_extendedprice", "sum_base_price")},
  {dsum_sql("l_extendedprice * (1 - l_discount)", "sum_disc_price")},
  {dsum_sql("l_extendedprice * (1 - l_discount) * (1 + l_tax)", "sum_charge")},
  {davg_sql("l_quantity", "avg_qty")},
  {davg_sql("l_extendedprice", "avg_price")},
  {davg_sql("l_discount", "avg_disc")},
  COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '{Q1_CUTOFF} 00:00:00'
GROUP BY l_returnflag, l_linestatus
"""


def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3-shaped: customer ⋈ orders ⋈ lineitem, revenue top-10.

    customer is pre-filtered on segment before the join (Catalyst pushes the
    filter below the join); top-10 is TakeOrderedAndProject, with o_orderkey
    as deterministic tiebreak.
    """
    cust = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-06-01").cast("timestamp")
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-06-01").cast("timestamp")
    )
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(dsum(revenue, "revenue"))
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


Q3_SQL = f"""
SELECT
  l_orderkey,
  o_orderdate,
  o_orderpriority,
  {dsum_sql("l_extendedprice * (1 - l_discount)", "revenue")}
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-06-01 00:00:00'
  AND l_shipdate > TIMESTAMP '1998-06-01 00:00:00'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, l_orderkey ASC
LIMIT 10
"""


def q5_local_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5-shaped: 6-way star join, revenue per nation.

    region and nation are bounded-size dims at every SF → explicit
    broadcast(); the lineitem⋈orders and lineitem⋈supplier joins shuffle on
    their keys (AQE skew-split enabled in the session).
    """
    region = F.broadcast(
        load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    )
    nation = F.broadcast(load_table(spark, sf_dir, "nation"))
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(
            cust,
            (orders.o_custkey == cust.c_custkey)
            & (cust.c_nationkey == supp.s_nationkey),
        )
        .join(nation, cust.c_nationkey == nation.n_nationkey)
        .join(region, nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name")
        .agg(dsum(revenue, "revenue"))
    )


Q5_SQL = f"""
SELECT
  n_name,
  {dsum_sql("l_extendedprice * (1 - l_discount)", "revenue")}
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN customer ON o_custkey = c_custkey AND c_nationkey = s_nationkey
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
GROUP BY n_name
"""


def window_top_orders_per_cust(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders per customer by total price (window row_number).

    One shuffle on o_custkey; rank filter is evaluated before any join or
    further shuffle. Tiebreak on o_orderkey keeps ranks deterministic.
    """
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return (
        orders.withColumn("rank_in_cust", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank_in_cust") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rank_in_cust")
    )


WINDOW_SQL = """
SELECT o_custkey, o_orderkey, o_totalprice, rank_in_cust
FROM (
  SELECT o_custkey, o_orderkey, o_totalprice,
         ROW_NUMBER() OVER (
           PARTITION BY o_custkey
           ORDER BY o_totalprice DESC, o_orderkey ASC
         ) AS rank_in_cust
  FROM orders
) t
WHERE rank_in_cust <= 3
"""


def rollup_sales(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP aggregation over region → nation hierarchy.

    Customer-side revenue rollup; nation/region broadcast to the fact side.
    """
    nation = F.broadcast(load_table(spark, sf_dir, "nation"))
    region = F.broadcast(load_table(spark, sf_dir, "region"))
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .join(nation, cust.c_nationkey == nation.n_nationkey)
        .join(region, nation.n_regionkey == region.r_regionkey)
        .rollup("r_name", "n_name")
        .agg(
            dsum(F.col("o_totalprice"), "total_sales"),
            F.count(F.lit(1)).alias("order_count"),
        )
    )


ROLLUP_SQL = f"""
SELECT
  r_name,
  n_name,
  {dsum_sql("o_totalprice", "total_sales")},
  COUNT(*) AS order_count
FROM orders
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY ROLLUP (r_name, n_name)
"""


def set_ops_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers with no open ('O') orders (anti-join; NOT EXISTS set-op).

    Left-anti join shuffles both sides on the key once; at scale this is the
    canonical "not exists" plan (no distinct-exchange like EXCEPT needs).
    """
    cust = load_table(spark, sf_dir, "customer")
    open_orders = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "O")
        .select("o_custkey")
    )
    return (
        cust.join(open_orders, cust.c_custkey == open_orders.o_custkey, "left_anti")
        .select("c_custkey", "c_name", "c_mktsegment")
    )


SET_OPS_SQL = """
SELECT c_custkey, c_name, c_mktsegment
FROM customer
WHERE NOT EXISTS (
  SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_orderstatus = 'O'
)
"""


def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: pure scan→filter→agg with every predicate pushed to
    the parquet reader — the canonical pushdown benchmark (zero joins, one
    exchange of a single partial-sum row)."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_discount") >= 0.03)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            dsum(F.col("l_extendedprice") * F.col("l_discount"), "revenue"),
            F.count(F.lit(1)).alias("line_count"),
        )
    )


Q6_SQL = f"""
SELECT
  {dsum_sql("l_extendedprice * l_discount", "revenue")},
  COUNT(*) AS line_count
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01'
  AND l_shipdate < TIMESTAMP '1997-01-01'
  AND l_discount BETWEEN 0.03 AND 0.07
  AND l_quantity < 24
"""


def cube_sales(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over (status, priority): all 4 grouping-set combinations in one
    pass (Spark plans one Expand + single aggregation — no re-scan per
    grouping set)."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.cube("o_orderstatus", "o_orderpriority").agg(
        dsum(F.col("o_totalprice"), "total_sales"),
        F.count(F.lit(1)).alias("order_count"),
    )


CUBE_SQL = f"""
SELECT o_orderstatus, o_orderpriority,
       {dsum_sql("o_totalprice", "total_sales")},
       COUNT(*) AS order_count
FROM orders
GROUP BY CUBE (o_orderstatus, o_orderpriority)
"""


def window_running_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-customer cumulative revenue ordered by order date — the running-
    aggregate window shape (one shuffle on the partition key; the frame is
    the default rows-unbounded-preceding via explicit spec)."""
    orders = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return orders.select(
        "o_custkey",
        "o_orderkey",
        "o_orderdate",
        F.sum(F.col("o_totalprice").cast(DECIMAL_T))
        .over(w)
        .cast("double")
        .alias("running_revenue"),
        F.row_number().over(
            Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
        ).cast("bigint").alias("order_seq"),
    )


RUNNING_SQL = """
SELECT o_custkey, o_orderkey, o_orderdate,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(30,6))) OVER (
         PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
         ROWS UNBOUNDED PRECEDING) AS DOUBLE) AS running_revenue,
       CAST(ROW_NUMBER() OVER (
         PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS BIGINT)
         AS order_seq
FROM orders
"""


def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: EXISTS correlated subquery → LEFT SEMI join.

    The semi join is the missing relational shape between inner join and
    anti join: orders qualify when ANY lineitem shipped after the order
    date (adapted predicate — the synthetic lineitem has no
    commit/receipt dates). Catalyst plans one shuffle on the order key
    with the probe side pruned to two columns; the date filter pushes to
    the orders scan. Semi-join output carries only the left side, so no
    duplicate-elimination pass is needed afterwards (the trap in the
    naive JOIN+DISTINCT rewrite, which shuffles the joined width)."""
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-07-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-10-01").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_shipdate"
    )
    return (
        orders.join(
            li,
            (orders.o_orderkey == li.l_orderkey)
            & (li.l_shipdate > orders.o_orderdate),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


Q4_SQL = """
SELECT o_orderpriority, COUNT(*) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1997-07-01'
  AND o_orderdate < TIMESTAMP '1997-10-01'
  AND EXISTS (
    SELECT 1 FROM lineitem
    WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate
  )
GROUP BY o_orderpriority
"""


Q17_BRAND = "Brand#1"


def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: correlated scalar-aggregate subquery
    (l_quantity < 0.2 · avg quantity of the same part), re-expressed
    WITHOUT a self-join: the brand filter broadcasts (bounded part subset),
    then the per-part average is a window aggregate over the already-
    filtered rows — one shuffle on l_partkey total, versus the textbook
    rewrite's aggregate + re-join (two shuffles and a second lineitem
    pass). Valid because the correlation key (l_partkey) determines the
    brand, so averaging inside the filtered set equals the subquery's
    full-table per-part average. Decimal accumulation keeps the 0.2·avg
    comparison bit-identical across engines/partitionings."""
    part_keys = F.broadcast(
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_brand") == Q17_BRAND)
        .select("p_partkey")
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice"
    )
    w = Window.partitionBy("l_partkey")
    avg_q = (
        F.sum(F.col("l_quantity").cast(DECIMAL_T)).over(w).cast("double")
        / F.count(F.lit(1)).over(w)
    )
    return (
        li.join(part_keys, li.l_partkey == F.col("p_partkey"))
        .withColumn("avg_q", avg_q)
        .filter(F.col("l_quantity") < 0.2 * F.col("avg_q"))
        .agg(
            (
                F.sum(F.col("l_extendedprice").cast(DECIMAL_T)).cast("double")
                / 7.0
            ).alias("avg_yearly"),
            F.count(F.lit(1)).alias("line_count"),
        )
    )


Q17_SQL = f"""
WITH branded AS (
  SELECT l_partkey, l_quantity, l_extendedprice
  FROM lineitem JOIN part ON p_partkey = l_partkey
  WHERE p_brand = '{Q17_BRAND}'
),
with_avg AS (
  SELECT l_quantity, l_extendedprice,
         CAST(SUM(CAST(l_quantity AS DECIMAL(30,6))) OVER (
           PARTITION BY l_partkey) AS DOUBLE)
           / COUNT(*) OVER (PARTITION BY l_partkey) AS avg_q
  FROM branded
)
SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(30,6))) AS DOUBLE) / 7.0
         AS avg_yearly,
       COUNT(*) AS line_count
FROM with_avg
WHERE l_quantity < 0.2 * avg_q
"""


# -------------------------------------------------------------------- pivot

# Pivot column values are pinned explicitly: Spark's two-arg pivot skips the
# extra distinct-values job AND fixes the output schema deterministically
# (the values-discovery variant is a collect of unbounded cardinality — the
# anti-pattern at scale).
MKT_SEGMENTS = ("AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD", "MACHINERY")


def pivot_sales_by_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PIVOT: revenue matrix of order-year × market segment (the
    wide-report operator ROLLUP/CUBE don't cover — one output COLUMN per
    pivot value).

    Plan: orders pre-aggregate to (custkey, year) BEFORE the customer join
    (the join input shrinks from |orders| to |custkey×years|), then one
    groupBy(year).pivot(segment, pinned) — a single Expand-free aggregate
    whose state is years × segments. Exact-decimal sums end-to-end; sum of
    per-customer sums ≡ the oracle's direct conditional aggregation.
    """
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment"
    )
    pre = (
        orders.select(
            "o_custkey",
            F.year("o_orderdate").cast("bigint").alias("order_year"),
            F.col("o_totalprice").cast(DECIMAL_T).alias("price"),
        )
        .groupBy("o_custkey", "order_year")
        .agg(F.sum("price").alias("rev"))
    )
    piv = (
        pre.join(customer, pre.o_custkey == customer.c_custkey)
        .groupBy("order_year")
        .pivot("c_mktsegment", list(MKT_SEGMENTS))
        .agg(F.sum("rev"))
    )
    zero = F.lit(0).cast(DECIMAL_T)
    return piv.select(
        "order_year",
        *[
            F.coalesce(F.col(seg), zero)
            .cast("double")
            .alias(f"{seg.lower()}_rev")
            for seg in MKT_SEGMENTS
        ],
    )


def _pivot_sql() -> str:
    cols = ",\n  ".join(
        f"CAST(COALESCE(SUM(CASE WHEN c_mktsegment = '{seg}' "
        f"THEN CAST(o_totalprice AS DECIMAL(30,6)) END), 0) AS DOUBLE) "
        f"AS {seg.lower()}_rev"
        for seg in MKT_SEGMENTS
    )
    return f"""
SELECT CAST(year(o_orderdate) AS BIGINT) AS order_year,
  {cols}
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY order_year
"""


# ------------------------------------------------------------- range frames

TRAILING_DAYS = 7
_TRAILING_SECS = TRAILING_DAYS * 86400


def window_trailing_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-based RANGE window frame: per-customer trailing-7-day revenue
    and order count at every order (the moving-aggregate shape
    rows-frames can't express — the frame is defined by VALUE distance,
    including all peers at equal timestamps, not by row offsets).

    One shuffle on the partition key, same envelope as the running-totals
    window; the frame bound is a constant so the in-partition pass is a
    sliding two-pointer, not a per-row rescan.
    """
    orders = load_table(spark, sf_dir, "orders")
    epoch = F.unix_timestamp("o_orderdate").alias("order_epoch")
    base = orders.select(
        "o_custkey", "o_orderkey", epoch, F.col("o_totalprice")
    )
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("order_epoch")
        .rangeBetween(-_TRAILING_SECS, 0)
    )
    return base.select(
        "o_custkey",
        "o_orderkey",
        "order_epoch",
        F.sum(F.col("o_totalprice").cast(DECIMAL_T))
        .over(w)
        .cast("double")
        .alias("trailing_rev"),
        F.count(F.lit(1)).over(w).cast("bigint").alias("trailing_cnt"),
    )


TRAILING_SQL = f"""
SELECT o_custkey, o_orderkey,
  CAST(epoch(o_orderdate) AS BIGINT) AS order_epoch,
  CAST(SUM(CAST(o_totalprice AS DECIMAL(30,6))) OVER (
    PARTITION BY o_custkey ORDER BY CAST(epoch(o_orderdate) AS BIGINT)
    RANGE BETWEEN {_TRAILING_SECS} PRECEDING AND CURRENT ROW) AS DOUBLE)
    AS trailing_rev,
  CAST(COUNT(*) OVER (
    PARTITION BY o_custkey ORDER BY CAST(epoch(o_orderdate) AS BIGINT)
    RANGE BETWEEN {_TRAILING_SECS} PRECEDING AND CURRENT ROW) AS BIGINT)
    AS trailing_cnt
FROM orders
"""


def groupingsets_sales(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS — independent (region-only) and (segment-only)
    marginals in ONE pass (the grouping construct rollup/cube can't express:
    no cross product, no hierarchy). One Expand of factor 2 feeding a single
    aggregate; `grouping_id` disambiguates the all-NULL grouping keys.
    """
    nation = F.broadcast(load_table(spark, sf_dir, "nation"))
    region = F.broadcast(load_table(spark, sf_dir, "region"))
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    joined = (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .join(nation, cust.c_nationkey == nation.n_nationkey)
        .join(region, nation.n_regionkey == region.r_regionkey)
    )
    return (
        joined.groupingSets(
            [[F.col("r_name")], [F.col("c_mktsegment")]],
            F.col("r_name"),
            F.col("c_mktsegment"),
        )
        .agg(
            F.grouping_id().cast("bigint").alias("grouping_set"),
            dsum(F.col("o_totalprice"), "total_sales"),
            F.count(F.lit(1)).alias("order_count"),
        )
        .select(
            "r_name", "c_mktsegment", "grouping_set", "total_sales", "order_count"
        )
    )


GROUPINGSETS_SQL = f"""
SELECT r_name, c_mktsegment,
       CAST(GROUPING(r_name) * 2 + GROUPING(c_mktsegment) AS BIGINT)
         AS grouping_set,
       {dsum_sql("o_totalprice", "total_sales")},
       CAST(COUNT(*) AS BIGINT) AS order_count
FROM orders
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY GROUPING SETS ((r_name), (c_mktsegment))
"""


def set_intersect_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT set operation: customers active in BOTH 1996 and 1997
    (the companion to set_ops_customers' EXCEPT/anti shape). Planned as
    two pruned scans → left-semi — distinct-by-construction inputs keep
    the intersect a plain semi join, no global distinct of the fact table.
    """
    orders = load_table(spark, sf_dir, "orders")
    y = F.year("o_orderdate")
    a = orders.filter(y == 1996).select("o_custkey").distinct()
    b = orders.filter(y == 1997).select("o_custkey").distinct()
    return a.intersect(b).select(F.col("o_custkey").alias("c_custkey"))


SET_INTERSECT_SQL = """
SELECT o_custkey AS c_custkey FROM orders WHERE year(o_orderdate) = 1996
INTERSECT
SELECT o_custkey AS c_custkey FROM orders WHERE year(o_orderdate) = 1997
"""


def window_first_last_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FIRST_VALUE / LAST_VALUE over the full-partition frame: each
    customer's first and last order price by date, plus the drift between
    them — the navigation window functions (value-at-frame-edge) that
    rank/lead/lag don't cover. The frame must be ROWS UNBOUNDED PRECEDING
    AND UNBOUNDED FOLLOWING — the default frame stops at CURRENT ROW and
    silently turns LAST_VALUE into "current value", the classic window
    bug this query exists to pin. Every row in a partition carries the
    same values, so one dropDuplicates reduces to a row per customer.
    """
    orders = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return (
        orders.select(
            "o_custkey",
            F.first("o_totalprice").over(w).alias("first_order_price"),
            F.last("o_totalprice").over(w).alias("last_order_price"),
        )
        .dropDuplicates(["o_custkey"])
        .select(
            "o_custkey",
            "first_order_price",
            "last_order_price",
            F.round(
                F.col("last_order_price") - F.col("first_order_price"), 2
            ).alias("price_drift"),
        )
    )


FIRST_LAST_SQL = """
SELECT DISTINCT o_custkey,
  FIRST_VALUE(o_totalprice) OVER w AS first_order_price,
  LAST_VALUE(o_totalprice) OVER w AS last_order_price,
  ROUND(LAST_VALUE(o_totalprice) OVER w
        - FIRST_VALUE(o_totalprice) OVER w, 2) AS price_drift
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
"""


def window_ntile_acctbal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NTILE bucketing: account-balance quartile per customer within each
    nation (the distribution-bucket window function rank/row_number don't
    cover — equi-COUNT buckets, not equi-width values). One shuffle on
    the partition key; deterministic tie-break on c_custkey keeps the
    bucket boundaries engine-stable.
    """
    customer = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_nationkey").orderBy(
        F.col("c_acctbal").desc(), F.col("c_custkey").asc()
    )
    return customer.select(
        "c_custkey",
        "c_nationkey",
        "c_acctbal",
        F.ntile(4).over(w).cast("bigint").alias("balance_quartile"),
    )


NTILE_SQL = """
SELECT c_custkey, c_nationkey, c_acctbal,
       CAST(NTILE(4) OVER (
         PARTITION BY c_nationkey
         ORDER BY c_acctbal DESC, c_custkey ASC) AS BIGINT)
         AS balance_quartile
FROM customer
"""


def window_percentile_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PERCENT_RANK + CUME_DIST distribution windows: each customer's
    account-balance standing within its nation — the relative-position
    family (rank normalized to [0,1]; share of peers at-or-below) that
    rank/ntile don't express. One shuffle on the partition key, both
    functions over the same sort; deterministic c_custkey tie-break.
    Ranks round to 9 so the double division is engine-stable.
    """
    customer = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_nationkey").orderBy(
        F.col("c_acctbal").desc(), F.col("c_custkey").asc()
    )
    return customer.select(
        "c_custkey",
        "c_nationkey",
        "c_acctbal",
        F.round(F.percent_rank().over(w), 9).alias("balance_pct_rank"),
        F.round(F.cume_dist().over(w), 9).alias("balance_cume_dist"),
    )


PERCENT_RANK_SQL = """
SELECT c_custkey, c_nationkey, c_acctbal,
       ROUND(PERCENT_RANK() OVER w, 9) AS balance_pct_rank,
       ROUND(CUME_DIST() OVER w, 9) AS balance_cume_dist
FROM customer
WINDOW w AS (PARTITION BY c_nationkey
             ORDER BY c_acctbal DESC, c_custkey ASC)
"""


BASKET_MIN_SUPPORT = 2
BASKET_TOP_K = 25


def basket_copurchase_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket analysis (association-rule mining, pairwise): part
    pairs co-occurring in the same order with support and lift
    (P(a,b)/(P(a)·P(b)) — >1 means the pair attaches more often than
    independence predicts), top-K by support.

    Plan: distinct (order, part) lines → groupBy(order) collects each
    basket ONCE and expands pairs with JVM array ops (dedup._bucket_pairs;
    pair fan-out bounded by basket size, ≤7 lines at TPC-H ratios — never
    a corpus self-join that recomputes the scan per side) → pair groupBy →
    per-part order counts attach as SHUFFLE_HASH key joins (the part
    dimension grows LINEARLY with the corpus — 20B parts at TPC-H sf100k —
    so it must never broadcast) → top-K via orderBy().limit() (the §6
    top-K rule: a filtered global row_number window sorts the whole pair
    frame in one partition); the rank column is recomputed over the ≤K-row
    survivors only.
    """
    from ..plans.cache import release_caches, tracked_cache
    from ..plans.roundcheck import checkpoint_round
    from .graph import copurchase_graph

    release_caches()
    # r9 (guide §2.4 — share the exchange): the memoized co-purchase
    # graph's `half` frame IS this query's pair-support aggregate (same
    # distinct (order, part) → basket → in-array pair expansion → one
    # groupBy, support = co-order count), so the basket build no longer
    # runs a second time here — pairs are a filter over the shared cached
    # frame, exactly like graph_connected_components' backbone.
    half, _ = copurchase_graph(spark, sf_dir)
    pairs = half.filter(F.col("support") >= BASKET_MIN_SUPPORT).select(
        F.col("a").alias("part_a"),
        F.col("b").alias("part_b"),
        "support",
    )
    # cached: the per-part order counts and the distinct-order count both
    # read the distinct line frame (previously two full lineitem scans +
    # distinct exchanges).
    lines = tracked_cache(
        load_table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    part_orders = lines.groupBy(F.col("l_partkey")).agg(
        F.count(F.lit(1)).alias("n_orders_part")
    )
    n_orders = lines.select("l_orderkey").distinct().count()
    lift = (F.col("support").cast("double") * F.lit(float(n_orders))) / (
        F.col("n_a").cast("double") * F.col("n_b")
    )
    # top-K first (TakeOrderedAndProject — distributed partial top-K, no
    # global sort), THEN the rank window over the ≤K-row survivor frame.
    # r9 (the link-prediction move, §3): the (support DESC, part_a,
    # part_b) order references NO attached column, so the two per-part
    # order-count attaches run AFTER the limit — two ≤K-row broadcast
    # probes of the cached distinct-line aggregate instead of two
    # SHUFFLE_HASH exchanges of the full surviving-pair frame. The eager
    # checkpoints make each broadcast subtree a materialized ≤K-row
    # LogicalRDD (the lint walkers' by-construction row bound).
    w = Window.orderBy(
        F.desc("support"), F.asc("part_a"), F.asc("part_b")
    )
    top = checkpoint_round(
        pairs.orderBy(F.desc("support"), F.asc("part_a"), F.asc("part_b"))
        .limit(BASKET_TOP_K)
        .withColumn("rank", F.row_number().over(w).cast("bigint")),
        "basket_copurchase_lift:topk",
    )
    with_na = checkpoint_round(
        part_orders.select(
            F.col("l_partkey").alias("part_a"),
            F.col("n_orders_part").alias("n_a"),
        ).join(F.broadcast(top), "part_a"),
        "basket_copurchase_lift:na",
    )
    return (
        part_orders.select(
            F.col("l_partkey").alias("part_b"),
            F.col("n_orders_part").alias("n_b"),
        )
        .join(F.broadcast(with_na), "part_b")
        .withColumn("lift", F.round(lift, 9))
        .select("rank", "part_a", "part_b", "support", "n_a", "n_b", "lift")
    )


BASKET_SQL = f"""
WITH lines AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
pairs AS (
  SELECT a.l_partkey AS part_a, b.l_partkey AS part_b, COUNT(*) AS support
  FROM lines a JOIN lines b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY 1, 2
  HAVING COUNT(*) >= {BASKET_MIN_SUPPORT}
),
pcount AS (
  SELECT l_partkey, COUNT(*) AS n FROM lines GROUP BY 1
),
tot AS (SELECT CAST(COUNT(DISTINCT l_orderkey) AS DOUBLE) AS n_orders
        FROM lines)
SELECT CAST(ROW_NUMBER() OVER (
         ORDER BY support DESC, part_a ASC, part_b ASC) AS BIGINT) AS rank,
       part_a, part_b, support,
       pa.n AS n_a, pb.n AS n_b,
       ROUND(CAST(support AS DOUBLE) * n_orders
             / (CAST(pa.n AS DOUBLE) * pb.n), 9) AS lift
FROM pairs
JOIN pcount pa ON pa.l_partkey = part_a
JOIN pcount pb ON pb.l_partkey = part_b
CROSS JOIN tot
QUALIFY rank <= {BASKET_TOP_K}
"""


FUZZY_MAX_DIST = 2
FUZZY_TOP_K = 5
FUZZY_N_PROBES = 10


def fuzzy_name_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entity resolution by fuzzy string match: a probe directory of
    TYPO'D customer names (3rd character corrupted in-query, both engines
    — the dirty-input convention) is matched back against the clean
    customer table via Levenshtein distance ≤ FUZZY_MAX_DIST, top-K
    candidates per probe ranked by distance. The true entity surfaces at
    distance 1; near-key neighbors trail at 2 — the ranked candidate list
    a record-linkage reviewer sees.

    Plan: probes are broadcast; the candidate space is BLOCKED before any
    edit-distance evaluates (equal length + equal first character — a
    single-char typo preserves both), so comparisons per probe are bounded
    by block size, not table size; the rank window runs over the
    distance-filtered candidate frame only.
    """
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    typo = F.concat(
        F.substring(F.col("c_name"), 1, 2),
        F.lit("x"),
        F.expr("substring(c_name, 4)"),
    )
    probes = (
        cust.filter(F.col("c_custkey") < FUZZY_N_PROBES)
        .select(
            F.col("c_custkey").alias("probe_key"),
            typo.alias("probe_name"),
        )
    )
    cand = cust.join(
        F.broadcast(probes),
        (F.length("c_name") == F.length("probe_name"))
        & (F.substring("c_name", 1, 1) == F.substring("probe_name", 1, 1)),
    )
    dist = F.levenshtein(F.col("c_name"), F.col("probe_name"))
    w = Window.partitionBy("probe_key").orderBy(
        F.asc("distance"), F.asc("match_key")
    )
    return (
        cand.select(
            "probe_key",
            "probe_name",
            F.col("c_custkey").alias("match_key"),
            F.col("c_name").alias("match_name"),
            dist.cast("bigint").alias("distance"),
        )
        .filter(F.col("distance") <= FUZZY_MAX_DIST)
        .withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= FUZZY_TOP_K)
    )


FUZZY_SQL = f"""
WITH probes AS (
  SELECT c_custkey AS probe_key,
         substr(c_name, 1, 2) || 'x' || substr(c_name, 4) AS probe_name
  FROM customer WHERE c_custkey < {FUZZY_N_PROBES}
),
cand AS (
  SELECT p.probe_key, p.probe_name,
         c.c_custkey AS match_key, c.c_name AS match_name,
         CAST(levenshtein(c.c_name, p.probe_name) AS BIGINT) AS distance
  FROM customer c JOIN probes p
    ON length(c.c_name) = length(p.probe_name)
   AND substr(c.c_name, 1, 1) = substr(p.probe_name, 1, 1)
  WHERE levenshtein(c.c_name, p.probe_name) <= {FUZZY_MAX_DIST}
)
SELECT probe_key, probe_name, match_key, match_name, distance,
       CAST(ROW_NUMBER() OVER (
         PARTITION BY probe_key
         ORDER BY distance ASC, match_key ASC) AS BIGINT) AS rank
FROM cand
QUALIFY rank <= {FUZZY_TOP_K}
"""


def cohort_revenue_ltv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customer-lifetime-value matrix by acquisition cohort: customers
    cohort on their FIRST order year; each (cohort, years-since-first)
    cell reports period revenue and the running cumulative LTV per
    acquired customer — the orders-side companion of the events-based
    retention matrix.

    Plan: first-order year per customer is one groupBy(o_custkey) min;
    orders re-join on the same key (co-partitioned — one shuffle feeds
    both); the (cohort × offset) aggregate is metadata-sized, so the
    cumulative window and per-customer division run on ≤ years² rows.
    Exact-decimal revenue sums keep every cell partitioning-stable.
    """
    orders = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderdate", "o_totalprice"
    )
    first = orders.groupBy("o_custkey").agg(
        F.min(F.year("o_orderdate")).alias("cohort_year")
    )
    cohort_sizes = first.groupBy("cohort_year").agg(
        F.count(F.lit(1)).alias("n_customers")
    )
    cells = (
        orders.join(first, "o_custkey")
        .groupBy(
            "cohort_year",
            (F.year("o_orderdate") - F.col("cohort_year")).alias("offset_years"),
        )
        .agg(
            dsum(F.col("o_totalprice"), "period_revenue"),
            F.count(F.lit(1)).alias("n_orders"),
        )
    )
    cum_w = (
        Window.partitionBy("cohort_year")
        .orderBy("offset_years")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        cells.join(F.broadcast(cohort_sizes), "cohort_year")
        .withColumn(
            "cum_revenue",
            F.round(
                F.sum(F.col("period_revenue").cast(DECIMAL_T)).over(cum_w)
                .cast("double"),
                2,
            ),
        )
        .select(
            "cohort_year",
            "offset_years",
            "n_customers",
            "n_orders",
            F.round("period_revenue", 2).alias("period_revenue"),
            "cum_revenue",
            F.round(
                F.col("cum_revenue") / F.col("n_customers"), 6
            ).alias("ltv_per_customer"),
        )
    )


COHORT_LTV_SQL = f"""
WITH first AS (
  SELECT o_custkey, MIN(year(o_orderdate)) AS cohort_year
  FROM orders GROUP BY o_custkey
),
sizes AS (
  SELECT cohort_year, COUNT(*) AS n_customers FROM first GROUP BY 1
),
cells AS (
  SELECT f.cohort_year,
         year(o.o_orderdate) - f.cohort_year AS offset_years,
         {dsum_sql("o.o_totalprice", "period_revenue")},
         COUNT(*) AS n_orders
  FROM orders o JOIN first f ON f.o_custkey = o.o_custkey
  GROUP BY 1, 2
),
cum AS (
  SELECT cohort_year, offset_years, period_revenue, n_orders,
         ROUND(CAST(SUM(CAST(period_revenue AS DECIMAL(30,6))) OVER (
           PARTITION BY cohort_year ORDER BY offset_years
           ROWS UNBOUNDED PRECEDING) AS DOUBLE), 2) AS cum_revenue
  FROM cells
)
SELECT c.cohort_year, c.offset_years, s.n_customers, c.n_orders,
       ROUND(c.period_revenue, 2) AS period_revenue, c.cum_revenue,
       ROUND(c.cum_revenue / s.n_customers, 6) AS ltv_per_customer
FROM cum c JOIN sizes s ON s.cohort_year = c.cohort_year
"""




# -------------------------------------------------------- RFM segmentation

RFM_FRACS = (0.2, 0.4, 0.6, 0.8)


def rfm_segmentation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM (recency / frequency / monetary) customer segmentation — the
    classic marketing-analytics scoring: quintile scores per metric and the
    concatenated segment code ("555" = best). Recency is measured against
    the dataset's own watermark (max order date), keeping it deterministic.

    Scale design: quintiles via FENCE BUCKETING, not ntile — a global
    ntile(5) is a single-partition total sort of every customer, which
    dies at a billion customers. Exact percentile fences compute in one
    1-row aggregate over the |customers| frame, broadcast back, and each
    customer scores with scan-local comparisons (score = 1 + #fences
    beaten). Same scores as ntile up to tie placement, at zero sort cost.

    Reference analog: none — classic OLAP segmentation beyond dbsurveyor.
    """
    orders = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderdate", "o_totalprice"
    )
    dec = "decimal(30,6)"
    base = orders.groupBy("o_custkey").agg(
        F.max("o_orderdate").alias("last_order"),
        F.count(F.lit(1)).alias("frequency"),
        F.sum(F.col("o_totalprice").cast(dec)).cast("double").alias("monetary"),
    )
    watermark = orders.agg(F.max("o_orderdate").alias("wm"))
    base = base.join(F.broadcast(watermark)).select(
        "o_custkey",
        F.datediff(F.col("wm"), F.col("last_order")).alias("recency_days"),
        "frequency",
        "monetary",
    )
    fr = F.array(*[F.lit(x) for x in RFM_FRACS])
    fences = base.agg(
        F.percentile(F.col("recency_days").cast("double"), fr).alias("qr"),
        F.percentile(F.col("frequency").cast("double"), fr).alias("qf"),
        F.percentile(F.col("monetary"), fr).alias("qm"),
    )
    scored = base.join(F.broadcast(fences))
    def _score(metric, fence_col, better_low):
        s = F.lit(1)
        for i in range(len(RFM_FRACS)):
            fence = F.col(fence_col)[i]
            beat = (metric < fence) if better_low else (metric > fence)
            s = s + beat.cast("int")
        return s.cast("bigint")
    r = _score(F.col("recency_days").cast("double"), "qr", True)
    f_ = _score(F.col("frequency").cast("double"), "qf", False)
    m = _score(F.col("monetary"), "qm", False)
    return scored.select(
        "o_custkey",
        F.col("recency_days").cast("bigint").alias("recency_days"),
        F.col("frequency").cast("bigint").alias("frequency"),
        F.round("monetary", 6).alias("monetary"),
        r.alias("r_score"),
        f_.alias("f_score"),
        m.alias("m_score"),
        F.concat(
            r.cast("string"), f_.cast("string"), m.cast("string")
        ).alias("segment"),
    )


def _rfm_sql() -> str:
    fr = ", ".join(str(x) for x in RFM_FRACS)
    def score(metric, q, op):
        terms = " + ".join(
            f"CAST(({metric} {op} {q}[{i + 1}]) AS INTEGER)"
            for i in range(len(RFM_FRACS))
        )
        return f"CAST(1 + {terms} AS BIGINT)"
    r = score("CAST(recency_days AS DOUBLE)", "qr", "<")
    f_ = score("CAST(frequency AS DOUBLE)", "qf", ">")
    m = score("monetary", "qm", ">")
    return f"""
WITH base0 AS (
  SELECT o_custkey, MAX(o_orderdate) AS last_order,
         CAST(COUNT(*) AS BIGINT) AS frequency,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(30,6))) AS DOUBLE) AS monetary
  FROM orders GROUP BY o_custkey
),
wm AS (SELECT MAX(o_orderdate) AS wm FROM orders),
base AS (
  SELECT o_custkey, date_diff('day', last_order, wm) AS recency_days,
         frequency, monetary
  FROM base0 CROSS JOIN wm
),
fences AS (
  SELECT quantile_cont(CAST(recency_days AS DOUBLE), [{fr}]) AS qr,
         quantile_cont(CAST(frequency AS DOUBLE), [{fr}]) AS qf,
         quantile_cont(monetary, [{fr}]) AS qm
  FROM base
)
SELECT o_custkey, CAST(recency_days AS BIGINT) AS recency_days, frequency,
       ROUND(monetary, 6) AS monetary,
       {r} AS r_score, {f_} AS f_score, {m} AS m_score,
       CAST({r} AS VARCHAR) || CAST({f_} AS VARCHAR) || CAST({m} AS VARCHAR)
         AS segment
FROM base CROSS JOIN fences
"""



# ------------------------------------------------------------- YoY growth


def orders_seasonality_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar-month seasonality index: per month-of-year (1-12), the
    average monthly revenue and its ratio to the overall monthly average —
    the multiplicative seasonal profile behind demand planning and the
    deseasonalization step of any forecast (`window_yoy_revenue` compares
    one month to itself a year back; this pools ALL years per calendar
    month). Index > 1 = seasonally strong month.

    Plan: one exact-decimal groupBy(yyyy-MM) aggregate (the scan reduces
    to ≤ months rows immediately), a 12-row month-of-year aggregate over
    it, and a broadcast 1-row overall mean — no windows at all.
    """
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderdate", "o_totalprice"
    )
    dec = "decimal(30,6)"
    monthly = orders.groupBy(
        F.date_format("o_orderdate", "yyyy-MM").alias("ym"),
        F.month("o_orderdate").cast("bigint").alias("month_num"),
    ).agg(F.sum(F.col("o_totalprice").cast(dec)).alias("rev"))
    per_month = monthly.groupBy("month_num").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_months"),
        (F.sum("rev").cast("double") / F.count(F.lit(1))).alias("avg_rev"),
    )
    overall = monthly.agg(
        (F.sum("rev").cast("double") / F.count(F.lit(1))).alias("overall_avg")
    )
    return per_month.crossJoin(F.broadcast(overall)).select(
        "month_num",
        "n_months",
        F.round("avg_rev", 6).alias("avg_monthly_revenue"),
        F.round(F.col("avg_rev") / F.col("overall_avg"), 9).alias(
            "seasonal_index"
        ),
    )


SEASONALITY_SQL = """
WITH monthly AS (
  SELECT strftime(CAST(o_orderdate AS DATE), '%Y-%m') AS ym,
         CAST(month(o_orderdate) AS BIGINT) AS month_num,
         SUM(CAST(o_totalprice AS DECIMAL(30,6))) AS rev
  FROM orders GROUP BY 1, 2
),
per_month AS (
  SELECT month_num, CAST(COUNT(*) AS BIGINT) AS n_months,
         CAST(SUM(rev) AS DOUBLE) / COUNT(*) AS avg_rev
  FROM monthly GROUP BY month_num
),
overall AS (
  SELECT CAST(SUM(rev) AS DOUBLE) / COUNT(*) AS overall_avg FROM monthly
)
SELECT month_num, n_months,
       ROUND(avg_rev, 6) AS avg_monthly_revenue,
       ROUND(avg_rev / overall_avg, 9) AS seasonal_index
FROM per_month, overall
"""


def window_yoy_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Year-over-year monthly revenue growth — the canonical reporting
    window (LAG 12 over the month series): per month, revenue, the
    same-month-last-year revenue, and the YoY percentage change (null for
    the first year — no fabricated zeros).

    Plan: the scan reduces to a ≤ months-row exact-decimal aggregate
    immediately; the lag window and growth arithmetic run on that
    metadata frame (single-partition window over ~84 rows — the
    documented metadata-frame exception, same as CUSUM/mix-plan).
    """
    from pyspark.sql.window import Window

    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderdate", "o_totalprice"
    )
    dec = "decimal(30,6)"
    monthly = orders.groupBy(
        F.date_format("o_orderdate", "yyyy-MM").alias("month")
    ).agg(
        F.sum(F.col("o_totalprice").cast(dec)).cast("double").alias("revenue")
    )
    w = Window.orderBy("month")
    prev = F.lag("revenue", 12).over(w)
    return monthly.select(
        "month",
        F.round("revenue", 6).alias("revenue"),
        F.round(prev, 6).alias("revenue_prior_year"),
        F.round((F.col("revenue") - prev) / prev * 100.0, 6).alias(
            "yoy_pct"
        ),
    )


YOY_SQL = """
WITH monthly AS (
  SELECT strftime(CAST(o_orderdate AS DATE), '%Y-%m') AS month,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(30,6))) AS DOUBLE) AS revenue
  FROM orders GROUP BY 1
)
SELECT month, ROUND(revenue, 6) AS revenue,
       ROUND(lag(revenue, 12) OVER (ORDER BY month), 6)
         AS revenue_prior_year,
       ROUND((revenue - lag(revenue, 12) OVER (ORDER BY month))
             / lag(revenue, 12) OVER (ORDER BY month) * 100.0, 6) AS yoy_pct
FROM monthly
"""



# -------------------------------------------------------------- ABC/Pareto


def abc_part_classification(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ABC (Pareto) classification of parts by revenue: class A = parts
    covering the first 80% of cumulative revenue, B = next 15%, C = tail —
    the inventory-prioritization table every ops team keeps. Reports each
    class's part count, revenue, and share.

    Plan: one exact-decimal groupBy(part) revenue aggregate; the running
    revenue prefix uses the §6 TWO-LEVEL parallel prefix
    (`plans/prefix.py`) — the part dimension grows LINEARLY with the
    corpus (|parts| = |lineitem|/30 at literal TPC-H ratios), so a
    partition-less cumulative window would sort billions of rows on one
    core at 100×. Decimal sums are exact and associative, so the blocked
    prefix is bit-identical to the global window and the oracle keeps its
    plain OVER (ORDER BY …).
    """
    from ..plans.cache import release_caches
    from ..plans.prefix import two_level_prefix

    release_caches()
    dec = "decimal(30,6)"
    lines = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_extendedprice", "l_discount"
    )
    rev = lines.groupBy("l_partkey").agg(
        F.sum(
            (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(dec)
        ).alias("revenue")
    )
    # `tot` re-reads the cached `rev` subtree that two_level_prefix pins
    # (CacheManager matches the identical aggregate plan), so the fact
    # table is scanned once for the whole query.
    tot = rev.agg(F.sum("revenue").alias("total"))
    classed = (
        two_level_prefix(
            rev,
            [F.desc("revenue"), F.asc("l_partkey")],
            out_col="cum",
            sum_col="revenue",
        )
        .join(F.broadcast(tot))
        .withColumn(
            "abc_class",
            F.when(F.col("cum") / F.col("total") <= 0.80, "A")
            .when(F.col("cum") / F.col("total") <= 0.95, "B")
            .otherwise("C"),
        )
    )
    return (
        classed.groupBy("abc_class")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_parts"),
            F.sum("revenue").alias("rev_dec"),
            F.max("total").alias("total"),
        )
        .select(
            "abc_class",
            "n_parts",
            F.round(F.col("rev_dec").cast("double"), 6).alias("class_revenue"),
            F.round(
                F.col("rev_dec").cast("double")
                / F.col("total").cast("double"),
                9,
            ).alias("revenue_share"),
        )
    )


ABC_SQL = """
WITH rev AS (
  SELECT l_partkey,
         SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(30,6)))
           AS revenue
  FROM lineitem GROUP BY l_partkey
),
tot AS (SELECT SUM(revenue) AS total FROM rev),
classed AS (
  SELECT revenue, total,
         CASE WHEN SUM(revenue) OVER (ORDER BY revenue DESC, l_partkey ASC
                                      ROWS UNBOUNDED PRECEDING) / total
                   <= 0.80 THEN 'A'
              WHEN SUM(revenue) OVER (ORDER BY revenue DESC, l_partkey ASC
                                      ROWS UNBOUNDED PRECEDING) / total
                   <= 0.95 THEN 'B'
              ELSE 'C' END AS abc_class
  FROM rev CROSS JOIN tot
)
SELECT abc_class, CAST(COUNT(*) AS BIGINT) AS n_parts,
       ROUND(CAST(SUM(revenue) AS DOUBLE), 6) AS class_revenue,
       ROUND(CAST(SUM(revenue) AS DOUBLE) / CAST(MAX(total) AS DOUBLE), 9)
         AS revenue_share
FROM classed GROUP BY abc_class
"""



# ------------------------------------------------------------- churn risk

CHURN_DAYS = 365


def customer_churn_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Churn-risk roster: per customer, days since last order (measured
    against the dataset's own watermark — deterministic, like
    `quality_timeliness`) and the churned flag at the CHURN_DAYS horizon,
    plus lifetime order count and revenue for triage — the list a
    retention campaign pulls. Complements `rfm_segmentation` (scores) with
    the binary operational flag.

    Plan: ONE groupBy(custkey) aggregate; the watermark is a 1-row
    broadcast. Never a window, never a sort.
    """
    orders = load_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderdate", "o_totalprice"
    )
    dec = "decimal(30,6)"
    per_cust = orders.groupBy("o_custkey").agg(
        F.max("o_orderdate").alias("last_order"),
        F.count(F.lit(1)).cast("bigint").alias("n_orders"),
        F.sum(F.col("o_totalprice").cast(dec)).cast("double").alias("ltv"),
    )
    wm = orders.agg(F.max("o_orderdate").alias("wm"))
    return per_cust.join(F.broadcast(wm)).select(
        "o_custkey",
        F.datediff(F.col("wm"), F.col("last_order"))
        .cast("bigint")
        .alias("days_since_last_order"),
        "n_orders",
        F.round("ltv", 6).alias("lifetime_revenue"),
        (F.datediff(F.col("wm"), F.col("last_order")) > CHURN_DAYS).alias(
            "churned"
        ),
    )


CHURN_SQL = f"""
WITH per_cust AS (
  SELECT o_custkey, MAX(o_orderdate) AS last_order,
         CAST(COUNT(*) AS BIGINT) AS n_orders,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(30,6))) AS DOUBLE) AS ltv
  FROM orders GROUP BY o_custkey
),
wm AS (SELECT MAX(o_orderdate) AS wm FROM orders)
SELECT o_custkey,
       CAST(date_diff('day', last_order, wm) AS BIGINT)
         AS days_since_last_order,
       n_orders, ROUND(ltv, 6) AS lifetime_revenue,
       (date_diff('day', last_order, wm) > {CHURN_DAYS}) AS churned
FROM per_cust CROSS JOIN wm
"""



# -------------------------------------------------------------------- HHI


def supplier_lead_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-to-ship lead time per supplier nation: mean / p50 / p95 /
    max days between o_orderdate and l_shipdate, plus the late-ish share
    (> 60 days) — the fulfillment-SLA screen beside
    `supplier_concentration_hhi`'s supply-risk one.

    Plan: ONE fact-fact join on the order key (both sides shuffle on the
    same key — the engine's co-partitioned join discipline), supplier
    nation attached via the broadcastable dim chain, then one per-nation
    aggregate with exact `percentile` ↔ `quantile_cont` parity. Nothing
    beyond the one co-key shuffle is data-sized.
    """
    lines = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate"
    )
    supp = F.broadcast(
        load_table(spark, sf_dir, "supplier").select(
            "s_suppkey", "s_nationkey"
        )
    )
    nation = F.broadcast(
        load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    )
    lead = F.datediff(
        F.col("l_shipdate").cast("date"), F.col("o_orderdate").cast("date")
    ).cast("double")
    probs = F.array(F.lit(0.5), F.lit(0.95))
    return (
        lines.join(orders, lines["l_orderkey"] == orders["o_orderkey"])
        .join(supp, lines["l_suppkey"] == supp["s_suppkey"])
        .join(nation, supp["s_nationkey"] == nation["n_nationkey"])
        .select(F.col("n_name").alias("nation"), lead.alias("lead_days"))
        .groupBy("nation")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_shipments"),
            F.round(F.avg("lead_days"), 6).alias("mean_lead_days"),
            F.percentile(F.col("lead_days"), probs).alias("_q"),
            F.max("lead_days").cast("bigint").alias("max_lead_days"),
            F.round(
                F.avg(F.when(F.col("lead_days") > 60, 1.0).otherwise(0.0)), 9
            ).alias("late_share"),
        )
        .select(
            "nation",
            "n_shipments",
            "mean_lead_days",
            F.round(F.col("_q")[0], 6).alias("p50_lead_days"),
            F.round(F.col("_q")[1], 6).alias("p95_lead_days"),
            "max_lead_days",
            "late_share",
        )
    )


LEAD_TIME_SQL = """
WITH leads AS (
  SELECT n.n_name AS nation,
         CAST(datediff('day', CAST(o.o_orderdate AS DATE),
                       CAST(l.l_shipdate AS DATE)) AS DOUBLE) AS lead_days
  FROM lineitem l
  JOIN orders o ON o.o_orderkey = l.l_orderkey
  JOIN supplier s ON s.s_suppkey = l.l_suppkey
  JOIN nation n ON n.n_nationkey = s.s_nationkey
)
SELECT nation, CAST(COUNT(*) AS BIGINT) AS n_shipments,
       ROUND(AVG(lead_days), 6) AS mean_lead_days,
       ROUND(quantile_cont(lead_days, 0.5), 6) AS p50_lead_days,
       ROUND(quantile_cont(lead_days, 0.95), 6) AS p95_lead_days,
       CAST(MAX(lead_days) AS BIGINT) AS max_lead_days,
       ROUND(AVG(CASE WHEN lead_days > 60 THEN 1.0 ELSE 0.0 END), 9)
         AS late_share
FROM leads GROUP BY nation
"""


def supplier_concentration_hhi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Supplier market concentration per nation: the Herfindahl-Hirschman
    index (Σ market-share², 0 = atomized, 1 = monopoly) over supplier
    revenue within each supplier nation, with the DOJ-style band
    (unconcentrated < 0.15 ≤ moderate < 0.25 ≤ concentrated) — the
    supply-risk screen a procurement team runs.

    Plan: one lineitem⋈supplier join (supplier side broadcast — dimension
    at TPC-H ratios) → exact-decimal revenue per (nation, supplier) →
    share math on the bounded |nations × suppliers| frame; shares are
    rationals of decimal sums, squared/summed through rounded decimal
    terms so the index is engine-identical.
    """
    from pyspark.sql.window import Window

    dec = "decimal(30,6)"
    lines = load_table(spark, sf_dir, "lineitem").select(
        "l_suppkey", "l_extendedprice", "l_discount"
    )
    supp = load_table(spark, sf_dir, "supplier").select(
        "s_suppkey", "s_nationkey"
    )
    rev = (
        lines.join(F.broadcast(supp), lines["l_suppkey"] == supp["s_suppkey"])
        .groupBy("s_nationkey", "s_suppkey")
        .agg(
            F.sum(
                (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
                    dec
                )
            ).alias("rev")
        )
    )
    w = Window.partitionBy("s_nationkey")
    share = F.col("rev").cast("double") / F.sum("rev").over(w).cast("double")
    terms = rev.select(
        "s_nationkey",
        F.round(share * share, 12).cast("decimal(38,12)").alias("t"),
    )
    hhi = F.col("hhi_d")
    return (
        terms.groupBy("s_nationkey")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_suppliers"),
            F.sum("t").cast("double").alias("hhi_d"),
        )
        .select(
            F.col("s_nationkey").cast("bigint").alias("nation_key"),
            "n_suppliers",
            F.round(hhi, 9).alias("hhi"),
            F.when(hhi < 0.15, "unconcentrated")
            .when(hhi < 0.25, "moderate")
            .otherwise("concentrated")
            .alias("band"),
        )
    )


HHI_SQL = """
WITH rev AS (
  SELECT s.s_nationkey, s.s_suppkey,
         SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(30,6)))
           AS rev
  FROM lineitem l JOIN supplier s ON s.s_suppkey = l.l_suppkey
  GROUP BY s.s_nationkey, s.s_suppkey
),
terms AS (
  SELECT s_nationkey,
         CAST(ROUND(
           (CAST(rev AS DOUBLE)
            / CAST(SUM(rev) OVER (PARTITION BY s_nationkey) AS DOUBLE))
           * (CAST(rev AS DOUBLE)
              / CAST(SUM(rev) OVER (PARTITION BY s_nationkey) AS DOUBLE)),
           12) AS DECIMAL(38,12)) AS t
  FROM rev
)
SELECT CAST(s_nationkey AS BIGINT) AS nation_key,
       CAST(COUNT(*) AS BIGINT) AS n_suppliers,
       ROUND(CAST(SUM(t) AS DOUBLE), 9) AS hhi,
       CASE WHEN CAST(SUM(t) AS DOUBLE) < 0.15 THEN 'unconcentrated'
            WHEN CAST(SUM(t) AS DOUBLE) < 0.25 THEN 'moderate'
            ELSE 'concentrated' END AS band
FROM terms GROUP BY s_nationkey
"""


# ---------------------------------------------------- backlog aging

AGING_BUCKETS = ((30, "0_30d"), (90, "31_90d"), (365, "91_365d"), (None, "gt_365d"))


def orders_backlog_aging(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Open-order BACKLOG aging — the receivables/WIP aging report every
    operational warehouse runs: non-finalized orders (status != 'F')
    bucketed by age at the dataset's own watermark (max order date — the
    deterministic now, as in `quality_timeliness`), per (status, bucket)
    with order counts and exact-decimal open value. The oldest buckets are
    the escalation queue; the value column sizes the exposure.

    Plan: 1-row watermark aggregate broadcast back; aging and bucketing
    are scan-local CASE arithmetic; ONE bounded (status x bucket)
    aggregate. At 100 TB this is a single pass over orders.
    """
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderstatus", "o_orderdate", "o_totalprice"
    )
    wm = orders.agg(F.max("o_orderdate").alias("wm"))
    age = F.datediff(F.col("wm").cast("date"), F.col("o_orderdate").cast("date"))
    bucket = F.when(age <= AGING_BUCKETS[0][0], AGING_BUCKETS[0][1])
    for ub, name in AGING_BUCKETS[1:]:
        bucket = (
            bucket.when(age <= ub, name) if ub is not None
            else bucket.otherwise(name)
        )
    return (
        orders.filter(F.col("o_orderstatus") != "F")
        .crossJoin(F.broadcast(wm))
        .groupBy(
            F.col("o_orderstatus").alias("status"), bucket.alias("age_bucket")
        )
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_orders"),
            F.round(
                F.sum(F.col("o_totalprice").cast("decimal(30,6)"))
                .cast("double"),
                2,
            ).alias("open_value"),
        )
    )


def _backlog_aging_sql() -> str:
    cases = [f"WHEN age <= {AGING_BUCKETS[0][0]} THEN '{AGING_BUCKETS[0][1]}'"]
    for ub, name in AGING_BUCKETS[1:]:
        cases.append(
            f"WHEN age <= {ub} THEN '{name}'" if ub is not None
            else f"ELSE '{name}'"
        )
    case = "CASE " + " ".join(cases) + " END"
    return f"""
WITH aged AS (
  SELECT o_orderstatus AS status, o_totalprice,
         datediff('day', CAST(o_orderdate AS DATE),
                  CAST((SELECT MAX(o_orderdate) FROM orders) AS DATE)) AS age
  FROM orders WHERE o_orderstatus <> 'F'
)
SELECT status, {case} AS age_bucket,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(30,6))) AS DOUBLE), 2)
         AS open_value
FROM aged
GROUP BY status, {case}
"""

# SES forecast: α = 1/2 on purpose — (1−α)^k is then an EXACT power of two
# in IEEE-754, so every weight (and every weighted term) is bit-identical
# across engines; the window truncates at SES_LAG months both because the
# tail weights are < 2^-32 and because 2^k must stay in int64.
SES_LAG = 32


def orders_forecast_ses(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-step-ahead monthly revenue forecast by simple exponential
    smoothing (Brown SES, α = 1/2) with the full backtest in the output:
    per month — actual revenue, the SES forecast made from prior months
    only, absolute percent error — plus the series-level MAPE on every
    row. The honest-baseline operator demand planning starts from (beat
    SES before shipping anything fancier).

    ŝ_t = Σ_{i=2}^{t-1} (1/2)^{t-i} x_i + (1/2)^{t-2} x_1 (seeded at x_1,
    lag-truncated at SES_LAG). The closed form turns the recurrence into
    a pair join ON THE MONTHLY FRAME — |months|² pairs bounded by the
    CALENDAR, not the data, so the whole forecast costs one exact-decimal
    groupBy(month) reduction of the fact table plus bounded-frame math.
    Weights are 1/2^k with 2^k an int64 shift (never pow()), so terms are
    exact in both engines before the decimal sum.
    """
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderdate", "o_totalprice"
    )
    monthly = orders.groupBy(
        F.date_format("o_orderdate", "yyyy-MM").alias("ym")
    ).agg(F.sum(F.col("o_totalprice").cast(DECIMAL_T)).alias("rev_dec"))
    w = Window.orderBy("ym")
    m = monthly.select(
        "ym",
        F.col("rev_dec").cast("double").alias("revenue"),
        # fixed-point micro-units: the decimal sum has exactly 6 dp, so
        # ×1e6 → int64 is lossless and ALL forecast arithmetic below is
        # integer (half-up rounding = add 2^(k−1), shift right) — no
        # float rounding anywhere, so the engines agree bit for bit
        (F.col("rev_dec") * 1_000_000).cast("bigint").alias("xi_int"),
    ).withColumn("t", F.row_number().over(w).cast("bigint"))
    a = m.select(F.col("t").alias("ti"), "xi_int")
    # weight exponent: k = t − i for i ≥ 2, k = t − 2 for the seed i = 1
    k = F.when(F.col("ti") == 1, F.col("t") - 2).otherwise(
        F.col("t") - F.col("ti")
    )
    pairs = (
        m.select("t")
        .join(a, (F.col("ti") < F.col("t")) & (k <= SES_LAG))
        .withColumn("k", k.cast("int"))
    )
    term = F.expr(
        "CASE WHEN k = 0 THEN xi_int "
        "ELSE (xi_int + shiftleft(cast(1 as bigint), k - 1)) "
        "DIV shiftleft(cast(1 as bigint), k) END"
    )
    fc = pairs.groupBy("t").agg(
        F.sum(term).cast("bigint").alias("fc_int")
    )
    scored = m.join(fc, "t", "left").select(
        "ym",
        "t",
        "revenue",
        (F.col("fc_int").cast("double") / 1_000_000.0).alias(
            "forecast_ses"
        ),
        F.round(
            F.abs(F.col("xi_int") - F.col("fc_int")).cast("double")
            / F.col("xi_int").cast("double"),
            9,
        ).alias("abs_pct_err"),
    )
    mape = scored.filter(F.col("t") >= 2).agg(
        (
            F.sum(F.col("abs_pct_err").cast("decimal(38,12)")).cast(
                "double"
            )
            / F.count(F.lit(1))
        ).alias("mape_raw")
    )
    return (
        scored.crossJoin(F.broadcast(mape))
        .select(
            "ym",
            "revenue",
            "forecast_ses",
            "abs_pct_err",
            F.round("mape_raw", 9).alias("mape"),
        )
        .orderBy("ym")
    )


FORECAST_SES_SQL = f"""
WITH monthly AS (
  SELECT strftime(CAST(o_orderdate AS DATE), '%Y-%m') AS ym,
         SUM(CAST(o_totalprice AS DECIMAL(30,6))) AS rev_dec
  FROM orders GROUP BY 1
),
m AS (
  SELECT ym, CAST(rev_dec AS DOUBLE) AS revenue,
         CAST(rev_dec * 1000000 AS BIGINT) AS xi_int,
         CAST(ROW_NUMBER() OVER (ORDER BY ym) AS BIGINT) AS t
  FROM monthly
),
fc AS (
  SELECT m.t,
         CAST(SUM(CASE WHEN (CASE WHEN a.t = 1 THEN m.t - 2
                             ELSE m.t - a.t END) = 0 THEN a.xi_int
              ELSE (a.xi_int + (1::BIGINT <<
                      CAST((CASE WHEN a.t = 1 THEN m.t - 2
                            ELSE m.t - a.t END) - 1 AS INTEGER)))
                   // (1::BIGINT <<
                      CAST(CASE WHEN a.t = 1 THEN m.t - 2
                           ELSE m.t - a.t END AS INTEGER)) END)
           AS BIGINT) AS fc_int
  FROM m JOIN m a
    ON a.t < m.t
   AND (CASE WHEN a.t = 1 THEN m.t - 2 ELSE m.t - a.t END) <= {SES_LAG}
  GROUP BY m.t
),
scored AS (
  SELECT m.ym, m.t, m.revenue,
         CAST(fc.fc_int AS DOUBLE) / 1000000.0 AS forecast_ses,
         round(CAST(abs(m.xi_int - fc.fc_int) AS DOUBLE)
               / CAST(m.xi_int AS DOUBLE), 9) AS abs_pct_err
  FROM m LEFT JOIN fc ON fc.t = m.t
),
mape AS (
  SELECT CAST(SUM(CAST(abs_pct_err AS DECIMAL(38,12))) AS DOUBLE)
           / COUNT(*) AS mape_raw
  FROM scored WHERE t >= 2
)
SELECT ym, revenue, forecast_ses, abs_pct_err,
       round(mape.mape_raw, 9) AS mape
FROM scored CROSS JOIN mape
ORDER BY ym
"""


QUERIES = {
    "orders_forecast_ses": orders_forecast_ses,
    "orders_backlog_aging": orders_backlog_aging,
    "rfm_segmentation": rfm_segmentation,
    "window_yoy_revenue": window_yoy_revenue,
    "orders_seasonality_index": orders_seasonality_index,
    "abc_part_classification": abc_part_classification,
    "customer_churn_flags": customer_churn_flags,
    "supplier_concentration_hhi": supplier_concentration_hhi,
    "supplier_lead_time": supplier_lead_time,
    "cohort_revenue_ltv": cohort_revenue_ltv,
    "fuzzy_name_match": fuzzy_name_match,
    "basket_copurchase_lift": basket_copurchase_lift,
    "window_percentile_rank": window_percentile_rank,
    "window_first_last_order": window_first_last_order,
    "groupingsets_sales": groupingsets_sales,
    "set_intersect_customers": set_intersect_customers,
    "window_ntile_acctbal": window_ntile_acctbal,
    "pivot_sales_by_segment": pivot_sales_by_segment,
    "window_trailing_revenue": window_trailing_revenue,
    "q1_pricing_summary": q1_pricing_summary,
    "q3_shipping_priority": q3_shipping_priority,
    "q5_local_supplier": q5_local_supplier,
    "q6_forecast_revenue": q6_forecast_revenue,
    "window_top_orders_per_cust": window_top_orders_per_cust,
    "window_running_totals": window_running_totals,
    "rollup_sales": rollup_sales,
    "cube_sales": cube_sales,
    "set_ops_customers": set_ops_customers,
    "q4_order_priority": q4_order_priority,
    "q17_small_quantity_revenue": q17_small_quantity_revenue,
}

ORACLES = {
    "orders_forecast_ses": FORECAST_SES_SQL,
    "orders_backlog_aging": _backlog_aging_sql(),
    "rfm_segmentation": _rfm_sql(),
    "window_yoy_revenue": YOY_SQL,
    "orders_seasonality_index": SEASONALITY_SQL,
    "abc_part_classification": ABC_SQL,
    "customer_churn_flags": CHURN_SQL,
    "supplier_concentration_hhi": HHI_SQL,
    "supplier_lead_time": LEAD_TIME_SQL,
    "cohort_revenue_ltv": COHORT_LTV_SQL,
    "fuzzy_name_match": FUZZY_SQL,
    "basket_copurchase_lift": BASKET_SQL,
    "window_percentile_rank": PERCENT_RANK_SQL,
    "window_first_last_order": FIRST_LAST_SQL,
    "groupingsets_sales": GROUPINGSETS_SQL,
    "set_intersect_customers": SET_INTERSECT_SQL,
    "window_ntile_acctbal": NTILE_SQL,
    "pivot_sales_by_segment": _pivot_sql(),
    "window_trailing_revenue": TRAILING_SQL,
    "q1_pricing_summary": Q1_SQL,
    "q3_shipping_priority": Q3_SQL,
    "q5_local_supplier": Q5_SQL,
    "q6_forecast_revenue": Q6_SQL,
    "window_top_orders_per_cust": WINDOW_SQL,
    "window_running_totals": RUNNING_SQL,
    "rollup_sales": ROLLUP_SQL,
    "cube_sales": CUBE_SQL,
    "set_ops_customers": SET_OPS_SQL,
    "q4_order_priority": Q4_SQL,
    "q17_small_quantity_revenue": Q17_SQL,
}
