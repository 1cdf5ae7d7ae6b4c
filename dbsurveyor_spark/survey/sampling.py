"""Data sampling strategies (SURVEY.md §2.B).

Re-expresses dbsurveyor's `SamplingStrategy` / `OrderingStrategy`
(`/root/reference/dbsurveyor-core/src/models.rs:349-374`,
`/root/reference/dbsurveyor-core/src/adapters/postgres/sampling.rs`):

- MostRecent{limit}: reference builds `ORDER BY <ts> DESC LIMIT n`
  (sampling.rs:420 generate_order_by_clause). Spark plans orderBy().limit()
  as TakeOrderedAndProject — per-partition top-N heaps merged on the driver,
  no global sort, so it scales to any table size.
- Random{limit}: reference uses `TABLESAMPLE BERNOULLI` for big tables /
  `ORDER BY RANDOM()` for small (sampling.rs:599-621). Our analog is a
  DETERMINISTIC Bernoulli sample: keep rows whose portable 60-bit key hash
  lands under the rate threshold. Scan-local (no shuffle), reproducible
  across engines and runs, and stable under repartitioning — which
  `rand()`-based sampling is not.
- Stratified: per-stratum MostRecent via one window shuffle on the stratum
  key (an extension the reference lacks but a survey tool needs when a table
  mixes populations).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..catalog import load_table
from ..functions.hashing import portable_hash64, portable_hash64_sql

MOST_RECENT_LIMIT = 100
RANDOM_PCT = 5  # percent of rows kept by the deterministic Bernoulli sample
STRATUM_LIMIT = 50


def sample_most_recent_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return orders.orderBy(
        F.desc("o_orderdate"), F.desc("o_orderkey")
    ).limit(MOST_RECENT_LIMIT)


MOST_RECENT_SQL = f"""
SELECT * FROM orders
ORDER BY o_orderdate DESC, o_orderkey DESC
LIMIT {MOST_RECENT_LIMIT}
"""


def sample_random_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return orders.filter(portable_hash64(F.col("o_orderkey")) % 100 < RANDOM_PCT)


RANDOM_SQL = f"""
SELECT * FROM orders
WHERE {portable_hash64_sql("o_orderkey")} % 100 < {RANDOM_PCT}
"""


def sample_stratified_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy(F.desc("ts"), F.desc("event_id"))
    return (
        events.withColumn("rn", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rn") <= STRATUM_LIMIT)
        .drop("rn")
    )


STRATIFIED_SQL = f"""
SELECT event_id, ts, user_id, event_type, value, props
FROM (
  SELECT *, ROW_NUMBER() OVER (
    PARTITION BY event_type ORDER BY ts DESC, event_id DESC) AS rn
  FROM events
) t
WHERE rn <= {STRATUM_LIMIT}
"""


def sample_by_pk_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OrderingStrategy::PrimaryKey (models.rs:362): first N rows by PK.

    orderBy().limit() plans as TakeOrderedAndProject — per-partition top-N
    heap then a driver merge of N rows, never a global sort. With min/max
    column statistics (parquet row-group metadata) the scan also prunes
    row groups whose PK range is above the cutoff.
    """
    orders = load_table(spark, sf_dir, "orders")
    return orders.orderBy(F.asc("o_orderkey")).limit(MOST_RECENT_LIMIT)


BY_PK_SQL = f"""
SELECT * FROM orders
ORDER BY o_orderkey ASC
LIMIT {MOST_RECENT_LIMIT}
"""


QUERIES = {
    "sample_most_recent_orders": sample_most_recent_orders,
    "sample_random_orders": sample_random_orders,
    "sample_stratified_events": sample_stratified_events,
    "sample_by_pk_orders": sample_by_pk_orders,
}

ORACLES = {
    "sample_most_recent_orders": MOST_RECENT_SQL,
    "sample_random_orders": RANDOM_SQL,
    "sample_stratified_events": STRATIFIED_SQL,
    "sample_by_pk_orders": BY_PK_SQL,
}
