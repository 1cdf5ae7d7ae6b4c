"""Live database-source operators (SURVEY.md §2.A tail).

The reference's collect surface runs against LIVE databases
(`dbsurveyor-core/src/adapters/sqlite/schema_collection.rs`,
`postgres/sampling.rs`); this container has no server database, but it
does have sqlite — so these operators exercise the real thing end to end:
a fixture .db is materialized (once, content-fingerprint-keyed) from the
SAME parquet tables the DuckDB oracle reads, then every row flows back
through a live connection path — executor-parallel rowid-range scans,
executor-parallel many-shard scans, and driver-streamed keyset paging —
and the results must value-hash-match the oracle run on the parquet
directly. A wrong type mapping, a dropped row at a partition/page
boundary, or a shard routing error all surface as an oracle mismatch.

Scale notes per operator are on the functions; the common property is
that no operator materializes table rows on the driver except the keyset
pager, whose page summaries (not rows) are what's retained — the same
shape as the reference's bulk-extraction loop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.aggregates import dsum, dsum_sql
from ..sources.sqlite_fixture import ensure_sqlite_db, ensure_sqlite_shards
from ..sources.sqlite_scale import (
    live_keyset_pages,
    read_shards,
    read_table_partitioned,
)

KEYSET_PAGE_SIZE = 1000
SHARD_COUNT = 4
SCAN_PARTITIONS = 8


def source_sqlite_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """supplier⋈nation read LIVE from sqlite via partitioned range scans.

    supplier arrives through 8 rowid-range tasks (each its own read-only
    connection — the Spark-JDBC partitionColumn shape), nation through one;
    the 25-row nation side is broadcast. At 100 TB the same plan holds:
    ranges bound per-task fetch, the join never shuffles the big side.
    """
    db = ensure_sqlite_db(sf_dir, ("supplier", "nation"))
    sup = read_table_partitioned(
        spark,
        db,
        "supplier",
        num_partitions=SCAN_PARTITIONS,
        schema="s_suppkey bigint, s_nationkey int, s_acctbal double",
    )
    nat = read_table_partitioned(
        spark,
        db,
        "nation",
        num_partitions=1,
        schema="n_nationkey int, n_name string",
    )
    return (
        sup.join(
            F.broadcast(nat), sup.s_nationkey == nat.n_nationkey, "inner"
        )
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).alias("n_suppliers"),
            dsum(F.col("s_acctbal"), "total_acctbal"),
            F.min("s_acctbal").alias("min_acctbal"),
            F.max("s_acctbal").alias("max_acctbal"),
        )
        .orderBy("n_name")
    )


SOURCE_SQLITE_ROUNDTRIP_SQL = f"""
SELECT n_name,
       COUNT(*) AS n_suppliers,
       {dsum_sql("s_acctbal", "total_acctbal")},
       MIN(s_acctbal) AS min_acctbal,
       MAX(s_acctbal) AS max_acctbal
FROM supplier JOIN nation ON s_nationkey = n_nationkey
GROUP BY n_name
ORDER BY n_name
"""


def source_sqlite_shard_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """customer read LIVE across 4 sqlite shard files, one connection per
    shard on the executor that owns the shard row — the millions-of-shards
    100 TB shape, where scan parallelism equals shard count and no shard's
    rows pass through the driver."""
    paths = ensure_sqlite_shards(sf_dir, "customer", SHARD_COUNT)
    cust = read_shards(
        spark,
        paths,
        "customer",
        "c_custkey bigint, c_nationkey int, c_acctbal double, "
        "c_mktsegment string",
    )
    return (
        cust.groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.countDistinct("c_nationkey").alias("n_nations"),
            dsum(F.col("c_acctbal"), "total_acctbal"),
            F.min("c_custkey").alias("min_custkey"),
            F.max("c_custkey").alias("max_custkey"),
        )
        .orderBy("c_mktsegment")
    )


SOURCE_SQLITE_SHARD_SCAN_SQL = f"""
SELECT c_mktsegment,
       COUNT(*) AS n_customers,
       COUNT(DISTINCT c_nationkey) AS n_nations,
       {dsum_sql("c_acctbal", "total_acctbal")},
       MIN(c_custkey) AS min_custkey,
       MAX(c_custkey) AS max_custkey
FROM customer
GROUP BY c_mktsegment
ORDER BY c_mktsegment
"""


def source_sqlite_keyset_sample(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """orders paged LIVE by primary-key keyset (page SQL from the pinned
    JDBC contract generator, bounded-backoff retries) — per-page summary
    rows prove no page boundary drops, duplicates, or reorders a row.

    Driver-streamed by design (the reference's bulk-extraction loop is a
    sequential keyset cursor); what's retained per page is a constant-size
    summary, so memory is O(pages). min/max are the float stats on purpose:
    they are order-free and exactly comparable across engines, making the
    page CONTENT (not just its row count) part of the checked value."""
    db = ensure_sqlite_db(sf_dir, ("orders",))
    strategy = {"PrimaryKey": {"columns": ["o_orderkey"]}}
    out = []
    for i, page in enumerate(
        live_keyset_pages(
            db, "orders", strategy, page_size=KEYSET_PAGE_SIZE
        )
    ):
        keys = [r["o_orderkey"] for r in page]
        prices = [r["o_totalprice"] for r in page]
        out.append(
            (i, len(page), keys[0], keys[-1], min(prices), max(prices))
        )
    return spark.createDataFrame(
        out,
        "page bigint, n_rows bigint, first_key bigint, last_key bigint, "
        "min_price double, max_price double",
    ).orderBy("page")


SOURCE_SQLITE_KEYSET_SAMPLE_SQL = f"""
WITH pg AS (
  SELECT o_orderkey, o_totalprice,
         CAST(FLOOR((ROW_NUMBER() OVER (ORDER BY o_orderkey) - 1)
                    / {KEYSET_PAGE_SIZE}.0) AS BIGINT) AS page
  FROM orders
)
SELECT page,
       COUNT(*) AS n_rows,
       MIN(o_orderkey) AS first_key,
       MAX(o_orderkey) AS last_key,
       MIN(o_totalprice) AS min_price,
       MAX(o_totalprice) AS max_price
FROM pg
GROUP BY page
ORDER BY page
"""


# Tables whose live schema the survey collects; (table, pk_col) pairs are
# static lake facts (TESTDATA.md) so the DuckDB oracle can mirror the
# fixture's INTEGER-PRIMARY-KEY promotion rule per table.
SCHEMA_TABLES = (
    ("region", "r_regionkey"),
    ("nation", "n_nationkey"),
    ("supplier", "s_suppkey"),
    ("customer", "c_custkey"),
    ("part", "p_partkey"),
    ("orders", "o_orderkey"),
)


def source_sqlite_schema_survey(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LIVE schema collection — the reference's core collect verb
    (`adapters/sqlite/schema_collection.rs` PRAGMA walk) executing against
    a real database, with row counts measured through the
    executor-parallel reader rather than trusted from metadata.

    Catalog metadata (PRAGMA table_info per table) is driver-side by
    design — it is O(columns), the same shape as the reference's
    collector; only the row counts touch data, and each count runs as a
    partitioned range scan on the PK column alone, so at 100 TB this is
    N bounded range-COUNTs per table, no driver materialization. The
    oracle recomputes every field (type mapping included) from the
    parquet via information_schema, so a drifted affinity map or a
    missed PK promotion fails the value gate.
    """
    from ..sources.sqlite import SqliteSource

    names = tuple(t for t, _pk in SCHEMA_TABLES)
    db = ensure_sqlite_db(sf_dir, names)
    src = SqliteSource(db)
    col_rows = []
    for t in names:
        for c in src.collect_table_schema(t)["columns"]:
            col_rows.append(
                (
                    t,
                    c["ordinal_position"],
                    c["name"],
                    c["data_type"],
                    c["is_primary_key"],
                    c["is_nullable"],
                )
            )
    cols = spark.createDataFrame(
        col_rows,
        "table_name string, ordinal bigint, column_name string, "
        "unified_type string, is_pk boolean, is_nullable boolean",
    )
    counts = None
    for t, pk in SCHEMA_TABLES:
        one = (
            read_table_partitioned(
                spark, db, t, num_partitions=4, columns=[pk]
            )
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_rows"))
            .select(F.lit(t).alias("table_name"), "n_rows")
        )
        counts = one if counts is None else counts.unionByName(one)
    return (
        cols.join(F.broadcast(counts), "table_name")
        .select(
            "table_name",
            "ordinal",
            "column_name",
            "unified_type",
            "is_pk",
            "is_nullable",
            "n_rows",
        )
        .orderBy("table_name", "ordinal")
    )


def _schema_survey_sql() -> str:
    names = ", ".join(f"'{t}'" for t, _pk in SCHEMA_TABLES)
    pk_parts = [
        f"""SELECT '{t}' AS table_name,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM {t}) AS n_rows,
       (SELECT COUNT(*) = COUNT(DISTINCT {pk})
           AND COUNT(*) = COUNT({pk}) FROM {t}) AS pk_ok"""
        for t, pk in SCHEMA_TABLES
    ]
    pk_union = "\n  UNION ALL\n".join(pk_parts)
    return f"""
WITH cols AS (
  SELECT table_name,
         CAST(ordinal_position AS BIGINT) AS ordinal,
         column_name,
         CASE WHEN data_type IN ('TINYINT','SMALLINT','INTEGER','BIGINT',
                                 'HUGEINT','UTINYINT','USMALLINT',
                                 'UINTEGER','UBIGINT') THEN 'BIGINT'
              WHEN data_type IN ('REAL','FLOAT','DOUBLE') THEN 'DOUBLE'
              WHEN data_type = 'BLOB' THEN 'BLOB'
              ELSE 'VARCHAR' END AS unified_type
  FROM information_schema.columns
  WHERE table_name IN ({names})
),
pk AS (
  {pk_union}
)
SELECT c.table_name, c.ordinal, c.column_name, c.unified_type,
       (c.ordinal = 1 AND c.unified_type = 'BIGINT' AND pk.pk_ok) AS is_pk,
       NOT (c.ordinal = 1 AND c.unified_type = 'BIGINT' AND pk.pk_ok)
         AS is_nullable,
       pk.n_rows
FROM cols c JOIN pk ON pk.table_name = c.table_name
ORDER BY c.table_name, c.ordinal
"""


QUERIES = {
    "source_sqlite_roundtrip": source_sqlite_roundtrip,
    "source_sqlite_shard_scan": source_sqlite_shard_scan,
    "source_sqlite_keyset_sample": source_sqlite_keyset_sample,
    "source_sqlite_schema_survey": source_sqlite_schema_survey,
}

ORACLES = {
    "source_sqlite_roundtrip": SOURCE_SQLITE_ROUNDTRIP_SQL,
    "source_sqlite_shard_scan": SOURCE_SQLITE_SHARD_SCAN_SQL,
    "source_sqlite_keyset_sample": SOURCE_SQLITE_KEYSET_SAMPLE_SQL,
    "source_sqlite_schema_survey": _schema_survey_sql(),
}
