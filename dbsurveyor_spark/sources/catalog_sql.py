"""Catalog SQL for live relational collection over JDBC.

The reference's largest modules are its engine adapters' schema collection
(`adapters/postgres/schema_collection.rs`, `adapters/mysql/*`): catalog
queries for tables, columns, keys, indexes, views, routines, and triggers.
No live database exists in this container, so the collection path here is a
PINNED CONTRACT: this module owns the exact SQL a `collect` against a live
Postgres/MySQL would push through `JdbcSource.read_query`, and golden tests
assert it (like the JDBC reader-option contract). The queries are written
information_schema-first (ANSI catalog views both engines implement), with
engine-specific catalogs only where the standard has no equivalent
(Postgres index metadata lives in pg_catalog; MySQL's in
information_schema.statistics).

Scale/behavior notes:
- every query filters out system schemas, so a server-wide sweep never
  drags catalog internals;
- results are metadata-scale; Spark-side these land via one single-split
  JDBC read each (no partitioning columns needed);
- ordering is pinned (schema, table, ordinal) so collected documents are
  byte-stable across runs — the property the drift differ relies on.
"""

from __future__ import annotations

ENGINES = ("postgresql", "mysql")

_PG_SYSTEM = "('pg_catalog', 'information_schema', 'pg_toast')"
_MY_SYSTEM = "('mysql', 'information_schema', 'performance_schema', 'sys')"


def _system_schemas(engine: str) -> str:
    if engine == "postgresql":
        return _PG_SYSTEM
    if engine == "mysql":
        return _MY_SYSTEM
    raise ValueError(f"unsupported engine {engine!r}; expected one of {ENGINES}")


def table_list_query(engine: str) -> str:
    """Base tables per non-system schema, with catalog row-count estimates
    where the engine keeps them (MySQL) — NULL otherwise (Postgres keeps
    estimates in pg_class; the collector takes exact counts later)."""
    sys_in = _system_schemas(engine)
    rows = (
        "t.table_rows" if engine == "mysql" else "CAST(NULL AS BIGINT)"
    )
    return (
        "SELECT t.table_schema AS schema_name, t.table_name, "
        f"{rows} AS approx_rows "
        "FROM information_schema.tables t "
        "WHERE t.table_type = 'BASE TABLE' "
        f"AND t.table_schema NOT IN {sys_in} "
        "ORDER BY t.table_schema, t.table_name"
    )


def column_query(engine: str) -> str:
    """All columns of non-system tables in ordinal order, with the fields
    the unified type mapper consumes (sources/typemap.py): data type, udt,
    nullability, default, char length, numeric precision/scale."""
    sys_in = _system_schemas(engine)
    udt = "c.udt_name" if engine == "postgresql" else "c.column_type"
    # auto-increment detection feeds OrderingStrategy::AutoIncrement
    # (models.rs:362; postgres/sampling.rs ordering detection): serial
    # columns carry a nextval() default, identity columns set is_identity;
    # MySQL flags auto_increment in the `extra` column.
    # is_identity is VARCHAR 'YES'/'NO' on Postgres but BOOL in DuckDB's
    # compatibility layer (where the bind test runs) — CAST keeps the
    # predicate portable across both.
    autoinc = (
        "(c.column_default LIKE 'nextval(%' "
        "OR CAST(c.is_identity AS VARCHAR) IN ('YES', 'true'))"
        if engine == "postgresql"
        else "(c.extra LIKE '%auto_increment%')"
    )
    return (
        "SELECT c.table_schema AS schema_name, c.table_name, c.column_name, "
        f"c.ordinal_position, c.data_type, {udt} AS engine_type, "
        "c.is_nullable, c.column_default, c.character_maximum_length, "
        f"c.numeric_precision, c.numeric_scale, {autoinc} AS is_auto_increment "
        "FROM information_schema.columns c "
        f"WHERE c.table_schema NOT IN {sys_in} "
        "ORDER BY c.table_schema, c.table_name, c.ordinal_position"
    )


def primary_key_query(engine: str) -> str:
    sys_in = _system_schemas(engine)
    return (
        "SELECT tc.table_schema AS schema_name, tc.table_name, "
        "tc.constraint_name, kcu.column_name, kcu.ordinal_position "
        "FROM information_schema.table_constraints tc "
        "JOIN information_schema.key_column_usage kcu "
        "ON kcu.constraint_name = tc.constraint_name "
        "AND kcu.table_schema = tc.table_schema "
        "AND kcu.table_name = tc.table_name "
        "WHERE tc.constraint_type = 'PRIMARY KEY' "
        f"AND tc.table_schema NOT IN {sys_in} "
        "ORDER BY tc.table_schema, tc.table_name, kcu.ordinal_position"
    )


def foreign_key_query(engine: str) -> str:
    """FK edges with referenced schema/table/column. MySQL's
    key_column_usage carries the referenced side directly. Postgres uses
    pg_constraint's conkey/confkey arrays with positional (ordinality)
    alignment — the information_schema route (key_column_usage ×
    constraint_column_usage) has NO ordinal correlation between the two
    sides, so a composite FK would cross-product into misaligned column
    pairs; the reference aligns via array_position(conkey/confkey) for
    exactly this reason (postgres/schema_collection.rs:616-642)."""
    sys_in = _system_schemas(engine)
    if engine == "mysql":
        return (
            "SELECT kcu.table_schema AS schema_name, kcu.table_name, "
            "kcu.constraint_name, kcu.column_name, kcu.ordinal_position, "
            "kcu.referenced_table_schema AS referenced_schema_name, "
            "kcu.referenced_table_name, kcu.referenced_column_name "
            "FROM information_schema.key_column_usage kcu "
            "WHERE kcu.referenced_table_name IS NOT NULL "
            f"AND kcu.table_schema NOT IN {sys_in} "
            "ORDER BY kcu.table_schema, kcu.table_name, "
            "kcu.constraint_name, kcu.ordinal_position"
        )
    return (
        "SELECT ns.nspname AS schema_name, tc.relname AS table_name, "
        "con.conname AS constraint_name, att.attname AS column_name, "
        "k.ord AS ordinal_position, "
        "fns.nspname AS referenced_schema_name, "
        "ftc.relname AS referenced_table_name, "
        "fatt.attname AS referenced_column_name "
        "FROM pg_constraint con "
        "JOIN pg_class tc ON tc.oid = con.conrelid "
        "JOIN pg_namespace ns ON ns.oid = tc.relnamespace "
        "JOIN pg_class ftc ON ftc.oid = con.confrelid "
        "JOIN pg_namespace fns ON fns.oid = ftc.relnamespace "
        "CROSS JOIN LATERAL unnest(con.conkey) WITH ORDINALITY AS k(attnum, ord) "
        "JOIN pg_attribute att "
        "ON att.attrelid = con.conrelid AND att.attnum = k.attnum "
        "JOIN pg_attribute fatt "
        "ON fatt.attrelid = con.confrelid AND fatt.attnum = con.confkey[k.ord] "
        "WHERE con.contype = 'f' "
        f"AND ns.nspname NOT IN {_PG_SYSTEM} "
        "ORDER BY schema_name, table_name, constraint_name, ordinal_position"
    )


def index_query(engine: str) -> str:
    """Index metadata. The ANSI catalog has no index view, so this is the
    one genuinely engine-specific query: pg_catalog join on Postgres,
    information_schema.statistics on MySQL."""
    if engine == "mysql":
        return (
            "SELECT s.table_schema AS schema_name, s.table_name, "
            "s.index_name, s.column_name, s.seq_in_index, "
            "(s.non_unique = 0) AS is_unique, "
            "(s.index_name = 'PRIMARY') AS is_primary, "
            "s.index_type "
            "FROM information_schema.statistics s "
            f"WHERE s.table_schema NOT IN {_MY_SYSTEM} "
            "ORDER BY s.table_schema, s.table_name, s.index_name, "
            "s.seq_in_index"
        )
    if engine != "postgresql":
        raise ValueError(f"unsupported engine {engine!r}")
    # pg_attribute is LEFT-joined: expression-index entries carry attnum 0
    # (no attribute row) and would silently vanish under an inner join —
    # they surface as the '<expression>' placeholder instead (the full
    # definition is recoverable via pg_get_indexdef on a live server).
    return (
        "SELECT ns.nspname AS schema_name, tc.relname AS table_name, "
        "ic.relname AS index_name, "
        "COALESCE(att.attname, '<expression>') AS column_name, "
        "k.ord AS seq_in_index, ix.indisunique AS is_unique, "
        "ix.indisprimary AS is_primary, am.amname AS index_type "
        "FROM pg_index ix "
        "JOIN pg_class tc ON tc.oid = ix.indrelid "
        "JOIN pg_class ic ON ic.oid = ix.indexrelid "
        "JOIN pg_namespace ns ON ns.oid = tc.relnamespace "
        "JOIN pg_am am ON am.oid = ic.relam "
        "CROSS JOIN LATERAL unnest(ix.indkey) WITH ORDINALITY AS k(attnum, ord) "
        "LEFT JOIN pg_attribute att "
        "ON att.attrelid = tc.oid AND att.attnum = k.attnum "
        f"WHERE ns.nspname NOT IN {_PG_SYSTEM} "
        "ORDER BY schema_name, table_name, index_name, seq_in_index"
    )


def view_query(engine: str) -> str:
    sys_in = _system_schemas(engine)
    return (
        "SELECT v.table_schema AS schema_name, v.table_name AS view_name, "
        "v.view_definition "
        "FROM information_schema.views v "
        f"WHERE v.table_schema NOT IN {sys_in} "
        "ORDER BY v.table_schema, v.table_name"
    )


def routine_query(engine: str) -> str:
    """Stored procedures and functions (the reference's routines.rs
    surface): name, kind, language, return type, definition where the
    catalog exposes it."""
    sys_in = _system_schemas(engine)
    return (
        "SELECT r.routine_schema AS schema_name, r.routine_name, "
        "r.routine_type, r.external_language AS language, "
        "r.data_type AS return_type, r.routine_definition "
        "FROM information_schema.routines r "
        f"WHERE r.routine_schema NOT IN {sys_in} "
        "ORDER BY r.routine_schema, r.routine_name"
    )


def trigger_query(engine: str) -> str:
    sys_in = _system_schemas(engine)
    return (
        "SELECT t.trigger_schema AS schema_name, t.trigger_name, "
        "t.event_manipulation AS event, t.event_object_table AS table_name, "
        "t.action_timing AS timing, t.action_statement "
        "FROM information_schema.triggers t "
        f"WHERE t.trigger_schema NOT IN {sys_in} "
        "ORDER BY t.trigger_schema, t.trigger_name, t.event_manipulation"
    )


def catalog_queries(engine: str) -> dict[str, str]:
    """The full collection sweep, keyed by the document section each query
    populates. A live `collect` runs these through JdbcSource.read_query
    in this order."""
    return {
        "tables": table_list_query(engine),
        "columns": column_query(engine),
        "primary_keys": primary_key_query(engine),
        "foreign_keys": foreign_key_query(engine),
        "indexes": index_query(engine),
        "views": view_query(engine),
        "routines": routine_query(engine),
        "triggers": trigger_query(engine),
    }
