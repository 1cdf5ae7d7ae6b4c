"""Catalog-SQL contract: the exact queries a live JDBC collect would issue.

No live Postgres/MySQL exists in the container, so — like the JDBC
reader-option golden tests — these pin structure and the load-bearing
clauses, and additionally BIND the ANSI-only queries against a DuckDB
database (DuckDB implements information_schema.tables/columns/
key_column_usage/etc.), proving they are valid SQL that returns the
expected columns on a real catalog, not just strings."""

from __future__ import annotations

import duckdb
import pytest

from dbsurveyor_spark.sources.catalog_sql import (
    ENGINES,
    catalog_queries,
    column_query,
    foreign_key_query,
    index_query,
    table_list_query,
)


class TestContract:
    @pytest.mark.parametrize("engine", ENGINES)
    def test_sweep_covers_every_document_section(self, engine):
        qs = catalog_queries(engine)
        assert list(qs) == [
            "tables", "columns", "primary_keys", "foreign_keys",
            "indexes", "views", "routines", "triggers",
        ]
        for sql in qs.values():
            assert sql.startswith("SELECT ")
            assert "ORDER BY" in sql  # byte-stable documents

    @pytest.mark.parametrize("engine", ENGINES)
    def test_system_schemas_always_excluded(self, engine):
        for key, sql in catalog_queries(engine).items():
            assert "NOT IN (" in sql, f"{engine}.{key} misses system filter"
            assert "information_schema'" in sql or "pg_catalog" in sql or (
                engine == "mysql"
            ), f"{engine}.{key}"

    def test_engine_specific_seams(self):
        # the ONE engine-specific catalog: index metadata
        assert "pg_index" in index_query("postgresql")
        assert "information_schema.statistics" in index_query("mysql")
        # mysql FKs come straight off key_column_usage; postgres aligns
        # composite-FK column pairs positionally via pg_constraint's
        # conkey/confkey arrays (the information_schema kcu×ccu join has
        # no ordinal correlation and cross-products composite FKs)
        assert "referenced_table_name" in foreign_key_query("mysql")
        pg_fk = foreign_key_query("postgresql")
        assert "pg_constraint" in pg_fk
        assert "unnest(con.conkey) WITH ORDINALITY" in pg_fk
        assert "con.confkey[k.ord]" in pg_fk
        assert "referenced_schema_name" in pg_fk
        # expression-index entries (attnum 0) must survive via LEFT JOIN
        pg_ix = index_query("postgresql")
        assert "LEFT JOIN pg_attribute" in pg_ix
        assert "'<expression>'" in pg_ix
        # unified-type-mapper inputs: engine-native type column
        assert "udt_name" in column_query("postgresql")
        assert "column_type" in column_query("mysql")
        with pytest.raises(ValueError):
            table_list_query("oracle")


class TestBindsOnRealCatalog:
    """DuckDB ships the ANSI information_schema views, so the portable
    queries must BIND and project the contracted columns on a real
    database with tables, keys, and views."""

    @pytest.fixture(scope="class")
    def con(self):
        con = duckdb.connect()
        con.execute(
            """
            CREATE TABLE users (id BIGINT PRIMARY KEY, name VARCHAR);
            CREATE TABLE orders (
              order_id BIGINT PRIMARY KEY,
              user_id BIGINT REFERENCES users(id),
              amount DECIMAL(12,2)
            );
            CREATE VIEW v_users AS SELECT id FROM users;
            """
        )
        yield con
        con.close()

    def _pg_compatible(self, sql: str) -> str:
        # DuckDB lacks udt_name/external_language extensions; swap for
        # ANSI columns of the same arity so binding still proves shape.
        return sql.replace("c.udt_name", "c.data_type").replace(
            "r.external_language", "CAST(NULL AS VARCHAR)"
        )

    def test_table_list_binds_and_sees_tables(self, con):
        rows = con.execute(table_list_query("postgresql")).fetchall()
        names = {r[1] for r in rows}
        assert {"users", "orders"} <= names
        # system/catalog schemas absent
        assert all(r[0] not in ("information_schema", "pg_catalog") for r in rows)

    def test_column_query_binds_with_ordinals(self, con):
        rows = con.execute(
            self._pg_compatible(column_query("postgresql"))
        ).fetchall()
        got = [(r[1], r[2], r[3]) for r in rows if r[1] == "orders"]
        assert got == [
            ("orders", "order_id", 1),
            ("orders", "user_id", 2),
            ("orders", "amount", 3),
        ]

    def test_pk_query_binds(self, con):
        # (information_schema.views exists on real Postgres/MySQL but not
        # in DuckDB's compatibility layer, so the view query stays a
        # structural contract only)
        from dbsurveyor_spark.sources.catalog_sql import primary_key_query

        pks = con.execute(primary_key_query("postgresql")).fetchall()
        assert {(r[1], r[3]) for r in pks} >= {
            ("users", "id"),
            ("orders", "order_id"),
        }
