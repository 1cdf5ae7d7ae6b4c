"""JDBC sampling: ordering-aware sample SQL, keyset paging, retry/backoff.

Parity: adapters/postgres/sampling.rs (generate_order_by_clause:420,
sample_table:484, TableSample models.rs:399). No live server — a stub
read_query serves canned frames and injects transient failures, which is
exactly how the retry/paging behavior gets exercised.
"""

from __future__ import annotations

import pytest

from dbsurveyor_spark.sources.jdbc_sampling import (
    collect_jdbc_samples,
    generate_order_by_clause,
    keyset_page_sql,
    paged_reader,
    sample_sql,
    sample_table,
    with_retries,
)


class TestOrderByClause:
    """Clause shapes pinned to sampling.rs:420's test vectors."""

    def test_primary_key(self):
        s = {"PrimaryKey": {"columns": ["id"]}}
        assert generate_order_by_clause(s, True) == 'ORDER BY "id" DESC'

    def test_composite_primary_key(self):
        s = {"PrimaryKey": {"columns": ["a", "b"]}}
        assert (
            generate_order_by_clause(s, True) == 'ORDER BY "a" DESC, "b" DESC'
        )

    def test_timestamp_and_autoincrement_and_rowid(self):
        for tag in ("Timestamp", "AutoIncrement", "SystemRowId"):
            s = {tag: {"column": "c"}}
            assert generate_order_by_clause(s, False) == 'ORDER BY "c" ASC'

    def test_unordered_random(self):
        assert generate_order_by_clause("Unordered") == "ORDER BY RANDOM()"

    def test_identifier_escaping(self):
        s = {"PrimaryKey": {"columns": ['we"ird']}}
        assert (
            generate_order_by_clause(s, True) == 'ORDER BY "we""ird" DESC'
        )

    def test_sample_sql_qualified(self):
        s = {"Timestamp": {"column": "created_at", "direction": "Descending"}}
        assert sample_sql("public", "events", s, 10) == (
            'SELECT * FROM "public"."events" '
            'ORDER BY "created_at" DESC LIMIT 10'
        )


class TestRetries:
    def test_transient_failures_then_success(self):
        calls, naps = [], []

        def flaky():
            calls.append(1)
            if len(calls) < 3:
                raise ConnectionError("reset by peer")
            return "ok"

        assert (
            with_retries(flaky, retries=3, backoff_s=0.5, sleep=naps.append)
            == "ok"
        )
        assert len(calls) == 3
        assert naps == [0.5, 1.0]  # exponential backoff

    def test_exhausted_reraises(self):
        def dead():
            raise ConnectionError("down")

        with pytest.raises(ConnectionError):
            with_retries(dead, retries=2, backoff_s=0.1, sleep=lambda _s: None)


class TestKeysetPaging:
    def test_first_and_resumed_page_sql(self):
        s = {"AutoIncrement": {"column": "id"}}
        assert keyset_page_sql(None, "t", s, 100) == (
            'SELECT * FROM "t" ORDER BY "id" ASC LIMIT 100'
        )
        assert keyset_page_sql(None, "t", s, 100, (42,)) == (
            'SELECT * FROM "t" WHERE "id" > 42 ORDER BY "id" ASC LIMIT 100'
        )

    def test_composite_row_value_comparison(self):
        s = {"PrimaryKey": {"columns": ["a", "b"]}}
        sql = keyset_page_sql("s", "t", s, 10, (1, "x"))
        assert 'WHERE ("a", "b") > (1, \'x\')' in sql
        assert 'ORDER BY "a" ASC, "b" ASC' in sql

    def test_unordered_rejected(self):
        with pytest.raises(ValueError):
            keyset_page_sql(None, "t", "Unordered", 10)

    def test_timestamp_requires_unique_tiebreaker(self):
        """Timestamps are not unique: a strict `ts > last` resume predicate
        skips the rest of a tie group at a page boundary (ADVICE r5). A
        bare Timestamp strategy must be rejected; with a tiebreaker the
        keyset becomes the unique (ts, tie) pair."""
        s = {"Timestamp": {"column": "created_at",
                           "direction": "Descending"}}
        with pytest.raises(ValueError, match="tiebreaker"):
            keyset_page_sql(None, "t", s, 10)
        sql = keyset_page_sql(
            None, "t", s, 10, ("2024-01-01 00:00:00", 42), tiebreaker="id"
        )
        assert (
            'WHERE ("created_at", "id") > (\'2024-01-01 00:00:00\', 42)'
            in sql
        )
        assert 'ORDER BY "created_at" ASC, "id" ASC' in sql

    def test_timestamp_paging_never_skips_tie_groups(self):
        """Regression for the ADVICE r5 data-loss scenario: a page boundary
        inside a run of equal timestamps."""
        s = {"Timestamp": {"column": "ts", "direction": "Descending"}}
        # 7 rows, 5 share ts=100 — page_size 2 splits the tie group twice
        table = [
            {"ts": 100, "id": i, "v": i} for i in range(5)
        ] + [{"ts": 200, "id": 5, "v": 5}, {"ts": 300, "id": 6, "v": 6}]

        def read_query(sql):
            lo = None
            if "WHERE" in sql:
                frag = sql.split("> (")[1].rsplit(") ORDER BY")[0]
                vals = [int(x.strip(" '")) for x in frag.split(",")]
                lo = tuple(vals)
            rows = sorted(table, key=lambda r: (r["ts"], r["id"]))
            if lo is not None:
                rows = [r for r in rows if (r["ts"], r["id"]) > lo]
            limit = int(sql.rsplit("LIMIT ", 1)[1])
            return _FakeFrame(rows[:limit])

        got = [
            r["id"]
            for page in paged_reader(
                read_query, None, "t", s, page_size=2,
                sleep=lambda _s: None, tiebreaker="id",
            )
            for r in page
        ]
        assert got == [0, 1, 2, 3, 4, 5, 6]  # nothing skipped, no dups

    def test_sql_literal_rejects_non_finite_and_roundtrips_floats(self):
        from dbsurveyor_spark.sources.jdbc_sampling import _sql_literal

        for bad in (float("nan"), float("inf"), float("-inf")):
            with pytest.raises(ValueError):
                _sql_literal(bad)
        # 17 significant digits round-trip any IEEE double exactly
        v = 0.1 + 0.2
        assert float(_sql_literal(v)) == v
        assert _sql_literal(True) == "TRUE"  # bool is not formatted as int

    def test_reader_advances_by_keyset_and_retries_same_page(self, spark):
        """3 pages of 2 rows; page 2's first attempt fails — the retry must
        re-issue the SAME keyset position (no skipped rows), and the scan
        must touch each row exactly once across pages (no OFFSET)."""
        s = {"AutoIncrement": {"column": "id"}}
        data = [(i, f"v{i}") for i in range(1, 6)]  # ids 1..5
        issued, fail_once = [], ["WHERE \"id\" > 2"]

        def read_query(sql):
            issued.append(sql)
            if fail_once and fail_once[0] in sql and "retrying" not in issued:
                fail_once.pop()
                raise ConnectionError("transient")
            # emulate the keyset scan against the table
            lo = 0
            if "WHERE" in sql:
                lo = int(sql.split('> ')[1].split(' ')[0])
            rows = [r for r in data if r[0] > lo][:2]
            return spark.createDataFrame(rows or [(None, None)],
                                         "id long, v string").filter(
                "id is not null"
            )

        pages = list(
            paged_reader(
                read_query, None, "t", s, page_size=2, sleep=lambda _s: None
            )
        )
        assert [[r["id"] for r in p] for p in pages] == [[1, 2], [3, 4], [5]]
        # the failed page-2 SQL was issued twice, identically
        p2 = [q for q in issued if 'WHERE "id" > 2' in q]
        assert len(p2) == 2 and p2[0] == p2[1]
        assert all("OFFSET" not in q for q in issued)


class TestSampleTable:
    def _reader(self, spark, rows):
        def read_query(sql):
            return spark.createDataFrame(rows, "id long, v string")

        return read_query

    def test_mostrecent_sample_document(self, spark):
        s = {"PrimaryKey": {"columns": ["id"]}}
        doc = sample_table(
            self._reader(spark, [(3, "c"), (2, "b")]),
            "public",
            "t",
            s,
            sample_size=2,
            total_rows=99,
            sleep=lambda _s: None,
        )
        assert doc["sampling_strategy"] == {"MostRecent": {"limit": 2}}
        assert doc["sample_status"] == "Complete"
        assert doc["sample_size"] == 2 and doc["total_rows"] == 99
        assert doc["rows"][0] == {"id": 3, "v": "c"}
        assert doc["warnings"] == []

    def test_short_table_warns(self, spark):
        s = {"PrimaryKey": {"columns": ["id"]}}
        doc = sample_table(
            self._reader(spark, [(1, "a")]),
            None,
            "t",
            s,
            sample_size=5,
            sleep=lambda _s: None,
        )
        assert doc["sample_size"] == 1
        assert any("less than requested" in w for w in doc["warnings"])

    def test_unordered_falls_back_to_random_with_warning(self, spark):
        doc = sample_table(
            self._reader(spark, [(1, "a")]),
            None,
            "t",
            "Unordered",
            sample_size=1,
            sleep=lambda _s: None,
        )
        assert doc["sampling_strategy"] == {"Random": {"limit": 1}}
        assert any("no reliable ordering" in w for w in doc["warnings"])

    def test_dead_table_skipped_not_fatal(self):
        def dead(sql):
            raise ConnectionError("down")

        doc = sample_table(
            dead, None, "t", "Unordered", retries=1, sleep=lambda _s: None
        )
        assert doc["rows"] == [] and doc["sample_size"] == 0
        assert "Skipped" in doc["sample_status"]

    def test_collect_samples_throttles_between_tables(self, spark):
        naps = []
        tables = [
            {"name": "a", "schema": None, "row_count": 1,
             "ordering_strategy": {"PrimaryKey": {"columns": ["id"]}}},
            {"name": "b", "schema": None, "row_count": 1,
             "ordering_strategy": "Unordered"},
        ]
        out = collect_jdbc_samples(
            self._reader(spark, [(1, "a")]),
            tables,
            sample_size=1,
            throttle_ms=250,
            sleep=naps.append,
        )
        assert [s["table_name"] for s in out] == ["a", "b"]
        assert naps == [0.25]  # once, between the two tables


class TestTablesampleFastPath:
    """sampling.rs:606-621 — large unordered Postgres tables use
    TABLESAMPLE BERNOULLI (2x oversampled) instead of ORDER BY RANDOM()."""

    def test_large_unordered_uses_bernoulli(self):
        sql = sample_sql(
            "public", "t", "Unordered", 100, total_rows=1_000_000
        )
        assert "TABLESAMPLE BERNOULLI(0.0200)" in sql  # 100*2/1e6*100
        assert "RANDOM()" not in sql and sql.endswith("LIMIT 100")

    def test_pct_clamped_to_bounds(self):
        lo = sample_sql(None, "t", "Unordered", 1, total_rows=10**9)
        assert "BERNOULLI(0.0100)" in lo  # clamped up to 0.01
        hi = sample_sql(None, "t", "Unordered", 900, total_rows=1000)
        assert "BERNOULLI(100.0000)" in hi  # clamped down to 100

    def test_small_or_unknown_or_mysql_falls_back(self):
        assert "RANDOM()" in sample_sql(None, "t", "Unordered", 10,
                                        total_rows=999)
        assert "RANDOM()" in sample_sql(None, "t", "Unordered", 10)
        assert "RANDOM()" in sample_sql(
            None, "t", "Unordered", 10, total_rows=10**6, engine="mysql"
        )

    def test_monotone_strategy_never_tablesamples(self):
        s = {"PrimaryKey": {"columns": ["id"]}}
        sql = sample_sql(None, "t", s, 10, total_rows=10**6)
        assert "TABLESAMPLE" not in sql and 'ORDER BY "id" DESC' in sql


class _FakeRow:
    def __init__(self, d):
        self._d = d

    def asDict(self):
        return dict(self._d)


class _FakeFrame:
    def __init__(self, rows):
        self._rows = rows

    def collect(self):
        return [_FakeRow(r) for r in self._rows]


class TestKeysetPagingProperty:
    """Randomized (seed-fixed, batched in-process — the repo's §5 property
    style): under arbitrary table sizes, page sizes, composite keys, and
    injected transient failures, the paged reader yields every row exactly
    once in key order, and every retry re-issues an identical query."""

    def test_never_skips_never_duplicates(self):
        import random as rnd

        rng = rnd.Random(20260815)
        for _trial in range(200):
            n = rng.randrange(0, 120)
            composite = rng.random() < 0.4
            if composite:
                keys = sorted(
                    {(rng.randrange(50), rng.randrange(50)) for _ in range(n)}
                )
                strategy = {"PrimaryKey": {"columns": ["a", "b"]}}
                table = [{"a": a, "b": b, "v": i}
                         for i, (a, b) in enumerate(keys)]
                keycols = ("a", "b")
            else:
                keys = sorted({(rng.randrange(10_000),) for _ in range(n)})
                strategy = {"AutoIncrement": {"column": "a"}}
                table = [{"a": a[0], "v": i} for i, a in enumerate(keys)]
                keycols = ("a",)
            page_size = rng.randrange(1, 40)
            fail_budget = rng.randrange(0, 3)
            issued = []

            def read_query(sql, _t=table, _fb=[fail_budget], _iss=issued,
                           _kc=keycols, _rng=rng):
                _iss.append(sql)
                if _fb[0] > 0 and _rng.random() < 0.3:
                    _fb[0] -= 1
                    raise ConnectionError("transient")
                lo = None
                if "WHERE" in sql:
                    frag = sql.split("> ")[1].rsplit(" ORDER BY")[0]
                    vals = [v.strip(" ()'") for v in frag.split(",")]
                    lo = tuple(int(v) for v in vals)
                rows = [
                    r for r in _t
                    if lo is None or tuple(r[c] for c in _kc) > lo
                ]
                limit = int(sql.rsplit("LIMIT ", 1)[1])
                return _FakeFrame(rows[:limit])

            got = [
                r
                for page in paged_reader(
                    read_query, None, "t", strategy,
                    page_size=page_size, sleep=lambda _s: None,
                )
                for r in page
            ]
            assert [tuple(r[c] for c in keycols) for r in got] == keys
            # no OFFSET ever; retried queries are byte-identical reissues
            assert all("OFFSET" not in q for q in issued)
            from collections import Counter

            for q, cnt in Counter(issued).items():
                assert cnt <= 1 + fail_budget
