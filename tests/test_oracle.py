"""Oracle parity: every queries() entry vs its oracle_sql() via DuckDB.

This is the same comparison the driver runs at sf=0.01 (row count + schema +
order-insensitive values); running it at sf0.001 keeps the suite fast.
"""

from __future__ import annotations

import pytest

from dbsurveyor_spark import registry

from .conftest import SF_ORACLE, assert_frames_match

ALL_QUERIES = sorted(registry.queries())


@pytest.mark.parametrize("key", ALL_QUERIES)
def test_oracle_parity(spark, duck, key):
    qfn = registry.queries()[key]
    oracles = registry.oracle_sql()
    sdf = qfn(spark, SF_ORACLE)
    if key not in oracles:
        # Non-SQL-expressible op: driver does a rows-only check.
        assert sdf.count() >= 0
        return
    ddf = duck.execute(oracles[key]).fetchdf()
    assert_frames_match(sdf, ddf, key)
