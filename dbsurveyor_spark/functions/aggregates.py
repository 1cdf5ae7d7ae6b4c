"""Cross-engine-deterministic aggregates.

Floating-point SUM/AVG results depend on accumulation order, which differs
between Spark partitions and the DuckDB oracle (and between runs at different
parallelism). Every float aggregate in this engine therefore goes through an
EXACT decimal accumulator: per-row arithmetic stays in double (bit-identical
in any IEEE-754 engine), the row value is cast to DECIMAL, summed exactly
(order-free), and the final total is cast back to double.

This also matters at 100 TB: results become independent of partition count,
AQE decisions, and speculative re-execution.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# 30 digits, 6 fractional: holds sums of ~1e17 values of magnitude ~1e6.
DECIMAL_T = "decimal(30,6)"


def dsum(col: Column, alias: str) -> Column:
    """Order-independent SUM over a double expression, returned as double."""
    return F.sum(col.cast(DECIMAL_T)).cast("double").alias(alias)


def dsum_sql(expr: str, alias: str) -> str:
    """DuckDB fragment matching :func:`dsum`."""
    return f"CAST(SUM(CAST(({expr}) AS DECIMAL(30,6))) AS DOUBLE) AS {alias}"


def davg(col: Column, alias: str) -> Column:
    """Order-independent AVG: exact decimal sum divided by count, as double."""
    return (
        F.sum(col.cast(DECIMAL_T)).cast("double") / F.count(F.lit(1))
    ).alias(alias)


def davg_sql(expr: str, alias: str) -> str:
    """DuckDB fragment matching :func:`davg`."""
    return (
        f"CAST(SUM(CAST(({expr}) AS DECIMAL(30,6))) AS DOUBLE) / COUNT(*) AS {alias}"
    )
