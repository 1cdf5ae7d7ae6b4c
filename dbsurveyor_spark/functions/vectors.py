"""Vector math over array<float> embedding columns — JVM-side, no UDFs.

Dot products / norms / cosine are expressed with Spark higher-order functions
(`zip_with` + `aggregate`), which run inside whole-stage codegen. The DuckDB
oracle mirrors the computation with `list_transform` + `list_reduce` using the
SAME left-fold order, so results are bit-identical IEEE doubles (verified
empirically; `list_dot_product` is NOT used because its accumulation order is
not contractually the same).

Cosine values exposed in query outputs are rounded to 9 decimals to absorb
any residual representation differences at display boundaries.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

COS_ROUND = 9


def as_double(col: Column) -> Column:
    return col.cast("array<double>")


def dot(a: Column, b: Column) -> Column:
    """Left-fold dot product of two double arrays."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity; 0.0 for zero-norm inputs (portable guard)."""
    d = dot(a, b)
    na, nb = norm(a), norm(b)
    return F.when((na > 0) & (nb > 0), d / (na * nb)).otherwise(F.lit(0.0))


def cosine_rounded(a: Column, b: Column) -> Column:
    return F.round(cosine(a, b), COS_ROUND)


# ------------------------------------------------------------- DuckDB mirror


def dot_sql(a: str, b: str) -> str:
    """DuckDB fragment: same left-fold order as :func:`dot`."""
    return (
        f"list_reduce(list_prepend(0.0, "
        f"list_transform(list_zip(CAST({a} AS DOUBLE[]), CAST({b} AS DOUBLE[])), "
        f"p -> p[1] * p[2])), (acc, v) -> acc + v)"
    )


def dot_self_sql(a: str) -> str:
    return (
        f"list_reduce(list_prepend(0.0, "
        f"list_transform(CAST({a} AS DOUBLE[]), x -> x * x)), (acc, v) -> acc + v)"
    )


def cosine_sql(a: str, b: str) -> str:
    d = dot_sql(a, b)
    na = f"sqrt({dot_self_sql(a)})"
    nb = f"sqrt({dot_self_sql(b)})"
    return (
        f"CASE WHEN {na} > 0 AND {nb} > 0 THEN ({d}) / (({na}) * ({nb})) "
        f"ELSE 0.0 END"
    )


def cosine_rounded_sql(a: str, b: str) -> str:
    return f"round({cosine_sql(a, b)}, {COS_ROUND})"
