"""Portable deterministic hashing.

Every hash in this engine must produce IDENTICAL values in Spark and in the
DuckDB correctness oracle, so all hashing is derived from md5 (identical
everywhere) rather than engine-native hash functions (Spark xxhash64 and
DuckDB hash() disagree).

``portable_hash64`` = first 15 hex chars of md5 → 60-bit non-negative bigint.
Spark:  CAST(conv(substring(md5(x), 1, 15), 16, 10) AS BIGINT)
DuckDB: CAST(('0x' || substring(md5(x), 1, 15)) AS BIGINT)

This is also the scale story: md5 is computed JVM-side (whole-stage codegen),
evenly distributed (good shuffle keys, no skew), and needs no UDF.

MinHash permutations use the classic universal-hash family
h_i(x) = (a_i * x + b_i) mod p with fixed constants and the Mersenne prime
2^31-1, matching the construction in Broder's MinHash papers (public
literature). The base hash is reduced to 32 bits and the multipliers kept
below 2^30 so a*x + b stays < 2^63 — no BIGINT overflow in either engine
(Spark 4 runs in ANSI mode where overflow throws; DuckDB likewise).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

HASH_HEX_LEN = 15  # 60 bits < 63, always fits a signed BIGINT
HASH32_HEX_LEN = 8  # 32-bit variant for arithmetic-safe minhash
HASH48_HEX_LEN = 12  # 48-bit variant: every bit 0..47 is meaningful (simhash)
MERSENNE_31 = (1 << 31) - 1


def portable_hash64(col: Column | str) -> Column:
    """60-bit non-negative deterministic hash of a column's string form."""
    c = F.col(col) if isinstance(col, str) else col
    return F.conv(F.substring(F.md5(c.cast("string")), 1, HASH_HEX_LEN), 16, 10).cast(
        "bigint"
    )


def portable_hash64_sql(expr: str) -> str:
    """DuckDB SQL fragment computing the same value as :func:`portable_hash64`."""
    return (
        f"CAST(('0x' || substring(md5(CAST({expr} AS VARCHAR)), 1, {HASH_HEX_LEN})) "
        "AS BIGINT)"
    )


def portable_hash32(col: Column | str) -> Column:
    """32-bit non-negative deterministic hash (arithmetic-safe for minhash)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.conv(F.substring(F.md5(c.cast("string")), 1, HASH32_HEX_LEN), 16, 10).cast(
        "bigint"
    )


def portable_hash32_sql(expr: str) -> str:
    """DuckDB SQL fragment computing the same value as :func:`portable_hash32`."""
    return (
        f"CAST(('0x' || substring(md5(CAST({expr} AS VARCHAR)), 1, {HASH32_HEX_LEN})) "
        "AS BIGINT)"
    )


def portable_hash48(col: Column | str) -> Column:
    """48-bit deterministic hash — for bit-sampling uses (SimHash) where
    every bit position up to 47 must actually vary. (portable_hash32 only
    populates bits 0..31: shifting it right by ≥32 is constantly zero.)"""
    c = F.col(col) if isinstance(col, str) else col
    return F.conv(F.substring(F.md5(c.cast("string")), 1, HASH48_HEX_LEN), 16, 10).cast(
        "bigint"
    )


def portable_hash48_sql(expr: str) -> str:
    """DuckDB SQL fragment computing the same value as :func:`portable_hash48`."""
    return (
        f"CAST(('0x' || substring(md5(CAST({expr} AS VARCHAR)), 1, {HASH48_HEX_LEN})) "
        "AS BIGINT)"
    )


def minhash_params(k: int, seed: int = 7) -> list[tuple[int, int]]:
    """Deterministic (a, b) pairs for k universal-hash permutations.

    a < 2^30 and b < 2^31-1, so with a 32-bit input hash the affine form
    a*x + b is below 2^63. Uses a small LCG (public-domain constants from
    Numerical Recipes) so the list is reproducible in any language.
    """
    params: list[tuple[int, int]] = []
    state = seed
    for _ in range(k):
        state = (state * 1664525 + 1013904223) % (1 << 63)
        a = (state % ((1 << 30) - 1)) + 1  # 1 .. 2^30-1
        state = (state * 1664525 + 1013904223) % (1 << 63)
        b = state % MERSENNE_31
        params.append((a, b))
    return params
