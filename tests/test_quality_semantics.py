"""Unit tests for quality-analyzer edge cases, mirroring the reference's own
test matrix (quality/{completeness,uniqueness,anomaly}.rs #[cfg(test)]).

These run on tiny in-memory frames (not the parquet tables) and pin the
semantic contract: empty→1.0, all-null→0.0, whitespace≠empty, null counts as
a duplicate value, z-score needs ≥3 values and std>1e-10.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from dbsurveyor_spark.functions.hashing import minhash_params, portable_hash64
from dbsurveyor_spark.functions.text import shingles, tokens


def _completeness(spark, rows, col):
    df = spark.createDataFrame(rows, f"{col} string")
    out = df.agg(
        F.count(F.lit(1)).alias("total"),
        (F.count(F.lit(1)) - F.count(F.col(col))).alias("nulls"),
        F.coalesce(F.sum((F.col(col) == "").cast("bigint")), F.lit(0)).alias("empty"),
    ).collect()[0]
    total = out.total
    return 1.0 if total == 0 else (total - out.nulls - out.empty) / total


def test_completeness_whitespace_not_empty(spark):
    # completeness.rs:242 — whitespace-only strings are present, not empty
    assert _completeness(spark, [("  ",), ("\t",), ("valid",)], "v") == 1.0


def test_completeness_all_nulls_is_zero(spark):
    assert _completeness(spark, [(None,), (None,)], "v") == 0.0


def test_completeness_mixed(spark):
    # 1 null + 1 empty of 4 → 0.5 for that column
    assert _completeness(spark, [(None,), ("",), ("a",), ("b",)], "v") == 0.5


def test_uniqueness_null_counts_as_value(spark):
    # uniqueness.rs:213 — two nulls are one distinct value + one duplicate
    df = spark.createDataFrame([(None,), (None,), ("x",)], "v string")
    out = df.agg(
        (
            F.count(F.lit(1))
            - (
                F.count_distinct(F.col("v"))
                + (F.count(F.lit(1)) > F.count(F.col("v"))).cast("bigint")
            )
        ).alias("dups")
    ).collect()[0]
    assert out.dups == 1


def test_zscore_constant_column_no_outliers(spark):
    # anomaly.rs:54 — std < 1e-10 → column skipped
    df = spark.createDataFrame([(5.0,)] * 10, "v double")
    stats = df.agg(
        F.stddev_pop("v").alias("sd"),
    ).collect()[0]
    assert stats.sd < 1e-10


def test_portable_hash64_matches_duckdb(spark, duck):
    got = spark.range(1).select(portable_hash64(F.lit("hello")).alias("h")).collect()[
        0
    ].h
    want = duck.execute(
        "SELECT CAST(('0x' || substring(md5('hello'), 1, 15)) AS BIGINT)"
    ).fetchone()[0]
    assert got == want == 419982666956583591


def test_minhash_params_fixed():
    params = minhash_params(4)
    assert params == minhash_params(4)  # deterministic
    assert all(1 <= a < (1 << 30) and 0 <= b < (1 << 31) - 1 for a, b in params)
    assert len({p for p in params}) == 4


def test_shingles_short_doc_empty(spark):
    df = spark.createDataFrame([("one two",), ("a b c d",)], "text string")
    out = df.select(shingles(tokens(F.col("text"))).alias("sh")).collect()
    assert out[0].sh == []
    assert out[1].sh == ["a b c", "b c d"]
