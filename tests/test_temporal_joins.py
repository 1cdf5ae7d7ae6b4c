"""Edge-case semantics for the as-of and range joins (operators/asof.py),
on tiny in-memory frames (SURVEY.md §5.1 style)."""

from __future__ import annotations

from datetime import datetime

import pytest
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _asof(spark, events_rows, orders_rows):
    """Re-run the as-of composition on explicit frames (same construction
    as asof_join_events_orders, parameterized for edge-case injection)."""
    events = spark.createDataFrame(
        events_rows, "event_id bigint, ts timestamp, user_id bigint, event_type string"
    )
    orders = spark.createDataFrame(
        orders_rows, "o_orderkey bigint, o_custkey bigint, o_orderdate timestamp"
    )
    tagged_events = events.select(
        F.col("user_id").alias("k"),
        F.col("ts").alias("t"),
        F.lit(0).alias("side"),
        "event_id",
        F.col("ts").alias("event_ts"),
        "event_type",
        F.lit(None).cast("bigint").alias("o_orderkey"),
        F.lit(None).cast("timestamp").alias("o_orderdate"),
    )
    tagged_orders = orders.select(
        F.col("o_custkey").alias("k"),
        F.col("o_orderdate").alias("t"),
        F.lit(1).alias("side"),
        F.lit(None).cast("bigint").alias("event_id"),
        F.lit(None).cast("timestamp").alias("event_ts"),
        F.lit(None).cast("string").alias("event_type"),
        "o_orderkey",
        "o_orderdate",
    )
    w = (
        Window.partitionBy("k")
        .orderBy("t", "side", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        tagged_events.unionByName(tagged_orders)
        .withColumn("last_event_id", F.last("event_id", ignorenulls=True).over(w))
        .filter(F.col("side") == 1)
        .select("o_orderkey", "last_event_id")
    )


TS = datetime


class TestAsofEdgeCases:
    def test_order_before_any_event_gets_null(self, spark):
        out = _asof(
            spark,
            [(1, TS(2000, 1, 2), 7, "click")],
            [(100, 7, TS(2000, 1, 1))],
        ).collect()
        assert out[0].last_event_id is None

    def test_equal_timestamp_event_matches(self, spark):
        # as-of is <= : an event AT the order date is eligible (events sort
        # before orders at equal t via the side tag)
        out = _asof(
            spark,
            [(1, TS(2000, 1, 1), 7, "click")],
            [(100, 7, TS(2000, 1, 1))],
        ).collect()
        assert out[0].last_event_id == 1

    def test_picks_latest_not_first(self, spark):
        out = _asof(
            spark,
            [
                (1, TS(2000, 1, 1), 7, "a"),
                (2, TS(2000, 1, 5), 7, "b"),
                (3, TS(2000, 2, 1), 7, "after"),
            ],
            [(100, 7, TS(2000, 1, 10))],
        ).collect()
        assert out[0].last_event_id == 2

    def test_no_cross_user_leakage(self, spark):
        out = {
            r.o_orderkey: r.last_event_id
            for r in _asof(
                spark,
                [(1, TS(2000, 1, 1), 7, "a")],
                [(100, 7, TS(2000, 1, 2)), (200, 8, TS(2000, 1, 2))],
            ).collect()
        }
        assert out == {100: 1, 200: None}


class TestRangeJoinEdgeCases:
    @pytest.fixture(scope="class")
    def run(self, spark):
        from dbsurveyor_spark.operators.asof import RANGE_SECONDS

        def _run(rows):
            events = spark.createDataFrame(
                rows,
                "event_id bigint, ts timestamp, user_id bigint, event_type string",
            )
            errors = events.filter(F.col("event_type") == "error").select(
                F.col("event_id").alias("err_id"),
                F.col("user_id").alias("err_user"),
                F.col("ts").alias("err_ts"),
                F.floor(F.unix_timestamp("ts") / RANGE_SECONDS).alias("err_bucket"),
            )
            cand = events.select(
                "event_id",
                F.col("user_id").alias("c_user"),
                F.col("ts").alias("c_ts"),
                F.floor(F.unix_timestamp("ts") / RANGE_SECONDS).alias("c_bucket"),
            )
            joined = errors.join(
                cand,
                (F.col("err_user") == F.col("c_user"))
                & (F.col("c_bucket") >= F.col("err_bucket") - 1)
                & (F.col("c_bucket") <= F.col("err_bucket"))
                & (F.col("c_ts") <= F.col("err_ts"))
                & (F.col("c_ts") > F.col("err_ts") - F.expr("INTERVAL 30 MINUTES"))
                & (F.col("event_id") != F.col("err_id")),
                "left",
            )
            return {
                r.event_id: r.nearby_count
                for r in joined.groupBy(F.col("err_id").alias("event_id"))
                .agg(F.count(F.col("event_id")).alias("nearby_count"))
                .collect()
            }

        return _run

    def test_exact_boundary_excluded(self, run):
        # candidate exactly 30:00 before the error is OUTSIDE (strict >)
        counts = run(
            [
                (1, TS(2000, 1, 1, 11, 30, 0), 7, "click"),
                (2, TS(2000, 1, 1, 12, 0, 0), 7, "error"),
            ]
        )
        assert counts[2] == 0

    def test_bucket_straddle_counted(self, run):
        # candidate 29:59 before, in the PREVIOUS bucket — must still count
        counts = run(
            [
                (1, TS(2000, 1, 1, 11, 30, 1), 7, "click"),
                (2, TS(2000, 1, 1, 12, 0, 0), 7, "error"),
            ]
        )
        assert counts[2] == 1

    def test_error_isolated_gets_zero_not_missing(self, run):
        counts = run([(1, TS(2000, 1, 1), 7, "error")])
        assert counts == {1: 0}

    def test_future_event_not_counted(self, run):
        counts = run(
            [
                (1, TS(2000, 1, 1, 12, 0, 1), 7, "click"),
                (2, TS(2000, 1, 1, 12, 0, 0), 7, "error"),
            ]
        )
        assert counts[2] == 0
