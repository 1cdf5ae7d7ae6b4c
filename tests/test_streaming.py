"""True Structured Streaming: file source + watermark + availableNow;
session_window sessionization; applyInPandasWithState custom operator."""

from __future__ import annotations

import os
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from dbsurveyor_spark.catalog import load_table
from dbsurveyor_spark.streaming.events import (
    stream_session_window_job,
    stream_sessionization,
    stream_stateful_user_totals_job,
    stream_tumbling_counts,
    stream_windowed_counts_job,
)

from .conftest import SF_ORACLE


@pytest.fixture
def ckpt():
    os.makedirs("/root/repo/.tmp", exist_ok=True)
    d = tempfile.mkdtemp(prefix="ckpt_", dir="/root/repo/.tmp")
    yield d
    shutil.rmtree(d, ignore_errors=True)
    shutil.rmtree(d + "_src", ignore_errors=True)


def test_streaming_matches_batch(spark, ckpt):
    streamed = stream_windowed_counts_job(spark, SF_ORACLE, ckpt)
    batch = stream_tumbling_counts(spark, SF_ORACLE).select(
        "window_start", "event_type", "event_count"
    )
    s = {tuple(r) for r in streamed.collect()}
    b = {tuple(r) for r in batch.collect()}
    assert s == b, f"stream/batch divergence: {len(s ^ b)} rows differ"
    assert len(s) > 0


def test_session_window_matches_batch_sessionization(spark, ckpt):
    """Native session_window streaming sessions == batch lag/cumsum sessions
    (same 30-min gap; boundary semantics differ only at exact-gap ties,
    which the synthetic microsecond timestamps never hit)."""
    streamed = stream_session_window_job(spark, SF_ORACLE, ckpt)
    batch = (
        stream_sessionization(spark, SF_ORACLE)
        .select("user_id", "n_events", "value_sum")
    )
    s = sorted(map(tuple, streamed.collect()))
    b = sorted(map(tuple, batch.collect()))
    assert len(s) > 0
    assert s == b, f"session divergence: {len(set(s) ^ set(b))} rows differ"


def test_stateful_user_totals(spark, ckpt):
    """applyInPandasWithState totals == plain batch groupBy totals."""
    streamed = stream_stateful_user_totals_job(spark, SF_ORACLE, ckpt)
    batch = (
        load_table(spark, SF_ORACLE, "events")
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 6).alias("value_sum"),
        )
    )
    s = {(r.user_id, r.n_events) for r in streamed.collect()}
    b = {(r.user_id, r.n_events) for r in batch.collect()}
    assert len(s) > 0
    assert s == b, f"stateful totals diverge: {len(s ^ b)} rows differ"


def test_stream_dedup_emits_each_event_once(spark, ckpt):
    """Injected duplicate deliveries must collapse: one output row per
    event_id, payload equal to the batch table's."""
    from dbsurveyor_spark.streaming.events import DUP_MOD, stream_dedup_job

    out = stream_dedup_job(spark, SF_ORACLE, ckpt)
    events = load_table(spark, SF_ORACLE, "events")
    n_events = events.count()
    assert out.count() == n_events
    assert out.select("event_id").distinct().count() == n_events
    # spot-check payload equality on the re-delivered subset
    dup_ids = out.filter(F.col("event_id") % DUP_MOD == 0).count()
    assert dup_ids == events.filter(F.col("event_id") % DUP_MOD == 0).count()


def test_trending_job_matches_batch(spark, ckpt):
    """foreachBatch ranking over the streaming aggregate == batch trending."""
    from dbsurveyor_spark.streaming.events import (
        stream_topk_trending,
        stream_trending_job,
    )

    streamed = stream_trending_job(spark, SF_ORACLE, ckpt)
    batch = stream_topk_trending(spark, SF_ORACLE)
    s = {tuple(r) for r in streamed.collect()}
    b = {tuple(r) for r in batch.collect()}
    assert s == b and len(s) > 0


def test_watermark_drops_late_data_in_append_mode(spark, ckpt, tmp_path):
    """Late-data semantics: an event older than the advanced watermark is
    DROPPED by the streaming aggregate once its window's state has been
    evicted, while the equivalent batch aggregate counts it — the trade a
    watermarked pipeline explicitly makes.

    Subtlety pinned here (measured, not assumed): dropping requires the
    state to be gone in a PRIOR batch. A straggler arriving in the very
    batch where the watermark first passes its window still merges into
    the live state before eviction. Hence THREE micro-batches
    (maxFilesPerTrigger=1): b1 advances event time far past window W1,
    b2 (any row) lets the watermark take effect and evict+emit W1,
    b3 delivers the W1 straggler → dropped."""
    import time

    from pyspark.sql import functions as F

    src = tmp_path / "late_src"
    src.mkdir()
    schema = "ts timestamp, event_type string"

    def _write(rows, name):
        (
            spark.createDataFrame(rows, "ts string, event_type string")
            .select(F.to_timestamp("ts").alias("ts"), "event_type")
            .coalesce(1)
            .write.parquet(str(src / name))
        )

    _write(
        [
            ("2024-01-01 00:05:00", "click"),
            ("2024-01-01 00:10:00", "click"),
            ("2024-01-01 06:00:00", "click"),  # wm → 05:50 after b1
        ],
        "b1.parquet",
    )
    time.sleep(1.1)  # distinct mtimes → deterministic file order
    _write([("2024-01-01 06:05:00", "click")], "b2.parquet")
    time.sleep(1.1)
    _write([("2024-01-01 00:20:00", "click")], "b3.parquet")  # straggler

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src) + "/*")
        .withWatermark("ts", "10 minutes")
    )
    agg = (
        stream.groupBy(F.window("ts", "3600 seconds").alias("w"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("w.start").alias("window_start"), "n")
    )
    q = (
        agg.writeStream.format("memory")
        .queryName("late_test")
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(300)
    dropped = sum(
        p["stateOperators"][0].get("numRowsDroppedByWatermark", 0)
        for p in q.recentProgress
        if p["stateOperators"]
    )
    assert dropped == 1  # the straggler, counted by the engine itself
    got = {
        (str(r["window_start"]), r["n"])
        for r in spark.table("late_test").collect()
    }
    # W1 finalized with the 2 on-time rows; the straggler did NOT reopen it
    assert got == {("2024-01-01 00:00:00", 2)}
    # batch semantics over the same files WOULD count the straggler
    batch = (
        spark.read.schema(schema)
        .parquet(str(src) + "/*")
        .groupBy(F.window("ts", "3600 seconds"))
        .count()
        .filter(F.col("window.start") == "2024-01-01 00:00:00")
        .collect()
    )
    assert batch[0]["count"] == 3


def test_transform_with_state_matches_batch(spark, ckpt):
    """transformWithStateInPandas totals == plain batch groupBy totals
    (the Spark 4 successor API, cross-checked against the same oracle as
    the applyInPandasWithState job). The TWS driver worker speaks
    protobuf to the JVM; skip where protobuf isn't installed."""
    import pytest

    pytest.importorskip("google.protobuf")
    from dbsurveyor_spark.streaming.events import stream_user_totals_tws_job

    streamed = stream_user_totals_tws_job(spark, SF_ORACLE, ckpt)
    batch = (
        load_table(spark, SF_ORACLE, "events")
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 6).alias("value_sum"),
        )
    )
    s = {(r.user_id, r.n_events) for r in streamed.collect()}
    b = {(r.user_id, r.n_events) for r in batch.collect()}
    assert len(s) > 0
    assert s == b, f"tws totals diverge: {len(s ^ b)} rows differ"


def test_stream_stream_interval_join_matches_batch(spark, ckpt):
    """The attribution interval join as a REAL watermarked stream-stream
    join: its pair set must equal the batch interval join, and the set of
    purchases with any in-window click must equal the batch operator's
    attributed set (the last-touch pick is a per-purchase argmax on top)."""
    from dbsurveyor_spark.streaming.events import (
        ATTRIBUTION_WINDOW_S,
        stream_attribution_join_job,
        stream_click_attribution,
    )

    pairs = stream_attribution_join_job(spark, SF_ORACLE, ckpt)
    got = {(r.purchase_id, r.click_id) for r in pairs.collect()}
    ev = load_table(spark, SF_ORACLE, "events").select(
        "event_id", "ts", "user_id", "event_type"
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("cu"),
        F.col("ts").alias("cts"),
        F.col("event_id").alias("cid"),
    )
    purch = ev.filter(F.col("event_type") == "purchase")
    batch_pairs = {
        (r.event_id, r.cid)
        for r in purch.join(
            clicks,
            (F.col("user_id") == F.col("cu"))
            & (F.col("cts") <= F.col("ts"))
            & (
                F.unix_micros(F.col("ts")) - F.unix_micros(F.col("cts"))
                <= ATTRIBUTION_WINDOW_S * 1_000_000
            ),
        ).collect()
    }
    assert got == batch_pairs and got
    attributed_batch = {
        r.purchase_id
        for r in stream_click_attribution(spark, SF_ORACLE)
        .filter(F.col("attributed"))
        .collect()
    }
    assert {p for p, _ in got} == attributed_batch


def test_state_size_report_semantics(spark):
    """Sizing rows cover every stateful shape, are non-degenerate, and the
    byte estimate is exactly rows × the documented per-row constant. The
    join buffer must count only clicks inside the attribution horizon."""
    from pyspark.sql import functions as F

    from dbsurveyor_spark.catalog import load_table
    from dbsurveyor_spark.streaming import events as se

    rows = {
        r.op_name: r
        for r in se.stream_state_size_report(spark, SF_ORACLE).collect()
    }
    assert set(rows) == set(se.STATE_OPS)
    for op, (horizon_s, bpr) in se.STATE_OPS.items():
        r = rows[op]
        assert r.horizon_s == horizon_s
        assert r.state_rows > 0, f"{op} must be non-degenerate at this SF"
        assert r.est_state_bytes == r.state_rows * bpr
    ev = load_table(spark, SF_ORACLE, "events")
    wm = ev.agg(F.max("ts")).collect()[0][0]
    total_clicks = ev.filter(F.col("event_type") == "click").count()
    assert rows["join_click_buffer"].state_rows <= total_clicks
    # dedup state is bounded by the event count in the horizon
    n_recent = ev.filter(
        F.col("ts") > F.lit(wm) - F.expr("INTERVAL 30 MINUTES")
    ).count()
    assert rows["dedup_within_watermark"].state_rows <= n_recent


def test_watermark_tuning_curve_monotone_and_consistent(spark):
    """Dropped counts must be non-increasing in delay, zero-delay drop
    equals the late-data report's non-on_time mass, and a day-long delay
    drops (almost) nothing."""
    from dbsurveyor_spark.streaming import events as se

    rows = sorted(
        se.stream_watermark_tuning_curve(spark, SF_ORACLE).collect(),
        key=lambda r: r.delay_s,
    )
    assert [r.delay_s for r in rows] == sorted(se.WATERMARK_DELAYS)
    drops = [r.n_dropped for r in rows]
    assert drops == sorted(drops, reverse=True), "monotone in delay"
    late = {
        r.bucket: r.n_events
        for r in se.stream_late_data_report(spark, SF_ORACLE).collect()
    }
    n_late = sum(v for k, v in late.items() if k != "on_time")
    assert drops[0] == n_late
    assert drops[0] > 0, "arrival disorder must make the curve non-vacuous"
    assert rows[-1].delay_s == 86400
    # at sf0.001 the feed is sparse (~43 min between events), so the
    # id-shift disorder translates to DAYS of lateness for the %31 tail —
    # a day-long watermark still recovers most, not all, of the late mass
    assert rows[-1].n_dropped < drops[0]
    assert rows[-1].n_dropped <= 0.05 * sum(late.values())
    for r in rows:
        assert abs(r.dropped_share - r.n_dropped / sum(late.values())) < 1e-6
