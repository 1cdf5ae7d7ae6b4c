"""Streaming analytics over the events table (SURVEY.md §2.H).

Two surfaces:

1. Batch-equivalent queries (oracle-checked): tumbling-window counts and
   gap-based sessionization expressed as ordinary DataFrame ops. In Spark,
   the SAME windowed-count logic runs unchanged under Structured Streaming
   (complete-mode aggregation); sessionization's streaming analog is
   session_window / applyInPandasWithState.
2. True Structured Streaming jobs (pytest-driven, `availableNow` trigger):
   `stream_windowed_counts_job` consumes the events parquet as a file
   stream with a watermark, proving the plumbing works end-to-end.

Scale notes: tumbling windows aggregate map-side per (window, type) — one
shuffle. Sessionization shuffles once on user_id; session assembly is two
window functions over each user partition (lag → gap flag → running sum),
no iterative driver logic.
"""

from __future__ import annotations

from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..catalog import load_table, table_path
from ..functions.aggregates import DECIMAL_T

WINDOW_SECONDS = 3600
SESSION_GAP_MIN = 30


def stream_tumbling_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-hour tumbling-window event counts + value sums per event_type."""
    events = load_table(spark, sf_dir, "events")
    win = F.window("ts", f"{WINDOW_SECONDS} seconds")
    return (
        events.groupBy(win.alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("event_count"),
            F.sum(F.col("value").cast(DECIMAL_T)).cast("double").alias("value_sum"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "event_count",
            "value_sum",
        )
    )


TUMBLING_SQL = f"""
SELECT time_bucket(INTERVAL '{WINDOW_SECONDS} seconds', ts) AS window_start,
       event_type,
       COUNT(*) AS event_count,
       CAST(SUM(CAST(value AS DECIMAL(30,6))) AS DOUBLE) AS value_sum
FROM events
GROUP BY 1, 2
"""


def stream_sessionization(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessions (30-min inactivity) per user, with stats.

    lag → new-session flag → running sum = session index; then one
    aggregation per (user, session).
    """
    events = load_table(spark, sf_dir, "events")
    order_w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev_ts = F.lag("ts").over(order_w)
    is_new = (
        prev_ts.isNull()
        | (F.col("ts") > prev_ts + F.expr(f"INTERVAL {SESSION_GAP_MIN} MINUTES"))
    ).cast("bigint")
    run_w = order_w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return (
        events.withColumn("is_new", is_new)
        .withColumn("session_idx", F.sum("is_new").over(run_w))
        .groupBy("user_id", "session_idx")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.sum(F.col("value").cast(DECIMAL_T)).cast("double").alias("value_sum"),
        )
    )


SESSION_SQL = f"""
WITH flagged AS (
  SELECT user_id, ts, event_id, value,
         CASE WHEN lag(ts) OVER w IS NULL
                OR ts > lag(ts) OVER w + INTERVAL '{SESSION_GAP_MIN} minutes'
              THEN 1 ELSE 0 END AS is_new
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
sessions AS (
  SELECT user_id, ts, event_id, value,
         CAST(SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_idx
  FROM flagged
)
SELECT user_id, session_idx, COUNT(*) AS n_events,
       MIN(ts) AS session_start, MAX(ts) AS session_end,
       CAST(SUM(CAST(value AS DECIMAL(30,6))) AS DOUBLE) AS value_sum
FROM sessions
GROUP BY user_id, session_idx
"""


# ------------------------------------------------- true structured streaming


def stream_windowed_counts_job(
    spark: SparkSession, sf_dir: str, checkpoint_dir: str
) -> DataFrame:
    """Run the tumbling-window count as a real Structured Streaming job over
    the events parquet (file source, availableNow trigger, 10-min watermark)
    and return the materialized result from the in-memory sink."""
    stream = _event_stream(spark, sf_dir, checkpoint_dir).withWatermark(
        "ts", "10 minutes"
    )
    agg = (
        stream.groupBy(
            F.window("ts", f"{WINDOW_SECONDS} seconds").alias("w"), "event_type"
        )
        .agg(F.count(F.lit(1)).alias("event_count"))
        .select(F.col("w.start").alias("window_start"), "event_type", "event_count")
    )
    query = (
        agg.writeStream.format("memory")
        .queryName("stream_counts")
        .outputMode("complete")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    if not query.awaitTermination(600):
        query.stop()
        raise TimeoutError("streaming job did not finish within 600s")
    return spark.table("stream_counts")


def stream_trending_job(
    spark: SparkSession, sf_dir: str, checkpoint_dir: str
) -> DataFrame:
    """stream_topk_trending as a REAL streaming job: the windowed count is
    the incremental streaming aggregate; the top-K rank — which is not an
    incremental operator — runs per micro-batch in foreachBatch over the
    aggregate's (windows × types, metadata-scale) output, exactly the
    split the batch query's docstring promises. Complete output mode so
    each batch re-ranks the full aggregate state; the LAST batch's ranking
    is the job's result (availableNow → one final complete snapshot)."""
    from pyspark.sql.window import Window

    stream = _event_stream(spark, sf_dir, checkpoint_dir).withWatermark(
        "ts", "10 minutes"
    )
    agg = (
        stream.groupBy(
            F.window("ts", f"{WINDOW_SECONDS} seconds").alias("w"), "event_type"
        )
        .agg(F.count(F.lit(1)).alias("event_count"))
        .select(F.col("w.start").alias("window_start"), "event_type", "event_count")
    )
    last_ranked: list = []

    def _rank_batch(batch_df: DataFrame, _batch_id: int) -> None:
        w = Window.partitionBy("window_start").orderBy(
            F.desc("event_count"), F.asc("event_type")
        )
        ranked = (
            batch_df.withColumn("rank", F.row_number().over(w).cast("bigint"))
            .filter(F.col("rank") <= TRENDING_K)
            .collect()
        )
        last_ranked.clear()
        last_ranked.extend(ranked)

    query = (
        agg.writeStream.foreachBatch(_rank_batch)
        .outputMode("complete")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    if not query.awaitTermination(600):
        query.stop()
        raise TimeoutError("streaming job did not finish within 600s")
    return spark.createDataFrame(
        last_ranked,
        "window_start timestamp, event_type string, event_count bigint, "
        "rank bigint",
    )


def _event_stream(spark: SparkSession, sf_dir: str, checkpoint_dir: str) -> DataFrame:
    """File-source stream over the events table (symlink-dir trick: the file
    streaming source requires a directory; the test tables are single
    read-only files)."""
    from pyspark.sql.types import LongType, TimestampNTZType

    from ..catalog import harden_session

    harden_session(spark)
    src_dir = Path(checkpoint_dir + "_src")
    src_dir.mkdir(parents=True, exist_ok=True)
    link = src_dir / "events.parquet"
    if not link.exists():
        link.symlink_to(table_path(sf_dir, "events"))
    raw_schema = spark.read.parquet(table_path(sf_dir, "events")).schema
    stream = spark.readStream.schema(raw_schema).parquet(str(src_dir))
    # Same ts normalization as catalog.load_table: watermarks REQUIRE
    # TimestampType (LTZ) — TIMESTAMP_NTZ event time is rejected outright.
    if isinstance(raw_schema["ts"].dataType, LongType):
        stream = stream.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    elif isinstance(raw_schema["ts"].dataType, TimestampNTZType):
        stream = stream.withColumn("ts", F.col("ts").cast("timestamp"))
    return stream


def stream_session_window_job(
    spark: SparkSession, sf_dir: str, checkpoint_dir: str
) -> DataFrame:
    """Gap-based sessionization as a REAL streaming job via Spark's native
    `session_window` (dynamic-gap session aggregation with watermark state
    eviction) — the streaming analog of `stream_sessionization`.

    Boundary note: session_window merges an event into a session iff its ts
    is STRICTLY before prev_end = prev_ts + gap, while the batch lag-based
    flag starts a new session iff ts > prev_ts + gap — the two disagree
    only for gaps of exactly 30:00.000000.
    """
    stream = _event_stream(spark, sf_dir, checkpoint_dir).withWatermark(
        "ts", "10 minutes"
    )
    agg = (
        stream.groupBy(
            F.session_window("ts", f"{SESSION_GAP_MIN} minutes").alias("w"), "user_id"
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast(DECIMAL_T)).cast("double").alias("value_sum"),
        )
        .select("user_id", "n_events", "value_sum")
    )
    query = (
        agg.writeStream.format("memory")
        .queryName("stream_sessions")
        .outputMode("complete")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    if not query.awaitTermination(600):
        query.stop()
        raise TimeoutError("streaming job did not finish within 600s")
    return spark.table("stream_sessions")


def stream_stateful_user_totals_job(
    spark: SparkSession, sf_dir: str, checkpoint_dir: str
) -> DataFrame:
    """Custom stateful streaming operator via applyInPandasWithState:
    per-user running totals (event count + value sum) carried in explicit
    GroupState across micro-batches — the escape hatch for stateful logic
    Spark's built-in windowed/session aggregations can't express.

    Arrow-batched per group; state is a single (count, sum) tuple per user,
    so state size is O(users), not O(events).
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
    from pyspark.sql.types import (
        DoubleType,
        LongType,
        StructField,
        StructType,
    )

    out_schema = StructType(
        [
            StructField("user_id", LongType()),
            StructField("n_events", LongType()),
            StructField("value_sum", DoubleType()),
        ]
    )
    state_schema = StructType(
        [StructField("n", LongType()), StructField("s", DoubleType())]
    )

    def update(key, pdfs, state: GroupState):
        n, s = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            s += float(pdf["value"].sum())
        state.update((n, s))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "value_sum": [round(s, 6)]}
        )

    stream = _event_stream(spark, sf_dir, checkpoint_dir).select("user_id", "value")
    result = stream.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    query = (
        result.writeStream.format("memory")
        .queryName("stream_user_totals")
        .outputMode("update")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    if not query.awaitTermination(600):
        query.stop()
        raise TimeoutError("streaming job did not finish within 600s")
    # update mode emits a row per micro-batch per user; the FINAL total is
    # the one with the highest n_events (counts are strictly increasing per
    # user), which is well-defined regardless of the memory sink's scan
    # order — unlike monotonically_increasing_id, which tracks partition
    # layout, not commit order.
    latest = spark.table("stream_user_totals")
    return latest.groupBy("user_id").agg(
        F.max("n_events").alias("n_events"),
        F.max_by("value_sum", "n_events").alias("value_sum"),
    )


def stream_user_totals_tws_job(
    spark: SparkSession, sf_dir: str, checkpoint_dir: str
) -> DataFrame:
    """The same per-user running totals on Spark 4's transformWithState
    API (`transformWithStateInPandas` + a StatefulProcessor): typed,
    named state cells with optional TTL — the successor to
    applyInPandasWithState's single state tuple, and the surface where
    multi-cell state, timers, and initial-state bootstrap live. Kept
    semantically identical to `stream_stateful_user_totals_job` so the
    two APIs cross-check each other in pytest.

    Requires `protobuf` (the TWS driver worker's control channel) and the
    RocksDB state store; the pytest gate importorskips protobuf, so on
    bare containers the applyInPandasWithState job remains the exercised
    stateful path.
    """
    import pandas as pd
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class Totals(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._totals = handle.getValueState("totals", "n BIGINT, s DOUBLE")

        def handleInputRows(self, key, rows, timerValues):
            n, s = (self._totals.get() or (0, 0.0)) if self._totals.exists() else (0, 0.0)
            for pdf in rows:
                n += len(pdf)
                s += float(pdf["value"].sum())
            self._totals.update((n, s))
            yield pd.DataFrame(
                {
                    "user_id": [key[0]],
                    "n_events": [n],
                    "value_sum": [round(s, 6)],
                }
            )

        def close(self) -> None:
            pass

    stream = _event_stream(spark, sf_dir, checkpoint_dir).select(
        "user_id", "value"
    )
    result = stream.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=Totals(),
        outputStructType="user_id bigint, n_events bigint, value_sum double",
        outputMode="Update",
        timeMode="None",
    )
    # transformWithState requires the RocksDB state store (the HDFS-backed
    # default provider doesn't implement multi-cell typed state); scope the
    # provider switch to this query's lifetime.
    provider_key = "spark.sql.streaming.stateStore.providerClass"
    prev = spark.conf.get(provider_key, None)
    spark.conf.set(
        provider_key,
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider",
    )
    try:
        query = (
            result.writeStream.format("memory")
            .queryName("stream_user_totals_tws")
            .outputMode("update")
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True)
            .start()
        )
        if not query.awaitTermination(600):
            query.stop()
            raise TimeoutError("streaming job did not finish within 600s")
    finally:
        if prev is None:
            spark.conf.unset(provider_key)
        else:
            spark.conf.set(provider_key, prev)
    latest = spark.table("stream_user_totals_tws")
    return latest.groupBy("user_id").agg(
        F.max("n_events").alias("n_events"),
        F.max_by("value_sum", "n_events").alias("value_sum"),
    )


# --------------------------------------------------- at-least-once dedup


DUP_MOD = 10  # every event_id % DUP_MOD == 0 is delivered twice


def stream_dedup_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ingest dedup for at-least-once delivery (batch equivalent of
    `stream_dedup_job`): the feed re-delivers every DUP_MOD-th event;
    collapse to one row per event_id and record how many deliveries were
    absorbed. Duplicate deliveries are EXACT copies, so MIN over each
    payload column is the unique payload — the aggregate is map-side
    combinable, one shuffle on event_id (the same shape a 100 TB ingest
    dedup needs; the streaming variant bounds its state with a watermark).
    """
    events = load_table(spark, sf_dir, "events").select(
        "event_id", "event_type", "user_id", "ts", "value"
    )
    dups = events.filter(F.col("event_id") % DUP_MOD == 0)
    deliveries = events.unionByName(dups)
    return deliveries.groupBy("event_id").agg(
        F.count(F.lit(1)).alias("delivery_count"),
        F.min("event_type").alias("event_type"),
        F.min("user_id").alias("user_id"),
        F.min("ts").alias("ts"),
        F.min("value").alias("value"),
    )


DEDUP_EVENTS_SQL = f"""
WITH deliveries AS (
  SELECT event_id, event_type, user_id, ts, value FROM events
  UNION ALL
  SELECT event_id, event_type, user_id, ts, value FROM events
  WHERE event_id % {DUP_MOD} = 0
)
SELECT event_id, COUNT(*) AS delivery_count,
       MIN(event_type) AS event_type, MIN(user_id) AS user_id,
       MIN(ts) AS ts, MIN(value) AS value
FROM deliveries GROUP BY event_id
"""


def stream_dedup_job(
    spark: SparkSession, sf_dir: str, checkpoint_dir: str
) -> DataFrame:
    """True streaming ingest dedup: duplicate deliveries are injected into
    the stream (explode fan-out for event_id % DUP_MOD == 0), then
    `dropDuplicatesWithinWatermark("event_id")` emits exactly one row per
    event and EVICTS each key's state once the 10-minute watermark passes —
    the bounded-state property that makes exactly-once ingest viable on an
    unbounded 100 TB feed (plain dropDuplicates would hold every key
    forever)."""
    stream = _event_stream(spark, sf_dir, checkpoint_dir)
    fanout = stream.withColumn(
        "delivery",
        F.explode(
            F.when(
                F.col("event_id") % DUP_MOD == 0,
                F.array(F.lit(1), F.lit(2)),
            ).otherwise(F.array(F.lit(1)))
        ),
    ).drop("delivery")
    deduped = fanout.withWatermark("ts", "10 minutes").dropDuplicatesWithinWatermark(
        ["event_id"]
    )
    query = (
        deduped.writeStream.format("memory")
        .queryName("stream_dedup")
        .outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    if not query.awaitTermination(600):
        query.stop()
        raise TimeoutError("streaming job did not finish within 600s")
    return spark.table("stream_dedup")


SLIDE_MIN = 15  # sliding step; window length stays WINDOW_SECONDS (1 h)


def stream_sliding_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-hour windows hopping every 15 minutes — the overlapping-window
    shape (each event belongs to exactly 4 windows). Spark's `window(ts,
    size, slide)` expands rows window-side BEFORE the aggregate, so the
    shuffle carries (window, type) partial counts, not raw events ×4; the
    same expression runs unchanged under Structured Streaming with a
    watermark. Windows are epoch-aligned (start ≡ 0 mod slide), which the
    oracle reproduces with time_bucket − k·slide."""
    events = load_table(spark, sf_dir, "events")
    win = F.window(
        "ts", f"{WINDOW_SECONDS} seconds", f"{SLIDE_MIN * 60} seconds"
    )
    return (
        events.groupBy(win.alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("event_count"),
            F.sum(F.col("value").cast(DECIMAL_T)).cast("double").alias("value_sum"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "event_count",
            "value_sum",
        )
    )


SLIDING_SQL = f"""
WITH expanded AS (
  SELECT time_bucket(INTERVAL '{SLIDE_MIN} minutes', ts)
           - k.k * INTERVAL '{SLIDE_MIN} minutes' AS window_start,
         event_type, value, ts
  FROM events
  CROSS JOIN (SELECT unnest(range({WINDOW_SECONDS // (SLIDE_MIN * 60)})) AS k) k
)
SELECT window_start, event_type,
       COUNT(*) AS event_count,
       CAST(SUM(CAST(value AS DECIMAL(30,6))) AS DOUBLE) AS value_sum
FROM expanded
WHERE ts >= window_start
  AND ts < window_start + INTERVAL '{WINDOW_SECONDS} seconds'
GROUP BY window_start, event_type
"""


TRENDING_K = 3


def stream_topk_trending(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trending dashboard shape: per 1-h tumbling window, the top-K event
    types by count with their rank.

    The rank window runs over the AGGREGATED frame — |windows|×|types|
    rows, metadata-scale — never over raw events; the heavy lifting is the
    same map-side-combinable windowed count as stream_tumbling_counts. In
    a live pipeline this is the foreachBatch ranking step on top of the
    streaming aggregate (rank itself isn't an incremental operator)."""
    from pyspark.sql.window import Window

    events = load_table(spark, sf_dir, "events")
    win = F.window("ts", f"{WINDOW_SECONDS} seconds")
    counts = (
        events.groupBy(win.alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("event_count"))
        .select(F.col("w.start").alias("window_start"), "event_type", "event_count")
    )
    w = Window.partitionBy("window_start").orderBy(
        F.desc("event_count"), F.asc("event_type")
    )
    return (
        counts.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= TRENDING_K)
    )


TRENDING_SQL = f"""
WITH counts AS (
  SELECT time_bucket(INTERVAL '{WINDOW_SECONDS} seconds', ts) AS window_start,
         event_type, COUNT(*) AS event_count
  FROM events GROUP BY 1, 2
)
SELECT window_start, event_type, event_count, rank FROM (
  SELECT *, ROW_NUMBER() OVER (
    PARTITION BY window_start ORDER BY event_count DESC, event_type ASC
  ) AS rank FROM counts
) t WHERE rank <= {TRENDING_K}
"""


VOLUME_Z = 2.0


def stream_volume_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily ingest-volume anomaly: days whose event count deviates from
    the stream's mean daily volume by more than VOLUME_Z population
    z-scores — the pipeline-health check that catches a broken producer
    or an ingest storm.

    The raw scan reduces to one (day → count) aggregate immediately
    (map-side combinable, |days| rows); mean/σ and the z-flag all run on
    that metadata-sized frame via unpartitioned windows. Day keys surface
    as ISO strings (engine-neutral, like retention_cohorts).
    """
    events = load_table(spark, sf_dir, "events")
    daily = events.groupBy(
        F.date_format(F.date_trunc("day", F.col("ts")), "yyyy-MM-dd").alias("day")
    ).agg(F.count(F.lit(1)).alias("n_events"))
    w = Window.partitionBy()
    n = F.count(F.lit(1)).over(w).cast("double")
    mean = F.sum("n_events").over(w) / n
    var = F.sum(F.col("n_events") * F.col("n_events")).over(w) / n - mean * mean
    std = F.sqrt(F.greatest(F.lit(0.0), var))
    z = (F.col("n_events") - mean) / std
    return (
        daily.select(
            "day",
            "n_events",
            F.round(z, 9).alias("z_score"),
        )
        .filter(F.abs(F.col("z_score")) > VOLUME_Z)
    )


VOLUME_ANOMALY_SQL = f"""
WITH daily AS (
  SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
         COUNT(*) AS n_events
  FROM events GROUP BY 1
),
stats AS (
  SELECT day, n_events,
         (n_events - AVG(n_events) OVER ()) /
         SQRT(GREATEST(0.0,
              AVG(n_events * n_events) OVER ()
              - AVG(n_events) OVER () * AVG(n_events) OVER ())) AS z
  FROM daily
)
SELECT day, n_events, ROUND(z, 9) AS z_score
FROM stats WHERE ABS(ROUND(z, 9)) > {VOLUME_Z}
"""


# -------------------------------------------------------- SCD2 state history

# The events table read as a changelog: each event sets its user's current
# "state" (event_type). scd2_user_state reconstructs the type-2 dimension
# history a warehouse keeps for such a feed.


def scd2_user_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Type-2 slowly-changing-dimension history per user: consecutive
    same-state events collapse, each CHANGE opens a validity interval
    [valid_from, valid_to) closed by the next change (valid_to NULL +
    is_current=1 for the open row) — the standard warehouse
    state-reconstruction over a changelog.

    Plan: one shuffle on user_id; change detection (lag), interval close
    (lead over the filtered change rows), and the current flag are all
    windows over that same partitioning — no second exchange, no
    driver-side iteration, partition size bounded by per-user history.
    """
    events = load_table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", F.col("event_type").alias("state")
    )
    order_w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    changed = events.withColumn(
        "prev_state", F.lag("state").over(order_w)
    ).filter(
        F.col("prev_state").isNull() | (F.col("prev_state") != F.col("state"))
    )
    return changed.select(
        "user_id",
        "state",
        F.col("ts").alias("valid_from"),
        F.lead("ts").over(order_w).alias("valid_to"),
        F.lead("ts").over(order_w).isNull().cast("int").alias("is_current"),
    )


SCD2_SQL = """
WITH ordered AS (
  SELECT user_id, ts, event_id, event_type AS state,
         lag(event_type) OVER w AS prev_state
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
changes AS (
  SELECT user_id, ts, event_id, state FROM ordered
  WHERE prev_state IS NULL OR prev_state <> state
)
SELECT user_id, state, ts AS valid_from,
       lead(ts) OVER w AS valid_to,
       CAST(lead(ts) OVER w IS NULL AS INT) AS is_current
FROM changes
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
"""


# ----------------------------------------------------- late-data accounting

# Arrival order is the event_id sequence (the ingest log's own order); the
# watermark before each event is the max event-time already ingested. The
# lateness histogram is what you read to size a streaming job's watermark
# delay / allowed lateness. The synthetic feed arrives exactly in event-time
# order, so — like every dirtied-in-query check here — deterministic
# ARRIVAL DISORDER is injected in both engines: selected events are pushed
# N positions later in the arrival sequence (_LATE_DELAYS), making their
# event-times older than the watermark by N inter-event gaps.
LATE_BLOCK = 4096  # two-level prefix-max block size (see docstring)
_LATE_DELAYS = ((31, 200), (17, 5), (23, 1))  # (event_id modulus, delay)
_ARRIVAL_SQL = "event_id + (CASE " + " ".join(
    f"WHEN event_id % {m} = 0 THEN {d}" for m, d in _LATE_DELAYS
) + " ELSE 0 END)"
LATE_BUCKETS = (
    ("on_time", 0.0),
    ("lt_1m", 60.0),
    ("lt_5m", 300.0),
    ("lt_30m", 1800.0),
    ("gte_30m", None),
)


def _lateness_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event lateness (seconds behind the running max event-time in
    arrival order) via the two-level parallel prefix max — the shared
    front half of the late-data report and the watermark tuning curve.
    Emits the event rows with a `late_sec` column."""
    ev = load_table(spark, sf_dir, "events").select(
        F.expr(_ARRIVAL_SQL).alias("arrival_key"),
        "event_id",
        F.col("ts").cast("double").alias("t"),
    )
    ev = ev.select(
        F.expr(f"arrival_key div {LATE_BLOCK}").alias("block"),
        "arrival_key",
        "event_id",
        "t",
    )
    bmax = ev.groupBy("block").agg(F.max("t").alias("bm"))
    prev_w = Window.orderBy("block").rowsBetween(
        Window.unboundedPreceding, -1
    )
    prefix = bmax.select(
        "block", F.max("bm").over(prev_w).alias("prev_blocks_max")
    )
    in_w = (
        Window.partitionBy("block")
        .orderBy("arrival_key", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    with_wm = (
        ev.join(F.broadcast(prefix), "block")
        .withColumn("in_block_prev", F.max("t").over(in_w))
        .withColumn(
            "wm", F.greatest(F.col("prev_blocks_max"), F.col("in_block_prev"))
        )
    )
    return with_wm.withColumn(
        "late_sec",
        F.when(
            F.col("wm").isNotNull() & (F.col("wm") > F.col("t")),
            F.col("wm") - F.col("t"),
        ).otherwise(F.lit(0.0)),
    )


def stream_late_data_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermark-lateness accounting: for each event, lateness = (max
    event-time among earlier-ARRIVING events) − its own event-time, bucketed
    into the delay histogram that sizes `withWatermark` / allowed-lateness.

    A global running max over arrival order is inherently sequential, so it
    computes as a TWO-LEVEL prefix max (the scan-friendly parallel-prefix
    shape): per-block max (one map-side aggregate, |blocks| rows) → running
    max over the metadata-sized block frame (single-partition window over
    |n|/B rows, like every other aggregate-level window here) → broadcast
    back → within-block running max (window partitioned by block, ≤B rows
    per partition). No data-sized single-partition window anywhere.
    """
    with_wm = _lateness_frame(spark, sf_dir)
    late = F.col("late_sec")
    bucket = F.when(late <= F.lit(0.0), F.lit("on_time"))
    for name, ub in LATE_BUCKETS[1:]:
        bucket = (
            bucket.when(late <= F.lit(ub), F.lit(name))
            if ub is not None
            else bucket.otherwise(F.lit(name))
        )
    agg = with_wm.select(bucket.alias("bucket"), late.alias("late_sec")).groupBy(
        "bucket"
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.max("late_sec"), 6).alias("max_late_sec"),
    )
    tot_w = Window.partitionBy()
    return agg.select(
        "bucket",
        "n_events",
        F.round(
            F.col("n_events").cast("double") / F.sum("n_events").over(tot_w), 9
        ).alias("share"),
        "max_late_sec",
    )


def _late_data_sql() -> str:
    cases = ["WHEN late <= 0.0 THEN 'on_time'"]
    for name, ub in LATE_BUCKETS[1:]:
        if ub is not None:
            cases.append(f"WHEN late <= {ub} THEN '{name}'")
        else:
            cases.append(f"ELSE '{name}'")
    case = "CASE " + " ".join(cases) + " END"
    return f"""
WITH wm AS (
  SELECT epoch(ts) AS t,
         MAX(epoch(ts)) OVER (ORDER BY {_ARRIVAL_SQL}, event_id
                              ROWS BETWEEN UNBOUNDED PRECEDING
                                       AND 1 PRECEDING) AS w
  FROM events
),
lateness AS (
  SELECT CASE WHEN w IS NOT NULL AND w > t THEN w - t ELSE 0.0 END AS late
  FROM wm
),
agg AS (
  SELECT {case} AS bucket, COUNT(*) AS n_events,
         ROUND(MAX(late), 6) AS max_late_sec
  FROM lateness GROUP BY 1
)
SELECT bucket, n_events,
       ROUND(CAST(n_events AS DOUBLE) / SUM(n_events) OVER (), 9) AS share,
       max_late_sec
FROM agg
"""


# --------------------------------------------- watermark tuning curve

WATERMARK_DELAYS = (0, 60, 300, 1800, 7200, 86400)  # seconds


def stream_watermark_tuning_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermark DELAY sweep — the dial the late-data histogram only hints
    at (the streaming analog of `ann_nprobe_curve`): for each candidate
    `withWatermark` delay, how many events would be DROPPED (arrive later
    than the watermark allows) and what fraction of the feed that is. The
    operator answers "what delay keeps loss under my SLO" directly; state
    cost grows linearly with the chosen delay (see
    `stream_state_size_report`), so this curve × that table is the full
    latency/completeness/memory trade.

    Plan: ONE shared lateness pass (`_lateness_frame`, the two-level
    parallel prefix max — no data-sized single-partition window), then ONE
    conditional aggregate produces every sweep level; the curve frame is
    \\|delays\\| rows.
    """
    lf = _lateness_frame(spark, sf_dir)
    agg = lf.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_total"),
        *[
            F.sum(F.when(F.col("late_sec") > float(d), 1).otherwise(0))
            .cast("bigint")
            .alias(f"d{d}")
            for d in WATERMARK_DELAYS
        ],
    )
    # ONE aggregate → rows via inline (union-of-selects replans the
    # lateness pipeline once per sweep level — measured 24 parquet scans)
    entries = [
        F.struct(
            F.lit(d).cast("bigint").alias("delay_s"),
            F.col(f"d{d}").alias("n_dropped"),
            F.round(
                F.col(f"d{d}").cast("double") / F.col("n_total"), 9
            ).alias("dropped_share"),
        )
        for d in WATERMARK_DELAYS
    ]
    return agg.select(F.inline(F.array(*entries)))


def _watermark_curve_sql() -> str:
    sums = ", ".join(
        f"CAST(SUM(CASE WHEN late > {float(d)} THEN 1 ELSE 0 END) AS BIGINT)"
        f" AS d{d}"
        for d in WATERMARK_DELAYS
    )
    branches = "\nUNION ALL\n".join(
        f"SELECT CAST({d} AS BIGINT) AS delay_s, d{d} AS n_dropped, "
        f"ROUND(CAST(d{d} AS DOUBLE) / n_total, 9) AS dropped_share FROM agg"
        for d in WATERMARK_DELAYS
    )
    return f"""
WITH wm AS (
  SELECT epoch(ts) AS t,
         MAX(epoch(ts)) OVER (ORDER BY {_ARRIVAL_SQL}, event_id
                              ROWS BETWEEN UNBOUNDED PRECEDING
                                       AND 1 PRECEDING) AS w
  FROM events
),
lateness AS (
  SELECT CASE WHEN w IS NOT NULL AND w > t THEN w - t ELSE 0.0 END AS late
  FROM wm
),
agg AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_total, {sums} FROM lateness
)
{branches}
"""


# --------------------------------------------------------- CUSUM drift

# Two-sided CUSUM control chart (Page 1954): slack k·σ absorbs noise,
# alarm at h·σ — the standard tuning (k=0.5, h=4) detects a sustained
# ~1σ mean shift fast while z-score/MAD point tests (which compare each
# DAY alone) miss it entirely: drift accumulates, points don't.
CUSUM_K = 0.5
CUSUM_H = 4.0
# The synthetic feed is drift-free, so (dirtied-in-query convention) a
# sustained volume DROP is injected in both engines: from Jan 24 on, every
# third event vanishes — a ≈33% mean shift the negative-side CUSUM must
# accumulate past the alarm threshold.
_CUSUM_DRIFT_SQL = (
    "NOT (event_id % 3 = 0 AND ts >= TIMESTAMP '2024-01-24 00:00:00')"
)


def stream_volume_cusum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sided CUSUM over daily ingest volume: per day the accumulated
    positive/negative drift statistics and alarm flags — the
    change-point/drift detector that complements the POINT anomaly suite.

    The CUSUM recursion S_t = max(0, S_{t-1} + d_t) is not a plain window
    aggregate, but it equals P_t − min(0, min_{i≤t} P_i) over the prefix
    sums P of the slack-adjusted deviations — two windows over the |days|
    METADATA frame (the scan reduces to day counts immediately; nothing
    data-sized is windowed).
    """
    events = load_table(spark, sf_dir, "events").filter(
        F.expr(_CUSUM_DRIFT_SQL)
    )
    daily = events.groupBy(
        F.date_format(F.date_trunc("day", F.col("ts")), "yyyy-MM-dd").alias(
            "day"
        )
    ).agg(F.count(F.lit(1)).alias("n"))
    all_w = Window.partitionBy()
    mu = F.sum("n").over(all_w).cast("double") / F.count(F.lit(1)).over(all_w)
    var = (
        F.sum(F.col("n") * F.col("n")).over(all_w).cast("double")
        / F.count(F.lit(1)).over(all_w)
        - mu * mu
    )
    sd = F.sqrt(F.greatest(F.lit(0.0), var))
    scored = daily.select(
        "day",
        "n",
        (F.col("n") - mu - F.lit(CUSUM_K) * sd).alias("d_pos"),
        (-(F.col("n") - mu) - F.lit(CUSUM_K) * sd).alias("d_neg"),
        (F.lit(CUSUM_H) * sd).alias("h"),
    )
    run = Window.orderBy("day").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return (
        scored.withColumn("p_pos", F.sum("d_pos").over(run))
        .withColumn("p_neg", F.sum("d_neg").over(run))
        .withColumn("m_pos", F.least(F.lit(0.0), F.min("p_pos").over(run)))
        .withColumn("m_neg", F.least(F.lit(0.0), F.min("p_neg").over(run)))
        .select(
            "day",
            F.col("n").alias("n_events"),
            F.round(F.col("p_pos") - F.col("m_pos"), 6).alias("cusum_pos"),
            F.round(F.col("p_neg") - F.col("m_neg"), 6).alias("cusum_neg"),
            (
                F.round(F.col("p_pos") - F.col("m_pos"), 6) > F.col("h")
            ).cast("int").alias("alarm_pos"),
            (
                F.round(F.col("p_neg") - F.col("m_neg"), 6) > F.col("h")
            ).cast("int").alias("alarm_neg"),
        )
    )


CUSUM_SQL = f"""
WITH daily AS (
  SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
         COUNT(*) AS n
  FROM events WHERE {_CUSUM_DRIFT_SQL}
  GROUP BY 1
),
scored AS (
  SELECT day, n,
         (n - mu - {CUSUM_K} * sd) AS d_pos,
         (-(n - mu) - {CUSUM_K} * sd) AS d_neg,
         ({CUSUM_H} * sd) AS h
  FROM (
    SELECT day, n,
           CAST(SUM(n) OVER () AS DOUBLE) / COUNT(*) OVER () AS mu,
           SQRT(GREATEST(0.0,
                CAST(SUM(n * n) OVER () AS DOUBLE) / COUNT(*) OVER ()
                - (CAST(SUM(n) OVER () AS DOUBLE) / COUNT(*) OVER ())
                  * (CAST(SUM(n) OVER () AS DOUBLE) / COUNT(*) OVER ())))
             AS sd
    FROM daily
  ) t
),
pre AS (
  SELECT day, n, h,
         SUM(d_pos) OVER w AS p_pos,
         SUM(d_neg) OVER w AS p_neg
  FROM scored
  WINDOW w AS (ORDER BY day ROWS UNBOUNDED PRECEDING)
),
mins AS (
  SELECT day, n, h, p_pos, p_neg,
         LEAST(0.0, MIN(p_pos) OVER w) AS m_pos,
         LEAST(0.0, MIN(p_neg) OVER w) AS m_neg
  FROM pre
  WINDOW w AS (ORDER BY day ROWS UNBOUNDED PRECEDING)
)
SELECT day, n AS n_events,
       ROUND(p_pos - m_pos, 6) AS cusum_pos,
       ROUND(p_neg - m_neg, 6) AS cusum_neg,
       CAST(ROUND(p_pos - m_pos, 6) > h AS INT) AS alarm_pos,
       CAST(ROUND(p_neg - m_neg, 6) > h AS INT) AS alarm_neg
FROM mins
"""


# ---------------------------------------------------- seasonal anomalies

SEASONAL_Z = 1.8


def stream_seasonal_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonality-aware volume anomaly: each HOUR's event count compared
    to the baseline of its own (day-of-week, hour-of-day) cell — the
    upgrade over stream_volume_anomaly's flat daily mean, which a weekly
    traffic pattern would swamp (Monday 9am is only anomalous relative to
    other Monday 9ams).

    Plan: the scan reduces immediately to one (hour → count) aggregate
    (map-side combinable, ≤ |hours| rows); the per-(dow,hour) baseline is
    a ≤168-row aggregate broadcast back; everything after the first
    aggregate is metadata-scale arithmetic. Baseline mean/σ derive from
    exact integer sums, so the z comparison is engine-stable.
    """
    events = load_table(spark, sf_dir, "events")
    hourly = events.groupBy(
        F.date_format(F.date_trunc("hour", F.col("ts")), "yyyy-MM-dd HH:mm:ss")
        .alias("hour_start"),
        (F.dayofweek(F.col("ts")) - 1).alias("dow"),
        F.hour(F.col("ts")).alias("hr"),
    ).agg(F.count(F.lit(1)).alias("n"))
    base = hourly.groupBy("dow", "hr").agg(
        (F.sum("n").cast("double") / F.count(F.lit(1))).alias("mu"),
        F.sqrt(
            F.greatest(
                F.lit(0.0),
                F.sum(F.col("n") * F.col("n")).cast("double")
                / F.count(F.lit(1))
                - (F.sum("n").cast("double") / F.count(F.lit(1)))
                * (F.sum("n").cast("double") / F.count(F.lit(1))),
            )
        ).alias("sd"),
    )
    z = (F.col("n") - F.col("mu")) / F.col("sd")
    return (
        hourly.join(F.broadcast(base), ["dow", "hr"])
        .filter(F.col("sd") > 0)
        .select(
            "hour_start",
            "dow",
            "hr",
            F.col("n").alias("n_events"),
            F.round("mu", 9).alias("baseline_mean"),
            F.round(z, 9).alias("z_score"),
        )
        .filter(F.abs(F.col("z_score")) >= SEASONAL_Z)
    )


SEASONAL_ANOMALY_SQL = f"""
WITH hourly AS (
  SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour_start,
         dayofweek(ts) AS dow, hour(ts) AS hr, COUNT(*) AS n
  FROM events GROUP BY 1, 2, 3
),
base AS (
  SELECT dow, hr,
         CAST(SUM(n) AS DOUBLE) / COUNT(*) AS mu,
         SQRT(GREATEST(0.0,
              CAST(SUM(n * n) AS DOUBLE) / COUNT(*)
              - (CAST(SUM(n) AS DOUBLE) / COUNT(*))
                * (CAST(SUM(n) AS DOUBLE) / COUNT(*)))) AS sd
  FROM hourly GROUP BY 1, 2
)
SELECT hour_start, dow, hr, n AS n_events,
       ROUND(mu, 9) AS baseline_mean,
       ROUND((n - mu) / sd, 9) AS z_score
FROM hourly JOIN base USING (dow, hr)
WHERE sd > 0 AND ABS(ROUND((n - mu) / sd, 9)) >= {SEASONAL_Z}
"""


# ------------------------------------------------------------ path analysis

PATH_LEN = 3
PATH_TOP_K = 10


def event_path_analysis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-K most common PATH_LEN-step event-type sequences (product
    analytics "path analysis" — the generalization of the fixed funnel to
    discovered journeys): consecutive event triples per user, counted
    corpus-wide with the distinct-user reach of each path.

    Plan: one shuffle on user_id; lead() windows build the step sequence
    in-scan (same codegen shape as the shingle pipeline — never an
    interpreted array lambda); the (path) aggregate's state is bounded by
    \\|event types\\|^PATH_LEN, and ranking runs over that metadata-sized
    frame only. distinct-user reach dedups (path, user) BEFORE counting —
    a two-level aggregate instead of count_distinct's Expand.
    """
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", "event_type"
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    s2, s3 = F.lead("event_type", 1).over(w), F.lead("event_type", 2).over(w)
    paths = (
        ev.select(
            "user_id",
            F.concat_ws(">", F.col("event_type"), s2, s3).alias("path"),
            s3.alias("_s3"),
        )
        .filter(F.col("_s3").isNotNull())
        .select("user_id", "path")
    )
    per_user = paths.groupBy("path", "user_id").agg(
        F.count(F.lit(1)).alias("n")
    )
    agg = per_user.groupBy("path").agg(
        F.sum("n").cast("bigint").alias("n_occurrences"),
        F.count(F.lit(1)).cast("bigint").alias("n_users"),
    )
    rank_w = Window.orderBy(F.desc("n_occurrences"), F.asc("path"))
    return (
        agg.withColumn("rank", F.row_number().over(rank_w).cast("bigint"))
        .filter(F.col("rank") <= PATH_TOP_K)
        .select("rank", "path", "n_occurrences", "n_users")
    )


PATH_SQL = f"""
WITH steps AS (
  SELECT user_id,
         event_type || '>' || lead(event_type, 1) OVER w
                    || '>' || lead(event_type, 2) OVER w AS path,
         lead(event_type, 2) OVER w AS s3
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
per_user AS (
  SELECT path, user_id, COUNT(*) AS n
  FROM steps WHERE s3 IS NOT NULL GROUP BY path, user_id
),
agg AS (
  SELECT path, CAST(SUM(n) AS BIGINT) AS n_occurrences,
         CAST(COUNT(*) AS BIGINT) AS n_users
  FROM per_user GROUP BY path
)
SELECT CAST(ROW_NUMBER() OVER (ORDER BY n_occurrences DESC, path ASC)
            AS BIGINT) AS rank,
       path, n_occurrences, n_users
FROM agg
QUALIFY rank <= {PATH_TOP_K}
"""




# --------------------------------------------------- click attribution

# Last-touch lookback window (purchases attribute to the latest click at
# most this many seconds earlier). 24 h keeps the sf-synthetic feed mixed:
# ~1/3 of purchases attribute, the rest report organic.
ATTRIBUTION_WINDOW_S = 24 * 3600


def stream_click_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-touch click attribution — the batch equivalent of a
    stream-stream INTERVAL JOIN (clicks ⟕ purchases on user_id with
    purchase.ts − click.ts ∈ [0, W]): each purchase is attributed to the
    user's LATEST click within the lookback window, else marked organic.
    In Structured Streaming this exact shape is the watermarked
    stream-stream join whose state retention is W; here the same semantics
    compute as ONE union + ONE window on the shared user_id partitioning
    (the scalable as-of construction, `operators/asof.py`) — no per-row
    probes, no data-sized single-partition stage, and a bounded-interval
    residual instead of the naive range self-join's fan-out.

    Tie discipline: clicks sort before purchases at equal ts (side 0 < 1),
    so a click at exactly purchase time attributes; among equal-ts clicks
    the highest event_id wins (last in window order). Lag is computed in
    integer MICROSECONDS (unix_micros ↔ epoch_us) — double epoch seconds
    would round differently across engines.
    """
    events = load_table(spark, sf_dir, "events").select(
        "event_id", "ts", "user_id", "event_type"
    )
    clicks = events.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("k"),
        F.col("ts").alias("t"),
        F.lit(0).alias("side"),
        F.col("event_id"),
        F.col("event_id").alias("c_id"),
        F.col("ts").alias("c_ts"),
    )
    purchases = events.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("k"),
        F.col("ts").alias("t"),
        F.lit(1).alias("side"),
        F.col("event_id"),
        F.lit(None).cast("bigint").alias("c_id"),
        F.lit(None).cast("timestamp").alias("c_ts"),
    )
    w = (
        Window.partitionBy("k")
        .orderBy("t", "side", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    lag_us = F.unix_micros(F.col("t")) - F.unix_micros(F.col("last_c_ts"))
    within = F.col("last_c_ts").isNotNull() & (
        lag_us <= F.lit(ATTRIBUTION_WINDOW_S * 1_000_000)
    )
    return (
        clicks.unionByName(purchases)
        .withColumn("last_c_id", F.last("c_id", ignorenulls=True).over(w))
        .withColumn("last_c_ts", F.last("c_ts", ignorenulls=True).over(w))
        .filter(F.col("side") == 1)
        .select(
            F.col("event_id").alias("purchase_id"),
            F.col("k").alias("user_id"),
            F.col("t").alias("purchase_ts"),
            F.when(within, F.col("last_c_id")).alias("attributed_click_id"),
            F.when(within, F.col("last_c_ts")).alias("click_ts"),
            F.when(within, (lag_us / F.lit(1_000_000)).cast("bigint")).alias(
                "lag_seconds"
            ),
            within.alias("attributed"),
        )
    )


ATTRIBUTION_SQL = f"""
WITH u AS (
  SELECT user_id AS k, ts AS t, 0 AS side, event_id,
         event_id AS c_id, ts AS c_ts
  FROM events WHERE event_type = 'click'
  UNION ALL
  SELECT user_id AS k, ts AS t, 1 AS side, event_id,
         CAST(NULL AS BIGINT) AS c_id, CAST(NULL AS TIMESTAMP) AS c_ts
  FROM events WHERE event_type = 'purchase'
),
lastc AS (
  SELECT k, t, side, event_id,
         last_value(c_id IGNORE NULLS) OVER win AS last_c_id,
         last_value(c_ts IGNORE NULLS) OVER win AS last_c_ts
  FROM u
  WINDOW win AS (PARTITION BY k ORDER BY t, side, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
)
SELECT event_id AS purchase_id, k AS user_id, t AS purchase_ts,
  CASE WHEN ok THEN last_c_id END AS attributed_click_id,
  CASE WHEN ok THEN last_c_ts END AS click_ts,
  CASE WHEN ok THEN (epoch_us(t) - epoch_us(last_c_ts)) // 1000000
  END AS lag_seconds,
  ok AS attributed
FROM (
  SELECT *, last_c_ts IS NOT NULL AND epoch_us(t) - epoch_us(last_c_ts)
         <= {ATTRIBUTION_WINDOW_S} * CAST(1000000 AS BIGINT) AS ok
  FROM lastc
) WHERE side = 1
"""



def stream_attribution_join_job(
    spark: SparkSession, sf_dir: str, checkpoint_dir: str
) -> DataFrame:
    """`stream_click_attribution`'s interval join as a REAL stream-stream
    INNER join: clicks and purchases are two watermarked branches of the
    events file stream, joined on user_id with the time-range residual
    purchase.ts − click.ts ∈ [0, W]. The range condition plus both
    watermarks let Spark EVICT click state older than W + delay — the
    bounded-state property the batch docstring promises. Emits every
    in-window (purchase, click) pair in append mode; last-touch selection
    is a per-purchase argmax the caller applies (the batch operator folds
    it into its window)."""
    stream = _event_stream(spark, sf_dir, checkpoint_dir)
    clicks = (
        stream.filter(F.col("event_type") == "click")
        .select(
            F.col("user_id").alias("c_user"),
            F.col("ts").alias("c_ts"),
            F.col("event_id").alias("click_id"),
        )
        .withWatermark("c_ts", "1 hour")
    )
    purchases = (
        stream.filter(F.col("event_type") == "purchase")
        .select(
            F.col("user_id").alias("p_user"),
            F.col("ts").alias("p_ts"),
            F.col("event_id").alias("purchase_id"),
        )
        .withWatermark("p_ts", "1 hour")
    )
    joined = purchases.join(
        clicks,
        F.expr(
            f"""c_user = p_user AND c_ts <= p_ts
            AND c_ts >= p_ts - INTERVAL {ATTRIBUTION_WINDOW_S} SECONDS"""
        ),
        "inner",
    ).select("purchase_id", "p_user", "p_ts", "click_id", "c_ts")
    query = (
        joined.writeStream.format("memory")
        .queryName("stream_attribution_pairs")
        .outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    if not query.awaitTermination(600):
        query.stop()
        raise TimeoutError("streaming job did not finish within 600s")
    return spark.table("stream_attribution_pairs")




def stream_peak_concurrency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Peak CONCURRENT sessions per day — the capacity-planning number
    (connection pools, websocket fan-out, licensing): sweep-line over
    session intervals (+1 at start, −1 at end; ends sort before starts at
    the same instant so back-to-back sessions never double-count), running
    sum = live concurrency, max per calendar day.

    The running sum is GLOBAL over arrival order, so it computes as the
    TWO-LEVEL parallel prefix (§6): per-day within-block running sum (one
    shuffle on the day key) + a ≤ days-row carry frame of prior-day
    delta totals — no data-sized single-partition window. Sessions that
    span midnight carry into the next day through exactly that carry term.
    Sessions come from `stream_sessionization` (same 30-min gap).
    """
    sessions = stream_sessionization(spark, sf_dir).select(
        "session_start", "session_end"
    )
    deltas = sessions.select(
        F.col("session_start").alias("t"), F.lit(1).alias("delta")
    ).unionByName(
        sessions.select(
            F.col("session_end").alias("t"), F.lit(-1).alias("delta")
        )
    )
    day = F.date_format(F.to_date("t"), "yyyy-MM-dd")
    within = Window.partitionBy("d").orderBy("t", "delta").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    per_day = deltas.select(day.alias("d"), "t", "delta").withColumn(
        "run", F.sum("delta").over(within)
    )
    day_tot = per_day.groupBy("d").agg(
        F.sum("delta").alias("day_delta"), F.max("run").alias("max_run")
    )
    carry_w = (
        Window.orderBy("d")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        day_tot.withColumn(
            "carry", F.sum("day_delta").over(carry_w) - F.col("day_delta")
        )
        .select(
            F.col("d").alias("day"),
            (F.col("max_run") + F.col("carry"))
            .cast("bigint")
            .alias("peak_concurrency"),
        )
    )


PEAK_CONCURRENCY_SQL = f"""
WITH sessions AS (
  SELECT session_start, session_end FROM ({SESSION_SQL.strip()})
),
deltas AS (
  SELECT session_start AS t, 1 AS delta FROM sessions
  UNION ALL
  SELECT session_end AS t, -1 AS delta FROM sessions
),
runs AS (
  SELECT strftime(CAST(t AS DATE), '%Y-%m-%d') AS d, t, delta,
         SUM(delta) OVER (ORDER BY t, delta
                          ROWS UNBOUNDED PRECEDING) AS run
  FROM deltas
)
SELECT d AS day, CAST(MAX(run) AS BIGINT) AS peak_concurrency
FROM runs GROUP BY d
"""



# ------------------------------------------------------------ bot scoring

BOT_USER_ID = 999_983  # synthetic high-rate user assembled in-query
BOT_MOD = 37
BOT_MIN_EVENTS = 20
BOT_MAX_CV = 0.4  # coefficient of variation of inter-event gaps


def events_bot_detection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heuristic bot / automation scoring per user: event volume, median
    inter-event gap, and the gap coefficient of variation — humans are
    bursty (CV ≈ 1 for Poisson-ish arrivals, higher with sessions), while
    schedulers and scrapers tick metronomically (CV → 0). Flag = high
    volume AND short median gap AND low CV, the standard first-pass
    abuse screen.

    The organic feed has no bots, so one is ASSEMBLED in-query in both
    engines: every BOT_MOD-th event re-attributes to a synthetic user id,
    which (events arriving in dense id order) yields a near-constant gap
    stream — the detector must flag exactly that user and no organic one.
    The flag rests on volume + CV (scale-free signals); the median gap is
    REPORTED, not gated — an absolute rate threshold would be a deployment
    parameter, not a property of metronomic behavior.

    Plan: one user_id shuffle; gaps via lag on that partitioning; median
    via exact percentile and CV via decimal-exact power sums, all inside
    the per-user aggregate (state = |users| rows).
    """
    ev = load_table(spark, sf_dir, "events").select("event_id", "ts", "user_id")
    attributed = ev.select(
        F.when(F.col("event_id") % BOT_MOD == 0, F.lit(BOT_USER_ID))
        .otherwise(F.col("user_id"))
        .alias("user_id"),
        "ts",
        "event_id",
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gaps = (
        attributed.withColumn(
            "gap_us",
            F.unix_micros(F.col("ts")) - F.unix_micros(F.lag("ts").over(w)),
        )
        .filter(F.col("gap_us").isNotNull())
        # exact integer µs for the MEDIAN (interpolating two ints is exact
        # in both engines; interpolating arbitrary doubles diverged by one
        # ulp at sf0.1), doubles only for the moment sums
        .withColumn("gap_s", F.col("gap_us").cast("double") / 1_000_000.0)
    )
    dec = "decimal(38,9)"
    per_user = gaps.groupBy("user_id").agg(
        (F.count(F.lit(1)) + 1).cast("bigint").alias("n_events"),
        # NO rounding: the interpolated µs median is integer-or-half —
        # exactly representable — and /1e6 is the identical double op in
        # both engines; rounding at 6 dp hits the .5 tie engines break
        # differently (observed at sf0.1)
        (F.percentile(F.col("gap_us"), F.lit(0.5)) / 1_000_000.0).alias(
            "median_gap_s"
        ),
        F.sum(F.col("gap_s").cast(dec)).cast("double").alias("s1"),
        F.sum((F.col("gap_s") * F.col("gap_s")).cast(dec))
        .cast("double")
        .alias("s2"),
        F.count(F.lit(1)).cast("double").alias("ng"),
    )
    mean = F.col("s1") / F.col("ng")
    cv = F.sqrt(F.col("s2") / F.col("ng") - mean * mean) / mean
    return per_user.select(
        "user_id",
        "n_events",
        "median_gap_s",
        F.round(cv, 6).alias("gap_cv"),
        (
            (F.col("n_events") >= BOT_MIN_EVENTS) & (cv <= BOT_MAX_CV)
        ).alias("is_bot"),
    )


BOT_SQL = f"""
WITH attributed AS (
  SELECT CASE WHEN event_id % {BOT_MOD} = 0 THEN {BOT_USER_ID}
              ELSE user_id END AS user_id, ts, event_id
  FROM events
),
gaps AS (
  SELECT user_id, gap_us, CAST(gap_us AS DOUBLE) / 1000000.0 AS gap_s
  FROM (
    SELECT user_id, epoch_us(ts) - epoch_us(lag(ts) OVER w) AS gap_us
    FROM attributed
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
  )
),
per_user AS (
  SELECT user_id,
         CAST(COUNT(*) + 1 AS BIGINT) AS n_events,
         quantile_cont(gap_us, 0.5) / 1000000.0 AS median_gap_s,
         CAST(SUM(CAST(gap_s AS DECIMAL(38,9))) AS DOUBLE) AS s1,
         CAST(SUM(CAST(gap_s * gap_s AS DECIMAL(38,9))) AS DOUBLE) AS s2,
         CAST(COUNT(*) AS DOUBLE) AS ng
  FROM gaps WHERE gap_us IS NOT NULL GROUP BY user_id
)
SELECT user_id, n_events, median_gap_s,
  ROUND(SQRT(s2 / ng - (s1 / ng) * (s1 / ng)) / (s1 / ng), 6) AS gap_cv,
  (n_events >= {BOT_MIN_EVENTS}
   AND SQRT(s2 / ng - (s1 / ng) * (s1 / ng)) / (s1 / ng) <= {BOT_MAX_CV})
    AS is_bot
FROM per_user
"""



# ----------------------------------------------------- payload schema drift

SCHEMA_V2_DATE = "2024-01-20 00:00:00"  # injected producer redeploy


def events_payload_schema_versions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Payload schema-VERSION tracking: per day, the distinct props
    key-set signatures in flight and the dominant signature's share — the
    monitor that catches a producer silently adding/renaming payload
    fields (table-level schema drift tooling can't see inside a JSON
    column; `survey_json_schema_inference` profiles one snapshot, this
    watches the mix over time).

    A producer redeploy is injected in-query in BOTH engines: events at or
    after SCHEMA_V2_DATE carry an extra `v` field on every 2nd event_id —
    the report must show exactly two signatures in flight after that date
    and one before.

    Plan: map-side key-set signature (sorted keys joined — canonical) →
    one bounded (day, signature) aggregate → share window over the ≤
    days×versions frame.
    """
    split = F.lit(SCHEMA_V2_DATE).cast("timestamp")
    ev = load_table(spark, sf_dir, "events").select("event_id", "ts", "props")
    upgraded = F.when(
        (F.col("ts") >= split) & (F.col("event_id") % 2 == 0),
        F.concat(
            F.regexp_replace(F.col("props"), "\\}$", ""), F.lit(', "v": 2}')
        ),
    ).otherwise(F.col("props"))
    signature = F.array_join(
        F.array_sort(F.json_object_keys(upgraded)), ","
    )
    counts = ev.select(
        F.date_format(F.to_date("ts"), "yyyy-MM-dd").alias("day"),
        signature.alias("key_signature"),
    ).groupBy("day", "key_signature").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_events")
    )
    w = Window.partitionBy("day")
    return counts.select(
        "day",
        "key_signature",
        "n_events",
        F.round(
            F.col("n_events").cast("double")
            / F.sum("n_events").over(w).cast("double"),
            9,
        ).alias("share"),
        (F.count(F.lit(1)).over(w) > 1).alias("mixed_versions"),
    )


PAYLOAD_SCHEMA_SQL = f"""
WITH upgraded AS (
  SELECT strftime(CAST(ts AS DATE), '%Y-%m-%d') AS day,
         CASE WHEN ts >= TIMESTAMP '{SCHEMA_V2_DATE}' AND event_id % 2 = 0
              THEN regexp_replace(props, '}}$', '') || ', "v": 2}}'
              ELSE props END AS p
  FROM events
),
counts AS (
  SELECT day,
         array_to_string(list_sort(json_keys(p)), ',') AS key_signature,
         CAST(COUNT(*) AS BIGINT) AS n_events
  FROM upgraded GROUP BY 1, 2
)
SELECT day, key_signature, n_events,
  ROUND(CAST(n_events AS DOUBLE)
        / SUM(CAST(n_events AS DOUBLE)) OVER (PARTITION BY day), 9) AS share,
  (COUNT(*) OVER (PARTITION BY day) > 1) AS mixed_versions
FROM counts
"""

# -------------------------------------------------- state-store sizing

# Per-row state estimates (key + value + RocksDB/HDFS-store framing) for
# the four stateful-operator families; the constants are documented sizing
# heuristics, the ROWS are measured from the data.
STATE_OPS = {
    # op_name: (horizon_seconds, bytes_per_row)
    "dedup_within_watermark": (SESSION_GAP_MIN * 60, 56),
    "session_window_open": (SESSION_GAP_MIN * 60, 72),
    "tumbling_agg_open_windows": (2 * WINDOW_SECONDS, 64),
    "join_click_buffer": (24 * 3600, 80),
}


def stream_state_size_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """State-store SIZING report for the stateful streaming jobs this
    engine ships — the capacity-planning table an operator reads before
    submitting a 100 TB/day stream: for each stateful shape, how many
    state rows would be live at the current watermark, and roughly how
    many bytes that is. Rows are measured against the dataset's OWN
    watermark (max event time — deterministic, like `quality_timeliness`):

    - `dedup_within_watermark`: distinct event ids younger than the
      dedup watermark (`dropDuplicatesWithinWatermark` keeps exactly
      these keys);
    - `session_window_open`: users with activity inside one session gap
      (each holds an open session-window state row);
    - `tumbling_agg_open_windows`: distinct (hour-window, event_type)
      groups within window + allowed-lateness horizon (unclosed agg
      state);
    - `join_click_buffer`: clicks inside the 24 h attribution interval
      (the stream-stream join buffers each until its window expires).

    Plan: the scan reduces to ONE conditional aggregate against the
    broadcast 1-row watermark — state size at any corpus scale is a
    single pass, no shuffle beyond the agg exchange.
    """
    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", "ts"
    )
    wm = ev.agg(F.max("ts").alias("wm"))
    win_key = F.concat_ws(
        "|",
        F.date_format(F.date_trunc("hour", F.col("ts")), "yyyy-MM-dd HH"),
        F.col("event_type"),
    )
    horizons = {k: v[0] for k, v in STATE_OPS.items()}
    agg = (
        ev.crossJoin(F.broadcast(wm))
        .agg(
            F.count_distinct(
                F.when(
                    F.col("ts")
                    > F.col("wm")
                    - F.expr(
                        f"INTERVAL {horizons['dedup_within_watermark']} SECONDS"
                    ),
                    F.col("event_id"),
                )
            )
            .cast("bigint")
            .alias("dedup_within_watermark"),
            F.count_distinct(
                F.when(
                    F.col("ts")
                    > F.col("wm")
                    - F.expr(
                        f"INTERVAL {horizons['session_window_open']} SECONDS"
                    ),
                    F.col("user_id"),
                )
            )
            .cast("bigint")
            .alias("session_window_open"),
            F.count_distinct(
                F.when(
                    F.col("ts")
                    > F.col("wm")
                    - F.expr(
                        f"INTERVAL {horizons['tumbling_agg_open_windows']} SECONDS"
                    ),
                    win_key,
                )
            )
            .cast("bigint")
            .alias("tumbling_agg_open_windows"),
            F.sum(
                F.when(
                    (F.col("event_type") == "click")
                    & (
                        F.col("ts")
                        > F.col("wm")
                        - F.expr(
                            f"INTERVAL {horizons['join_click_buffer']} SECONDS"
                        )
                    ),
                    1,
                ).otherwise(0)
            )
            .cast("bigint")
            .alias("join_click_buffer"),
        )
    )
    # ONE aggregate → rows via inline (a union of per-op selects would
    # replan the whole aggregate per branch: measured 16 parquet scans for
    # the 4-row report; inline keeps it at one)
    entries = [
        F.struct(
            F.lit(op).alias("op_name"),
            F.lit(horizon_s).cast("bigint").alias("horizon_s"),
            F.col(op).alias("state_rows"),
            (F.col(op) * bpr).cast("bigint").alias("est_state_bytes"),
        )
        for op, (horizon_s, bpr) in STATE_OPS.items()
    ]
    return agg.select(F.inline(F.array(*entries)))


def _state_size_sql() -> str:
    h = {k: v[0] for k, v in STATE_OPS.items()}
    counts = f"""
SELECT
  CAST(COUNT(DISTINCT CASE WHEN ts > wm - INTERVAL {h['dedup_within_watermark']} SECONDS
       THEN event_id END) AS BIGINT) AS dedup_within_watermark,
  CAST(COUNT(DISTINCT CASE WHEN ts > wm - INTERVAL {h['session_window_open']} SECONDS
       THEN user_id END) AS BIGINT) AS session_window_open,
  CAST(COUNT(DISTINCT CASE WHEN ts > wm - INTERVAL {h['tumbling_agg_open_windows']} SECONDS
       THEN strftime(date_trunc('hour', ts), '%Y-%m-%d %H') || '|' || event_type
       END) AS BIGINT) AS tumbling_agg_open_windows,
  CAST(SUM(CASE WHEN event_type = 'click'
                 AND ts > wm - INTERVAL {h['join_click_buffer']} SECONDS
                THEN 1 ELSE 0 END) AS BIGINT) AS join_click_buffer
FROM events CROSS JOIN (SELECT MAX(ts) AS wm FROM events)
"""
    branches = "\nUNION ALL\n".join(
        f"SELECT '{op}' AS op_name, CAST({horizon_s} AS BIGINT) AS horizon_s, "
        f"{op} AS state_rows, CAST({op} * {bpr} AS BIGINT) AS est_state_bytes "
        "FROM agg"
        for op, (horizon_s, bpr) in STATE_OPS.items()
    )
    return f"WITH agg AS ({counts})\n{branches}"


QUERIES = {
    "stream_watermark_tuning_curve": stream_watermark_tuning_curve,
    "stream_state_size_report": stream_state_size_report,
    "scd2_user_state": scd2_user_state,
    "event_path_analysis": event_path_analysis,
    "stream_seasonal_anomaly": stream_seasonal_anomaly,
    "stream_volume_cusum": stream_volume_cusum,
    "stream_late_data_report": stream_late_data_report,
    "stream_tumbling_counts": stream_tumbling_counts,
    "stream_topk_trending": stream_topk_trending,
    "stream_volume_anomaly": stream_volume_anomaly,
    "stream_sliding_counts": stream_sliding_counts,
    "stream_sessionization": stream_sessionization,
    "stream_dedup_events": stream_dedup_events,
    "stream_click_attribution": stream_click_attribution,
    "stream_peak_concurrency": stream_peak_concurrency,
    "events_bot_detection": events_bot_detection,
    "events_payload_schema_versions": events_payload_schema_versions,
}

ORACLES = {
    "stream_watermark_tuning_curve": _watermark_curve_sql(),
    "stream_state_size_report": _state_size_sql(),
    "scd2_user_state": SCD2_SQL,
    "event_path_analysis": PATH_SQL,
    "stream_seasonal_anomaly": SEASONAL_ANOMALY_SQL,
    "stream_volume_cusum": CUSUM_SQL,
    "stream_late_data_report": _late_data_sql(),
    "stream_tumbling_counts": TUMBLING_SQL,
    "stream_topk_trending": TRENDING_SQL,
    "stream_volume_anomaly": VOLUME_ANOMALY_SQL,
    "stream_sliding_counts": SLIDING_SQL,
    "stream_sessionization": SESSION_SQL,
    "stream_dedup_events": DEDUP_EVENTS_SQL,
    "stream_click_attribution": ATTRIBUTION_SQL,
    "stream_peak_concurrency": PEAK_CONCURRENCY_SQL,
    "events_bot_detection": BOT_SQL,
    "events_payload_schema_versions": PAYLOAD_SCHEMA_SQL,
}
