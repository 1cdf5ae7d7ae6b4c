"""As-of and time-range joins (SURVEY.md §2.D tail) — custom temporal
operators Spark lacks natively, built as compositions of existing ops.

- asof_join_events_orders: for every order, the latest event of the same
  user at-or-before the order date. Implemented with the UNION + WINDOW
  technique: tag both sides, union on (key, time), and carry the last event
  forward with last_value(ignorenulls) — ONE shuffle on the key, no per-row
  probing, no range explosion. This is the scalable as-of plan (a sort-merge
  within key partitions); DuckDB's native ASOF JOIN is the oracle.
- range_join_error_bursts: count same-user events in the 30 minutes before
  each error event. Implemented with TIME-BUCKET PRE-JOINING: both sides are
  bucketed to 30-min grid cells and joined on (user, bucket ∈ {b-1, b}) then
  exact-range filtered — bounds the join fan-out to two buckets per row
  instead of |user_history|.
- asof_join_nearest: the nearest-direction variant (pandas merge_asof
  direction='nearest') — both directions from the SAME union+window
  shuffle via preceding/following frames on one sorted partition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..catalog import load_table

RANGE_SECONDS = 1800  # 30 minutes


def _dedup_events(events: DataFrame) -> DataFrame:
    """One event per (user_id, ts): keep max event_id — makes the as-of
    target unique so both engines pick the same row at timestamp ties."""
    w = Window.partitionBy("user_id", "ts").orderBy(F.desc("event_id"))
    return (
        events.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


_DEDUP_EVENTS_SQL = """
SELECT event_id, ts, user_id, event_type FROM (
  SELECT event_id, ts, user_id, event_type,
         ROW_NUMBER() OVER (PARTITION BY user_id, ts
                            ORDER BY event_id DESC) AS rn
  FROM events
) WHERE rn = 1
"""


def asof_join_events_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate"
    )
    events = _dedup_events(
        load_table(spark, sf_dir, "events").select(
            "event_id", "ts", "user_id", "event_type"
        )
    )
    tagged_events = events.select(
        F.col("user_id").alias("k"),
        F.col("ts").alias("t"),
        F.lit(0).alias("side"),  # events sort before orders at equal t (<=)
        F.col("event_id"),
        F.col("ts").alias("event_ts"),
        F.col("event_type"),
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
        F.col("o_orderkey"),
        F.col("o_orderdate"),
    )
    unioned = tagged_events.unionByName(tagged_orders)
    w = (
        Window.partitionBy("k")
        .orderBy("t", "side", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        unioned.withColumn("last_event_id", F.last("event_id", ignorenulls=True).over(w))
        .withColumn("last_event_ts", F.last("event_ts", ignorenulls=True).over(w))
        .withColumn(
            "last_event_type", F.last("event_type", ignorenulls=True).over(w)
        )
        .filter(F.col("side") == 1)
        .select(
            "o_orderkey",
            F.col("k").alias("o_custkey"),
            "o_orderdate",
            "last_event_id",
            "last_event_ts",
            "last_event_type",
        )
    )


ASOF_SQL = f"""
WITH ev AS ({_DEDUP_EVENTS_SQL})
SELECT o.o_orderkey, o.o_custkey, o.o_orderdate,
       ev.event_id AS last_event_id,
       ev.ts AS last_event_ts,
       ev.event_type AS last_event_type
FROM orders o
ASOF LEFT JOIN ev
  ON o.o_custkey = ev.user_id AND ev.ts <= o.o_orderdate
"""


def range_join_error_bursts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per error event: count of same-user events in (ts-30min, ts],
    excluding itself."""
    events = load_table(spark, sf_dir, "events").select(
        "event_id", "ts", "user_id", "event_type"
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
        # exact microsecond-precision range bound (unix_timestamp truncates
        # to seconds — only safe for the coarse bucket pruning above)
        & (F.col("c_ts") > F.col("err_ts") - F.expr("INTERVAL 30 MINUTES"))
        & (F.col("event_id") != F.col("err_id")),
        "left",
    )
    return joined.groupBy(
        F.col("err_id").alias("event_id"),
        F.col("err_user").alias("user_id"),
        F.col("err_ts").alias("ts"),
    ).agg(F.count(F.col("event_id")).alias("nearby_count"))


RANGE_SQL = f"""
SELECT e.event_id, e.user_id, e.ts,
       CAST(COUNT(c.event_id) AS BIGINT) AS nearby_count
FROM events e
LEFT JOIN events c
  ON c.user_id = e.user_id
 AND c.ts <= e.ts
 AND c.ts > e.ts - INTERVAL '30 minutes'
 AND c.event_id <> e.event_id
WHERE e.event_type = 'error'
GROUP BY e.event_id, e.user_id, e.ts
"""


def asof_join_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NEAREST-direction as-of join (pandas `merge_asof(direction=
    'nearest')`, kdb's `wj` nearest window): for every order, the same
    user's event CLOSEST in time in EITHER direction, with the direction
    and the gap — the feature-alignment join when the reading can
    legitimately land on either side of the anchor (sensor sync, quote/
    trade matching). Backward wins equal-distance ties (pandas'
    convention), and the same-timestamp event counts as backward.

    Plan: the same UNION + WINDOW technique as `asof_join_events_orders`,
    paying ONE shuffle on the user key for BOTH directions: the backward
    candidate is last_value(ignorenulls) over the preceding frame, the
    forward candidate is first_value(ignorenulls) over the following
    frame — two frames on one sorted partition, no second exchange (at
    same t the event row sorts before the order row, so equality lands in
    the backward frame and the forward frame is strictly-later). Gap
    arithmetic is integer epoch MICROseconds (unix_micros ↔ epoch_us) —
    exact in both engines at full timestamp precision.
    """
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate"
    )
    events = _dedup_events(
        load_table(spark, sf_dir, "events").select(
            "event_id", "ts", "user_id", "event_type"
        )
    )
    tagged_events = events.select(
        F.col("user_id").alias("k"),
        F.col("ts").alias("t"),
        F.lit(0).alias("side"),
        F.col("event_id"),
        F.col("ts").alias("event_ts"),
        F.lit(None).cast("bigint").alias("o_orderkey"),
        F.lit(None).cast("timestamp").alias("o_orderdate"),
    )
    tagged_orders = orders.select(
        F.col("o_custkey").alias("k"),
        F.col("o_orderdate").alias("t"),
        F.lit(1).alias("side"),
        F.lit(None).cast("bigint").alias("event_id"),
        F.lit(None).cast("timestamp").alias("event_ts"),
        F.col("o_orderkey"),
        F.col("o_orderdate"),
    )
    unioned = tagged_events.unionByName(tagged_orders)
    order_by = [F.col("t"), F.col("side"), F.col("event_id")]
    back_w = (
        Window.partitionBy("k")
        .orderBy(*order_by)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    fwd_w = (
        Window.partitionBy("k")
        .orderBy(*order_by)
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    t_s = F.unix_micros(F.col("t"))
    b_gap = t_s - F.unix_micros(F.col("b_ts"))
    f_gap = F.unix_micros(F.col("f_ts")) - t_s
    use_back = F.col("f_id").isNull() | (
        F.col("b_id").isNotNull() & (b_gap <= f_gap)
    )
    return (
        unioned.withColumn(
            "b_id", F.last("event_id", ignorenulls=True).over(back_w)
        )
        .withColumn(
            "b_ts", F.last("event_ts", ignorenulls=True).over(back_w)
        )
        .withColumn(
            "f_id", F.first("event_id", ignorenulls=True).over(fwd_w)
        )
        .withColumn(
            "f_ts", F.first("event_ts", ignorenulls=True).over(fwd_w)
        )
        .filter(F.col("side") == 1)
        .select(
            "o_orderkey",
            F.col("k").alias("o_custkey"),
            "o_orderdate",
            F.when(use_back, F.col("b_id"))
            .otherwise(F.col("f_id"))
            .alias("nearest_event_id"),
            F.when(use_back, F.col("b_ts"))
            .otherwise(F.col("f_ts"))
            .alias("nearest_event_ts"),
            F.when(
                F.col("b_id").isNull() & F.col("f_id").isNull(), F.lit(None)
            )
            .when(use_back, F.lit("backward"))
            .otherwise(F.lit("forward"))
            .cast("string")
            .alias("direction"),
            F.when(use_back, b_gap)
            .otherwise(f_gap)
            .cast("bigint")
            .alias("gap_us"),
        )
    )


ASOF_NEAREST_SQL = f"""
WITH ev AS ({_DEDUP_EVENTS_SQL}),
unioned AS (
  SELECT user_id AS k, ts AS t, 0 AS side, event_id, ts AS event_ts,
         CAST(NULL AS BIGINT) AS o_orderkey,
         CAST(NULL AS TIMESTAMP) AS o_orderdate
  FROM ev
  UNION ALL
  SELECT o_custkey, o_orderdate, 1, NULL, NULL, o_orderkey, o_orderdate
  FROM orders
),
framed AS (
  SELECT *,
    last_value(event_id IGNORE NULLS) OVER (
      PARTITION BY k ORDER BY t, side, event_id
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS b_id,
    last_value(event_ts IGNORE NULLS) OVER (
      PARTITION BY k ORDER BY t, side, event_id
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS b_ts,
    first_value(event_id IGNORE NULLS) OVER (
      PARTITION BY k ORDER BY t, side, event_id
      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS f_id,
    first_value(event_ts IGNORE NULLS) OVER (
      PARTITION BY k ORDER BY t, side, event_id
      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS f_ts
  FROM unioned
)
SELECT o_orderkey, k AS o_custkey, o_orderdate,
  CASE WHEN use_back THEN b_id ELSE f_id END AS nearest_event_id,
  CASE WHEN use_back THEN b_ts ELSE f_ts END AS nearest_event_ts,
  CASE WHEN b_id IS NULL AND f_id IS NULL THEN NULL
       WHEN use_back THEN 'backward' ELSE 'forward' END AS direction,
  CAST(CASE WHEN use_back THEN b_gap ELSE f_gap END AS BIGINT)
    AS gap_us
FROM (
  SELECT *,
    epoch_us(t) - epoch_us(b_ts) AS b_gap,
    epoch_us(f_ts) - epoch_us(t) AS f_gap,
    (f_id IS NULL OR (b_id IS NOT NULL AND
      epoch_us(t) - epoch_us(b_ts) <= epoch_us(f_ts) - epoch_us(t)))
      AS use_back
  FROM framed
) WHERE side = 1
"""


QUERIES = {
    "asof_join_events_orders": asof_join_events_orders,
    "asof_join_nearest": asof_join_nearest,
    "range_join_error_bursts": range_join_error_bursts,
}

ORACLES = {
    "asof_join_events_orders": ASOF_SQL,
    "asof_join_nearest": ASOF_NEAREST_SQL,
    "range_join_error_bursts": RANGE_SQL,
}
