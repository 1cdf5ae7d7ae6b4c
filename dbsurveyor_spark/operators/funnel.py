"""Event-funnel analysis over the events table.

Classic product-analytics funnel: users who viewed, then clicked at or
after their first view, then purchased at or after that click — the
sequential-conversion query every event warehouse runs.

Scale shape: the iterative stage semi-join. Each stage is one
filter → (join on user_id) → groupBy(user_id) min-aggregate; every join
and aggregate keys on user_id, so after the first exchange the stages
reuse the same hash partitioning (and stage frames only ever shrink —
stage N is a subset of stage N−1's users). The alternative single-pass
form (collect_list per user + sequence-matching lambda) drags every
user's full event history through one interpreted HOF — strictly worse
at 100 TB. Three narrow shuffles on a bounded-cardinality key beat one
wide one.

The output is the funnel table itself (stage, users, conversion from
stage 1) — metadata-sized, assembled from three 1-row aggregates.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table

FUNNEL_STAGES = ("view", "click", "purchase")


def funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", "ts"
    )
    stage_first: list[DataFrame] = []
    prev: DataFrame | None = None
    for stage in FUNNEL_STAGES:
        cur = events.filter(F.col("event_type") == stage)
        if prev is not None:
            cur = cur.join(
                prev.select("user_id", F.col("first_ts").alias("_prev_ts")),
                "user_id",
            ).filter(F.col("ts") >= F.col("_prev_ts"))
        cur = cur.groupBy("user_id").agg(F.min("ts").alias("first_ts"))
        stage_first.append(cur)
        prev = cur
    base = stage_first[0].agg(
        F.count(F.lit(1)).alias("_base_users")
    )
    rows = [
        sf.agg(F.count(F.lit(1)).alias("users"))
        .crossJoin(F.broadcast(base))
        .select(
            F.lit(i + 1).cast("bigint").alias("stage"),
            F.lit(stage).alias("event_type"),
            F.col("users"),
            F.round(F.col("users") / F.col("_base_users"), 6).alias(
                "conversion"
            ),
        )
        for i, (stage, sf) in enumerate(zip(FUNNEL_STAGES, stage_first))
    ]
    return reduce(DataFrame.unionByName, rows)


FUNNEL_SQL = """
WITH s1 AS (
  SELECT user_id, MIN(ts) AS first_ts FROM events
  WHERE event_type = 'view' GROUP BY user_id
),
s2 AS (
  SELECT e.user_id, MIN(e.ts) AS first_ts
  FROM events e JOIN s1 ON s1.user_id = e.user_id
  WHERE e.event_type = 'click' AND e.ts >= s1.first_ts
  GROUP BY e.user_id
),
s3 AS (
  SELECT e.user_id, MIN(e.ts) AS first_ts
  FROM events e JOIN s2 ON s2.user_id = e.user_id
  WHERE e.event_type = 'purchase' AND e.ts >= s2.first_ts
  GROUP BY e.user_id
),
base AS (SELECT COUNT(*) AS b FROM s1)
SELECT CAST(1 AS BIGINT) AS stage, 'view' AS event_type,
       CAST(COUNT(*) AS BIGINT) AS users,
       ROUND(COUNT(*) * 1.0 / b, 6) AS conversion
FROM s1, base GROUP BY b
UNION ALL
SELECT CAST(2 AS BIGINT), 'click', CAST(COUNT(*) AS BIGINT),
       ROUND(COUNT(*) * 1.0 / b, 6)
FROM s2, base GROUP BY b
UNION ALL
SELECT CAST(3 AS BIGINT), 'purchase', CAST(COUNT(*) AS BIGINT),
       ROUND(COUNT(*) * 1.0 / b, 6)
FROM s3, base GROUP BY b
"""


def retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention matrix: users cohorted by the week of their
    first signup event; each later week of ANY activity marks them
    retained at that week offset.

    Scale shape: the cohort anchor is one signup-filtered aggregate on
    user_id; activity joins it back on the same key (co-partitioned),
    reduces to DISTINCT (cohort, offset, user) — one map-side-combinable
    dedup shuffle — then counts collapse to the metadata-sized matrix.
    Cohort sizes re-derive from the anchor frame and broadcast-join onto
    the matrix for the retention rate. No count_distinct two-phase
    expansion, no per-user history arrays.
    """
    events = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", "ts"
    )
    anchor = (
        events.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.date_trunc("week", F.min("ts")).alias("cohort_week"))
    )
    sizes = anchor.groupBy("cohort_week").agg(
        F.count(F.lit(1)).alias("cohort_size")
    )
    active = (
        events.join(anchor, "user_id")
        .select(
            "user_id",
            "cohort_week",
            (
                F.datediff(
                    F.date_trunc("week", F.col("ts")).cast("date"),
                    F.col("cohort_week").cast("date"),
                )
                / 7
            )
            .cast("bigint")
            .alias("week_offset"),
        )
        .filter(F.col("week_offset") >= 0)
        .dropDuplicates(["user_id", "cohort_week", "week_offset"])
    )
    matrix = active.groupBy("cohort_week", "week_offset").agg(
        F.count(F.lit(1)).alias("active_users")
    )
    return (
        matrix.join(F.broadcast(sizes), "cohort_week")
        .select(
            # ISO string: Spark DATE surfaces as python date objects while
            # DuckDB DATE lands as datetime64 — string keeps the compare
            # engine-neutral (same convention as other date-keyed outputs)
            F.date_format("cohort_week", "yyyy-MM-dd").alias("cohort_week"),
            "week_offset",
            "active_users",
            "cohort_size",
            F.round(F.col("active_users") / F.col("cohort_size"), 6).alias(
                "retention"
            ),
        )
    )


RETENTION_SQL = """
WITH anchor AS (
  SELECT user_id, date_trunc('week', MIN(ts)) AS cohort_week
  FROM events WHERE event_type = 'signup' GROUP BY user_id
),
sizes AS (
  SELECT cohort_week, COUNT(*) AS cohort_size FROM anchor GROUP BY cohort_week
),
active AS (
  SELECT DISTINCT e.user_id, a.cohort_week,
         CAST(datediff('day', CAST(a.cohort_week AS DATE),
                       CAST(date_trunc('week', e.ts) AS DATE)) / 7
              AS BIGINT) AS week_offset
  FROM events e JOIN anchor a ON a.user_id = e.user_id
  WHERE datediff('day', CAST(a.cohort_week AS DATE),
                 CAST(date_trunc('week', e.ts) AS DATE)) >= 0
),
matrix AS (
  SELECT cohort_week, week_offset, COUNT(*) AS active_users
  FROM active GROUP BY cohort_week, week_offset
)
SELECT strftime(m.cohort_week, '%Y-%m-%d') AS cohort_week, m.week_offset,
       CAST(m.active_users AS BIGINT) AS active_users,
       CAST(s.cohort_size AS BIGINT) AS cohort_size,
       ROUND(m.active_users * 1.0 / s.cohort_size, 6) AS retention
FROM matrix m JOIN sizes s ON s.cohort_week = m.cohort_week
"""


def event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order event-transition matrix: counts of consecutive
    (event → next event) steps per user, with each source event's
    transition probability — the Markov-chain view of user behavior.

    One lag/lead window per user (single shuffle on user_id — the same
    key every events query partitions by), then a (from, to) count whose
    aggregate state is |types|² — metadata-scale. The probability
    denominator is a window over the aggregated matrix, not the data.
    Ties in ts break on event_id so both engines order identically.
    """
    from pyspark.sql.window import Window

    events = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", "ts", "event_id"
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    steps = events.select(
        F.col("event_type").alias("from_event"),
        F.lead("event_type", 1).over(w).alias("to_event"),
    ).filter(F.col("to_event").isNotNull())
    matrix = steps.groupBy("from_event", "to_event").agg(
        F.count(F.lit(1)).alias("transitions")
    )
    total = F.sum("transitions").over(Window.partitionBy("from_event"))
    return matrix.select(
        "from_event",
        "to_event",
        "transitions",
        F.round(F.col("transitions") / total, 6).alias("probability"),
    )


TRANSITIONS_SQL = """
WITH steps AS (
  SELECT event_type AS from_event,
         lead(event_type, 1) OVER (
           PARTITION BY user_id ORDER BY ts, event_id) AS to_event
  FROM events
),
matrix AS (
  SELECT from_event, to_event, COUNT(*) AS transitions
  FROM steps WHERE to_event IS NOT NULL
  GROUP BY from_event, to_event
)
SELECT from_event, to_event, CAST(transitions AS BIGINT) AS transitions,
       ROUND(transitions * 1.0 /
             SUM(transitions) OVER (PARTITION BY from_event), 6)
         AS probability
FROM matrix
"""


def event_interarrival_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inter-event arrival statistics per event type: how long after a
    user's previous event does each type arrive (p50/p90 gap seconds,
    count) — the feature-engineering pass for sequence models and the
    input to session-gap tuning (stream_sessionization's 30-min gap
    should sit far above typical p90s).

    One lag window on the shared user_id key produces the gap column;
    exact percentiles aggregate per type (bounded groups). Ties on ts
    break on event_id so both engines order identically.
    """
    from pyspark.sql.window import Window

    events = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", "ts", "event_id"
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # fractional epoch seconds: timestamp→double (micros/1e6) is the same
    # IEEE expression DuckDB's epoch() computes — unix_timestamp would
    # truncate to whole seconds and diverge
    gaps = events.select(
        "event_type",
        (
            F.col("ts").cast("double")
            - F.lag(F.col("ts").cast("double"), 1).over(w)
        ).alias("gap_s"),
    ).filter(F.col("gap_s").isNotNull())
    q = F.percentile(F.col("gap_s").cast("double"), F.array(F.lit(0.5), F.lit(0.9)))
    return gaps.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_gaps"),
        F.round(q[0], 6).alias("gap_p50_s"),
        F.round(q[1], 6).alias("gap_p90_s"),
    )


INTERARRIVAL_SQL = """
WITH gaps AS (
  SELECT event_type,
         epoch(ts) - epoch(lag(ts, 1) OVER (
           PARTITION BY user_id ORDER BY ts, event_id)) AS gap_s
  FROM events
)
SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_gaps,
       ROUND(quantile_cont(CAST(gap_s AS DOUBLE), 0.5), 6) AS gap_p50_s,
       ROUND(quantile_cont(CAST(gap_s AS DOUBLE), 0.9), 6) AS gap_p90_s
FROM gaps WHERE gap_s IS NOT NULL
GROUP BY event_type
"""


def latest_event_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Latest record per key — the ubiquitous lake pattern (current-state
    view / SCD collapse / changelog compaction), done the scale-right way:
    ONE struct-max aggregate (lexicographic (ts, event_id) — ts wins,
    event_id breaks ties) instead of a row_number window. The aggregate is
    map-side combinable — each partition contributes one candidate per
    key, so the shuffle carries |keys| rows — where the window form sorts
    every row of every partition before discarding all but one.
    """
    events = load_table(spark, sf_dir, "events")
    m = F.max(
        F.struct(
            F.col("ts"), F.col("event_id"), F.col("event_type"), F.col("value")
        )
    ).alias("m")
    return (
        events.groupBy("user_id")
        .agg(m)
        .select(
            "user_id",
            F.col("m.ts").alias("ts"),
            F.col("m.event_id").alias("event_id"),
            F.col("m.event_type").alias("event_type"),
            F.round(F.col("m.value"), 6).alias("value"),
        )
    )


LATEST_EVENT_SQL = """
SELECT user_id, ts, event_id, event_type, ROUND(value, 6) AS value
FROM events
QUALIFY ROW_NUMBER() OVER (
  PARTITION BY user_id ORDER BY ts DESC, event_id DESC) = 1
"""


def event_time_heatmap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-of-week × hour-of-day activity heatmap (events + distinct
    users per cell) — the seasonality/load profile behind cron placement
    and anomaly baselines. One aggregate with map-side partials; state is
    ≤ 7×24 cells + per-cell distinct-user counting (the distinct forces
    the usual two-phase expand — bounded by |cells|×|users|).

    dow is normalized to 0=Sunday..6=Saturday (Spark's dayofweek is
    1-based, DuckDB's EXTRACT(dow) 0-based; the −1 aligns them).
    """
    events = load_table(spark, sf_dir, "events")
    return (
        events.select(
            (F.dayofweek("ts") - 1).cast("bigint").alias("dow"),
            F.hour("ts").cast("bigint").alias("hour_of_day"),
            "user_id",
            "event_id",
        )
        .groupBy("dow", "hour_of_day")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
            F.count_distinct("user_id").cast("bigint").alias("n_users"),
        )
    )


HEATMAP_SQL = """
SELECT CAST(EXTRACT(dow FROM ts) AS BIGINT) AS dow,
       CAST(EXTRACT(hour FROM ts) AS BIGINT) AS hour_of_day,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
FROM events
GROUP BY dow, hour_of_day
"""




# ------------------------------------------------------------ active users

WAU_DAYS = 7
MAU_DAYS = 28


def active_users_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DAU / WAU / MAU + stickiness (DAU/MAU) per day — the product-health
    time series every event pipeline publishes. Trailing-window DISTINCT
    counts cannot run as window functions (no COUNT(DISTINCT) over a
    frame), so the scalable construction is: ONE data-sized dedup to the
    (day, user) activity frame, then join it onto the day spine with a
    bounded range predicate (fan-out ≤ MAU_DAYS, a constant) and count
    distinct users per (spine day, horizon). Shuffle volume is |activity|
    × 2 horizons, never events × horizons; the raw feed is touched once.

    Day spine = the days present in the feed (deterministic; no calendar
    generator), so gaps in ingestion surface as missing rows, not zeros.
    """
    events = load_table(spark, sf_dir, "events").select(
        F.to_date("ts").alias("d"), "user_id"
    )
    activity = events.distinct()  # (day, user)
    days = activity.select(F.col("d").alias("spine_d")).distinct()
    # one bounded-fan-out join per horizon, unioned so a single groupBy
    # computes both trailing distincts (conditional count_distinct)
    joined = days.join(
        activity,
        (F.col("d") <= F.col("spine_d"))
        & (F.datediff(F.col("spine_d"), F.col("d")) < MAU_DAYS),
    )
    dd = F.datediff(F.col("spine_d"), F.col("d"))
    agg = joined.groupBy("spine_d").agg(
        F.count_distinct(F.when(dd == 0, F.col("user_id"))).alias("dau"),
        F.count_distinct(
            F.when(dd < WAU_DAYS, F.col("user_id"))
        ).alias("wau"),
        F.count_distinct(F.col("user_id")).alias("mau"),
    )
    return agg.select(
        F.date_format("spine_d", "yyyy-MM-dd").alias("day"),
        F.col("dau").cast("bigint").alias("dau"),
        F.col("wau").cast("bigint").alias("wau"),
        F.col("mau").cast("bigint").alias("mau"),
        F.round(
            F.col("dau").cast("double") / F.col("mau").cast("double"), 9
        ).alias("stickiness"),
    )


ACTIVE_USERS_SQL = f"""
WITH activity AS (SELECT DISTINCT CAST(ts AS DATE) AS d, user_id FROM events),
days AS (SELECT DISTINCT d AS spine_d FROM activity),
joined AS (
  SELECT s.spine_d, a.user_id, date_diff('day', a.d, s.spine_d) AS dd
  FROM days s JOIN activity a
    ON a.d <= s.spine_d AND date_diff('day', a.d, s.spine_d) < {MAU_DAYS}
)
SELECT strftime(spine_d, '%Y-%m-%d') AS day,
  CAST(COUNT(DISTINCT CASE WHEN dd = 0 THEN user_id END) AS BIGINT) AS dau,
  CAST(COUNT(DISTINCT CASE WHEN dd < {WAU_DAYS} THEN user_id END) AS BIGINT)
    AS wau,
  CAST(COUNT(DISTINCT user_id) AS BIGINT) AS mau,
  ROUND(CAST(COUNT(DISTINCT CASE WHEN dd = 0 THEN user_id END) AS DOUBLE)
        / CAST(COUNT(DISTINCT user_id) AS DOUBLE), 9) AS stickiness
FROM joined GROUP BY spine_d
"""



# ---------------------------------------------------------- activity streaks


def user_activity_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user consecutive-active-day streaks (gaps-and-islands): longest
    streak, current streak (run touching the feed's last day), active days
    — the engagement metric product teams track next to DAU (the
    "7-day streak" badge is literally this query).

    The islands trick stays fully partition-parallel: distinct
    (user, day) → day_number − row_number() per user is CONSTANT within a
    consecutive run (both increase by 1 per day), so groupBy(user, island)
    yields the runs with no iteration; everything shuffles once on
    user_id and all windows ride that same partitioning.
    """
    from pyspark.sql.window import Window

    ev = load_table(spark, sf_dir, "events").select(
        "user_id", F.to_date("ts").alias("d")
    )
    activity = ev.distinct()
    wm = activity.agg(F.max("d").alias("last_day"))
    w = Window.partitionBy("user_id").orderBy("d")
    islands = activity.select(
        "user_id",
        "d",
        (F.unix_date(F.col("d")) - F.row_number().over(w)).alias("island"),
    )
    runs = islands.groupBy("user_id", "island").agg(
        F.count(F.lit(1)).alias("len"),
        F.max("d").alias("run_end"),
    )
    return (
        runs.join(F.broadcast(wm))
        .groupBy("user_id")
        .agg(
            F.sum("len").cast("bigint").alias("active_days"),
            F.max("len").cast("bigint").alias("longest_streak"),
            F.max(
                F.when(F.col("run_end") == F.col("last_day"), F.col("len"))
            )
            .cast("bigint")
            .alias("current_streak"),
        )
        .select(
            "user_id",
            "active_days",
            "longest_streak",
            F.coalesce("current_streak", F.lit(0).cast("bigint")).alias(
                "current_streak"
            ),
        )
    )


STREAKS_SQL = """
WITH activity AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events),
wm AS (SELECT MAX(d) AS last_day FROM activity),
islands AS (
  SELECT user_id, d,
         date_diff('day', DATE '1970-01-01', d)
         - row_number() OVER (PARTITION BY user_id ORDER BY d) AS island
  FROM activity
),
runs AS (
  SELECT user_id, island, CAST(COUNT(*) AS BIGINT) AS len, MAX(d) AS run_end
  FROM islands GROUP BY user_id, island
)
SELECT user_id,
       CAST(SUM(len) AS BIGINT) AS active_days,
       CAST(MAX(len) AS BIGINT) AS longest_streak,
       CAST(COALESCE(MAX(CASE WHEN run_end = last_day THEN len END), 0)
            AS BIGINT) AS current_streak
FROM runs CROSS JOIN wm
GROUP BY user_id
"""

# ------------------------------------------- point-in-time features

PIT_HORIZONS = ((86400, "24h"), (7 * 86400, "7d"))  # (seconds, label)


def events_pit_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """POINT-IN-TIME-correct feature snapshot — the feature-store join
    that prevents training-serving skew and label leakage: for every
    purchase (the label event), each user-activity feature counts ONLY
    events strictly BEFORE the purchase, within trailing 24 h / 7 d
    horizons. Any "compute features then join on user" shortcut leaks
    future events into training rows; this operator is the leakage-free
    pattern as one plan.

    Plan: ONE shuffle on user_id; every horizon-feature is a
    RANGE-interval window frame over exact integer microseconds (epoch_us
    — float seconds would make frame membership engine-dependent at ties)
    on that shared sort; label rows filter AFTER the windows so features
    see the full history. No joins at all — the classic as-of-join stack
    per feature collapses into frames over one partitioning.
    """
    ev = load_table(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        "event_type",
        "ts",
        F.unix_micros(F.col("ts")).alias("us"),
    )
    from pyspark.sql.window import Window

    feats = []
    cols = []
    base = ev
    for secs, label in PIT_HORIZONS:
        w = (
            Window.partitionBy("user_id")
            .orderBy("us")
            .rangeBetween(-secs * 1_000_000, -1)
        )
        for etype in ("view", "click"):
            cname = f"{etype}s_{label}"
            base = base.withColumn(
                cname,
                F.sum(
                    F.when(F.col("event_type") == etype, 1).otherwise(0)
                )
                .over(w)
                .cast("bigint"),
            )
            cols.append(cname)
    return base.filter(F.col("event_type") == "purchase").select(
        "event_id",
        "user_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("label_ts"),
        *[F.coalesce(F.col(c), F.lit(0)).cast("bigint").alias(c) for c in cols],
    )


def _pit_features_sql() -> str:
    wins = []
    for secs, label in PIT_HORIZONS:
        for etype in ("view", "click"):
            wins.append(
                f"CAST(COALESCE(SUM(CASE WHEN event_type = '{etype}' "
                f"THEN 1 ELSE 0 END) OVER ("
                f"PARTITION BY user_id ORDER BY epoch_us(ts) "
                f"RANGE BETWEEN {secs * 1_000_000} PRECEDING "
                f"AND 1 PRECEDING), 0) AS BIGINT) AS {etype}s_{label}"
            )
    wcols = ",\n         ".join(wins)
    names = ", ".join(
        f"{etype}s_{label}"
        for _s, label in PIT_HORIZONS
        for etype in ("view", "click")
    )
    return f"""
WITH feat AS (
  SELECT event_id, user_id, event_type, ts,
         {wcols}
  FROM events
)
SELECT event_id, user_id,
       strftime(ts, '%Y-%m-%d %H:%M:%S.%f') AS label_ts,
       {names}
FROM feat WHERE event_type = 'purchase'
"""


# --------------------------------------------------- time to convert

TTC_PROBS = (0.25, 0.5, 0.75, 0.9)


def funnel_time_to_convert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-to-convert distribution — the latency view of the funnel
    (`funnel_conversion` says HOW MANY convert; this says HOW FAST):
    per user, first view → first purchase at-or-after it, and the
    p25/p50/p75/p90 of that latency plus the conversion share. The
    attribution-window / retargeting-deadline sizing table.

    Plan: two user_id-keyed min-aggregates (the funnel's stage shape —
    both reuse one partitioning), latencies in exact integer microseconds
    (interpolated percentiles over integers are bit-stable across
    engines — the `events_bot_detection` lesson), ONE 1-row percentile
    aggregate at the end.
    """
    events = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", "ts", F.unix_micros(F.col("ts")).alias("us")
    )
    views = events.filter(F.col("event_type") == "view").groupBy(
        "user_id"
    ).agg(F.min("us").alias("v_us"))
    buys = (
        events.filter(F.col("event_type") == "purchase")
        .join(views, "user_id")
        .filter(F.col("us") >= F.col("v_us"))
        .groupBy("user_id")
        .agg(F.min(F.col("us") - F.col("v_us")).alias("lat_us"))
    )
    n_viewed = views.agg(F.count(F.lit(1)).cast("bigint").alias("n_viewed"))
    probs = F.array(*[F.lit(p) for p in TTC_PROBS])
    agg = buys.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_converted"),
        F.percentile(F.col("lat_us").cast("double"), probs).alias("q"),
    )
    sel = [
        F.round(F.col("q")[i] / F.lit(1_000_000.0), 6).alias(
            f"p{int(p * 100)}_s"
        )
        for i, p in enumerate(TTC_PROBS)
    ]
    return agg.crossJoin(F.broadcast(n_viewed)).select(
        "n_viewed",
        "n_converted",
        F.round(F.col("n_converted") / F.col("n_viewed"), 6).alias(
            "convert_share"
        ),
        *sel,
    )


def _ttc_sql() -> str:
    probs = ", ".join(str(p) for p in TTC_PROBS)
    qsel = ", ".join(
        f"ROUND(q[{i + 1}] / 1000000.0, 6) AS p{int(p * 100)}_s"
        for i, p in enumerate(TTC_PROBS)
    )
    return f"""
WITH views AS (
  SELECT user_id, MIN(epoch_us(ts)) AS v_us
  FROM events WHERE event_type = 'view' GROUP BY user_id
),
buys AS (
  SELECT e.user_id, MIN(epoch_us(e.ts) - v.v_us) AS lat_us
  FROM events e JOIN views v ON v.user_id = e.user_id
  WHERE e.event_type = 'purchase' AND epoch_us(e.ts) >= v.v_us
  GROUP BY e.user_id
),
agg AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_converted,
         quantile_cont(CAST(lat_us AS DOUBLE), [{probs}]) AS q
  FROM buys
),
nv AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_viewed FROM views)
SELECT n_viewed, n_converted,
       ROUND(CAST(n_converted AS DOUBLE) / n_viewed, 6) AS convert_share,
       {qsel}
FROM agg CROSS JOIN nv
"""




# ----------------------------------------------- within-session funnel

def funnel_within_session(spark, sf_dir):
    """Within-SESSION funnel: view -> click -> purchase completed inside
    ONE 30-min-gap session (the single-sitting conversion rate;
    `funnel_conversion` allows days between stages, so the two tables
    bracket intent strength). Stage timestamps are ordered within the
    session: first view, first click at-or-after it, first purchase
    at-or-after that click.

    Plan: ONE user_id shuffle builds gap sessions (lag -> cumsum, the
    sessionization shape); the cached (user, session, type, ts) frame
    feeds three stage aggregates that all reuse the user_id-prefixed
    partitioning, exactly like `funnel_conversion`'s shrinking stage
    semi-joins. Output is the metadata-sized funnel table.
    """
    from pyspark.sql.window import Window

    from ..plans.cache import release_caches, tracked_cache

    release_caches()
    events = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", "ts", "event_id"
    )
    order_w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev_ts = F.lag("ts").over(order_w)
    is_new = (
        prev_ts.isNull() | (F.col("ts") > prev_ts + F.expr("INTERVAL 30 MINUTES"))
    ).cast("bigint")
    run_w = order_w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    sess = tracked_cache(
        events.withColumn("is_new", is_new)
        .withColumn("session_idx", F.sum("is_new").over(run_w))
        .select("user_id", "session_idx", "event_type", "ts")
    )
    keys = ["user_id", "session_idx"]
    total = sess.select(*keys).distinct().agg(
        F.count(F.lit(1)).cast("bigint").alias("_total")
    )
    s_view = (
        sess.filter(F.col("event_type") == "view")
        .groupBy(*keys)
        .agg(F.min("ts").alias("v_ts"))
    )
    s_click = (
        sess.filter(F.col("event_type") == "click")
        .join(s_view, keys)
        .filter(F.col("ts") >= F.col("v_ts"))
        .groupBy(*keys)
        .agg(F.min("ts").alias("c_ts"))
    )
    s_buy = (
        sess.filter(F.col("event_type") == "purchase")
        .join(s_click, keys)
        .filter(F.col("ts") >= F.col("c_ts"))
        .groupBy(*keys)
        .agg(F.min("ts").alias("p_ts"))
    )
    base = s_view.agg(F.count(F.lit(1)).cast("bigint").alias("_base"))
    stages = [("view", s_view), ("view_click", s_click), ("view_click_purchase", s_buy)]
    rows = []
    for i, (name, frame) in enumerate(stages):
        rows.append(
            frame.agg(F.count(F.lit(1)).cast("bigint").alias("sessions"))
            .crossJoin(F.broadcast(base))
            .crossJoin(F.broadcast(total))
            .select(
                F.lit(i + 1).cast("bigint").alias("stage"),
                F.lit(name).alias("stage_name"),
                "sessions",
                F.round(F.col("sessions") / F.col("_base"), 6).alias("conversion"),
                F.round(F.col("sessions") / F.col("_total"), 6).alias("share_of_all_sessions"),
            )
        )
    res = rows[0]
    for r in rows[1:]:
        res = res.unionByName(r)
    return res


WITHIN_SESSION_FUNNEL_SQL = """
WITH flagged AS (
  SELECT user_id, ts, event_id, event_type,
         CASE WHEN lag(ts) OVER w IS NULL
                OR ts > lag(ts) OVER w + INTERVAL '30 minutes'
              THEN 1 ELSE 0 END AS is_new
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
sess AS (
  SELECT user_id, event_type, ts,
         CAST(SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                ROWS UNBOUNDED PRECEDING) AS BIGINT)
           AS session_idx
  FROM flagged
),
total AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS t FROM (
    SELECT DISTINCT user_id, session_idx FROM sess)
),
s_view AS (
  SELECT user_id, session_idx, MIN(ts) AS v_ts FROM sess
  WHERE event_type = 'view' GROUP BY user_id, session_idx
),
s_click AS (
  SELECT s.user_id, s.session_idx, MIN(s.ts) AS c_ts
  FROM sess s JOIN s_view v
    ON v.user_id = s.user_id AND v.session_idx = s.session_idx
  WHERE s.event_type = 'click' AND s.ts >= v.v_ts
  GROUP BY s.user_id, s.session_idx
),
s_buy AS (
  SELECT s.user_id, s.session_idx, MIN(s.ts) AS p_ts
  FROM sess s JOIN s_click c
    ON c.user_id = s.user_id AND c.session_idx = s.session_idx
  WHERE s.event_type = 'purchase' AND s.ts >= c.c_ts
  GROUP BY s.user_id, s.session_idx
),
base AS (SELECT CAST(COUNT(*) AS BIGINT) AS b FROM s_view),
counts AS (
  SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM s_view) AS n1,
         (SELECT CAST(COUNT(*) AS BIGINT) FROM s_click) AS n2,
         (SELECT CAST(COUNT(*) AS BIGINT) FROM s_buy) AS n3
)
SELECT CAST(1 AS BIGINT) AS stage, 'view' AS stage_name, n1 AS sessions,
       ROUND(CAST(n1 AS DOUBLE) / b, 6) AS conversion,
       ROUND(CAST(n1 AS DOUBLE) / t, 6) AS share_of_all_sessions
FROM counts, base, total
UNION ALL
SELECT CAST(2 AS BIGINT), 'view_click', n2,
       ROUND(CAST(n2 AS DOUBLE) / b, 6), ROUND(CAST(n2 AS DOUBLE) / t, 6)
FROM counts, base, total
UNION ALL
SELECT CAST(3 AS BIGINT), 'view_click_purchase', n3,
       ROUND(CAST(n3 AS DOUBLE) / b, 6), ROUND(CAST(n3 AS DOUBLE) / t, 6)
FROM counts, base, total
"""


# ------------------------------------------------------------- A/B lift

# Deterministic user-level arm assignment (hash-Bernoulli, the same
# portable split every sampler here uses); the synthetic feed has no
# experiment, so (dirtied-in-query convention, both engines) the CONTROL
# arm loses every 10th purchase — a real sustained conversion effect the
# two-proportion z-test must detect.
AB_SALT = "ab_"
AB_DROP_MOD = 10
AB_VALUE_MIN = 180.0  # conversion = a HIGH-VALUE purchase (~quarter of users
# at any SF; an any-purchase metric saturates at rate 1.0 and degenerates
# the z denominator)


def events_ab_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A/B experiment readout: user-level hash assignment into
    treatment/control, per-arm users and converters (≥1 counted purchase),
    conversion rates, absolute and relative lift, and the pooled
    two-proportion z statistic — the table every growth experiment reads.
    One row; every input is an integer count, so both engines compute
    bit-identical doubles from the same closed forms.

    Plan: one scan → per-user (arm, converted) aggregate (map-side
    combinable) → one 1-row conditional aggregate; no windows, no joins.
    """
    from ..functions.hashing import portable_hash64

    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", "value"
    )
    arm = F.when(
        portable_hash64(
            F.concat(F.lit(AB_SALT), F.col("user_id").cast("string"))
        )
        % 2
        == 0,
        F.lit("control"),
    ).otherwise(F.lit("treatment"))
    counted = (
        (F.col("event_type") == "purchase")
        & (F.col("value") >= AB_VALUE_MIN)
        & ((arm == "treatment") | (F.col("event_id") % AB_DROP_MOD != 0))
    )
    per_user = ev.groupBy(F.col("user_id"), arm.alias("arm")).agg(
        F.max(F.when(counted, 1).otherwise(0)).alias("converted")
    )
    agg = per_user.agg(
        F.sum(F.when(F.col("arm") == "treatment", 1).otherwise(0))
        .cast("bigint")
        .alias("n_treatment"),
        F.sum(F.when(F.col("arm") == "control", 1).otherwise(0))
        .cast("bigint")
        .alias("n_control"),
        F.sum(
            F.when(F.col("arm") == "treatment", F.col("converted")).otherwise(
                0
            )
        )
        .cast("bigint")
        .alias("conv_treatment"),
        F.sum(
            F.when(F.col("arm") == "control", F.col("converted")).otherwise(0)
        )
        .cast("bigint")
        .alias("conv_control"),
    )
    pt = F.col("conv_treatment").cast("double") / F.col("n_treatment")
    pc = F.col("conv_control").cast("double") / F.col("n_control")
    pool = (
        (F.col("conv_treatment") + F.col("conv_control")).cast("double")
        / (F.col("n_treatment") + F.col("n_control"))
    )
    se = F.sqrt(
        pool
        * (1.0 - pool)
        * (
            1.0 / F.col("n_treatment").cast("double")
            + 1.0 / F.col("n_control").cast("double")
        )
    )
    # degenerate experiments (everyone or no one converts) have no sampling
    # variance — z is undefined, not infinite, in both engines
    z = F.when(se > 0.0, (pt - pc) / se)
    return agg.select(
        "n_treatment",
        "n_control",
        "conv_treatment",
        "conv_control",
        F.round(pt, 6).alias("rate_treatment"),
        F.round(pc, 6).alias("rate_control"),
        F.round(pt - pc, 6).alias("abs_lift"),
        F.round((pt - pc) / pc, 6).alias("rel_lift"),
        F.round(z, 6).alias("z_stat"),
    )


def _ab_lift_sql() -> str:
    from ..functions.hashing import portable_hash64_sql

    arm = (
        f"CASE WHEN {portable_hash64_sql(f'{AB_SALT!r} || CAST(user_id AS VARCHAR)')}"
        " % 2 = 0 THEN 'control' ELSE 'treatment' END"
    )
    return f"""
WITH per_user AS (
  SELECT user_id, {arm} AS arm,
         MAX(CASE WHEN event_type = 'purchase'
                   AND value >= {AB_VALUE_MIN}
                   AND ({arm} = 'treatment'
                        OR event_id % {AB_DROP_MOD} <> 0)
                  THEN 1 ELSE 0 END) AS converted
  FROM events GROUP BY 1, 2
),
agg AS (
  SELECT
    CAST(SUM(CASE WHEN arm = 'treatment' THEN 1 ELSE 0 END) AS BIGINT)
      AS n_treatment,
    CAST(SUM(CASE WHEN arm = 'control' THEN 1 ELSE 0 END) AS BIGINT)
      AS n_control,
    CAST(SUM(CASE WHEN arm = 'treatment' THEN converted ELSE 0 END)
         AS BIGINT) AS conv_treatment,
    CAST(SUM(CASE WHEN arm = 'control' THEN converted ELSE 0 END)
         AS BIGINT) AS conv_control
  FROM per_user
)
SELECT n_treatment, n_control, conv_treatment, conv_control,
  ROUND(CAST(conv_treatment AS DOUBLE) / n_treatment, 6) AS rate_treatment,
  ROUND(CAST(conv_control AS DOUBLE) / n_control, 6) AS rate_control,
  ROUND(CAST(conv_treatment AS DOUBLE) / n_treatment
        - CAST(conv_control AS DOUBLE) / n_control, 6) AS abs_lift,
  ROUND((CAST(conv_treatment AS DOUBLE) / n_treatment
         - CAST(conv_control AS DOUBLE) / n_control)
        / (CAST(conv_control AS DOUBLE) / n_control), 6) AS rel_lift,
  ROUND(CASE WHEN sqrt(
            (CAST(conv_treatment + conv_control AS DOUBLE)
             / (n_treatment + n_control))
            * (1.0 - CAST(conv_treatment + conv_control AS DOUBLE)
                     / (n_treatment + n_control))
            * (1.0 / CAST(n_treatment AS DOUBLE)
               + 1.0 / CAST(n_control AS DOUBLE))) > 0.0
        THEN (CAST(conv_treatment AS DOUBLE) / n_treatment
              - CAST(conv_control AS DOUBLE) / n_control)
             / sqrt(
            (CAST(conv_treatment + conv_control AS DOUBLE)
             / (n_treatment + n_control))
            * (1.0 - CAST(conv_treatment + conv_control AS DOUBLE)
                     / (n_treatment + n_control))
            * (1.0 / CAST(n_treatment AS DOUBLE)
               + 1.0 / CAST(n_control AS DOUBLE)))
        END, 6) AS z_stat
FROM agg
"""


QUERIES = {
    "events_ab_lift": events_ab_lift,
    "funnel_within_session": funnel_within_session,
    "funnel_time_to_convert": funnel_time_to_convert,
    "events_pit_features": events_pit_features,
    "user_activity_streaks": user_activity_streaks,
    "active_users_report": active_users_report,
    "funnel_conversion": funnel_conversion,
    "retention_cohorts": retention_cohorts,
    "event_transitions": event_transitions,
    "event_interarrival_stats": event_interarrival_stats,
    "latest_event_per_user": latest_event_per_user,
    "event_time_heatmap": event_time_heatmap,
}
ORACLES = {
    "events_ab_lift": _ab_lift_sql(),
    "funnel_within_session": WITHIN_SESSION_FUNNEL_SQL,
    "funnel_time_to_convert": _ttc_sql(),
    "events_pit_features": _pit_features_sql(),
    "user_activity_streaks": STREAKS_SQL,
    "active_users_report": ACTIVE_USERS_SQL,
    "funnel_conversion": FUNNEL_SQL,
    "retention_cohorts": RETENTION_SQL,
    "event_transitions": TRANSITIONS_SQL,
    "event_interarrival_stats": INTERARRIVAL_SQL,
    "latest_event_per_user": LATEST_EVENT_SQL,
    "event_time_heatmap": HEATMAP_SQL,
}
