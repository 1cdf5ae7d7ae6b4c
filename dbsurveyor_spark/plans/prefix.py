"""Two-level parallel prefix over a totally-ordered frame (SURVEY §6).

A global ``row_number()`` / running ``sum()`` with no partition keys is a
single-partition WindowExec — the whole frame sorts on one core and the
operator dies at 100× (a raw-token vocabulary is 10⁸–10⁹ rows; a per-part
revenue frame is |lineitem|/30 at literal TPC-H ratios). The scale-true
shape is the classic parallel prefix, here in two levels:

1. ``repartitionByRange`` on the total order: partition *i* holds a
   contiguous slice of the order, balanced by the range sampler, and every
   row in partition *i* precedes every row in partition *i+1*. The blocked
   frame is CACHED so both downstream consumers read ONE materialized
   ``spark_partition_id()`` assignment (range boundaries come from
   sampling; the cache pins them).
2. Per-partition partials (count / sum) → cumulative offsets over the
   ≤|shuffle partitions|-row partial frame — the ONLY partition-less
   window, provably bounded by config, not data — broadcast back, then an
   in-partition window (partitioned by the block id, ≤|rows|/P each) adds
   the local prefix to the block offset.

Same output bit-for-bit as the global window (the total order is total:
callers must pass a tie-free ordering), so DuckDB oracles keep their plain
``OVER (ORDER BY …)`` formulation.

Used by `text_zipf_fit` (global rank of the token vocabulary) and
`abc_part_classification` (running revenue share over |parts|); the
streaming late-data family uses the same doctrine with a data-derived
block key (`streaming/events.py _lateness_frame`).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .cache import tracked_cache

_PID = "__prefix_pid"
_PARTIAL = "__prefix_partial"
_OFF = "__prefix_off"


def two_level_prefix(
    df: DataFrame,
    order_cols: list[Column],
    out_col: str,
    sum_col: str | None = None,
) -> DataFrame:
    """Attach a global ``row_number`` (``sum_col=None``) or an INCLUSIVE
    running sum of ``sum_col`` under the total order ``order_cols``,
    without a single-partition window. ``order_cols`` must be tie-free
    (include a unique key) or ranks at range boundaries are ambiguous.

    The blocked frame enters the tracked-cache registry: the caller's
    query owns it until the next registry query's ``release_caches()``.
    """
    spark = df.sparkSession
    n_parts = int(spark.conf.get("spark.sql.shuffle.partitions"))
    # Cache the INPUT too: repartitionByRange first runs a SAMPLING pass
    # over `df` to pick range boundaries, so an uncached input recomputes
    # its full upstream (a fact-table scan + aggregate for both current
    # callers) twice — once for the sampler, once for the block fill. The
    # cached frame is the same size as `blocked` below, so peak storage
    # only doubles a frame that was already pinned; callers that derive
    # side aggregates from the same plan (abc's `tot`) hit it for free
    # via CacheManager subtree matching (§2 fewer passes).
    df = tracked_cache(df)
    blocked = tracked_cache(
        df.repartitionByRange(n_parts, *order_cols).withColumn(
            _PID, F.spark_partition_id()
        )
    )
    partial = (
        F.count(F.lit(1)).cast("bigint")
        if sum_col is None
        else F.sum(sum_col)
    ).alias(_PARTIAL)
    partials = blocked.groupBy(_PID).agg(partial)
    prev_w = Window.orderBy(_PID).rowsBetween(Window.unboundedPreceding, -1)
    offsets = partials.select(
        _PID, F.sum(_PARTIAL).over(prev_w).alias(_OFF)
    )
    in_w = Window.partitionBy(_PID).orderBy(*order_cols)
    local = (
        F.row_number().over(in_w).cast("bigint")
        if sum_col is None
        else F.sum(sum_col).over(
            in_w.rowsBetween(Window.unboundedPreceding, 0)
        )
    )
    zero = F.lit(0) if sum_col is None else F.lit(0).cast(
        dict(blocked.dtypes)[sum_col]
    )
    return (
        blocked.join(F.broadcast(offsets), _PID)
        .withColumn(out_col, F.coalesce(F.col(_OFF), zero) + local)
        .drop(_PID, _OFF)
    )
