"""Scale utilities: bucketed co-located joins and skew-join salting.

These are the two levers the DataFrame API doesn't apply automatically:

- **Bucketing** pre-shuffles a table ONCE at write time (`bucketBy`), so
  every later join/aggregation on the bucket key runs exchange-free. At
  100 TB, a fact table joined daily on the same key amortizes its shuffle
  across every downstream query.
- **Salting** splits a hot key across `salt_factor` sub-keys so one
  reducer doesn't receive the whole key's rows. AQE's skew-join splitting
  handles moderate skew at runtime; explicit salting is for the extreme
  case (a single key holding a double-digit percentage of the table) where
  even a split partition can't hold the build side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# ---------------------------------------------------------------- bucketing


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_cols: list[str],
    n_buckets: int,
    sort_cols: list[str] | None = None,
) -> None:
    """Persist as a bucketed (and optionally sorted) managed table.

    Sorting within buckets additionally removes the sort from later
    sort-merge joins — the scan comes back bucketed AND ordered.
    """
    writer = df.write.mode("overwrite").bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.format("parquet").saveAsTable(table_name)


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, on: list[str], how: str = "inner"
) -> DataFrame:
    """Join two tables bucketed on the join key: with matching bucket counts
    Spark plans a sort-merge join with NO Exchange on either side."""
    return spark.table(left_table).join(spark.table(right_table), on=on, how=how)


def count_exchanges(df: DataFrame) -> int:
    """Number of shuffle Exchange operators in the physical plan."""
    from .asserts import formatted_plan

    plan = formatted_plan(df)
    return sum(
        1
        for ln in plan.splitlines()
        if ln.strip().startswith("(") and " Exchange" in ln and "Reused" not in ln
    )


# ------------------------------------------------------------------ salting


def salted_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    salt_factor: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew-resistant equi-join: salt the skewed (left/probe) side randomly
    by hash, EXPLODE the small (right/build) side across all salt values,
    and join on (key, salt).

    The right side is replicated `salt_factor`× — appropriate when it is
    small relative to the skew being split (the usual case: a huge
    fact-side hot key against a modest dimension). Deterministic salting
    (hash of the full row) keeps results reproducible, but note it cannot
    spread a hot key whose rows are byte-identical duplicates.

    Only inner/left joins are supported: a right or full outer join would
    null-extend each unmatched RIGHT replica, duplicating such rows
    salt_factor times.
    """
    if how not in ("inner", "left", "leftouter", "left_outer"):
        raise ValueError(
            f"salted_join supports inner/left joins only, got {how!r} "
            "(outer-preserving the replicated side would duplicate rows)"
        )
    salt = (F.crc32(F.concat_ws("\x00", *left.columns)) % salt_factor).cast("int")
    left_s = left.withColumn("__salt", salt)
    right_s = right.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(salt_factor)]))
    )
    out = left_s.join(right_s, on=[key, "__salt"], how=how)
    return out.drop("__salt")


# ------------------------------------------------------------ z-order rewrite

ZORDER_BITS = 16  # per-dimension resolution of the Morton key


def zorder_key(df: DataFrame, cols: list[str], bits: int = ZORDER_BITS):
    """Morton (Z-order) key column for ``cols``: each dimension normalized
    to [0, 2^bits) against its observed min/max (one tiny agg, broadcast
    as literals), then bit-interleaved with shift-and-mask sums — pure
    JVM integer math inside whole-stage codegen, no UDF.

    The same construction `layout_zorder_stats` previews; this is the
    executable version a rewrite sorts by."""
    from pyspark.sql import functions as F

    dtypes = dict(df.dtypes)

    def _numeric(c: str):
        # temporal dims normalize via epoch math (date → days,
        # timestamp/_ntz → fractional seconds); numerics cast directly
        dt = dtypes[c]
        col = F.col(c)
        if dt == "date":
            return F.unix_date(col).cast("double")
        if dt.startswith("timestamp"):
            return col.cast("timestamp").cast("double")
        return col.cast("double")

    nums = [_numeric(c) for c in cols]
    stats = df.agg(
        *[F.min(n).alias(f"mn_{i}") for i, n in enumerate(nums)],
        *[F.max(n).alias(f"mx_{i}") for i, n in enumerate(nums)],
    ).collect()[0]
    scaled = []
    for i, n in enumerate(nums):
        mn, mx = stats[f"mn_{i}"], stats[f"mx_{i}"]
        span = (mx - mn) or 1.0
        q = F.least(
            F.lit((1 << bits) - 1),
            F.floor(
                (n - F.lit(mn)) / F.lit(span) * ((1 << bits) - 1)
            ).cast("bigint"),
        )
        scaled.append(q)
    key = F.lit(0).cast("bigint")
    ndim = len(cols)
    for b in range(bits):
        for i, q in enumerate(scaled):
            bit = F.shiftright(q, b).bitwiseAND(F.lit(1))
            key = key + (bit * F.lit(1 << (b * ndim + i)))
    return key


def zorder_rewrite(
    df: DataFrame,
    cols: list[str],
    out_path: str,
    n_files: int = 8,
    bits: int = ZORDER_BITS,
) -> None:
    """Rewrite ``df`` as a Z-ordered parquet lake (the `OPTIMIZE ZORDER BY`
    operation, Delta/Iceberg): range-partition on the Morton key so each
    output file owns a contiguous Z-range (a small RECTANGLE of the
    dimension space, not a stripe), then sort within partitions so parquet
    row groups inherit the clustering too. After this, min/max zone maps
    prune on EVERY clustered dimension at once — the difference between
    scanning a 100 TB fact and scanning a few files of it.

    Cost shape: one pass + one range shuffle (sampled range boundaries) +
    an in-partition sort — the same cost as any global sort-write, with
    no driver-side work beyond the 2·ndim min/max literals."""
    keyed = df.withColumn("__z", zorder_key(df, cols, bits))
    (
        keyed.repartitionByRange(n_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode("overwrite")
        .parquet(out_path)
    )
