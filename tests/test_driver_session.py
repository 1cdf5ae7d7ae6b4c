"""Regression guard: every query must work on a session WE did not build.

Round-1 postmortem: `spark.sql.legacy.parquet.nanosAsLong` was only set in
``session.get_session()``'s builder, while the driver harness constructs its
own bare ``SparkSession.builder.getOrCreate()`` — so all 10 events-touching
queries died with PARQUET_TYPE_ILLEGAL under the driver while passing
locally. ``catalog.harden_session`` now re-asserts every runtime-settable
config at each entry point; these tests prove the engine is self-contained.
"""

from __future__ import annotations

import os
import subprocess
import sys

from dbsurveyor_spark.catalog import harden_session, load_table

SF_SMALL = "/root/testdata/sf0.001"

# The exact subprocess a driver-style harness runs: bare session, no configs,
# then the formerly-red queries. Covers batch loads (asof), the all-tables
# loop (survey_schema_overview), stratified sampling, and the streaming
# symlink-source path (stream_tumbling_counts).
_DRIVER_SCRIPT = """
import sys
sys.path.insert(0, {repo!r})
from pyspark.sql import SparkSession

spark = (
    SparkSession.builder.master("local[4]")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)
# deliberately NO nanosAsLong / timezone / arrow configs — driver parity

from __spark_entry__ import queries

qs = queries()
for key in (
    "asof_join_events_orders",
    "survey_schema_overview",
    "sample_stratified_events",
    "stream_tumbling_counts",
):
    n = qs[key](spark, {sf!r}).count()
    print(f"{{key}}: {{n}} rows")
    assert n >= 0
print("DRIVER_SESSION_OK")
"""


def test_queries_run_on_bare_driver_session(tmp_path):
    """Subprocess with a config-less SparkSession must run events queries."""
    script = _DRIVER_SCRIPT.format(repo="/root/repo", sf=SF_SMALL)
    env = dict(os.environ)
    # a bare driver gives us no extra heap either; the queries must survive
    env.pop("SPARK_GRAFT_CPUS", None)
    proc = subprocess.run(
        [sys.executable, "-c", script],
        capture_output=True,
        text=True,
        timeout=600,
        env=env,
        cwd=str(tmp_path),
    )
    assert proc.returncode == 0, f"stderr tail:\n{proc.stderr[-4000:]}"
    assert "DRIVER_SESSION_OK" in proc.stdout


def test_harden_session_reasserts_unset_confs(spark):
    """In-process: strip the critical confs, load_table must restore them."""
    spark.conf.unset("spark.sql.legacy.parquet.nanosAsLong")
    spark.conf.set("spark.sql.session.timeZone", "America/New_York")
    try:
        df = load_table(spark, SF_SMALL, "events")
        assert spark.conf.get("spark.sql.legacy.parquet.nanosAsLong") == "true"
        assert spark.conf.get("spark.sql.session.timeZone") == "UTC"
        assert df.schema["ts"].dataType.typeName() == "timestamp"
        assert df.limit(1).count() == 1
    finally:
        harden_session(spark)


def test_harden_respects_explicit_shuffle_partitions(spark):
    """Sentinel semantics: the stock 200 is replaced AT MOST ONCE per
    session (first harden on a bare driver session); after that, any
    caller-chosen value — including an explicit 200 — is never clobbered."""
    sentinel = "spark.dbsurveyor.shufflePartitionsAdjusted"
    before = spark.conf.get("spark.sql.shuffle.partitions")
    before_sentinel = spark.conf.get(sentinel, "false")
    try:
        # Simulate the bare-session first call: sentinel unset, stock 200.
        spark.conf.unset(sentinel)
        spark.conf.set("spark.sql.shuffle.partitions", "200")
        harden_session(spark)
        assert spark.conf.get("spark.sql.shuffle.partitions") == os.environ.get(
            "SPARK_GRAFT_SHUFFLE_PARTITIONS", "32"
        )
        # After the one adjustment, explicit choices stick — even 200.
        spark.conf.set("spark.sql.shuffle.partitions", "17")
        harden_session(spark)
        assert spark.conf.get("spark.sql.shuffle.partitions") == "17"
        spark.conf.set("spark.sql.shuffle.partitions", "200")
        harden_session(spark)
        assert spark.conf.get("spark.sql.shuffle.partitions") == "200"
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", before)
        spark.conf.set(sentinel, before_sentinel)
