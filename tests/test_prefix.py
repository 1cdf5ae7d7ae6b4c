"""`plans/prefix.py two_level_prefix` — equivalence to the global window.

The helper replaces partition-less rank / running-sum windows in
`text_zipf_fit`, `abc_part_classification`, and `text_vocab_coverage`; its
contract is BIT-equality with the single-partition form under any range
partitioning. Randomized frames (seed-fixed, the repo's §5 property style)
pin that, including duplicate sum-values, negative numbers, and frames
smaller than the partition count.
"""

from __future__ import annotations

import random

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from dbsurveyor_spark.plans.cache import release_caches
from dbsurveyor_spark.plans.prefix import two_level_prefix


def _frames(spark, rng, n):
    rows = [
        (i, rng.randrange(-50, 50), rng.randrange(0, 8))
        for i in range(n)
    ]
    return spark.createDataFrame(rows, "id long, x long, grp long")


class TestTwoLevelPrefix:
    def test_rank_equals_global_row_number(self, spark):
        rng = random.Random(20260815)
        for n in (0, 1, 5, 200, 3000):
            df = _frames(spark, rng, n)
            order = [F.desc("x"), F.asc("id")]
            got = {
                r.id: r.rank
                for r in two_level_prefix(df, order, out_col="rank").collect()
            }
            w = Window.orderBy(*order)
            want = {
                r.id: r.rank
                for r in df.withColumn(
                    "rank", F.row_number().over(w).cast("bigint")
                ).collect()
            }
            assert got == want, f"n={n}"
            release_caches()

    def test_running_sum_equals_global_window(self, spark):
        rng = random.Random(7)
        for n in (1, 17, 1000):
            df = _frames(spark, rng, n)
            order = [F.desc("x"), F.asc("id")]
            got = {
                r.id: r.cum
                for r in two_level_prefix(
                    df, order, out_col="cum", sum_col="x"
                ).collect()
            }
            w = Window.orderBy(*order).rowsBetween(
                Window.unboundedPreceding, Window.currentRow
            )
            want = {
                r.id: r.cum
                for r in df.withColumn("cum", F.sum("x").over(w)).collect()
            }
            assert got == want, f"n={n}"
            release_caches()

    def test_no_partitionless_window_over_data(self, spark):
        """The only partition-less window in the plan must sit over the
        pid-grouped partial frame (bounded by shuffle partitions)."""
        import os
        import sys

        sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
        from test_plan_lint import _window_violations

        df = _frames(spark, random.Random(1), 500)
        out = two_level_prefix(df, [F.desc("x"), F.asc("id")], out_col="rank")
        assert _window_violations(out._jdf.queryExecution()) == []
        release_caches()
