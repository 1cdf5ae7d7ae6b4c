"""Physical-plan assertions for the extended TPC-H shapes (tpch_extra).

Each test pins the *scale claim* the operator's docstring makes — single
lineitem scan, broadcast instead of window, anti/semi/outer join choice,
predicate pushdown — so a regression that keeps values correct but breaks
the 100 TB plan fails loudly at sf0.001.
"""

from __future__ import annotations

from dbsurveyor_spark.operators import tpch_extra as m
from dbsurveyor_spark.plans.asserts import (
    assert_broadcast_join,
    assert_no_python_eval,
    assert_pushed_filters,
    formatted_plan,
)

from .conftest import SF_SMALL


def _scan_count(plan: str, table: str) -> int:
    """Number of parquet scans over the given table in the plan."""
    return sum(
        1
        for section in plan.split("\n\n")
        if "Scan parquet" in section and f"{table}.parquet" in section
    )


class TestSingleScanClaims:
    def test_q21_scans_lineitem_once_not_three_times(self, spark):
        """The textbook EXISTS/NOT-EXISTS form scans lineitem 3×; the
        pair-aggregate rewrite must scan it exactly once."""
        plan = formatted_plan(m.q21_waiting_supplier(spark, SF_SMALL))
        assert _scan_count(plan, "lineitem") == 1, plan

    def test_q19_single_join_not_union_of_three(self, spark):
        """OR-of-ANDs must plan as ONE part join with a residual filter,
        not a UNION of three joins (three lineitem scans)."""
        plan = formatted_plan(m.q19_disjunctive_revenue(spark, SF_SMALL))
        assert _scan_count(plan, "lineitem") == 1, plan
        assert _scan_count(plan, "part") == 1, plan
        assert "Union" not in plan, plan

    def test_q15_scans_lineitem_once_for_agg_and_max(self, spark):
        """The revenue view is aggregated once; the scalar max must reuse
        the aggregate (via exchange reuse or recomputed 1-row side), never
        re-scanning lineitem more than twice total (agg + max branch both
        read the same shuffle output when reuse kicks in)."""
        plan = formatted_plan(m.q15_top_supplier(spark, SF_SMALL))
        assert _scan_count(plan, "lineitem") <= 2, plan

    def test_q18_having_agg_reused_not_rescanned(self, spark):
        plan = formatted_plan(m.q18_large_volume_customers(spark, SF_SMALL))
        assert _scan_count(plan, "lineitem") == 1, plan

    def test_q11_scalar_derives_from_cached_agg_not_rescan(self, spark):
        """The per-part aggregate feeds both the HAVING rows and the
        scalar average; it must be served from the cached frame (one
        lineitem pass), never windowed over a single partition."""
        plan = formatted_plan(m.q11_important_parts(spark, SF_SMALL))
        assert "InMemoryRelation" in plan or "InMemoryTableScan" in plan, plan
        assert "Window" not in plan, plan

    def test_q20_single_conditional_agg_scan(self, spark):
        """The correlated-agg threshold must fold into ONE conditional
        aggregation pass — the textbook form scans lineitem twice."""
        df = m.q20_excess_shippers(spark, SF_SMALL)
        plan = formatted_plan(df)
        assert _scan_count(plan, "lineitem") == 1, plan
        assert "LeftSemi" in plan, plan
        assert_broadcast_join(df, at_least=2)


class TestJoinStrategyClaims:
    def test_q2_argmax_uses_broadcast_not_window(self, spark):
        """Per-nation argmax must be agg + broadcast equality join — a
        window over partitionBy(nation) would cap parallelism at 25."""
        df = m.q2_top_acctbal_supplier(spark, SF_SMALL)
        plan = formatted_plan(df)
        assert "Window" not in plan, plan
        assert_broadcast_join(df, at_least=2)

    def test_q13_plans_left_outer_join(self, spark):
        plan = formatted_plan(m.q13_customer_distribution(spark, SF_SMALL))
        assert "LeftOuter" in plan, plan

    def test_q16_exclusion_is_anti_join(self, spark):
        plan = formatted_plan(m.q16_supplier_variety(spark, SF_SMALL))
        assert "LeftAnti" in plan, plan

    def test_q22_no_recent_orders_is_anti_join_with_pushed_date(self, spark):
        df = m.q22_idle_customers(spark, SF_SMALL)
        plan = formatted_plan(df)
        assert "LeftAnti" in plan, plan
        assert_pushed_filters(df, "o_orderdate")

    def test_q7_broadcasts_both_nation_sides(self, spark):
        assert_broadcast_join(m.q7_volume_shipping(spark, SF_SMALL), at_least=2)

    def test_q10_top20_is_take_ordered(self, spark):
        plan = formatted_plan(m.q10_returned_items(spark, SF_SMALL))
        assert "TakeOrderedAndProject" in plan, plan


class TestPushdownAndJvmSide:
    def test_date_filters_push_to_scans(self, spark):
        assert_pushed_filters(
            m.q7_volume_shipping(spark, SF_SMALL), "l_shipdate"
        )
        assert_pushed_filters(
            m.q10_returned_items(spark, SF_SMALL), "l_returnflag", "o_orderdate"
        )
        assert_pushed_filters(
            m.q14_promo_effect(spark, SF_SMALL), "l_shipdate"
        )
        assert_pushed_filters(
            m.q9_product_profit(spark, SF_SMALL), "p_name"
        )

    def test_all_extended_queries_stay_jvm_side(self, spark):
        for key, fn in m.QUERIES.items():
            assert_no_python_eval(fn(spark, SF_SMALL))
