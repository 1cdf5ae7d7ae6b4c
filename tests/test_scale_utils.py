"""Bucketed co-located joins and salted skew joins (plans/scale.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dbsurveyor_spark.catalog import load_table
from dbsurveyor_spark.plans.scale import (
    bucketed_join,
    count_exchanges,
    salted_join,
    write_bucketed,
)

SF = "/root/testdata/sf0.001"


class TestBucketing:
    @pytest.fixture(scope="class")
    def bucketed_tables(self, spark):
        orders = load_table(spark, SF, "orders").select("o_orderkey", "o_custkey")
        cust = load_table(spark, SF, "customer").select("c_custkey", "c_mktsegment")
        write_bucketed(
            orders.withColumnRenamed("o_custkey", "custkey"),
            "b_orders", ["custkey"], 8, sort_cols=["custkey"],
        )
        write_bucketed(
            cust.withColumnRenamed("c_custkey", "custkey"),
            "b_customer", ["custkey"], 8, sort_cols=["custkey"],
        )
        yield "b_orders", "b_customer"
        for t in ("b_orders", "b_customer"):
            spark.sql(f"DROP TABLE IF EXISTS {t}")

    def test_join_is_exchange_free(self, spark, bucketed_tables):
        lt, rt = bucketed_tables
        # disable broadcast so the join strategy is genuinely sort-merge
        prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            joined = bucketed_join(spark, lt, rt, on=["custkey"])
            assert count_exchanges(joined) == 0, "bucketed join must not shuffle"
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)

    def test_unbucketed_join_does_shuffle(self, spark):
        # control: the same join over raw frames plans >=1 Exchange
        prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            orders = load_table(spark, SF, "orders").select(
                F.col("o_custkey").alias("custkey")
            )
            cust = load_table(spark, SF, "customer").select(
                F.col("c_custkey").alias("custkey"), "c_mktsegment"
            )
            assert count_exchanges(orders.join(cust, "custkey")) >= 1
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)

    def test_bucketed_join_result_matches_plain(self, spark, bucketed_tables):
        lt, rt = bucketed_tables
        bucketed = bucketed_join(spark, lt, rt, on=["custkey"]).count()
        orders = load_table(spark, SF, "orders")
        cust = load_table(spark, SF, "customer")
        plain = orders.join(cust, orders.o_custkey == cust.c_custkey).count()
        assert bucketed == plain > 0


class TestSaltedJoin:
    def test_matches_plain_join(self, spark):
        orders = load_table(spark, SF, "orders").select(
            F.col("o_custkey").alias("custkey"), "o_orderkey", "o_totalprice"
        )
        cust = load_table(spark, SF, "customer").select(
            F.col("c_custkey").alias("custkey"), "c_mktsegment"
        )
        salted = salted_join(orders, cust, "custkey", salt_factor=8)
        plain = orders.join(cust, "custkey")
        assert salted.count() == plain.count() > 0
        s = {(r.o_orderkey, r.c_mktsegment) for r in salted.collect()}
        p = {(r.o_orderkey, r.c_mktsegment) for r in plain.collect()}
        assert s == p

    def test_left_join_preserved(self, spark):
        left = spark.createDataFrame(
            [(1, "a"), (2, "b"), (99, "orphan")], "k bigint, v string"
        )
        right = spark.createDataFrame([(1, "x"), (2, "y")], "k bigint, w string")
        out = salted_join(left, right, "k", salt_factor=4, how="left")
        rows = {r.k: r.w for r in out.collect()}
        assert rows == {1: "x", 2: "y", 99: None}


class TestZorderRewrite:
    """The rewrite must deliver what layout_zorder_stats predicts: after
    Z-ordering orders by (o_custkey, o_orderdate), a small box predicate
    intersects far fewer parquet row groups than under the natural
    (orderkey-ingest) layout — measured from real footer min/max stats,
    the exact mechanism zone-map pruning uses."""

    def _intersecting_row_groups(self, path, cust_box, date_box):
        import glob

        import pyarrow.parquet as pq

        hit = total = 0
        for f in glob.glob(f"{path}/*.parquet"):
            md = pq.ParquetFile(f).metadata
            names = {md.schema.column(i).name: i
                     for i in range(md.num_columns)}
            for rg in range(md.num_row_groups):
                g = md.row_group(rg)
                cs_c = g.column(names["o_custkey"]).statistics
                cs_d = g.column(names["o_orderdate"]).statistics
                total += 1
                if (cs_c.min <= cust_box[1] and cs_c.max >= cust_box[0]
                        and str(cs_d.min) <= date_box[1]
                        and str(cs_d.max) >= date_box[0]):
                    hit += 1
        return hit, total

    def test_box_predicate_prunes_after_rewrite(self, spark, tmp_path):
        from dbsurveyor_spark.catalog import load_table
        from dbsurveyor_spark.plans.scale import zorder_rewrite

        orders = load_table(spark, "/root/testdata/sf0.01", "orders").select(
            "o_orderkey", "o_custkey", "o_orderdate"
        )
        natural = str(tmp_path / "natural")
        zordered = str(tmp_path / "zordered")
        # natural = ingest order, same file/row-group granularity
        (
            orders.repartitionByRange(16, "o_orderkey")
            .sortWithinPartitions("o_orderkey")
            .write.mode("overwrite")
            .parquet(natural)
        )
        zorder_rewrite(orders, ["o_custkey", "o_orderdate"], zordered,
                       n_files=16)
        # a ~1/7 × ~1/7 box of the (customer, date) space
        # (custkey spans 0..1500 at sf0.01)
        cust_box = (100, 300)
        date_box = ("1996-01-01", "1996-12-31")
        nat_hit, nat_total = self._intersecting_row_groups(
            natural, cust_box, date_box
        )
        z_hit, z_total = self._intersecting_row_groups(
            zordered, cust_box, date_box
        )
        # natural layout: every file spans the full customer+date range
        assert nat_hit == nat_total
        # z-order: the box touches at most a third of the row groups
        assert z_hit <= z_total // 3, (z_hit, z_total)
        # and the rewrite lost no rows
        assert (
            spark.read.parquet(zordered).count() == orders.count()
        )
