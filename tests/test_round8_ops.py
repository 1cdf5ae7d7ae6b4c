"""Semantics gates for the round-8 batch-B operators: group holdout,
link prediction, lexical diversity. The registry oracle drive checks
cross-engine value equality; these tests pin the PROPERTIES the values
must satisfy (leakage, candidate validity, ratio algebra) so a future
refactor can't stay value-consistent while drifting semantically."""

from __future__ import annotations

import math

from dbsurveyor_spark.operators.graph import (
    LINKPRED_TOP_N,
    copurchase_graph,
    graph_link_prediction,
)
from dbsurveyor_spark.operators.textstats import text_lexical_diversity
from dbsurveyor_spark.survey.sampling import sample_group_holdout

SF = "/root/testdata/sf0.001"


class TestGroupHoldout:
    def test_no_group_leaks_and_partition_is_total(self, spark):
        out = sample_group_holdout(spark, SF).collect()
        assert {r.split for r in out} <= {"train", "val", "test"}
        assert all(r.leaked_groups == 0 for r in out)
        n_orders = spark.read.parquet(f"{SF}/orders.parquet").count()
        assert sum(r.n_rows for r in out) == n_orders
        assert abs(sum(r.revenue_share for r in out) - 1.0) < 1e-6

    def test_split_is_group_constant(self, spark):
        # re-derive the assignment: every customer's orders in ONE split
        from dbsurveyor_spark.functions.hashing import portable_hash64
        from pyspark.sql import functions as F

        orders = spark.read.parquet(f"{SF}/orders.parquet")
        bucket = portable_hash64(F.col("o_custkey").cast("string")) % 100
        per_cust = (
            orders.select("o_custkey", bucket.alias("b"))
            .groupBy("o_custkey")
            .agg(F.countDistinct("b").alias("nb"))
        )
        assert per_cust.filter("nb > 1").count() == 0


class TestTemporalHoldout:
    def test_splits_are_time_ordered_and_total(self, spark):
        from dbsurveyor_spark.survey.sampling import (
            TEMPORAL_TEST_START,
            TEMPORAL_VAL_START,
            sample_temporal_holdout,
        )

        out = {r.split: r for r in sample_temporal_holdout(spark, SF).collect()}
        assert set(out) == {"train", "val", "test"}
        assert out["train"].last_date < TEMPORAL_VAL_START
        assert TEMPORAL_VAL_START <= out["val"].first_date
        assert out["val"].last_date < TEMPORAL_TEST_START
        assert TEMPORAL_TEST_START <= out["test"].first_date
        n_orders = spark.read.parquet(f"{SF}/orders.parquet").count()
        assert sum(r.n_rows for r in out.values()) == n_orders
        # overlap audit: seen-in-train is bounded by the split's customers,
        # and train trivially sees itself
        for r in out.values():
            assert 0 <= r.n_seen_in_train <= r.n_customers
        assert out["train"].n_seen_in_train == out["train"].n_customers


class TestLinkPrediction:
    def test_wedges_generate_in_row_from_materialized_pairs(self, spark):
        """r9 regression guard: the wedge stream must be ONE in-row
        Generate over a MATERIALIZED pair-array column — not a self-join
        of the capped-adjacency pipeline (which planned the window+cap
        subtree once per side), and not an inline HOF under the Generate
        (re-evaluated per output row, the §6 Generate rule)."""
        import re

        from dbsurveyor_spark.plans.asserts import formatted_plan
        from dbsurveyor_spark.plans.roundcheck import round_inspector

        captured = {}

        def hook(df, label):
            if label == "graph_link_prediction:topn":
                captured["plan"] = formatted_plan(df)

        with round_inspector(hook):
            graph_link_prediction(spark, SF)
        plan = captured["plan"]
        # exactly one Generate explodes a plain attribute (the projected
        # pair array), never an inline transform/flatten expression
        explodes = re.findall(r"Arguments: explode\((\w+)#\d+\)", plan)
        assert explodes.count("prs") == 1, plan
        # the capped-adjacency ranking window appears once, not per side
        # (4 Window nodes total: cap rn + the <=N-row rank window + the
        # cached co-purchase relation's rendered children)
        assert len(re.findall(r"\(\d+\) Window", plan)) <= 4, plan

    def test_predictions_are_new_valid_ranked(self, spark):
        out = graph_link_prediction(spark, SF).collect()
        assert len(out) == LINKPRED_TOP_N
        assert [r.rank for r in out] == list(range(1, LINKPRED_TOP_N + 1))
        half, _ = copurchase_graph(spark, SF)
        edges = {(r.a, r.b) for r in half.select("a", "b").collect()}
        for r in out:
            assert r.part_a < r.part_b  # canonical orientation
            assert (r.part_a, r.part_b) not in edges  # genuinely new links
            assert r.common_neighbors >= 1
            assert 0.0 < r.jaccard <= 1.0
            assert r.adamic_adar > 0.0

    def test_ranking_is_by_cn_then_aa(self, spark):
        out = graph_link_prediction(spark, SF).collect()
        keys = [
            (-r.common_neighbors, -r.adamic_adar, r.part_a, r.part_b)
            for r in out
        ]
        assert keys == sorted(keys)

    def test_jaccard_consistent_with_degrees(self, spark):
        out = graph_link_prediction(spark, SF).collect()
        _, deg = copurchase_graph(spark, SF)
        degs = {r.v: r.deg for r in deg.collect()}
        for r in out[:10]:
            union = degs[r.part_a] + degs[r.part_b] - r.common_neighbors
            assert abs(r.jaccard - round(r.common_neighbors / union, 9)) < 1e-9


class TestModularity:
    def test_q_terms_and_total(self, spark):
        from dbsurveyor_spark.operators.graph import graph_modularity

        rows = graph_modularity(spark, SF).collect()
        assert len(rows) >= 2  # multiple brands
        m = sum(r.degree_sum for r in rows) / 2  # handshake
        for r in rows:
            assert 0 <= r.internal_edges * 2 <= r.degree_sum
            assert 0.0 <= r.internal_share <= 1.0
            expected = round(
                r.internal_edges / m - (r.degree_sum / (2 * m)) ** 2, 9
            )
            assert abs(r.q_term - expected) < 1e-8
        q = rows[0].modularity
        assert all(abs(r.modularity - q) < 1e-12 for r in rows)
        assert -1.0 <= q <= 1.0
        assert abs(q - round(sum(r.q_term for r in rows), 7)) < 1e-6


class TestForecastSES:
    def test_recurrence_and_mape(self, spark):
        from dbsurveyor_spark.operators.relational import (
            orders_forecast_ses,
        )

        rows = sorted(
            orders_forecast_ses(spark, SF).collect(), key=lambda r: r.ym
        )
        assert rows[0].forecast_ses is None  # no history for month 1
        # t=2 forecast is the seed: exactly month 1's revenue
        assert abs(rows[1].forecast_ses - rows[0].revenue) < 1e-6
        # t=3 forecast = (x2 + x1) / 2 up to micro-unit rounding
        assert (
            abs(
                rows[2].forecast_ses
                - (rows[1].revenue + rows[0].revenue) / 2
            )
            < 1e-5
        )
        errs = [r.abs_pct_err for r in rows if r.abs_pct_err is not None]
        mape = rows[0].mape
        assert abs(mape - sum(errs) / len(errs)) < 1e-6
        assert 0 < mape < 1  # a sane baseline on a seasonal series
    def test_ppl_algebra_and_split_gap(self, spark):
        from dbsurveyor_spark.operators.textstats import (
            text_lm_perplexity_bigram,
        )

        rows = text_lm_perplexity_bigram(spark, SF).collect()
        docs = spark.read.parquet(f"{SF}/documents.parquet").count()
        assert len(rows) == docs
        assert {r.split for r in rows} == {"train", "held_out"}
        for r in rows:
            if r.n_bigrams == 0:
                assert r.mean_nll is None and r.ppl is None
                continue
            assert r.mean_nll > 0  # -ln of a probability < 1
            assert abs(r.ppl - round(math.exp(round(r.mean_nll, 9)), 6)) < 1e-6
        # the model must actually fit its training data: train perplexity
        # below held-out on average (the gap is the point of the split)
        import statistics

        tr = [r.mean_nll for r in rows if r.split == "train" and r.mean_nll]
        ho = [
            r.mean_nll for r in rows if r.split == "held_out" and r.mean_nll
        ]
        assert statistics.mean(tr) < statistics.mean(ho)


class TestLexicalDiversity:
    def test_counts_and_ratio_algebra(self, spark):
        rows = text_lexical_diversity(spark, SF).collect()
        docs = spark.read.parquet(f"{SF}/documents.parquet").count()
        assert len(rows) == docs  # anchored on the documents spine
        for r in rows:
            assert 1 <= r.n_types <= r.n_tokens
            assert r.n_hapax <= r.n_types
            assert abs(r.ttr - round(r.n_types / r.n_tokens, 9)) < 1e-9
            assert (
                abs(r.root_ttr - round(r.n_types / math.sqrt(r.n_tokens), 9))
                < 1e-9
            )
            assert r.hapax_share <= r.ttr + 1e-12  # hapax ⊆ types
            if r.n_tokens > 1:
                assert 0.0 < r.herdan_c <= 1.0  # V ≤ N ⇒ ln V / ln N ≤ 1

    def test_known_document(self, spark):
        import pandas as pd

        pdf = pd.DataFrame(
            {"doc_id": [1], "text": ["a b b c c c"]}
        )
        df = spark.createDataFrame(pdf)
        df.createOrReplaceTempView("documents_tmp")
        # reuse the operator's internal math through a tiny direct check
        from pyspark.sql import functions as F
        from dbsurveyor_spark.functions.text import tokens

        tok = df.select(
            "doc_id", F.explode(tokens(F.col("text"))).alias("tok")
        )
        agg = (
            tok.groupBy("doc_id", "tok")
            .count()
            .groupBy("doc_id")
            .agg(
                F.sum("count").alias("n"),
                F.count("*").alias("v"),
                F.sum(F.when(F.col("count") == 1, 1).otherwise(0)).alias(
                    "h"
                ),
            )
            .first()
        )
        assert (agg.n, agg.v, agg.h) == (6, 3, 1)
