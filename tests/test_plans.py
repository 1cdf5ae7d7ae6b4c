"""Physical-plan assertions (SURVEY.md §5.3): pushdown, pruning, broadcast,
and no-Python-in-hot-path guarantees that value checks alone can't see.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from dbsurveyor_spark.catalog import load_table
from dbsurveyor_spark.operators import dedup, relational, similarity
from dbsurveyor_spark.plans.asserts import (
    assert_broadcast_join,
    assert_no_python_eval,
    assert_pushed_filters,
    assert_read_schema_only,
    assert_whole_stage_codegen,
    formatted_plan,
)
from dbsurveyor_spark.survey import quality

SF = "/root/testdata/sf0.001"


class TestPushdownAndPruning:
    def test_q1_shipdate_filter_pushed_to_scan(self, spark):
        df = relational.q1_pricing_summary(spark, SF)
        assert_pushed_filters(df, "l_shipdate")

    def test_q1_scan_prunes_to_needed_columns(self, spark):
        df = relational.q1_pricing_summary(spark, SF)
        assert_read_schema_only(
            df,
            "lineitem.parquet",
            {
                "l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice",
                "l_discount", "l_tax", "l_shipdate",
            },
        )

    def test_q3_segment_filter_pushed(self, spark):
        df = relational.q3_shipping_priority(spark, SF)
        assert_pushed_filters(df, "c_mktsegment")

    def test_q6_all_predicates_pushed(self, spark):
        # the Q6 shape exists to prove full pushdown: every predicate column
        # must reach the reader, and the scan must prune to exactly the
        # filter+aggregate columns
        df = relational.q6_forecast_revenue(spark, SF)
        assert_pushed_filters(df, "l_shipdate", "l_discount", "l_quantity")
        assert_read_schema_only(
            df,
            "lineitem.parquet",
            {"l_shipdate", "l_discount", "l_quantity", "l_extendedprice"},
        )

    def test_projection_reaches_scan_for_two_column_query(self, spark):
        df = load_table(spark, SF, "orders").select("o_orderkey", "o_totalprice")
        assert_read_schema_only(df, "orders.parquet", {"o_orderkey", "o_totalprice"})


class TestJoinStrategy:
    def test_q5_broadcasts_dims(self, spark):
        # region+nation are bounded-cardinality: must be broadcast, never shuffled.
        assert_broadcast_join(relational.q5_local_supplier(spark, SF), at_least=2)

    def test_q3_no_cartesian(self, spark):
        plan = formatted_plan(relational.q3_shipping_priority(spark, SF))
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan

    def test_q3_top10_is_take_ordered(self, spark):
        # ORDER BY + LIMIT must compile to TakeOrderedAndProject (per-partition
        # top-N + driver merge), not a global sort.
        plan = formatted_plan(relational.q3_shipping_priority(spark, SF))
        assert "TakeOrderedAndProject" in plan

    def test_ann_centroid_join_is_broadcast(self, spark):
        assert_broadcast_join(similarity.ann_ivf_topk(spark, SF), at_least=1)

    def test_q4_plans_a_semi_join_with_pruned_probe(self, spark):
        # EXISTS must become a semi join (left side only in the output, no
        # dedup pass), probing a 2-column lineitem scan
        df = relational.q4_order_priority(spark, SF)
        plan = formatted_plan(df)
        assert "LeftSemi" in plan
        assert_pushed_filters(df, "o_orderdate")
        assert_read_schema_only(
            df, "lineitem.parquet", {"l_orderkey", "l_shipdate"}
        )

    def test_q17_single_lineitem_pass_no_self_join(self, spark):
        # the correlated-avg rewrite must be window-based: ONE lineitem
        # scan (no aggregate+re-join second pass), brand subset broadcast
        df = relational.q17_small_quantity_revenue(spark, SF)
        plan = formatted_plan(df)
        assert plan.count("lineitem.parquet") == 1
        assert_broadcast_join(df, at_least=1)
        assert_read_schema_only(
            df,
            "lineitem.parquet",
            {"l_partkey", "l_quantity", "l_extendedprice"},
        )


class TestJvmOnlyHotPaths:
    def test_core_queries_have_no_python_eval(self, spark):
        for fn in (
            relational.q1_pricing_summary,
            relational.q5_local_supplier,
            quality.quality_completeness,
            dedup.dedup_minhash_lsh,
            dedup.dedup_simhash,
        ):
            assert_no_python_eval(fn(spark, SF))

    def test_vector_scoring_uses_arrow_kernel_not_row_python(self, spark):
        # The cosine hot kernel is DELIBERATELY an Arrow-batched pandas UDF:
        # HOF lambdas are interpreted (~10× pass cost at dim=64) and a fully
        # unrolled fold blows janino's method limit inside join codegen
        # (functions/vectors.py:_cosine_kernel). Assert the fast shape: Arrow
        # eval present, row-at-a-time Python absent.
        plan = formatted_plan(similarity.ann_bruteforce_topk(spark, SF))
        assert "ArrowEvalPython" in plan
        assert "BatchEvalPython" not in plan

    def test_q1_whole_stage_codegen(self, spark):
        assert_whole_stage_codegen(
            None, rebuild=lambda: relational.q1_pricing_summary(spark, SF)
        )


class TestScanEconomy:
    def test_quality_completeness_single_scan(self, spark):
        # One aggregate job: exactly one lineitem scan in the plan.
        plan = formatted_plan(quality.quality_completeness(spark, SF))
        assert plan.count("lineitem.parquet") <= 2  # scan node + its reuse ref

    def test_filter_on_loaded_events_pushes_below_ts_conversion(self, spark):
        # events gets a ts-conversion projection in catalog.load_table; filters
        # on OTHER columns must still reach the parquet reader.
        df = load_table(spark, SF, "events").filter(F.col("event_type") == "error")
        assert_pushed_filters(df, "event_type")


class TestRound2OperatorPlans:
    def test_weighted_mix_prunes_documents_scan(self, spark):
        # hash-Bernoulli keep can't push (md5 of a column), but the scan
        # must read only the three projected columns, never text/n_chars.
        from dbsurveyor_spark.survey import sampling

        assert_read_schema_only(
            sampling.sample_weighted_mix(spark, SF),
            "documents.parquet",
            {"doc_id", "lang", "source"},
        )

    def test_hash_split_prunes_documents_scan(self, spark):
        from dbsurveyor_spark.survey import sampling

        assert_read_schema_only(
            sampling.sample_hash_split(spark, SF),
            "documents.parquet",
            {"doc_id", "lang"},
        )

    def test_stream_dedup_events_single_shuffle_no_python(self, spark):
        from dbsurveyor_spark.streaming import events as streaming_events

        df = streaming_events.stream_dedup_events(spark, SF)
        assert_no_python_eval(df)
        plan = formatted_plan(df)
        assert "CartesianProduct" not in plan
        # exactly ONE physical shuffle (the event_id aggregate); formatted
        # explain renders each node twice — tree line + detail section
        assert plan.count("Exchange") <= 2, plan

    def test_clusters_edge_pipeline_has_no_cartesian(self, spark):
        from dbsurveyor_spark.operators import dedup

        plan = formatted_plan(dedup.dedup_neardup_clusters(spark, SF))
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan

    def test_text_repetition_stays_jvm_and_joinless_grams(self, spark):
        # the gram build + both count levels are pure JVM (no Python eval);
        # no per-doc O(n²) nested-loop shapes
        from dbsurveyor_spark.operators import textstats

        df = textstats.text_repetition(spark, SF)
        assert_no_python_eval(df)
        plan = formatted_plan(df)
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan
        # both metric branches must read the cached gram frame, not re-run
        # the explode+window pass per branch
        assert plan.count("InMemoryTableScan") >= 2, plan

    def test_correlation_scan_prunes_to_measure_columns(self, spark):
        from dbsurveyor_spark.survey import profile

        df = profile.survey_correlation(spark, SF)
        assert_no_python_eval(df)
        assert_read_schema_only(
            df,
            "lineitem.parquet",
            {"l_quantity", "l_extendedprice", "l_discount", "l_tax"},
        )

    def test_histogram_scan_prunes_to_measure_columns(self, spark):
        from dbsurveyor_spark.survey import profile

        df = profile.survey_numeric_histogram(spark, SF)
        assert_read_schema_only(
            df,
            "lineitem.parquet",
            {"l_quantity", "l_extendedprice", "l_discount", "l_tax"},
        )

    def test_trending_scan_prunes_to_ts_and_type(self, spark):
        from dbsurveyor_spark.streaming import events as streaming_events

        df = streaming_events.stream_topk_trending(spark, SF)
        assert_no_python_eval(df)
        assert_read_schema_only(df, "events.parquet", {"ts", "event_type"})

    def test_referential_integrity_plans_anti_joins_no_cartesian(self, spark):
        plan = formatted_plan(quality.quality_referential_integrity(spark, SF))
        assert "LeftAnti" in plan, plan
        assert "CartesianProduct" not in plan

    def test_fd_inference_no_expand_no_cartesian(self, spark):
        from dbsurveyor_spark.survey import profile

        plan = formatted_plan(profile.survey_fd_inference(spark, SF))
        # distinct-pair + count shape, never the multi-distinct Expand
        assert "Expand" not in plan, plan
        assert "CartesianProduct" not in plan

    def test_volume_anomaly_scan_prunes_to_ts(self, spark):
        from dbsurveyor_spark.streaming import events as streaming_events

        df = streaming_events.stream_volume_anomaly(spark, SF)
        assert_no_python_eval(df)
        assert_read_schema_only(df, "events.parquet", {"ts"})

    def test_incremental_dedup_broadcasts_new_batch(self, spark):
        # the delta batch's banded signatures must broadcast — the corpus
        # side never shuffles for the incremental match
        plan = formatted_plan(dedup.dedup_minhash_incremental(spark, SF))
        assert "BroadcastHashJoin" in plan, plan
        assert "CartesianProduct" not in plan

    def test_latest_event_compaction_aggregates_not_window_sorts(self, spark):
        from dbsurveyor_spark.operators import funnel

        df = funnel.latest_event_per_user(spark, SF)
        plan = formatted_plan(df)
        # the whole point: struct-max partial aggregation, never a
        # row_number window (which sorts every row before discarding)
        assert "Window" not in plan, plan
        assert "HashAggregate" in plan or "SortAggregate" in plan, plan
        assert_no_python_eval(df)

    def test_funnel_family_stays_jvm_no_cartesian(self, spark):
        from dbsurveyor_spark.operators import funnel

        for fn in (
            funnel.funnel_conversion,
            funnel.retention_cohorts,
            funnel.event_transitions,
        ):
            df = fn(spark, SF)
            assert_no_python_eval(df)
            plan = formatted_plan(df)
            assert "CartesianProduct" not in plan, fn.__name__
        # cohort sizes are bounded (|weeks|) — must broadcast onto the matrix
        plan = formatted_plan(funnel.retention_cohorts(spark, SF))
        assert "BroadcastHashJoin" in plan, plan

    def test_corpus_curation_stays_jvm_with_broadcast_anti_join(self, spark):
        from dbsurveyor_spark.operators import pipeline

        df = pipeline.corpus_curation(spark, SF)
        assert_no_python_eval(df)
        plan = formatted_plan(df)
        assert "CartesianProduct" not in plan
        # the decontamination exclusion list is bounded (benchmark-sized):
        # must plan as a broadcast LEFT ANTI, never a shuffled anti join
        assert "BroadcastHashJoin" in plan and "LeftAnti" in plan, plan

    def test_embed_cluster_report_no_cross_join(self, spark):
        # assignment is the streaming mapInPandas pass (the one sanctioned
        # Python use) — never a corpus×k cross join
        plan = formatted_plan(similarity.embed_cluster_report(spark, SF))
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan

    def test_ann_ivf_caches_cell_assignment(self, spark):
        # both plan branches (assigned + probes) must read the cached
        # assignment, not re-run the corpus mapInPandas pass per branch
        plan = formatted_plan(similarity.ann_ivf_topk(spark, SF))
        assert plan.count("InMemoryTableScan") >= 2, plan


class TestJsonSchemaShape:
    """survey_json_schema_inference must stay O(1) plan-size in the field
    vocabulary: one explode + one groupBy, no Expand (the multi-distinct
    rewrite that duplicates the input per field), no per-field agg lists."""

    def test_no_expand_in_plan(self, spark):
        from dbsurveyor_spark.survey import jsonschema

        plan = formatted_plan(
            jsonschema.survey_json_schema_inference(spark, SF)
        )
        assert "Expand" not in plan, plan

    def test_thousand_field_document_column(self, spark):
        # A synthetic 1,000-field vocabulary: plan must neither grow with
        # the vocabulary nor fall back from codegen. 50 docs × 20 fields
        # each; every field name appears exactly once across the corpus.
        from dbsurveyor_spark.survey.jsonschema import infer_json_schema

        docs = []
        fid = 0
        for d in range(50):
            parts = []
            for j in range(20):
                if fid % 3 == 0:
                    parts.append(f'"f{fid:04d}": {fid}')
                elif fid % 3 == 1:
                    parts.append(f'"f{fid:04d}": "v{fid}"')
                else:
                    parts.append(f'"f{fid:04d}": {fid}.5')
                fid += 1
            docs.append("{" + ", ".join(parts) + "}")
        df = spark.createDataFrame([(d,) for d in docs], "doc string")
        out = infer_json_schema(df, "doc", len(docs))
        plan = formatted_plan(out)
        assert "Expand" not in plan, plan
        rows = out.collect()
        assert len(rows) == 1000
        by_field = {r["field"]: r for r in rows}
        assert by_field["f0000"]["dominant_type"] == "integer"
        assert by_field["f0001"]["dominant_type"] == "string"
        assert by_field["f0002"]["dominant_type"] == "double"
        assert all(r["present_cnt"] == 1 for r in rows)
        assert all(r["presence_pct"] == 2.0 for r in rows)
