"""Plan + semantics tests for the round-4 additions: PII scan, substring
dedup, top-values / moments profilers, pivot, RANGE-frame window."""

from __future__ import annotations

from pyspark.sql import functions as F

from dbsurveyor_spark.operators import dedup, pipeline, relational
from dbsurveyor_spark.plans.asserts import (
    assert_no_python_eval,
    assert_read_schema_only,
    formatted_plan,
)
from dbsurveyor_spark.survey import profile

SF = "/root/testdata/sf0.001"


class TestPiiScan:
    def test_map_side_only_no_shuffle(self, spark):
        df = pipeline.text_pii_scan(spark, SF)
        plan = formatted_plan(df)
        assert "Exchange" not in plan, plan
        assert_no_python_eval(df)

    def test_injected_pii_is_found_and_redacted(self, spark):
        df = pipeline.text_pii_scan(spark, SF).filter(F.col("doc_id") % 7 == 0)
        rows = df.collect()
        assert rows and all(r.email_count >= 1 and r.flagged == 1 for r in rows)
        # doc 0 hits every injection family (0 ≡ 0 mod 7/11/13/17)
        r0 = next(r for r in rows if r.doc_id == 0)
        assert (
            r0.ssn_count >= 1 and r0.phone_count >= 1 and r0.ipv4_count >= 1
        )
        assert r0.pii_total == (
            r0.email_count + r0.ssn_count + r0.phone_count + r0.ipv4_count
        )

    def test_clean_docs_unflagged(self, spark):
        df = pipeline.text_pii_scan(spark, SF)
        clean = df.filter(
            (F.col("doc_id") % 7 != 0)
            & (F.col("doc_id") % 11 != 0)
            & (F.col("doc_id") % 13 != 0)
            & (F.col("doc_id") % 17 != 0)
        )
        assert clean.filter(F.col("flagged") == 1).count() == 0


class TestSubstringDedup:
    def test_no_python_eval(self, spark):
        assert_no_python_eval(dedup.dedup_substring(spark, SF))

    def test_shuffled_grams_are_int64_not_strings(self, spark):
        # the whole point of hashing windows map-side: nothing string-typed
        # ever reaches an exchange. Inspect each Exchange's output schema.
        plan = formatted_plan(dedup.dedup_substring(spark, SF))
        for block in plan.split("\n\n"):
            if block.strip().startswith("(") and "Exchange" in block.split("\n")[0]:
                assert "string" not in block.lower(), block

    def test_injected_exact_dups_score_one(self, spark):
        df = dedup.dedup_substring(spark, SF)
        clones = df.filter(F.col("doc_id") >= dedup.ID_OFFSET)
        n = clones.count()
        assert n > 0
        assert clones.filter(F.col("dup_fraction") == 1.0).count() == n


class TestProfilers:
    def test_top_values_scan_prunes_orders(self, spark):
        df = profile.survey_top_values(spark, SF)
        assert_read_schema_only(
            df,
            "orders.parquet",
            {"o_orderstatus", "o_orderpriority", "o_custkey"},
        )
        assert_no_python_eval(df)

    def test_top_values_k_per_column(self, spark):
        import collections

        rows = profile.survey_top_values(spark, SF).collect()
        by_col = collections.Counter(r.column_name for r in rows)
        assert set(by_col) == set(profile._TOP_VALUES_COLS)
        # tiny domains yield ≤K rows; ranks are 1..n and frequencies ≤ 1
        for r in rows:
            assert 1 <= r.rank <= profile.TOP_VALUES_K
            assert 0.0 < r.frequency <= 1.0

    def test_moments_single_pass_pruned(self, spark):
        df = profile.survey_numeric_moments(spark, SF)
        plan = formatted_plan(df)
        # tree-form "Scan parquet  (n)" counts nodes once (the details
        # section repeats each node as "(n) Scan parquet")
        assert plan.count("Scan parquet  (") == 1, plan
        assert_read_schema_only(
            df, "lineitem.parquet", set(profile._MOMENT_SCALES)
        )

    def test_moments_sane_shapes(self, spark):
        rows = {
            r.column_name: r
            for r in profile.survey_numeric_moments(spark, SF).collect()
        }
        assert set(rows) == set(profile._MOMENT_SCALES)
        # l_quantity is ~uniform on [1,50]: near-zero skew, platykurtic
        q = rows["l_quantity"]
        assert abs(q.skewness) < 0.2
        assert q.kurtosis_excess < 0
        for r in rows.values():
            assert r.stddev_pop > 0


class TestPivotAndRangeFrame:
    def test_pivot_preaggregates_before_join(self, spark):
        # the orders-side aggregate must sit BELOW the customer join:
        # exactly two HashAggregate pairs (pre-agg + pivot agg), and the
        # orders scan pruned to 3 columns.
        df = relational.pivot_sales_by_segment(spark, SF)
        assert_read_schema_only(
            df, "orders.parquet", {"o_custkey", "o_orderdate", "o_totalprice"}
        )
        assert_read_schema_only(
            df, "customer.parquet", {"c_custkey", "c_mktsegment"}
        )

    def test_pivot_schema_is_pinned(self, spark):
        df = relational.pivot_sales_by_segment(spark, SF)
        assert df.columns == ["order_year"] + [
            f"{s.lower()}_rev" for s in relational.MKT_SEGMENTS
        ]

    def test_trailing_window_one_exchange(self, spark):
        df = relational.window_trailing_revenue(spark, SF)
        plan = formatted_plan(df)
        assert plan.count("Exchange (") == 1, plan

    def test_trailing_counts_bounded_by_running(self, spark):
        # trailing-7d count ≤ running row_number, equality iff all history
        # is within the window — spot-check the frame actually trims.
        df = relational.window_trailing_revenue(spark, SF)
        agg = df.agg(
            F.max("trailing_cnt").alias("max_cnt"),
            F.count(F.lit(1)).alias("n"),
        ).collect()[0]
        per_cust_max = (
            df.groupBy("o_custkey").count().agg(F.max("count")).collect()[0][0]
        )
        assert agg.n > 0
        assert agg.max_cnt <= per_cust_max


class TestIndexAddAndBalance:
    def test_add_batch_consistent_with_full_assignment(self, spark):
        # add() must place a delta vector exactly where the search path's
        # assignment pass places it — otherwise lookups miss fresh data.
        from dbsurveyor_spark.catalog import load_table
        from dbsurveyor_spark.operators import similarity

        added = {
            (r.vec_id, r.cell_id)
            for r in similarity.ann_ivf_add_batch(spark, SF).collect()
        }
        assert added
        emb = load_table(spark, SF, "embeddings").select("vec_id", "embedding")
        cent = similarity.trained_centroid_rows(spark, SF)
        full = {
            (r.vec_id, r.cell_id)
            for r in similarity.rank_cells(emb, cent, 1).collect()
            if r.vec_id % 10 == similarity.ADD_BATCH_RESIDUE
        }
        assert added == full

    def test_balance_check_summary_shape(self, spark):
        from dbsurveyor_spark.survey import quality

        row = quality.quality_balance_check(spark, SF).collect()[0]
        assert row.total_orders > 0
        assert row.orders_with_lines <= row.total_orders
        assert row.reconciled + row.mismatched == row.orders_with_lines
        assert 0.0 <= row.mismatch_rate <= 1.0


class TestProductQuantization:
    def test_codes_are_compact_and_valid(self, spark):
        from dbsurveyor_spark.catalog import load_table
        from dbsurveyor_spark.functions.vectors import (
            PQ_ENCODE_SCHEMA,
            pq_encode_mapper,
        )
        from dbsurveyor_spark.operators import similarity

        emb = load_table(spark, SF, "embeddings").select(
            "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
        )
        books = similarity.trained_pq_codebooks(spark, SF)
        assert len(books) == similarity.PQ_M
        valid = [{int(cid) for cid, _ in cb} for cb in books]
        codes = emb.mapInPandas(
            pq_encode_mapper(books), PQ_ENCODE_SCHEMA
        ).collect()
        assert len(codes) == emb.count()
        for r in codes:
            assert len(r.codes) == similarity.PQ_M
            for s, c in enumerate(r.codes):
                assert c in valid[s]

    def test_pq_topk_overlaps_ground_truth(self, spark):
        # ADC over 16-code subquantizers is lossy, but on 500 vectors the
        # approximate top-3 must still intersect the exact top-3 somewhere
        # across the probe set — guards against a scrambled codes/table
        # mapping that would still hash-match its own oracle.
        from dbsurveyor_spark.operators import similarity

        pq = {
            (r.query_id, r.neighbor_id)
            for r in similarity.ann_pq_topk(spark, SF).collect()
        }
        bf = {
            (r.query_id, r.neighbor_id)
            for r in similarity.ann_bruteforce_topk(spark, SF)
            .filter(F.col("rank") <= similarity.IVF_K)
            .collect()
        }
        assert len(pq) == len(bf)
        assert pq & bf


class TestIvfPq:
    def test_posting_list_cells_match_ivf_assignment(self, spark):
        # the fused encode pass's cell column must equal the IVF rn=1
        # assignment — one model, two code paths
        from dbsurveyor_spark.catalog import load_table
        from dbsurveyor_spark.functions.vectors import (
            PQ_RESID_ENCODE_SCHEMA,
            pq_encode_mapper,
        )
        from dbsurveyor_spark.operators import similarity

        emb = load_table(spark, SF, "embeddings").select(
            "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
        )
        cent = similarity.trained_centroid_rows(spark, SF)
        books = similarity.trained_residual_codebooks(spark, SF)
        posting = {
            r.vec_id: r.cell_id
            for r in emb.mapInPandas(
                pq_encode_mapper(books, cent_rows=cent),
                PQ_RESID_ENCODE_SCHEMA,
            ).collect()
        }
        assigned = {
            r.vec_id: r.cell_id
            for r in similarity.rank_cells(emb, cent, 1)
            .filter(F.col("rn") == 1)
            .collect()
        }
        assert posting == assigned

    def test_ivfpq_results_within_probed_cells(self, spark):
        # every reported neighbor must live in one of its query's NPROBE
        # probed cells (the inverted-list restriction), and ranks are 1..k
        from dbsurveyor_spark.catalog import load_table
        from dbsurveyor_spark.operators import similarity

        emb = load_table(spark, SF, "embeddings").select(
            "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
        )
        cent = similarity.trained_centroid_rows(spark, SF)
        cells = {
            (r.vec_id, r.cell_id)
            for r in similarity.rank_cells(emb, cent, similarity.NPROBE)
            .collect()
        }
        assigned = {
            r.vec_id: r.cell_id
            for r in similarity.rank_cells(emb, cent, 1)
            .filter(F.col("rn") == 1)
            .collect()
        }
        res = similarity.ann_ivfpq_topk(spark, SF).collect()
        assert res
        by_q = {}
        for r in res:
            assert (r.query_id, assigned[r.neighbor_id]) in cells
            assert r.neighbor_id != r.query_id
            by_q.setdefault(r.query_id, []).append(r.rank)
        for ranks in by_q.values():
            assert sorted(ranks) == list(range(1, len(ranks) + 1))

    def test_ivfpq_overlaps_ivf(self, spark):
        # residual coding refines, not scrambles: the IVFADC top-k must
        # intersect the uncompressed IVF top-k over the same probed cells
        from dbsurveyor_spark.operators import similarity

        pq = {
            (r.query_id, r.neighbor_id)
            for r in similarity.ann_ivfpq_topk(spark, SF).collect()
        }
        ivf = {
            (r.query_id, r.neighbor_id)
            for r in similarity.ann_ivf_topk(spark, SF).collect()
        }
        assert pq & ivf


class TestTrainingDeterminism:
    def test_pq_codebooks_invariant_under_partitioning(self, spark):
        # integer-unit partial sums merge exactly, so the trained model
        # must be bit-identical no matter how the corpus is split.
        from dbsurveyor_spark.catalog import load_table
        from dbsurveyor_spark.functions.vectors import (
            PQ_PARTIAL_SCHEMA,
            merge_centroid_partials,
            pq_partial_mapper,
        )
        from dbsurveyor_spark.operators import similarity
        from pyspark.sql import functions as F

        books = similarity.trained_pq_codebooks(spark, SF)
        emb = load_table(spark, SF, "embeddings").select(
            F.col("embedding").cast("array<double>").alias("embedding")
        )
        for parts in (1, 7):
            cur = [
                [(cid, list(vec)) for cid, vec in b] for b in books
            ]
            rows = (
                emb.repartition(parts)
                .mapInPandas(pq_partial_mapper(cur), PQ_PARTIAL_SCHEMA)
                .collect()
            )
            retrained = [
                merge_centroid_partials(
                    [r for r in rows if int(r["sub"]) == s]
                )
                for s in range(similarity.PQ_M)
            ]
            # one extra Lloyd step from the converged model, under two
            # different partitionings, must agree bit-for-bit
            if parts == 1:
                ref = retrained
            else:
                assert retrained == ref


class TestSetOpsAndGroupingSets:
    def test_groupingsets_single_expand_single_scan_pair(self, spark):
        # one Expand (factor 2), not one aggregate per grouping set
        plan = formatted_plan(relational.groupingsets_sales(spark, SF))
        assert plan.count("Expand (") == 1, plan

    def test_groupingsets_marginals_sum_to_total(self, spark):
        rows = relational.groupingsets_sales(spark, SF).collect()
        by_set = {}
        for r in rows:
            by_set.setdefault(r.grouping_set, []).append(r)
        assert len(by_set) == 2
        totals = [
            round(sum(r.total_sales for r in v), 2) for v in by_set.values()
        ]
        assert totals[0] == totals[1]  # both marginals cover every order

    def test_intersect_is_semi_join_not_full_distinct(self, spark):
        df = relational.set_intersect_customers(spark, SF)
        rows = {r.c_custkey for r in df.collect()}
        assert rows  # non-degenerate at sf0.001
        assert_read_schema_only(
            df, "orders.parquet", {"o_custkey", "o_orderdate"}
        )

    def test_ntile_buckets_balanced(self, spark):
        import collections

        rows = relational.window_ntile_acctbal(spark, SF).collect()
        per = collections.Counter(
            (r.c_nationkey, r.balance_quartile) for r in rows
        )
        by_nation = collections.defaultdict(list)
        for (nk, q), n in per.items():
            by_nation[nk].append((q, n))
        for nk, qs in by_nation.items():
            counts = [n for _, n in sorted(qs)]
            assert len(counts) <= 4
            assert max(counts) - min(counts) <= 1  # NTILE balance invariant
