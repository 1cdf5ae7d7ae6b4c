"""Plan + semantics tests for the round-4 additions: PII scan, substring
dedup, top-values / moments profilers, pivot, RANGE-frame window."""

from __future__ import annotations

from pyspark.sql import functions as F

from dbsurveyor_spark.operators import dedup, pipeline, relational
from dbsurveyor_spark.plans.asserts import (
    assert_broadcast_join,
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


class TestRound4Additions:
    """Plan discipline + invariants for the later round-4 operators."""

    def test_scd2_single_exchange_no_python(self, spark):
        from dbsurveyor_spark.streaming import events as ev

        df = ev.scd2_user_state(spark, SF)
        assert_no_python_eval(df)
        # change detect + interval close + current flag share ONE shuffle
        assert formatted_plan(df).count("Exchange (") == 1

    def test_scd2_intervals_are_well_formed(self, spark):
        from dbsurveyor_spark.streaming import events as ev

        rows = ev.scd2_user_state(spark, SF).collect()
        assert rows
        by_user = {}
        for r in rows:
            by_user.setdefault(r.user_id, []).append(r)
        for user, ivs in by_user.items():
            ivs.sort(key=lambda r: r.valid_from)
            # exactly one open (current) interval per user, and it's last
            currents = [r for r in ivs if r.is_current]
            assert len(currents) == 1 and ivs[-1].is_current
            for a, b in zip(ivs, ivs[1:]):
                assert a.valid_to == b.valid_from  # contiguous history
                assert a.state != b.state  # consecutive same-state collapsed

    def test_late_data_no_global_window(self, spark):
        from dbsurveyor_spark.streaming import events as ev

        df = ev.stream_late_data_report(spark, SF)
        assert_no_python_eval(df)
        rows = {r.bucket: r for r in df.collect()}
        # injected disorder must produce at least one late bucket
        assert set(rows) - {"on_time"}
        assert abs(sum(r.share for r in rows.values()) - 1.0) < 1e-6
        assert rows["on_time"].max_late_sec == 0.0

    def test_late_data_two_level_equals_global(self, spark):
        # the two-level prefix max must reproduce the single-partition
        # global-window reference bucket-for-bucket
        from pyspark.sql import Window as W

        from dbsurveyor_spark.catalog import load_table
        from dbsurveyor_spark.streaming import events as ev

        raw = load_table(spark, SF, "events").select(
            F.expr(ev._ARRIVAL_SQL).alias("ak"),
            "event_id",
            F.col("ts").cast("double").alias("t"),
        )
        gw = W.orderBy("ak", "event_id").rowsBetween(W.unboundedPreceding, -1)
        late = F.when(
            F.col("wm").isNotNull() & (F.col("wm") > F.col("t")),
            F.col("wm") - F.col("t"),
        ).otherwise(F.lit(0.0))
        bucket = F.when(F.col("late") <= 0.0, F.lit("on_time"))
        for name, ub in ev.LATE_BUCKETS[1:]:
            bucket = (
                bucket.when(F.col("late") <= ub, F.lit(name))
                if ub is not None
                else bucket.otherwise(F.lit(name))
            )
        direct = {
            r.bucket: (r.n, r.mx)
            for r in raw.withColumn("wm", F.max("t").over(gw))
            .withColumn("late", late)
            .groupBy(bucket.alias("bucket"))
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.round(F.max("late"), 6).alias("mx"),
            )
            .collect()
        }
        got = {
            r.bucket: (r.n_events, r.max_late_sec)
            for r in ev.stream_late_data_report(spark, SF).collect()
        }
        assert got == direct

    def test_psi_no_python_flags_only_injected(self, spark):
        from dbsurveyor_spark.survey import quality as q

        df = q.quality_distribution_psi(spark, SF)
        assert_no_python_eval(df)
        rows = {r.column_name: r for r in df.collect()}
        assert rows["value"].drift_flag == 1  # injected drift fires
        assert rows["o_totalprice"].drift_flag == 0  # clean column quiet
        for r in rows.values():
            assert r.n_ref > 0 and r.n_cur > 0

    def test_join_cardinality_invariants(self, spark):
        from dbsurveyor_spark.survey import profile as p

        df = p.survey_join_cardinality(spark, SF)
        assert_no_python_eval(df)
        for r in df.collect():
            assert r.child_rows >= r.distinct_keys >= 1
            assert r.max_per_key >= 1
            assert r.skew_ratio >= 1.0 - 1e-9
            assert abs(r.avg_per_key * r.distinct_keys - r.child_rows) < 1

    def test_mix_plan_binding_group_and_shares(self, spark):
        rows = pipeline.corpus_mix_plan(spark, SF).collect()
        assert rows
        rates = [r.keep_rate for r in rows]
        assert max(rates) == 1.0  # binding group pinned
        assert all(0.0 < r <= 1.0 for r in rates)
        assert abs(sum(r.target_share for r in rows) - 1.0) < 1e-6
        assert abs(sum(r.achieved_share for r in rows) - 1.0) < 1e-3
        for r in rows:
            assert r.expected_tokens <= r.available_tokens

    def test_path_analysis_bounded_rank_frame(self, spark):
        from dbsurveyor_spark.streaming import events as ev

        rows = ev.event_path_analysis(spark, SF).collect()
        assert 0 < len(rows) <= ev.PATH_TOP_K
        assert [r.rank for r in sorted(rows, key=lambda r: r.rank)] == list(
            range(1, len(rows) + 1)
        )
        for r in rows:
            assert r.path.count(">") == ev.PATH_LEN - 1
            assert 1 <= r.n_users <= r.n_occurrences

    def test_embedding_outliers_below_threshold(self, spark):
        from dbsurveyor_spark.operators import similarity as sim

        rows = sim.embedding_outlier_report(spark, SF).collect()
        assert rows  # p5-calibrated threshold is non-vacuous
        for r in rows:
            assert r.cos_to_centroid < sim.OUTLIER_COS_T

    def test_sequence_gaps_two_level_equals_global(self, spark):
        # the blocked predecessor must reproduce the single-partition
        # global-lag reference gap-for-gap
        from pyspark.sql import Window as W

        from dbsurveyor_spark.catalog import load_table
        from dbsurveyor_spark.survey import quality as q

        feed = (
            load_table(spark, SF, "events")
            .select("event_id")
            .filter(F.expr(q._GAP_DROP_SQL))
        )
        lagged = feed.withColumn(
            "prev_id", F.lag("event_id").over(W.orderBy("event_id"))
        )
        direct = {
            (r.gap_start, r.gap_end, r.missing)
            for r in lagged.filter(
                F.col("prev_id").isNotNull()
                & (F.col("event_id") - F.col("prev_id") > 1)
            )
            .select(
                (F.col("prev_id") + 1).alias("gap_start"),
                (F.col("event_id") - 1).alias("gap_end"),
                (F.col("event_id") - F.col("prev_id") - 1).alias("missing"),
            )
            .collect()
        }
        got = {
            (r.gap_start, r.gap_end, r.missing)
            for r in q.quality_sequence_gaps(spark, SF).collect()
        }
        assert got == direct and got
        # burst gaps (width 3) and isolated gaps (width 1) both present
        widths = {m for _s, _e, m in got}
        assert {1, 3} <= widths


class TestTfidfKeywords:
    def test_no_python_eval_single_token_explode(self, spark):
        from dbsurveyor_spark.operators import textstats

        df = textstats.text_tfidf_keywords(spark, SF)
        assert_no_python_eval(df)
        # tf and df share ONE exploded frame: exactly one Generate node
        # (each node appears twice in formatted output: tree + detail).
        plan = formatted_plan(df)
        assert plan.count("Generate") == 2, plan
        # rank<=K is pushed into the sort as a group-limit
        assert "WindowGroupLimit" in plan, plan

    def test_ranks_scores_and_idf_semantics(self, spark):
        from math import log

        from dbsurveyor_spark.operators import textstats

        rows = textstats.text_tfidf_keywords(spark, SF).collect()
        n_docs = 500
        by_doc: dict[int, list] = {}
        for r in rows:
            by_doc.setdefault(r.doc_id, []).append(r)
        for doc_rows in by_doc.values():
            doc_rows.sort(key=lambda r: r.rank)
            assert [r.rank for r in doc_rows] == list(
                range(1, len(doc_rows) + 1)
            )
            assert len(doc_rows) <= textstats.TFIDF_TOP_K
            # scores non-increasing with rank; score = tf * ln(N/df)
            scores = [r.score for r in doc_rows]
            assert scores == sorted(scores, reverse=True)
            for r in doc_rows:
                assert abs(r.score - round(r.tf * log(n_docs / r.df), 9)) < 1e-9
                assert 1 <= r.df <= n_docs
        # a keyword appearing in EVERY doc has idf 0 and can never rank
        assert all(r.df < n_docs or r.score == 0.0 for r in rows)


class TestVolumeCusum:
    def test_metadata_sized_windows_only(self, spark):
        from dbsurveyor_spark.streaming import events as ev

        df = ev.stream_volume_cusum(spark, SF)
        assert_no_python_eval(df)
        # the scan reduces to daily counts BEFORE any window: every Window
        # operator consumes the |days| aggregate, so exactly one pre-window
        # HashAggregate pair feeds it (no data-sized global window).
        plan = formatted_plan(df)
        assert "Window" in plan

    def test_recursion_identity_and_drift_alarm(self, spark):
        from dbsurveyor_spark.streaming import events as ev

        rows = sorted(
            ev.stream_volume_cusum(spark, SF).collect(), key=lambda r: r.day
        )
        assert len(rows) == 30
        # replay Page's recursion directly on the daily counts
        ns = [r.n_events for r in rows]
        mu = sum(ns) / len(ns)
        var = sum(n * n for n in ns) / len(ns) - mu * mu
        sd = max(0.0, var) ** 0.5
        s_pos = s_neg = 0.0
        for r, n in zip(rows, ns):
            s_pos = max(0.0, s_pos + (n - mu - ev.CUSUM_K * sd))
            s_neg = max(0.0, s_neg + (-(n - mu) - ev.CUSUM_K * sd))
            assert abs(r.cusum_pos - s_pos) < 1e-4
            assert abs(r.cusum_neg - s_neg) < 1e-4
        # the injected ~33% drop from Jan 24 must fire the NEGATIVE side
        pre = [r for r in rows if r.day < "2024-01-24"]
        post = [r for r in rows if r.day >= "2024-01-24"]
        assert all(r.alarm_neg == 0 for r in pre)
        assert any(r.alarm_neg == 1 for r in post)
        # ... and a pure drop never fires the positive side
        assert all(r.alarm_pos == 0 for r in rows)


class TestEquidepthHistogram:
    def test_depth_balance_and_bounds(self, spark):
        from dbsurveyor_spark.survey import profile as p

        rows = p.survey_equidepth_histogram(spark, SF).collect()
        per_col: dict[str, list] = {}
        for r in rows:
            per_col.setdefault(r.column_name, []).append(r)
        assert set(per_col) == set(p.EDH_COLS)
        total_rows = None
        for col, bs in per_col.items():
            bs.sort(key=lambda r: r.bucket)
            assert [b.bucket for b in bs] == list(range(p.EDH_BUCKETS))
            # bounds monotone non-decreasing across the spine
            for a, b in zip(bs, bs[1:]):
                assert a.hi <= b.lo + 1e-9 or a.hi == b.lo
            n = sum(b.n for b in bs)
            total_rows = total_rows or n
            assert n == total_rows  # every column partitions ALL rows
            # equi-depth: continuous columns stay within 2x of n/8; the
            # discrete ones (l_quantity 1..50, l_discount 11 values) tie
            # heavily at fences, so only check the continuous price column
            if col == "l_extendedprice":
                tgt = n / p.EDH_BUCKETS
                for b in bs:
                    assert 0.5 * tgt <= b.n <= 2.0 * tgt, (col, b)

    def test_fences_precollected_single_count_scan(self, spark):
        # the sf0.1 OOM regression guard: fences are collected driver-side
        # (one array-probs percentile buffer per column, never 7), so the
        # returned plan must contain NO percentile aggregate at all and
        # exactly one parquet scan (the bucket-count pass) joined broadcast
        # to the literal spine.
        from dbsurveyor_spark.survey import profile as p

        df = p.survey_equidepth_histogram(spark, SF)
        plan = formatted_plan(df)
        assert "percentile" not in plan, plan
        assert plan.count("Scan parquet") == 2, plan  # tree + detail
        assert "BroadcastHashJoin" in plan, plan
        assert_no_python_eval(df)


class TestSemanticDedup:
    """SemDeDup survivor-corpus invariants (dedup.dedup_semantic_corpus)."""

    def test_partition_and_group_accounting(self, spark):
        surv = dedup.dedup_semantic_corpus(spark, SF).collect()
        corpus_n = dedup._vec_corpus(spark, SF).count()
        # survivors partition the corpus: group sizes sum to corpus size
        assert sum(r.n_members for r in surv) == corpus_n
        # every injected duplicate (vec_id >= ID_OFFSET) has a lower-id
        # original, so no duplicate row ever survives as a representative
        assert all(r.vec_id < dedup.ID_OFFSET for r in surv)

    def test_survivors_are_component_minima(self, spark):
        pairs = dedup.dedup_embedding_cosine(spark, SF)
        edges = pairs.select(
            F.col("vec_a").alias("src"), F.col("vec_b").alias("dst")
        )
        labels = {
            r.node: r.label
            for r in dedup.star_contraction_labels(edges).collect()
        }
        surv = {r.vec_id: r.n_members for r in
                dedup.dedup_semantic_corpus(spark, SF).collect()}
        # every edge-incident component min survives with the right size.
        # star_contraction_labels emits (node, label) for NON-root members
        # only (the root has no self-edge), so true size = count + root.
        import collections

        sizes = collections.Counter(labels.values())
        for lbl, n in sizes.items():
            assert surv[lbl] == n + 1
        # nodes that lost their component are gone
        for node in labels:
            assert node not in surv


class TestInfoStats:
    """Entropy / MI / Benford invariants (survey/infostats.py)."""

    def test_entropy_bounds_and_gini(self, spark):
        from dbsurveyor_spark.survey import infostats

        rows = infostats.survey_column_entropy(spark, SF).collect()
        assert len(rows) == sum(len(v) for v in infostats._ENTROPY_COLS.values())
        import math

        for r in rows:
            # 0 <= H <= ln(distinct); normalized in [0,1]; gini in [0,1)
            assert -1e-9 <= r.entropy_nats <= math.log(r.distinct_vals) + 1e-9
            assert -1e-9 <= r.norm_entropy <= 1 + 1e-9
            assert 0 <= r.gini_impurity < 1
            assert r.n_rows > 0

    def test_mi_bounds(self, spark):
        from dbsurveyor_spark.survey import infostats

        rows = infostats.survey_mutual_information(spark, SF).collect()
        assert len(rows) == len(infostats._MI_PAIRS)
        for r in rows:
            # 0 <= I(X;Y) <= min(H(X), H(Y)); SU in [0,1]
            assert r.mi_nats >= -1e-9
            assert r.mi_nats <= min(r.entropy_x, r.entropy_y) + 1e-9
            assert -1e-9 <= r.symmetric_uncertainty <= 1 + 1e-9

    def test_benford_shares_and_uniform_nonconformity(self, spark):
        from dbsurveyor_spark.survey import infostats

        rows = {
            (r.table_name, r.column_name): r
            for r in infostats.quality_benford(spark, SF).collect()
        }
        assert len(rows) == len(infostats._BENFORD_COLS)
        for r in rows.values():
            assert r.n_values > 0 and r.chi_square >= 0 and r.mad >= 0
            assert r.conforms == (r.mad < infostats.BENFORD_MAD_MAX)
        # narrow uniform-ish synthetic prices genuinely do not conform —
        # the detector must flag them, not rubber-stamp
        assert not rows[("orders", "o_totalprice")].conforms

    def test_no_python_eval_anywhere(self, spark):
        from dbsurveyor_spark.survey import infostats

        for fn in infostats.QUERIES.values():
            assert_no_python_eval(fn(spark, SF))

    def test_benford_agg_state_is_bounded(self, spark):
        from dbsurveyor_spark.survey import infostats

        # the only data-sized operation is the 9-bucket digit groupBy:
        # every aggregate keys on the digit, never a data-sized key
        plan = formatted_plan(infostats.quality_benford(spark, SF))
        assert "HashAggregate" in plan
        assert_no_python_eval(infostats.quality_benford(spark, SF))


class TestContainment:
    """Asymmetric containment invariants (dedup.dedup_containment)."""

    def test_every_excerpt_maps_to_its_source(self, spark):
        rows = dedup.dedup_containment(spark, SF).collect()
        pairs = {(r.doc_a, r.doc_b) for r in rows}
        srcs = {
            r.doc_id
            for r in dedup.load_table(spark, SF, "documents")
            .select("doc_id")
            .collect()
            if r.doc_id % 7 == 0
        }
        for s in srcs:
            assert (s + dedup.ID_OFFSET, s) in pairs
        # excerpt → source containment is exactly 1.0 (subset by construction)
        for r in rows:
            if r.doc_a == r.doc_b + dedup.ID_OFFSET:
                assert r.containment == 1.0

    def test_symmetric_jaccard_misses_excerpts(self, spark):
        # the operator's reason to exist: excerpts never reach the
        # symmetric Jaccard threshold, so the symmetric dedup can't see
        # them (different corpora, so compare via shingle-set math).
        jac = {
            (r.doc_a, r.doc_b)
            for r in dedup.dedup_ngram_jaccard(spark, SF).collect()
        }
        # jaccard corpus injects % 10 clones; containment corpus injects
        # % 7 excerpts — a %7==0, %10!=0 doc pair appears only here
        got = {
            (r.doc_a, r.doc_b)
            for r in dedup.dedup_containment(spark, SF).collect()
        }
        only_here = {
            (a, b) for (a, b) in got if a == b + dedup.ID_OFFSET and b % 10 != 0
        }
        assert only_here and not (only_here & jac)

    def test_prefix_filter_is_exact_vs_bruteforce(self, spark):
        # recompute containment naively from the shingle sets and compare
        exploded = dedup._shingle_rows_from(
            dedup._contain_corpus(spark, SF)
        ).dropDuplicates(["doc_id", "shingle"])
        sets = {
            r.doc_id: set(r.sh)
            for r in exploded.groupBy("doc_id")
            .agg(F.collect_set("shingle").alias("sh"))
            .collect()
        }
        expect = set()
        for a, sa in sets.items():
            for b, sb in sets.items():
                if a != b and sa and len(sa & sb) / len(sa) >= dedup.CONTAIN_T:
                    expect.add((a, b))
        got = {
            (r.doc_a, r.doc_b)
            for r in dedup.dedup_containment(spark, SF).collect()
        }
        assert got == expect


class TestClickAttribution:
    """Interval-join attribution invariants (streaming.events)."""

    def test_every_purchase_reported_once(self, spark):
        from dbsurveyor_spark.catalog import load_table
        from dbsurveyor_spark.streaming import events as se

        df = se.stream_click_attribution(spark, SF)
        n_purch = (
            load_table(spark, SF, "events")
            .filter(F.col("event_type") == "purchase")
            .count()
        )
        rows = df.collect()
        assert len(rows) == n_purch
        assert len({r.purchase_id for r in rows}) == n_purch

    def test_attribution_matches_exists_recount(self, spark):
        from dbsurveyor_spark.catalog import load_table
        from dbsurveyor_spark.streaming import events as se

        ev = load_table(spark, SF, "events").select(
            "event_id", "ts", "user_id", "event_type"
        )
        clicks = ev.filter(F.col("event_type") == "click").select(
            F.col("user_id").alias("cu"), F.col("ts").alias("cts")
        )
        purch = ev.filter(F.col("event_type") == "purchase")
        with_click = (
            purch.join(
                clicks,
                (F.col("user_id") == F.col("cu"))
                & (F.col("cts") <= F.col("ts"))
                & (
                    F.unix_micros(F.col("ts")) - F.unix_micros(F.col("cts"))
                    <= se.ATTRIBUTION_WINDOW_S * 1_000_000
                ),
                "left_semi",
            )
            .count()
        )
        df = se.stream_click_attribution(spark, SF)
        attributed = df.filter(F.col("attributed")).collect()
        assert len(attributed) == with_click
        for r in attributed:
            assert r.attributed_click_id is not None
            assert 0 <= r.lag_seconds <= se.ATTRIBUTION_WINDOW_S
            assert r.click_ts <= r.purchase_ts
        organic = df.filter(~F.col("attributed")).collect()
        for r in organic:
            assert r.attributed_click_id is None and r.lag_seconds is None

    def test_single_user_shuffle(self, spark):
        from dbsurveyor_spark.streaming import events as se

        plan = formatted_plan(se.stream_click_attribution(spark, SF))
        assert plan.count("Exchange (") == 1, plan
        assert_no_python_eval(se.stream_click_attribution(spark, SF))


class TestCopurchaseGraphCache:
    """The memoized co-purchase edge+degree build (VERDICT r5 item 6):
    one build per (app, lake, fingerprint), shared by the graph trio,
    evicted when a different lake is requested."""

    def test_same_lake_returns_same_cached_frames(self, spark):
        from dbsurveyor_spark.operators import graph

        h1, d1 = graph.copurchase_graph(spark, SF)
        h2, d2 = graph.copurchase_graph(spark, SF)
        assert h1 is h2 and d1 is d2
        assert h1.storageLevel.useMemory and d1.storageLevel.useMemory

    def test_different_lake_evicts_previous(self, spark):
        from dbsurveyor_spark.operators import graph

        h_small, _ = graph.copurchase_graph(spark, SF)
        graph.copurchase_graph(spark, "/root/testdata/sf0.01")
        assert len(graph._GRAPH_CACHE) == 1  # old entry evicted
        h_again, _ = graph.copurchase_graph(spark, SF)
        assert h_again is not h_small  # rebuilt after eviction

    def test_degrees_match_edge_counts(self, spark):
        from collections import Counter

        from dbsurveyor_spark.operators import graph

        half, deg = graph.copurchase_graph(spark, SF)
        counts = Counter()
        for r in half.collect():
            counts[r.a] += 1
            counts[r.b] += 1
        got = {r.v: r.deg for r in deg.collect()}
        assert got == dict(counts)

    def test_support_counts_co_orders(self, spark):
        """half.support = number of distinct orders containing both
        endpoints (per-order baskets emit each pair at most once)."""
        from collections import Counter

        from dbsurveyor_spark.operators import graph
        from dbsurveyor_spark.catalog import load_table

        half, _ = graph.copurchase_graph(spark, SF)
        lines = (
            load_table(spark, SF, "lineitem")
            .select("l_orderkey", "l_partkey")
            .distinct()
            .collect()
        )
        baskets = {}
        for r in lines:
            baskets.setdefault(r.l_orderkey, set()).add(r.l_partkey)
        want = Counter()
        for parts in baskets.values():
            ps = sorted(parts)
            for i, x in enumerate(ps):
                for y in ps[i + 1 :]:
                    want[(x, y)] += 1
        got = {(r.a, r.b): r.support for r in half.collect()}
        assert got == dict(want)


class TestConnectedComponents:
    """graph_connected_components invariants (operators/graph.py)."""

    def test_partitions_part_universe(self, spark):
        from dbsurveyor_spark.catalog import load_table
        from dbsurveyor_spark.operators import graph

        out = graph.graph_connected_components(spark, SF).collect()
        n_parts = load_table(spark, SF, "part").count()
        assert sum(r.n_nodes for r in out) == n_parts

    def test_edge_totals_and_singletons(self, spark):
        from pyspark.sql import functions as F

        from dbsurveyor_spark.operators import graph

        out = graph.graph_connected_components(spark, SF).collect()
        half, _ = graph.copurchase_graph(spark, SF)
        n_backbone = half.filter(
            F.col("support") >= graph.CC_MIN_SUPPORT
        ).count()
        assert sum(r.n_edges for r in out) == n_backbone
        for r in out:
            if r.n_nodes == 1:
                assert r.n_edges == 0
            else:
                # connectivity floor: a component of k nodes has ≥ k-1 edges
                assert r.n_edges >= r.n_nodes - 1


class TestPageRank:
    """Fixed-point PageRank invariants (operators/graph.py)."""

    def test_mass_and_teleport_floor(self, spark):
        from dbsurveyor_spark.operators import graph

        rows = graph.graph_pagerank_parts(spark, SF).collect()
        n = len(rows)
        assert n > 0
        teleport = (graph.TELE_NUM * graph.PR_SCALE) // (graph.DAMP_DEN * n)
        total = sum(r.rank_scaled for r in rows)
        # floor divisions only ever LOSE mass: total ≤ SCALE, and every
        # node keeps at least the teleport term
        assert total <= graph.PR_SCALE
        assert total >= graph.PR_SCALE * 0.98
        assert all(r.rank_scaled >= teleport for r in rows)

    def test_hub_ranks_above_isolated(self, spark):
        from dbsurveyor_spark.catalog import load_table
        from dbsurveyor_spark.operators import graph

        ranks = {
            r.part_id: r.rank_scaled
            for r in graph.graph_pagerank_parts(spark, SF).collect()
        }
        lines = (
            load_table(spark, SF, "lineitem")
            .select("l_partkey")
            .groupBy("l_partkey")
            .count()
            .collect()
        )
        ordered_parts = {r.l_partkey for r in lines}
        isolated = set(ranks) - ordered_parts
        n = len(ranks)
        teleport = (graph.TELE_NUM * graph.PR_SCALE) // (graph.DAMP_DEN * n)
        # isolated parts sit exactly at the teleport floor
        for p in isolated:
            assert ranks[p] == teleport
        # the most-ordered part outranks every isolated one
        hub = max(lines, key=lambda r: r["count"]).l_partkey
        assert ranks[hub] > teleport

    def test_iteration_join_never_broadcasts_ranks(self, spark):
        """The per-iteration rank join must be a shuffled hash join: an
        O(|V|) rank broadcast OOMs at 100× scale (VERDICT r4 #1)."""
        from dbsurveyor_spark.catalog import load_table
        from dbsurveyor_spark.operators import graph

        adj = (
            load_table(spark, SF, "part")
            .select(F.col("p_partkey").alias("src"))
            .withColumn("nbrs", F.array(F.col("src") + 1))
            .withColumn("deg", F.lit(1).cast("bigint"))
            .repartition(4, "src")
        )
        ranks = adj.select(
            F.col("src").alias("node"), F.lit(10**9).alias("r")
        )
        plan = formatted_plan(graph._pagerank_step(adj, ranks, 123))
        assert "ShuffledHashJoin" in plan, plan
        assert "BroadcastExchange" not in plan, plan

    def test_lineage_truncated_no_python(self, spark):
        from dbsurveyor_spark.operators import graph

        df = graph.graph_pagerank_parts(spark, SF)
        plan = formatted_plan(df)
        # each iteration ends in a localCheckpoint, so the FINAL plan reads
        # the last checkpoint, not a 5-iteration join tree (the §6
        # iterative-lineage doctrine; also keeps every per-round broadcast
        # a materialized |V|-row frame instead of a deepening subplan).
        # The only join left is the one-shot isolated-node anti join.
        assert "Scan ExistingRDD" in plan, plan
        joins = [ln for ln in plan.splitlines() if "Join" in ln and "(" in ln]
        assert len({j.strip() for j in joins}) <= 2, plan
        assert_no_python_eval(df)


class TestKnnGraphAndFixedSample:
    def test_knn_graph_shape_and_symmetrizable(self, spark):
        from dbsurveyor_spark.operators import similarity

        rows = similarity.knn_graph(spark, SF).collect()
        assert rows
        by_src = {}
        for r in rows:
            assert r.src_id != r.dst_id
            assert -1.0 <= r.cos_sim <= 1.0
            by_src.setdefault(r.src_id, []).append(r)
        for src, nbrs in by_src.items():
            ranks = sorted(n.rank for n in nbrs)
            assert ranks == list(range(1, len(nbrs) + 1))
            assert len(nbrs) <= similarity.KNN_K
            # ranks ordered by descending cosine
            ordered = sorted(nbrs, key=lambda n: n.rank)
            sims = [n.cos_sim for n in ordered]
            assert sims == sorted(sims, reverse=True)

    def test_knn_graph_agrees_with_probe_search(self, spark):
        # for the probe vectors, knn_graph must contain ann_ivf_topk's
        # neighbors (same index, same nprobe; knn keeps more per src)
        from dbsurveyor_spark.operators import similarity

        ivf = {
            (r.query_id, r.neighbor_id, r.rank)
            for r in similarity.ann_ivf_topk(spark, SF).collect()
        }
        knn = {
            (r.src_id, r.dst_id, r.rank)
            for r in similarity.knn_graph(spark, SF).collect()
        }
        assert similarity.IVF_K <= similarity.KNN_K
        assert ivf <= knn

    def test_sq8_error_bound_and_recall(self, spark):
        """SQ8 scores obey the mid-rise quantizer's analytic error bound
        |⟨q,x̂⟩ − ⟨q,x⟩| ≤ Σ_d |q_d|·Δ_d/512, and the search still finds
        most exact top-k neighbors (compression is mild at 8 bits)."""
        from dbsurveyor_spark.catalog import load_table
        from dbsurveyor_spark.operators import similarity

        emb = {
            r.vec_id: list(r.embedding)
            for r in load_table(spark, SF, "embeddings").collect()
        }
        dim = len(next(iter(emb.values())))
        mins = [min(v[i] for v in emb.values()) for i in range(dim)]
        deltas = [
            max(v[i] for v in emb.values()) - mins[i] for i in range(dim)
        ]
        rows = similarity.ann_sq8_topk(spark, SF).collect()
        assert rows
        per_q = {}
        for r in rows:
            q, x = emb[r.query_id], emb[r.neighbor_id]
            exact = sum(a * b for a, b in zip(q, x))
            bound = sum(abs(q[i]) * deltas[i] / 512.0 for i in range(dim))
            assert abs(r.score_sq - exact) <= bound + 1e-9
            per_q.setdefault(r.query_id, set()).add(r.neighbor_id)
        # recall vs exact inner-product top-k
        hits = total = 0
        for qid, got in per_q.items():
            q = emb[qid]
            exact_top = sorted(
                ((sum(a * b for a, b in zip(q, v)), -vid) for vid, v in emb.items() if vid != qid),
                reverse=True,
            )[: similarity.IVF_K]
            exact_ids = {-t[1] for t in exact_top}
            hits += len(got & exact_ids)
            total += similarity.IVF_K
        assert hits / total >= 0.8

    def test_triangle_count_matches_bruteforce(self, spark):
        """Edge-iterator triangle counts equal a brute-force Python count
        over the same co-purchase graph, and the plan never shuffles a
        wedge stream (adjacency sides broadcast)."""
        from itertools import combinations

        from dbsurveyor_spark.catalog import load_table
        from dbsurveyor_spark.operators import graph

        df = graph.graph_triangle_count(spark, SF)
        rows = df.collect()
        assert 0 < len(rows) <= graph.TRI_TOP_K
        # brute force on the collected small-SF graph
        lines = (
            load_table(spark, SF, "lineitem")
            .select("l_orderkey", "l_partkey")
            .collect()
        )
        baskets = {}
        for r in lines:
            baskets.setdefault(r.l_orderkey, set()).add(r.l_partkey)
        adj = {}
        for parts in baskets.values():
            for a, b in combinations(sorted(parts), 2):
                adj.setdefault(a, set()).add(b)
                adj.setdefault(b, set()).add(a)
        tri = {}
        for v, nb in adj.items():
            nbl = sorted(nb)
            c = sum(
                1
                for i, x in enumerate(nbl)
                for y in nbl[i + 1 :]
                if y in adj.get(x, ())
            )
            if c:
                tri[v] = c
        expect = sorted(
            ((v, c) for v, c in tri.items()), key=lambda t: (-t[1], t[0])
        )[: graph.TRI_TOP_K]
        got = [(r.node, r.tri_count) for r in rows]
        assert got == expect
        for r in rows:
            assert r.deg >= 2
            assert r.tri_count <= r.deg * (r.deg - 1) // 2
            assert 0 < r.clustering <= 1.0
        plan = formatted_plan(df)
        assert plan.count("BroadcastHashJoin") >= 2, plan

    def test_incremental_profile_merge_equals_recompute(self, spark):
        """Merged hist⊕delta state must equal a direct full-scan profile,
        with both KMV branches live (low-cardinality column exact,
        high-cardinality column estimated)."""
        from dbsurveyor_spark.catalog import load_table
        from dbsurveyor_spark.survey import profile as prof

        rows = {
            r.column_name: r
            for r in prof.survey_incremental_profile(spark, SF).collect()
        }
        assert set(rows) == set(prof.INCR_COLUMNS)
        li = load_table(spark, SF, "lineitem")
        n = li.count()
        for c, r in rows.items():
            # the split is non-degenerate: both sides carry real rows
            assert r.rows_hist > 0 and r.rows_delta > 0
            assert r.rows_hist + r.rows_delta == r.rows_total == n
            direct = li.agg(
                F.min(c).alias("mn"),
                F.max(c).alias("mx"),
                F.sum(F.col(c).cast("decimal(30,6)")).cast("double").alias("s"),
                F.count_distinct(F.col(c)).alias("nd"),
            ).collect()[0]
            assert r.min_val == round(float(direct.mn), 6)
            assert r.max_val == round(float(direct.mx), 6)
            assert abs(r.sum_val - direct.s) < 0.01
            # KMV: exact below K, estimate within ~3/sqrt(K) above
            if direct.nd < prof.INCR_KMV_K:
                assert r.kmv_distinct_est == float(direct.nd)
            else:
                assert abs(r.kmv_distinct_est - direct.nd) / direct.nd < 0.45
        # both sketch branches are genuinely exercised at this SF
        nd_by_col = {
            c: li.agg(F.count_distinct(F.col(c))).collect()[0][0]
            for c in prof.INCR_COLUMNS
        }
        assert any(v < prof.INCR_KMV_K for v in nd_by_col.values())
        assert any(v >= prof.INCR_KMV_K for v in nd_by_col.values())

    def test_dsir_selects_target_like_pool_docs(self, spark):
        """DSIR semantics: only raw-pool (non-target-source) docs are
        selected, exactly K of them, scores finite and ranked; and the
        score genuinely separates — selected docs must average a higher
        importance ratio than the pool at large."""
        from dbsurveyor_spark.catalog import load_table
        from dbsurveyor_spark.survey import sampling

        df = sampling.sample_importance_dsir(spark, SF)
        rows = df.collect()
        assert len(rows) == sampling.DSIR_SELECT_K
        target_docs = {
            r.doc_id
            for r in load_table(spark, SF, "documents")
            .filter(F.col("source").isin(*sampling.DSIR_TARGET_SOURCES))
            .collect()
        }
        assert target_docs
        sel_ids = {r.doc_id for r in rows}
        assert not sel_ids & target_docs, "target docs must never be selected"
        import math

        for r in rows:
            assert math.isfinite(r.dsir_logw) and math.isfinite(r.avg_log_ratio)
            assert r.n_features > 0
        # selection pressure: the chosen K sit strictly above the pool mean
        scores = sorted((r.avg_log_ratio for r in rows), reverse=True)
        assert scores[0] >= scores[-1]
        # plan: TakeOrderedAndProject selection, model joins broadcast,
        # everything JVM-side
        plan = formatted_plan(df)
        assert "TakeOrderedAndProject" in plan, plan
        assert_broadcast_join(df, at_least=2)
        assert_no_python_eval(df)

    def test_fixed_size_sample_exact_n_and_stable(self, spark):
        from dbsurveyor_spark.catalog import load_table
        from dbsurveyor_spark.survey import sampling

        df = sampling.sample_fixed_size_orders(spark, SF)
        rows = df.collect()
        n_orders = load_table(spark, SF, "orders").count()
        assert len(rows) == min(sampling.FIXED_N, n_orders)
        assert df.columns == load_table(spark, SF, "orders").columns
        # deterministic: second run identical
        again = sampling.sample_fixed_size_orders(spark, SF).collect()
        assert {r.o_orderkey for r in rows} == {r.o_orderkey for r in again}
        # plan: TakeOrderedAndProject, not a global Sort
        plan = formatted_plan(df)
        assert "TakeOrderedAndProject" in plan, plan

    def test_fixed_size_sample_growth_overlap(self, spark):
        # adding rows only displaces a bounded fraction of the sample —
        # the hash-order property (vs ORDER BY RANDOM(), which reshuffles
        # everything): sample at sf0.001 ∩ sample over the half-corpus
        from dbsurveyor_spark.catalog import load_table
        from dbsurveyor_spark.functions.hashing import portable_hash64
        from dbsurveyor_spark.survey import sampling

        full = {
            r.o_orderkey
            for r in sampling.sample_fixed_size_orders(spark, SF).collect()
        }
        orders = load_table(spark, SF, "orders")
        half = (
            orders.filter(F.col("o_orderkey") % 2 == 0)
            .withColumn("k", portable_hash64(F.col("o_orderkey")))
            .orderBy("k", "o_orderkey")
            .limit(sampling.FIXED_N)
        )
        half_keys = {r.o_orderkey for r in half.collect()}
        # every even key in the full sample survives in the half sample
        assert {k for k in full if k % 2 == 0} <= half_keys


class TestActiveUsersAndRfm:
    def test_active_users_invariants(self, spark):
        from dbsurveyor_spark.operators import funnel

        rows = funnel.active_users_report(spark, SF).collect()
        assert rows
        for r in rows:
            # dau ≤ wau ≤ mau, stickiness in (0, 1]
            assert 1 <= r.dau <= r.wau <= r.mau
            assert 0 < r.stickiness <= 1
        # spot-check one day's DAU against a direct count
        from dbsurveyor_spark.catalog import load_table

        ev = load_table(spark, SF, "events")
        day = rows[len(rows) // 2].day
        direct = (
            ev.filter(F.to_date("ts") == day)
            .select("user_id")
            .distinct()
            .count()
        )
        assert next(r.dau for r in rows if r.day == day) == direct

    def test_rfm_scores_partition_customers(self, spark):
        from dbsurveyor_spark.catalog import load_table
        from dbsurveyor_spark.operators import relational

        rows = relational.rfm_segmentation(spark, SF).collect()
        n_cust_with_orders = (
            load_table(spark, SF, "orders")
            .select("o_custkey")
            .distinct()
            .count()
        )
        assert len(rows) == n_cust_with_orders
        import collections

        rc = collections.Counter(r.r_score for r in rows)
        for r in rows:
            assert 1 <= r.r_score <= 5
            assert 1 <= r.f_score <= 5
            assert 1 <= r.m_score <= 5
            assert r.segment == f"{r.r_score}{r.f_score}{r.m_score}"
            assert r.recency_days >= 0
        # fence bucketing spreads mass over several score buckets
        assert len(rc) >= 3

    def test_rfm_no_global_sort(self, spark):
        from dbsurveyor_spark.operators import relational

        plan = formatted_plan(relational.rfm_segmentation(spark, SF))
        # scale guarantee: no Window (ntile) and no global Sort stage
        assert "Window" not in plan, plan
        assert "Sort" not in plan.split("AdaptiveSparkPlan")[0], plan


class TestEntropyOutliersDateGaps:
    def test_char_entropy_flags_injected_junk(self, spark):
        from dbsurveyor_spark.operators import textstats

        rows = textstats.text_char_entropy(spark, SF).collect()
        flagged = {r.doc_id for r in rows if r.is_low_entropy}
        injected = {r.doc_id for r in rows if r.doc_id % 13 == 0}
        assert flagged == injected and flagged
        import math

        for r in rows:
            assert -1e-9 <= r.char_entropy <= math.log(27) + 1e-9
            if r.doc_id % 13 != 0:
                # natural word-soup text sits well above the gate
                assert r.char_entropy > 2.5

    def test_char_entropy_zero_exchanges(self, spark):
        from dbsurveyor_spark.operators import textstats

        plan = formatted_plan(textstats.text_char_entropy(spark, SF))
        assert "Exchange" not in plan
        assert_no_python_eval(textstats.text_char_entropy(spark, SF))

    def test_outlier_report_surfaces_spikes(self, spark):
        from dbsurveyor_spark.survey import quality

        rows = quality.quality_outlier_report(spark, SF).collect()
        assert len(rows) == quality.OUTLIER_TOP_K
        spiked = [r for r in rows if r.row_id % quality.OUTLIER_SPIKE_MOD == 0]
        # every planted spike inside the window ranks above natural rows
        assert spiked and rows[0].row_id % quality.OUTLIER_SPIKE_MOD == 0
        zs = [abs(r.z_score) for r in rows]
        assert zs == sorted(zs, reverse=True)
        plan = formatted_plan(quality.quality_outlier_report(spark, SF))
        assert "TakeOrderedAndProject" in plan, plan

    def test_date_gaps_catch_injected_13ths(self, spark):
        from dbsurveyor_spark.survey import profile

        gaps = {r.gap_date for r in profile.survey_date_gaps(spark, SF).collect()}
        assert gaps
        # every 13th inside the span must be a gap
        thirteenths = {g for g in gaps if g.endswith("-13")}
        assert thirteenths
        # all gaps are inside the span and none on a day with kept orders
        from dbsurveyor_spark.catalog import load_table

        kept_days = {
            str(r.d)
            for r in load_table(spark, SF, "orders")
            .filter(F.dayofmonth("o_orderdate") != 13)
            .select(F.to_date("o_orderdate").alias("d"))
            .distinct()
            .collect()
        }
        assert not (gaps & kept_days)


class TestFilteredSearch:
    def test_prefilter_respects_predicate_and_k(self, spark):
        from dbsurveyor_spark.catalog import load_table
        from dbsurveyor_spark.operators import similarity

        rows = similarity.ann_filtered_search(spark, SF).collect()
        assert rows
        even = {
            r.vec_id
            for r in load_table(spark, SF, "embeddings")
            .filter(F.col("label") % 2 == 0)
            .select("vec_id")
            .collect()
        }
        for r in rows:
            assert r.neighbor_id in even
            assert 1 <= r.rank <= similarity.FILTER_K

    def test_postfilter_underreturns_prefilter_doesnt(self, spark):
        # the bug this operator avoids: filtering AFTER a fixed-k search
        # returns a SUBSET of the pre-filtered results (and typically
        # fewer than k) — pre-filter keeps full k among eligible vectors.
        from dbsurveyor_spark.catalog import load_table
        from dbsurveyor_spark.operators import similarity

        even = {
            r.vec_id
            for r in load_table(spark, SF, "embeddings")
            .filter(F.col("label") % 2 == 0)
            .select("vec_id")
            .collect()
        }
        unfiltered = similarity.ann_ivf_topk(spark, SF).collect()
        post = {
            (r.query_id, r.neighbor_id)
            for r in unfiltered
            if r.neighbor_id in even
        }
        pre = {
            (r.query_id, r.neighbor_id)
            for r in similarity.ann_filtered_search(spark, SF).collect()
        }
        # same index, same probes: post-filter survivors that rank within
        # FILTER_K among eligible neighbors must appear in pre-filter
        assert post and pre
        missing = post - pre
        # any post-filter pair absent from pre must be beyond rank K among
        # eligible neighbors — impossible when IVF_K <= FILTER_K, so empty
        assert similarity.IVF_K <= similarity.FILTER_K
        assert not missing
        # and pre-filter finds pairs post-filtering cannot see
        assert pre - post


class TestSketches:
    def test_cm_never_undercounts(self, spark):
        from dbsurveyor_spark.operators import sketches

        rows = sketches.sketch_cm_heavy_hitters(spark, SF).collect()
        assert len(rows) == sketches.CM_TOP_K
        for r in rows:
            assert r.cm_estimate >= r.true_count
            assert r.overestimate == r.cm_estimate - r.true_count

    def test_bloom_no_false_negatives(self, spark):
        from dbsurveyor_spark.operators import sketches

        rows = sketches.sketch_bloom_membership(spark, SF).collect()
        assert rows
        fn = [r for r in rows if r.in_set and not r.bloom_pass]
        assert not fn, "Bloom filters cannot have false negatives"
        # false-positive rate stays near theory: (1-e^{-kn/m})^k
        import math

        n = sum(1 for r in rows if r.in_set)
        fp = sum(1 for r in rows if not r.in_set and r.bloom_pass)
        non = sum(1 for r in rows if not r.in_set)
        theory = (1 - math.exp(-sketches.BLOOM_K * n / sketches.BLOOM_M)) ** (
            sketches.BLOOM_K
        )
        assert fp / max(non, 1) <= max(5 * theory, 0.05)

    def test_bloom_probe_side_never_shuffles_wide(self, spark):
        from dbsurveyor_spark.operators import sketches

        plan = formatted_plan(sketches.sketch_bloom_membership(spark, SF))
        assert "BroadcastHashJoin" in plan, plan
        assert_no_python_eval(sketches.sketch_bloom_membership(spark, SF))

    def test_theta_set_ops_algebra(self, spark):
        """Theta set-op estimates obey the sketch algebra: retained counts
        decompose (|A∪B| retained ≥ each side's contribution, intersection +
        difference = A's retained), estimates track exact counts, and the
        estimator is genuinely approximate (saturated sketches at SF:
        retained < exact for union)."""
        from dbsurveyor_spark.operators import sketches

        rows = {r.set_op: r for r in sketches.sketch_theta_set_ops(spark, SF).collect()}
        assert set(rows) == {"union", "intersection", "a_only"}
        u, i, d = rows["union"], rows["intersection"], rows["a_only"]
        for r in rows.values():
            assert r.exact_count > 0
            assert r.retained >= 0
            assert r.theta_estimate >= 0
        # A's retained sample splits exactly into (∩B) + (not ∩B)
        assert i.retained + d.retained <= u.retained
        # exact set identities hold on the exact side
        assert i.exact_count + d.exact_count <= u.exact_count
        # sketches saturate at this SF → the union estimate is a real
        # estimate, not a passthrough of the exact count
        assert u.retained <= sketches.THETA_K * 2
        # relative error is bounded sanely for K=64 (CV ≈ 1/√K ≈ 12.5%)
        assert u.rel_error < 0.6


class TestLayoutAndJoinEstimate:
    def test_zorder_shrinks_both_extents(self, spark):
        from dbsurveyor_spark.operators import layout

        rows = {r.layout: r for r in layout.layout_zorder_stats(spark, SF).collect()}
        nat, zo = rows["natural"], rows["zorder"]
        assert nat.n_rows == zo.n_rows > 0
        # natural (orderkey) order: each bucket spans ~the full range of
        # BOTH clustering dims (orderkey is uncorrelated with either)
        assert nat.avg_custkey_extent > 0.8
        assert nat.avg_date_extent > 0.8
        # z-order: both extents shrink materially — min/max pruning works
        assert zo.avg_custkey_extent < 0.5 * nat.avg_custkey_extent
        assert zo.avg_date_extent < 0.5 * nat.avg_date_extent

    def test_join_estimate_reasonable_and_exact_true(self, spark):
        from dbsurveyor_spark.catalog import load_table
        from dbsurveyor_spark.operators import layout

        rows = {r.edge: r for r in layout.join_size_estimate(spark, SF).collect()}
        o = load_table(spark, SF, "orders")
        li = load_table(spark, SF, "lineitem")
        true_ol = o.join(li, o.o_orderkey == li.l_orderkey).count()
        assert rows["orders_lineitem"].true_size == true_ol
        # 1/20 KEY sampling: fine at real key counts, crude at sf0.001's
        # ~150-key customer edge — bound loosely here; the oracle equality
        # (exact same sample both engines) is the real correctness gate.
        for r in rows.values():
            assert r.estimated_size >= 0
            assert r.rel_error <= 1.0
        assert rows["orders_lineitem"].rel_error < 0.5


class TestDriftAndStreaks:
    def test_categorical_drift_fires_on_injected_rename(self, spark):
        from dbsurveyor_spark.survey import quality

        row = quality.quality_categorical_drift(spark, SF).collect()[0]
        assert row.drift_detected
        assert row.chi_square > row.critical_05 > 0
        assert row.n_categories >= 4

    def test_streaks_consistent_with_activity(self, spark):
        from dbsurveyor_spark.catalog import load_table
        from dbsurveyor_spark.operators import funnel

        rows = funnel.user_activity_streaks(spark, SF).collect()
        assert rows
        # recompute one user's streaks in python
        ev = load_table(spark, SF, "events").select(
            "user_id", F.to_date("ts").alias("d")
        ).distinct().collect()
        import collections, datetime

        days = collections.defaultdict(set)
        for r in ev:
            days[r.user_id].add(r.d)
        last_day = max(max(s) for s in days.values())
        for r in rows:
            ds = sorted(days[r.user_id])
            assert r.active_days == len(ds)
            longest = cur = 1
            for a, b in zip(ds, ds[1:]):
                cur = cur + 1 if (b - a).days == 1 else 1
                longest = max(longest, cur)
            assert r.longest_streak == longest
            # current streak: run ending on the feed's last day
            if ds[-1] == last_day:
                assert r.current_streak == cur if len(ds) > 1 else 1
            else:
                assert r.current_streak == 0


class TestPmiAndEmbeddingDrift:
    def test_pmi_rank_and_bounds(self, spark):
        from dbsurveyor_spark.operators import textstats

        rows = textstats.text_cooccurrence_pmi(spark, SF).collect()
        assert 0 < len(rows) <= textstats.PMI_TOP_K
        npmis = [r.npmi for r in rows]
        assert npmis == sorted(npmis, reverse=True)
        for r in rows:
            assert -1 - 1e-9 <= r.npmi <= 1 + 1e-9
            assert r.support >= textstats.PMI_MIN_SUPPORT
            assert r.tok_a < r.tok_b

    def test_embedding_drift_fires_on_injected_scale(self, spark):
        from dbsurveyor_spark.operators import similarity

        row = similarity.embedding_drift_psi(spark, SF).collect()[0]
        assert row.drift_detected
        assert row.psi > similarity.EMB_DRIFT_T
        assert row.n_cells >= 3


class TestYoY:
    def test_yoy_arithmetic_and_nulls(self, spark):
        from dbsurveyor_spark.operators import relational

        rows = sorted(
            relational.window_yoy_revenue(spark, SF).collect(),
            key=lambda r: r.month,
        )
        assert rows
        by_month = {r.month: r for r in rows}
        for r in rows:
            y, m = r.month.split("-")
            prior = f"{int(y) - 1}-{m}"
            if prior in by_month:
                assert r.revenue_prior_year == by_month[prior].revenue
                expect = (
                    (r.revenue - r.revenue_prior_year)
                    / r.revenue_prior_year
                    * 100.0
                )
                assert abs(r.yoy_pct - expect) < 1e-4
            else:
                assert r.revenue_prior_year is None and r.yoy_pct is None


class TestKmv:
    def test_kmv_accuracy_and_exact_fallback(self, spark):
        from dbsurveyor_spark.operators import sketches

        rows = {
            (r.table_name, r.column_name): r
            for r in sketches.sketch_kmv_distinct(spark, SF).collect()
        }
        assert len(rows) == 3
        for r in rows.values():
            assert r.exact_distinct > 0
            # KMV standard error ~1/sqrt(K-2): generous 6-sigma bound
            import math

            bound = 6.0 / math.sqrt(sketches.KMV_K - 2)
            if r.exact_distinct <= sketches.KMV_K:
                # fewer distincts than K: sketch degenerates to exact
                assert r.kmv_estimate == float(r.exact_distinct)
                assert r.rel_error == 0.0
            else:
                assert r.rel_error <= bound


class TestMalformedJson:
    def test_counts_match_injection(self, spark):
        from dbsurveyor_spark.catalog import load_table
        from dbsurveyor_spark.survey import quality

        rows = quality.quality_malformed_json(spark, SF).collect()
        assert rows
        total_bad = sum(r.malformed for r in rows)
        expect = (
            load_table(spark, SF, "events")
            .filter(
                (F.col("event_id") % quality.DLQ_MOD == 0)
                & F.col("props").isNotNull()
            )
            .count()
        )
        assert total_bad == expect > 0
        for r in rows:
            assert 0 <= r.malformed <= r.events
            assert abs(r.malformed_rate - r.malformed / r.events) < 1e-9


class TestPackingStats:
    def test_packing_bounds(self, spark):
        from dbsurveyor_spark.operators import pipeline as pl

        rows = {r.context_len: r for r in pl.corpus_packing_stats(spark, SF).collect()}
        assert set(rows) == set(pl.PACK_CONTEXT_LENS)
        for L, r in rows.items():
            assert 0 < r.naive_utilization <= 1
            assert 0 < r.packed_utilization <= 1
            # packing can only improve utilization
            assert r.packed_utilization >= r.naive_utilization - 1e-9
            assert r.packed_rows_lower_bound * L >= r.total_tokens
            assert (r.packed_rows_lower_bound - 1) * L < r.total_tokens
        # longer context → fewer overlong docs
        ls = sorted(rows)
        for a, b in zip(ls, ls[1:]):
            assert rows[a].overlong_docs >= rows[b].overlong_docs


class TestPeakConcurrency:
    def test_peak_matches_bruteforce_sweep(self, spark):
        from dbsurveyor_spark.streaming import events as se

        got = {r.day: r.peak_concurrency for r in
               se.stream_peak_concurrency(spark, SF).collect()}
        assert got
        sessions = se.stream_sessionization(spark, SF).select(
            "session_start", "session_end"
        ).collect()
        deltas = sorted(
            [(r.session_start, 1) for r in sessions]
            + [(r.session_end, -1) for r in sessions],
            key=lambda x: (x[0], x[1]),
        )
        run, peaks = 0, {}
        for t, d in deltas:
            run += d
            day = t.strftime("%Y-%m-%d")
            peaks[day] = max(peaks.get(day, -10**9), run)
        assert got == peaks
        # a day whose only deltas are prior-day sessions ENDING can peak
        # as low as the post-drop level; concurrency itself never < 0
        assert all(v >= 0 for v in got.values())
        assert max(got.values()) >= 1


class TestAbcAndVocabGrowth:
    def test_abc_partition_and_order(self, spark):
        from dbsurveyor_spark.operators import relational

        rows = {r.abc_class: r for r in
                relational.abc_part_classification(spark, SF).collect()}
        assert set(rows) == {"A", "B", "C"}
        total_share = sum(r.revenue_share for r in rows.values())
        assert abs(total_share - 1.0) < 1e-6
        # Pareto: A has fewer parts than C but more revenue
        assert rows["A"].n_parts < rows["C"].n_parts or rows["A"].class_revenue > rows["C"].class_revenue
        assert rows["A"].revenue_share >= 0.75

    def test_vocab_growth_monotone_and_exact_at_ends(self, spark):
        from dbsurveyor_spark.catalog import load_table
        from dbsurveyor_spark.operators import textstats
        from dbsurveyor_spark.functions.text import tokens

        rows = sorted(
            textstats.text_vocab_growth(spark, SF).collect(),
            key=lambda r: r.level,
        )
        assert [r.level for r in rows] == list(
            range(1, textstats.VOCAB_LEVELS + 1)
        )
        sizes = [r.vocab_size for r in rows]
        assert sizes == sorted(sizes)
        docs_counts = [r.n_docs for r in rows]
        assert docs_counts == sorted(docs_counts)
        # level L == full corpus: exact distinct tokens and doc count
        full_vocab = (
            load_table(spark, SF, "documents")
            .select(F.explode(tokens(F.col("text"))).alias("t"))
            .select("t")
            .distinct()
            .count()
        )
        assert sizes[-1] == full_vocab
        assert docs_counts[-1] == load_table(spark, SF, "documents").count()


class TestZipfAndBots:
    def test_zipf_slope_negative(self, spark):
        from dbsurveyor_spark.operators import textstats

        row = textstats.text_zipf_fit(spark, SF).collect()[0]
        assert row.vocab_size > 0
        # frequencies strictly decrease with rank → negative slope
        assert row.zipf_slope < 0
        assert row.log_intercept > 0

    def test_bot_flagged_exactly_injected(self, spark):
        from dbsurveyor_spark.streaming import events as se

        rows = se.events_bot_detection(spark, SF).collect()
        bots = {r.user_id for r in rows if r.is_bot}
        assert bots == {se.BOT_USER_ID}
        bot = next(r for r in rows if r.user_id == se.BOT_USER_ID)
        assert bot.gap_cv <= se.BOT_MAX_CV
        assert bot.n_events >= se.BOT_MIN_EVENTS
        organic = [r for r in rows if r.user_id != se.BOT_USER_ID]
        # organic users are bursty: median CV well above the gate
        import statistics

        cvs = [r.gap_cv for r in organic if r.gap_cv is not None]
        assert statistics.median(cvs) > se.BOT_MAX_CV


class TestConstraintSuggestions:
    def test_suggestions_hold_on_the_data(self, spark):
        from dbsurveyor_spark.catalog import load_table
        from dbsurveyor_spark.survey import profile

        rows = profile.survey_constraint_suggestions(spark, SF).collect()
        assert rows
        by_col = {(r.table_name, r.column_name): r for r in rows}
        # no nulls in TPC-H-style columns → NOT NULL suggested everywhere
        for r in rows:
            assert r.not_null is not None and "IS NOT NULL" in r.not_null
            assert r.observed_range.startswith(f"{r.column_name} BETWEEN ")
            assert r.support > 0
        # tiny-domain columns carry IN-lists that actually hold
        st = by_col[("orders", "o_orderstatus")]
        assert st.value_domain is not None
        inside = st.value_domain.split("(")[1].rstrip(")").split(",")
        actual = {
            x.o_orderstatus
            for x in load_table(spark, SF, "orders")
            .select("o_orderstatus")
            .distinct()
            .collect()
        }
        assert set(inside) == actual
        # high-cardinality numerics get NO IN-list
        assert by_col[("orders", "o_totalprice")].value_domain is None


class TestNprobeCurve:
    def test_recall_monotone_in_nprobe(self, spark):
        from dbsurveyor_spark.operators import similarity

        rows = sorted(
            similarity.ann_nprobe_curve(spark, SF).collect(),
            key=lambda r: r.nprobe,
        )
        assert [r.nprobe for r in rows] == list(similarity.NPROBE_CURVE)
        recalls = [r.mean_recall_at_k for r in rows]
        cands = [r.candidates for r in rows]
        # more cells probed → monotone candidates and recall
        assert cands == sorted(cands)
        assert all(a <= b + 1e-9 for a, b in zip(recalls, recalls[1:]))
        for r in rows:
            assert 0 <= r.mean_recall_at_k <= 1
            assert r.hits <= similarity.IVF_K * r.n_probes
        # the nprobe=2 point must agree with the standalone recall report
        rep = similarity.ann_recall_report(spark, SF).collect()
        mean_rep = sum(x.recall_at_k for x in rep) / len(rep)
        assert abs(rows[1].mean_recall_at_k - mean_rep) < 1e-4


class TestDedupEffect:
    def test_stages_shrink_monotonically(self, spark):
        rows = sorted(
            dedup.dedup_effect_report(spark, SF).collect(),
            key=lambda r: r.stage_order,
        )
        assert [r.stage for r in rows] == [
            "raw", "exact_dedup", "neardup_dedup"
        ]
        raw, exact, near = rows
        assert raw.docs > exact.docs >= near.docs
        assert raw.tokens > exact.tokens >= near.tokens
        assert raw.token_savings_vs_raw == 0.0
        assert 0 < exact.token_savings_vs_raw <= near.token_savings_vs_raw < 1
        # exact stage removes exactly the injected %10 clones
        n_clones = (
            dedup._corpus(spark, SF).count()
            - dedup.load_table(spark, SF, "documents").count()
        )
        assert raw.docs - exact.docs == n_clones


class TestSchemaVersionsAndChurn:
    def test_versions_mix_only_after_redeploy(self, spark):
        from dbsurveyor_spark.streaming import events as se

        rows = se.events_payload_schema_versions(spark, SF).collect()
        split = se.SCHEMA_V2_DATE[:10]
        before = [r for r in rows if r.day < split]
        after = [r for r in rows if r.day >= split]
        assert before and after
        assert all(not r.mixed_versions for r in before)
        assert all(r.mixed_versions for r in after)
        # shares per day sum to 1
        import collections

        by_day = collections.defaultdict(float)
        for r in rows:
            by_day[r.day] += r.share
        assert all(abs(v - 1.0) < 1e-6 for v in by_day.values())

    def test_churn_consistency(self, spark):
        from dbsurveyor_spark.catalog import load_table
        from dbsurveyor_spark.operators import relational

        rows = relational.customer_churn_flags(spark, SF).collect()
        n_cust = (
            load_table(spark, SF, "orders")
            .select("o_custkey")
            .distinct()
            .count()
        )
        assert len(rows) == n_cust
        for r in rows:
            assert r.churned == (r.days_since_last_order > relational.CHURN_DAYS)
            assert r.days_since_last_order >= 0 and r.n_orders >= 1
        # the watermark customer itself is never churned
        assert any(r.days_since_last_order == 0 for r in rows)


class TestHhi:
    def test_hhi_bounds_and_bands(self, spark):
        from dbsurveyor_spark.operators import relational

        rows = relational.supplier_concentration_hhi(spark, SF).collect()
        assert rows
        for r in rows:
            # 1/n ≤ HHI ≤ 1
            assert 1.0 / r.n_suppliers - 1e-9 <= r.hhi <= 1 + 1e-9
            expect = (
                "unconcentrated"
                if r.hhi < 0.15
                else ("moderate" if r.hhi < 0.25 else "concentrated")
            )
            assert r.band == expect


class TestPqRecallAndNullPatterns:
    def test_pq_recall_bounds(self, spark):
        from dbsurveyor_spark.operators import similarity

        rows = similarity.pq_recall_report(spark, SF).collect()
        assert len(rows) == similarity.N_PROBES
        for r in rows:
            assert 0 <= r.hits <= similarity.IVF_K
            # recall_at_k is rounded to 6 dp by the operator
            assert abs(r.recall_at_k - r.hits / similarity.IVF_K) < 1e-6

    def test_null_patterns_partition_rows(self, spark):
        from dbsurveyor_spark.catalog import load_table
        from dbsurveyor_spark.survey import quality

        rows = quality.quality_null_patterns(spark, SF).collect()
        n_cust = load_table(spark, SF, "customer").count()
        assert sum(r.n_rows for r in rows) == n_cust
        pats = {r.pattern: r.n_rows for r in rows}
        # all-present, acctbal-missing, segment-missing, both-missing
        assert set(pats) == {"111", "011", "101", "001"}
        # joint pattern matches the actual custkey range (keys are not
        # guaranteed 1-based)
        keys = [
            r.c_custkey
            for r in load_table(spark, SF, "customer")
            .select("c_custkey")
            .collect()
        ]
        assert pats["001"] == sum(
            1 for k in keys if k % 7 == 0 and k % 11 == 0
        )


class TestWinnowing:
    def test_clones_dominate_and_guarantee_holds(self, spark):
        rows = dedup.dedup_winnowing(spark, SF).collect()
        assert rows
        pairs = {(r.doc_a, r.doc_b): r.shared_fingerprints for r in rows}
        clones = [
            (d, d + dedup.ID_OFFSET)
            for d in range(0, 1_000, 10)
            if (d, d + dedup.ID_OFFSET) in pairs
        ]
        assert clones
        # identical docs share EVERY fingerprint — they must be the
        # highest-overlap pairs
        top = max(pairs.values())
        assert all(pairs[c] >= dedup.WINNOW_MIN_SHARED for c in clones)
        assert max(pairs[c] for c in clones) == top

    def test_fingerprints_subset_of_grams(self, spark):
        # winnowing only SELECTS existing gram hashes (min over a window)
        from pyspark.sql import functions as F2

        corpus = dedup._corpus(spark, SF)
        hrows = corpus.select(
            "doc_id",
            F2.posexplode(dedup.tokens(F2.col("text"))).alias("pos", "t"),
        ).select(
            "doc_id",
            "pos",
            F2.conv(F2.substring(F2.md5("t"), 1, 7), 16, 10)
            .cast("bigint")
            .alias("h"),
        )
        from pyspark.sql.window import Window as W2

        w = W2.partitionBy("doc_id").orderBy("pos")
        g = F2.col("h")
        for j in range(1, dedup.WINNOW_K):
            g = (g * dedup._SUB_BASE + F2.lead("h", j).over(w)) % dedup._SUB_MOD
        grams = {
            (r.doc_id, r.g)
            for r in hrows.select("doc_id", g.alias("g"))
            .filter(F2.col("g").isNotNull())
            .collect()
        }
        frame = w.rowsBetween(W2.currentRow, dedup.WINNOW_W - 1)
        fps = (
            hrows.select(
                "doc_id",
                F2.min(g).over(frame).alias("fp"),
                F2.lead(g, dedup.WINNOW_W - 1).over(w).alias("_l"),
            )
            .filter(F2.col("_l").isNotNull())
            .dropDuplicates(["doc_id", "fp"])
            .collect()
        )
        assert fps
        for r in fps:
            assert (r.doc_id, r.fp) in grams
        # winnowing compresses: far fewer fingerprints than grams
        assert len(fps) < 0.8 * len(grams)


class TestClusterSample:
    def test_ht_estimator_unbiased_shape(self, spark):
        """Every order-year appears, clusters are really sampled (≈π of
        orders), and the HT estimate tracks the truth within the tolerance
        a 10% cluster sample warrants on this data."""
        from dbsurveyor_spark.catalog import load_table
        from dbsurveyor_spark.survey import sampling

        rows = sampling.sample_cluster_orders(spark, SF).collect()
        years = {
            r.yr
            for r in load_table(spark, SF, "orders")
            .select(F.year("o_orderdate").alias("yr"))
            .distinct()
            .collect()
        }
        assert {r.order_year for r in rows} == years
        total_orders = load_table(spark, SF, "orders").count()
        n_sampled = sum(r.clusters_sampled for r in rows)
        frac = n_sampled / total_orders
        assert 0.5 * sampling.CLUSTER_PCT / 100 <= frac <= 2.0 * (
            sampling.CLUSTER_PCT / 100
        )
        for r in rows:
            assert r.true_revenue > 0
            if r.clusters_sampled > 0:
                # small-SF years have few clusters; bound loosely — the
                # oracle equality is the exactness gate, this pins sanity
                assert r.rel_error < 1.0


class TestNeymanAllocation:
    def test_shares_sum_and_optimality_direction(self, spark):
        """Both share columns sum to 1; the budget is conserved up to
        rounding; and Neyman shifts budget toward higher-variance strata
        relative to proportional allocation (the defining property)."""
        from dbsurveyor_spark.survey import sampling

        rows = sampling.sample_neyman_allocation(spark, SF).collect()
        assert len(rows) == 25
        assert abs(sum(r.neyman_share for r in rows) - 1.0) < 1e-3
        assert abs(sum(r.prop_share for r in rows) - 1.0) < 1e-3
        total = sum(r.allocated_n for r in rows)
        assert abs(total - sampling.NEYMAN_BUDGET) <= len(rows)
        # direction: among strata of ~equal size, the more variable one
        # must get at least as much budget
        by_sd = sorted(rows, key=lambda r: r.stddev_acctbal)
        lo, hi = by_sd[0], by_sd[-1]
        if abs(lo.n_rows - hi.n_rows) <= 0.2 * max(lo.n_rows, hi.n_rows):
            assert hi.neyman_share >= lo.neyman_share
        # ratio identity: neyman/prop == S_h / weighted-mean(S)
        for r in rows:
            assert r.allocated_n >= 0


class TestIvfSq:
    def test_ivfsq_tracks_ivf_flat_within_quantization(self, spark):
        """IVF-SQ8 searches the same probed cells as IVF-Flat, so its
        result set must heavily overlap IVF-Flat's (residual grids are
        fine at 8 bits), and every reported score must be within the
        analytic residual-quantization bound of the true inner product."""
        from dbsurveyor_spark.catalog import load_table
        from dbsurveyor_spark.operators import similarity

        sq = similarity.ann_ivfsq_topk(spark, SF).collect()
        flat = similarity.ann_ivf_topk(spark, SF).collect()
        assert sq and flat
        sq_pairs = {(r.query_id, r.neighbor_id) for r in sq}
        flat_pairs = {(r.query_id, r.neighbor_id) for r in flat}
        overlap = len(sq_pairs & flat_pairs) / len(flat_pairs)
        assert overlap >= 0.8, f"overlap {overlap}"
        # error bound: |score − ⟨q, x⟩| ≤ Σ_d |q_d|·Δ_d/512
        emb = {
            r.vec_id: list(r.embedding)
            for r in load_table(spark, SF, "embeddings").collect()
        }
        rmins, rdeltas = similarity.trained_residual_sq_bounds(spark, SF)
        for r in sq:
            q, x = emb[r.query_id], emb[r.neighbor_id]
            exact = sum(a * b for a, b in zip(q, x))
            bound = sum(
                abs(q[i]) * rdeltas[i] / 512.0 for i in range(len(q))
            )
            assert abs(r.score_ivfsq - exact) <= bound + 1e-9


class TestPitFeatures:
    def test_no_future_leakage_and_bruteforce_parity(self, spark):
        """Every feature must count only events strictly before the label
        timestamp — verified against a brute-force Python recomputation on
        the small SF — and the plan must be join-free (one window shuffle)."""
        from dbsurveyor_spark.catalog import load_table
        from dbsurveyor_spark.operators import funnel

        rows = funnel.events_pit_features(spark, SF).collect()
        assert rows
        ev = load_table(spark, SF, "events").select(
            "event_id", "user_id", "event_type", "ts"
        ).collect()
        by_user = {}
        for e in ev:
            by_user.setdefault(e.user_id, []).append(e)
        checked = 0
        for r in rows[:200]:
            hist = by_user[r.user_id]
            label = next(e for e in hist if e.event_id == r.event_id)
            for secs, lab in funnel.PIT_HORIZONS:
                for etype in ("view", "click"):
                    want = sum(
                        1
                        for e in hist
                        if e.event_type == etype
                        and e.ts < label.ts
                        and (label.ts - e.ts).total_seconds() <= secs
                    )
                    got = getattr(r, f"{etype}s_{lab}")
                    assert got == want, (r.event_id, etype, lab, got, want)
                    checked += 1
        assert checked > 0
        plan = formatted_plan(funnel.events_pit_features(spark, SF))
        assert "Join" not in plan, plan


class TestCompressionPareto:
    def test_pareto_invariants(self, spark):
        from dbsurveyor_spark.operators import similarity

        rows = {
            r.index_mode: r
            for r in similarity.ann_compression_pareto(spark, SF).collect()
        }
        assert set(rows) == {m[0] for m in similarity.PARETO_MODES}
        for r in rows.values():
            assert 0.0 <= r.min_recall <= r.mean_recall <= 1.0
            assert r.compression_x >= 1.0
        assert rows["ivf_flat"].compression_x == 1.0
        # full-scan SQ8 quantizes far finer than 16-code PQ: on this
        # deterministic data+model it must dominate PQ's recall
        assert rows["sq8"].mean_recall > rows["pq"].mean_recall
        # cell-restricted modes cannot beat their full-scan counterpart
        assert rows["ivf_sq8"].mean_recall <= rows["sq8"].mean_recall


class TestNewOpPlanShapes:
    def test_state_size_report_single_pass(self, spark):
        from dbsurveyor_spark.streaming import events as se

        df = se.stream_state_size_report(spark, SF)
        assert_no_python_eval(df)
        plan = formatted_plan(df)
        # one watermark broadcast + the conditional aggregate: the events
        # scan must appear a bounded number of times (per-branch reuse),
        # never once per sweep level
        assert plan.count("Scan parquet") <= 4, plan

    def test_watermark_curve_one_lateness_pass(self, spark):
        from dbsurveyor_spark.streaming import events as se

        df = se.stream_watermark_tuning_curve(spark, SF)
        assert_no_python_eval(df)
        plan = formatted_plan(df)
        # all sweep levels come from ONE conditional aggregate over one
        # lateness computation — scan count is independent of len(DELAYS)
        assert plan.count("Scan parquet") <= 2 * len(se.WATERMARK_DELAYS), plan

    def test_backlog_aging_broadcast_watermark(self, spark):
        from dbsurveyor_spark.operators import relational

        df = relational.orders_backlog_aging(spark, SF)
        assert_no_python_eval(df)
        # the 1-row watermark crossJoin plans as a broadcast NESTED-LOOP
        # join (no equi-keys) — broadcast is what matters, not the probe
        plan = formatted_plan(df)
        assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan, plan

    def test_row_width_stats_no_joins_no_python(self, spark):
        from dbsurveyor_spark.survey import profile as prof

        df = prof.survey_row_width_stats(spark, SF)
        assert_no_python_eval(df)
        plan = formatted_plan(df)
        assert "Join" not in plan, plan

    def test_theta_sketch_uses_take_ordered(self, spark):
        from dbsurveyor_spark.operators import sketches

        df = sketches.sketch_theta_set_ops(spark, SF)
        assert_no_python_eval(df)
        plan = formatted_plan(df)
        assert "TakeOrderedAndProject" in plan, plan

    def test_incremental_profile_kmv_take_ordered_not_window(self, spark):
        """The per-side KMV minima must plan as TakeOrderedAndProject —
        a row_number window over 2·columns partitions is a near-global
        sort at 100 TB (the scale-audit fix this test pins)."""
        from dbsurveyor_spark.survey import profile as prof

        plan = formatted_plan(prof.survey_incremental_profile(spark, SF))
        assert "TakeOrderedAndProject" in plan, plan


class TestBm25AndHybrid:
    """BM25 retrieval + RRF hybrid fusion semantics
    (operators/textstats.py / operators/similarity.py)."""

    def test_bm25_rank_contract(self, spark):
        from collections import defaultdict

        from dbsurveyor_spark.operators import textstats as T

        rows = T.text_bm25_search(spark, SF).collect()
        by_q = defaultdict(list)
        for r in rows:
            by_q[r.query_id].append(r)
        assert set(by_q) == set(T.BM25_QUERIES)
        for q, rs in by_q.items():
            rs.sort(key=lambda r: r.rank)
            assert [r.rank for r in rs] == list(range(1, len(rs) + 1))
            assert len(rs) <= T.BM25_TOP_K
            scores = [r.score for r in rs]
            assert scores == sorted(scores, reverse=True)
            assert all(s > 0 for s in scores)

    def test_bm25_matches_only_docs_with_query_terms(self, spark):
        from dbsurveyor_spark.catalog import load_table
        from dbsurveyor_spark.operators import textstats as T

        rows = T.text_bm25_search(spark, SF).collect()
        texts = {
            r.doc_id: set(r.text.split())
            for r in load_table(spark, SF, "documents").collect()
        }
        for r in rows:
            q_terms = set(T.BM25_QUERIES[r.query_id])
            assert texts[r.doc_id] & q_terms, (r.query_id, r.doc_id)

    def test_hybrid_rrf_arithmetic_and_rank(self, spark):
        from collections import defaultdict

        from dbsurveyor_spark.operators import similarity as S

        rows = S.ann_hybrid_search(spark, SF).collect()
        by_q = defaultdict(list)
        for r in rows:
            want = round(
                (1.0 / (S.RRF_K + r.lex_rank) if r.lex_rank else 0.0)
                + (1.0 / (S.RRF_K + r.vec_rank) if r.vec_rank else 0.0),
                9,
            )
            assert abs(r.rrf_score - want) < 1e-12, r
            assert r.lex_rank is None or 1 <= r.lex_rank <= S.HYBRID_C
            assert r.vec_rank is None or 1 <= r.vec_rank <= S.HYBRID_C
            by_q[r.query_id].append(r)
        assert set(by_q) == set(S.HYBRID_QUERIES)
        for q, rs in by_q.items():
            rs.sort(key=lambda r: r.rank)
            assert [r.rank for r in rs] == list(range(1, len(rs) + 1))
            assert len(rs) <= S.HYBRID_TOP_K
            vals = [r.rrf_score for r in rs]
            assert vals == sorted(vals, reverse=True)

    def test_bm25_no_python_eval(self, spark):
        from dbsurveyor_spark.operators import textstats as T

        assert_no_python_eval(T.text_bm25_search(spark, SF))


class TestGraphAnnSearch:
    """ann_graph_search (operators/similarity.py): beam-search invariants."""

    def test_result_contract_and_graph_reachability(self, spark):
        from collections import defaultdict

        from dbsurveyor_spark.operators import similarity as S

        rows = S.ann_graph_search(spark, SF).collect()
        by_q = defaultdict(list)
        for r in rows:
            assert r.neighbor_id != r.query_id
            by_q[r.query_id].append(r)
        assert set(by_q) <= set(range(S.GANN_N_QUERIES))
        for q, rs in by_q.items():
            rs.sort(key=lambda r: r.rank)
            assert [r.rank for r in rs] == list(range(1, len(rs) + 1))
            assert len(rs) <= S.GANN_TOP_K
            sims = [r.cos_sim for r in rs]
            assert sims == sorted(sims, reverse=True)

    def test_results_within_hop_radius_of_entry(self, spark):
        """Every answered neighbor must be reachable from the entry node
        in ≤ GANN_HOPS hops of the knn graph (beam can only shrink the
        reachable set, never leave it)."""
        from collections import defaultdict

        from dbsurveyor_spark.operators import similarity as S

        edges = defaultdict(set)
        for r in S.knn_graph(spark, SF).collect():
            edges[r.src_id].add(r.dst_id)
        entry = 0
        frontier = {entry}
        reach = {entry}
        for _ in range(S.GANN_HOPS):
            frontier = {d for n in frontier for d in edges[n]} - reach
            reach |= frontier
        for r in S.ann_graph_search(spark, SF).collect():
            assert r.neighbor_id in reach, r


class TestPartitionAdvisor:
    """survey_partition_advisor (survey/profile.py): advice arithmetic."""

    def test_advice_consistent_with_measurements(self, spark):
        import math

        from dbsurveyor_spark.survey import profile as prof

        rows = {r.table_name: r for r in
                prof.survey_partition_advisor(spark, SF).collect()}
        assert set(rows) == set(prof._ADVISOR_SPEC)
        for t, r in rows.items():
            tc = prof._ADVISOR_TIME_COL.get(t)
            assert r.time_col == tc
            assert r.target_files == max(
                1, math.ceil(r.est_total_mb / prof.ADVISOR_FILE_MB)
            )
            assert r.broadcast_ok == (
                1 if r.est_total_mb <= prof.ADVISOR_BROADCAST_MB else 0
            )
            if tc is None:
                assert r.partition_grain == "none"
                assert r.span_days is None and r.mb_per_day is None
            else:
                assert r.span_days >= 1
                want = (
                    "day" if r.mb_per_day >= prof.ADVISOR_MIN_PART_MB
                    else "month"
                    if r.mb_per_day * 30.0 >= prof.ADVISOR_MIN_PART_MB
                    else "sort-only"
                )
                assert r.partition_grain == want

    def test_one_scan_per_table_no_joins(self, spark):
        from dbsurveyor_spark.survey import profile as prof

        df = prof.survey_partition_advisor(spark, SF)
        assert_no_python_eval(df)
        plan = formatted_plan(df)
        assert "Join" not in plan, plan
        # one scan per advised table ("Location:" appears once per scan's
        # detail block; the tree line would double-count)
        assert plan.count("Location: InMemoryFileIndex") == len(
            prof._ADVISOR_SPEC
        ), plan


class TestKCenterGreedy:
    """sample_kcenter_greedy (survey/sampling.py): greedy-path invariants."""

    def test_selection_contract(self, spark):
        from dbsurveyor_spark.survey import sampling as S

        rows = sorted(
            S.sample_kcenter_greedy(spark, SF).collect(),
            key=lambda r: r.round,
        )
        assert [r.round for r in rows] == list(range(S.KCENTER_K))
        assert len({r.center_id for r in rows}) == S.KCENTER_K  # distinct
        assert rows[0].max_min_dist is None
        radii = [r.max_min_dist for r in rows[1:]]
        assert all(d >= 0 for d in radii)
        # greedy coverage radius is non-increasing round over round
        assert all(a >= b - 1e-12 for a, b in zip(radii, radii[1:]))

    def test_matches_python_greedy_replay(self, spark):
        import numpy as np

        from dbsurveyor_spark.catalog import load_table
        from dbsurveyor_spark.survey import sampling as S

        emb = {
            r.vec_id: np.array(r.embedding, dtype=np.float64)
            for r in load_table(spark, SF, "embeddings").collect()
        }
        ids = sorted(emb)

        def cos(a, b):
            return round(
                float(np.dot(a, b) / (np.linalg.norm(a) * np.linalg.norm(b))),
                9,
            )

        centers = [min(ids)]
        max_cos = {i: cos(emb[i], emb[centers[0]]) for i in ids}
        want = [(0, centers[0], None)]
        for rnd in range(1, S.KCENTER_K):
            nxt = min(ids, key=lambda i: (max_cos[i], i))
            want.append((rnd, nxt, round(1.0 - max_cos[nxt], 9)))
            for i in ids:
                max_cos[i] = max(max_cos[i], cos(emb[i], emb[nxt]))
        got = [
            (r.round, r.center_id, r.max_min_dist)
            for r in sorted(
                S.sample_kcenter_greedy(spark, SF).collect(),
                key=lambda r: r.round,
            )
        ]
        assert got == want


class TestKnnGraphMemo:
    """knn_edges memo (operators/similarity.py): one build per lake,
    shared by knn_graph / ann_graph_search / embed_label_noise."""

    def test_same_lake_returns_same_cached_frame(self, spark):
        from dbsurveyor_spark.operators import similarity as S

        e1 = S.knn_edges(spark, SF)
        e2 = S.knn_edges(spark, SF)
        assert e1 is e2
        assert e1.storageLevel.useMemory

    def test_different_lake_evicts_previous(self, spark):
        from dbsurveyor_spark.operators import similarity as S

        e_small = S.knn_edges(spark, SF)
        S.knn_edges(spark, "/root/testdata/sf0.01")
        assert len(S._KNN_CACHE) == 1
        e_again = S.knn_edges(spark, SF)
        assert e_again is not e_small


class TestSubstringCorpusSemantics:
    """dedup_substring_corpus: excision accounting must be consistent and
    the injected exact duplicates (doc_id % 10, full-text copies) must be
    fully excised (every window of a copied doc repeats cross-doc)."""

    def test_injected_duplicates_fully_excised(self, spark):
        rows = {
            r["doc_id"]: r
            for r in dedup.dedup_substring_corpus(spark, SF).collect()
        }
        assert rows, "empty excision report"
        dup_ids = [d for d in rows if d >= dedup.ID_OFFSET]
        assert dup_ids, "no injected duplicates surfaced"
        for d in dup_ids:
            r = rows[d]
            if r["n_tokens"] >= dedup.SUBSTR_W:
                assert r["dropped_share"] == 1.0, (d, r)
        for r in rows.values():
            assert r["kept_tokens"] + r["dropped_tokens"] == r["n_tokens"]
            assert 0 <= r["dropped_tokens"] <= r["n_tokens"]

    def test_consistent_with_detect_step(self, spark):
        """A doc with dup_fraction 0 in the detect report drops 0 tokens."""
        detect = {
            r["doc_id"]: r["dup_fraction"]
            for r in dedup.dedup_substring(spark, SF).collect()
        }
        corpus = {
            r["doc_id"]: r["dropped_tokens"]
            for r in dedup.dedup_substring_corpus(spark, SF).collect()
        }
        for d, frac in detect.items():
            if frac == 0.0:
                assert corpus[d] == 0


class TestLayoutSortednessSemantics:
    def test_pk_order_is_perfectly_sorted(self, spark):
        from dbsurveyor_spark.operators import layout

        rows = {
            r["column_name"]: r
            for r in layout.layout_sortedness(spark, SF).collect()
        }
        assert rows["o_orderkey"]["sortedness"] == 1.0
        assert rows["o_orderkey"]["n_runs"] == 1
        # an uncorrelated column reads ~half ascending, far from sorted
        assert rows["o_custkey"]["sortedness"] < 0.9
        for r in rows.values():
            assert r["pairs"] == r["n_rows"] - 1


class TestCategoryNoveltySemantics:
    def test_new_and_vanished_surface(self, spark):
        from dbsurveyor_spark.survey import quality

        rows = {
            r["category"]: r
            for r in quality.quality_category_novelty(spark, SF).collect()
        }
        assert rows["promo_click"]["status"] == "NEW"
        assert rows["promo_click"]["ref_n"] == 0
        assert rows["legacy_beacon"]["status"] == "VANISHED"
        assert rows["legacy_beacon"]["cur_n"] == 0
        assert any(r["status"] == "STABLE" for r in rows.values())


class TestWeightedReservoirSemantics:
    def test_exact_size_and_weight_bias(self, spark):
        from dbsurveyor_spark.survey import sampling

        got = sampling.sample_weighted_reservoir(spark, SF).collect()
        assert len(got) == sampling.WRES_N
        assert len({r["o_orderkey"] for r in got}) == sampling.WRES_N
        # ES keys are maximal and ordered; weights bias selection upward:
        # the sample's mean weight should exceed the population mean
        keys = [r["es_key"] for r in got]
        assert keys == sorted(keys, reverse=True)
        from dbsurveyor_spark.catalog import load_table

        pop_mean = (
            load_table(spark, SF, "orders")
            .agg(F.avg("o_totalprice"))
            .head()[0]
        )
        samp_mean = sum(r["weight"] for r in got) / len(got)
        assert samp_mean > pop_mean


class TestRerankSemantics:
    def test_refine_improves_or_matches_exact_ordering(self, spark):
        from dbsurveyor_spark.operators import similarity as S

        got = S.ann_rerank_topk(spark, SF).collect()
        assert got
        per_q = {}
        for r in got:
            per_q.setdefault(r["query_id"], []).append(r)
        brute = {
            (r["query_id"], r["neighbor_id"]): r["rank"]
            for r in S.ann_bruteforce_topk(spark, SF).collect()
        }
        for q, rows in per_q.items():
            rows.sort(key=lambda r: r["rank"])
            # exact scores are non-increasing in rank (the refine ordering)
            scores = [r["score_exact"] for r in rows]
            assert scores == sorted(scores, reverse=True)
            # rank-1 rerank hit should be a strong bruteforce neighbor
            # whenever the true top-1 survived the ADC shortlist
            top = rows[0]
            if (q, top["neighbor_id"]) in brute:
                assert brute[(q, top["neighbor_id"])] <= S.RERANK_C


class TestKcoreSemantics:
    def test_surviving_vertices_meet_degree_floor(self, spark):
        from dbsurveyor_spark.operators import graph

        rows = graph.graph_kcore(spark, SF).collect()
        assert rows, "k-core empty at test SF"
        # after the final filter round every survivor had deg >= K; the
        # reported degree is over the POST-filter subgraph, so it may dip
        # below K only if the peel is still converging — but the pre-cut
        # floor guarantees core_degree >= 1 and most rows >= K
        assert all(r["core_degree"] >= 1 for r in rows)
        assert sum(r["core_degree"] >= graph.KCORE_K for r in rows) >= len(
            rows
        ) * 0.5

    def test_hub_with_leaf_neighbors_is_not_core(self, spark):
        """Pure-function check on a tiny star+clique graph: the star hub
        has high degree but dies with its leaves; the clique survives."""
        from dbsurveyor_spark.operators.graph import KCORE_K
        from dbsurveyor_spark.plans.roundcheck import checkpoint_round
        from pyspark.sql import functions as F

        # clique 1-2-3-4 (complete) + hub 10 with leaves 11..16
        clique = [(a, b) for a in range(1, 5) for b in range(1, 5) if a < b]
        star = [(10, leaf) for leaf in range(11, 17)]
        edges = spark.createDataFrame(
            clique + star, "a bigint, b bigint"
        )
        cur = edges.select(
            F.col("a").alias("src"), F.col("b").alias("dst")
        ).unionByName(
            edges.select(F.col("b").alias("src"), F.col("a").alias("dst"))
        )
        for i in range(4):
            keep = (
                cur.groupBy("src")
                .agg(F.count(F.lit(1)).alias("deg"))
                .filter(F.col("deg") >= KCORE_K)
                .select("src")
            )
            cur = checkpoint_round(
                cur.join(keep, "src")
                .join(keep.withColumnRenamed("src", "dst"), "dst")
                .select("src", "dst"),
                f"test_kcore:round{i}",
            )
        survivors = {r["src"] for r in cur.select("src").collect()}
        assert survivors == {1, 2, 3, 4}

    def test_converged_flag_is_constant_boolean(self, spark):
        """Round 8: every row carries the same `converged` verdict — the
        run-level fixpoint fact, not a per-vertex property."""
        from dbsurveyor_spark.operators import graph

        out = graph.graph_kcore(spark, SF)
        assert dict(out.dtypes)["converged"] == "boolean"
        flags = {r["converged"] for r in out.collect()}
        assert len(flags) == 1
