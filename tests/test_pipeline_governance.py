"""Pipeline-governance operators: semantics + physical-plan discipline.

Value parity with the DuckDB oracles runs in test_oracle.py (these keys are
in the registry); here we pin the semantics a leakage/contamination check
must not drift on, and the plan shapes that make them 100 TB-safe.
"""

from __future__ import annotations

import pytest

from dbsurveyor_spark.operators import pipeline
from dbsurveyor_spark.plans.asserts import (
    assert_broadcast_join,
    assert_no_python_eval,
    formatted_plan,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def decon(spark):
    return pipeline.corpus_decontamination(spark, SF).toPandas()


@pytest.fixture(scope="module")
def leaks(spark):
    return pipeline.split_leakage_report(spark, SF).toPandas()


@pytest.fixture(scope="module")
def mix(spark):
    return pipeline.corpus_mix_report(spark, SF).toPandas()


class TestSemantics:
    def test_decontamination_containment_bounds(self, decon):
        # containment fraction is w.r.t. the BENCHMARK doc: (0, 1] and
        # >= the reporting threshold
        assert (decon["contamination"] > 0).all()
        assert (decon["contamination"] <= 1.0).all()
        assert (decon["contamination"] >= pipeline.CONTAMINATION_MIN_FRAC).all()
        assert (decon["overlap"] <= decon["bench_shingles"]).all()

    def test_decontamination_sides_disjoint(self, decon):
        # a document is either benchmark or corpus, never both
        assert not set(decon["corpus_doc_id"]) & set(decon["bench_doc_id"])

    def test_leakage_spans_multiple_splits(self, leaks):
        assert (leaks["n_splits"] >= 2).all()
        assert (leaks["n_copies"] >= leaks["n_splits"]).all()
        for s in leaks["splits"]:
            parts = s.split(",")
            assert len(parts) == len(set(parts))
            assert set(parts) <= {"train", "val", "test"}

    def test_leakage_nonempty_on_cloned_corpus(self, leaks):
        # the dedup corpus clones every 10th doc under a shifted id; with a
        # 90/5/5 id-hash split some clone pairs MUST straddle splits
        assert len(leaks) > 0

    def test_neardup_leakage_cross_split_and_verified(self, spark):
        nd = pipeline.split_leakage_neardup(spark, SF).toPandas()
        # cloned corpus: every 10th doc re-inserted under id+1M, and the
        # id-hash split assigns the clone independently — some exact-copy
        # pairs (J = 1.0) MUST straddle splits
        assert len(nd) > 0
        assert (nd["split_a"] != nd["split_b"]).all()
        assert set(nd["split_a"]) | set(nd["split_b"]) <= {"train", "val", "test"}
        # every reported pair passed the exact verify, not just banding
        assert (nd["jaccard"] >= pipeline.JACCARD_T).all()
        assert (nd["jaccard"] <= 1.0).all()
        assert (nd["shared_bands"] >= 1).all()
        # exact clones are in there with jaccard exactly 1.0
        clones = nd[nd["doc_b"] == nd["doc_a"] + 1_000_000]
        assert len(clones) > 0
        assert (clones["jaccard"] == 1.0).all()

    def test_mix_shares_sum_to_one(self, mix):
        assert abs(mix["token_share"].sum() - 1.0) < 1e-3  # rounding per row
        assert (mix["n_tokens"] >= mix["n_docs"]).all()  # docs are non-empty
        assert mix["n_docs"].sum() == 500  # every document accounted for


class TestSemanticDecontamination:
    def test_flagged_clones_all_caught_at_cos_one(self, spark):
        """Every injected clone whose ORIGINAL is benchmark-flagged must be
        reported contaminated with cosine 1.0 (identical vectors share cell
        rankings under the same quantizer, so IVF blocking cannot miss
        them), and its closest bench item must be the original."""
        from pyspark.sql import functions as F

        from dbsurveyor_spark.catalog import load_table
        from dbsurveyor_spark.operators.dedup import ID_OFFSET

        out = {
            r.corpus_vec_id: r
            for r in pipeline.corpus_decontamination_semantic(spark, SF).collect()
        }
        assert out, "detector must be non-vacuous at this SF"
        base = load_table(spark, SF, "embeddings").select("vec_id")
        flagged = {
            r.vec_id
            for r in base.filter(
                pipeline._sem_bench_pred() & (F.col("vec_id") % 10 == 0)
            ).collect()
        }
        assert flagged
        for orig in flagged:
            clone = orig + ID_OFFSET
            assert clone in out, f"clone {clone} of bench {orig} missed"
            assert out[clone].cos_sim == 1.0
            assert out[clone].bench_vec_id == orig
            assert out[clone].n_bench_matches >= 1

    def test_one_row_per_contaminated_vector(self, spark):
        df = pipeline.corpus_decontamination_semantic(spark, SF).toPandas()
        assert df["corpus_vec_id"].is_unique
        assert (df["cos_sim"] >= 0.95).all()

    def test_bench_side_broadcast_corpus_never_shuffles_wide(self, spark):
        df = pipeline.corpus_decontamination_semantic(spark, SF)
        assert_broadcast_join(df, at_least=2)
        plan = formatted_plan(df)
        # the only Python on the path is the Arrow assignment/cosine kernel
        assert "BatchEvalPython" not in plan


class TestPlans:
    def test_decontamination_broadcasts_benchmark(self, spark):
        # the corpus side must never shuffle for the join: benchmark
        # shingles and benchmark sizes are both broadcast
        df = pipeline.corpus_decontamination(spark, SF)
        assert_broadcast_join(df, at_least=2)
        assert_no_python_eval(df)

    def test_leakage_single_aggregation_no_python(self, spark):
        df = pipeline.split_leakage_report(spark, SF)
        assert_no_python_eval(df)
        # content-hash groupBy is the only data-sized exchange
        plan = formatted_plan(df)
        assert plan.count("Exchange") <= 2

    def test_mix_report_no_python(self, spark):
        assert_no_python_eval(pipeline.corpus_mix_report(spark, SF))

    def test_neardup_leakage_no_python_and_semi_join(self, spark):
        # JVM-side end to end; verify stage restricts the set-aggregate to
        # candidate docs via a semi join (candidate-sized, not corpus-sized)
        df = pipeline.split_leakage_neardup(spark, SF)
        assert_no_python_eval(df)
        assert "LeftSemi" in formatted_plan(df)


class TestCuratedCorpusSink:
    def test_partitioned_write_and_pruned_readback(self, spark, tmp_path):
        """materialize_curated_corpus writes a split-partitioned zstd lake;
        a single-split read must plan directory-level partition pruning and
        agree with the in-memory pipeline output."""
        import os

        from pyspark.sql import functions as F

        from dbsurveyor_spark.operators.pipeline import (
            corpus_curation,
            materialize_curated_corpus,
        )
        from dbsurveyor_spark.plans.asserts import formatted_plan

        from .conftest import SF_SMALL

        out = str(tmp_path / "curated")
        counts = materialize_curated_corpus(spark, SF_SMALL, out)
        expected = {
            r["split"]: r["n"]
            for r in corpus_curation(spark, SF_SMALL)
            .groupBy("split")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        }
        assert counts == expected and counts.get("train", 0) > 0
        # split=... partition directories exist; files are zstd parquet
        assert os.path.isdir(os.path.join(out, "split=train"))
        files = [
            f
            for f in os.listdir(os.path.join(out, "split=train"))
            if f.endswith(".parquet")
        ]
        assert files and all(".zstd." in f for f in files)
        # single-split read prunes at the partition level
        train = spark.read.parquet(out).filter(F.col("split") == "train")
        plan = formatted_plan(train)
        assert "PartitionFilters" in plan and "split" in plan, plan
        assert train.count() == expected["train"]
        # text re-attached for training consumption
        assert {"doc_id", "text", "lang", "source", "n_tokens"} <= set(
            train.columns
        )


class TestMixPlanner:
    def test_downsample_only_plan_hits_targets(self):
        from dbsurveyor_spark.operators.pipeline import plan_corpus_mix

        plan = plan_corpus_mix(
            {"en": 1_000_000, "fr": 100_000, "de": 50_000},
            {"en": 0.5, "fr": 0.3, "de": 0.2},
        )
        # de is the binding group (highest target/available): kept fully
        assert plan["de"]["keep_rate"] == 1.0
        # no upsampling anywhere
        assert all(p["keep_rate"] <= 1.0 for p in plan.values())
        # achieved shares match targets to rounding
        for g in plan:
            assert abs(plan[g]["achieved_share"] - plan[g]["target_share"]) < 1e-4
        # en downsampled hard: 0.5/0.2 * 50k/1M = 0.125
        assert abs(plan["en"]["keep_rate"] - 0.125) < 1e-9

    def test_plan_from_real_mix_report(self, spark):
        from dbsurveyor_spark.operators.pipeline import (
            corpus_mix_report,
            plan_corpus_mix,
        )
        from .conftest import SF_SMALL

        rows = corpus_mix_report(spark, SF_SMALL).collect()
        avail = {}
        for r in rows:
            avail[r["lang"]] = avail.get(r["lang"], 0) + r["n_tokens"]
        plan = plan_corpus_mix(avail, {lang: 1.0 for lang in avail})
        # uniform targets: the scarcest language binds at 1.0
        scarcest = min(avail, key=lambda g: avail[g])
        assert plan[scarcest]["keep_rate"] == 1.0
        assert sum(p["achieved_share"] for p in plan.values()) == pytest.approx(
            1.0, abs=1e-3
        )

    def test_unplannable_target_raises(self):
        import pytest as _pytest

        from dbsurveyor_spark.operators.pipeline import plan_corpus_mix

        with _pytest.raises(ValueError, match="zz"):
            plan_corpus_mix({"en": 100}, {"en": 0.5, "zz": 0.5})


class TestMixPlannerClosesLoop:
    def test_planned_rates_realize_target_shares_on_testdata(self, spark):
        """End-to-end: plan keep-rates from the real mix report, apply them
        with the deterministic hash-Bernoulli filter, and verify the
        sampled corpus's token shares approach the targets (exact equality
        is impossible — Bernoulli on 500 docs — so assert the planner
        moved each share toward its target vs the unsampled corpus)."""
        from pyspark.sql import functions as F

        from dbsurveyor_spark.catalog import load_table
        from dbsurveyor_spark.functions.hashing import portable_hash64
        from dbsurveyor_spark.functions.text import tokens
        from dbsurveyor_spark.operators.pipeline import (
            corpus_mix_report,
            plan_corpus_mix,
        )
        from .conftest import SF_SMALL

        rows = corpus_mix_report(spark, SF_SMALL).collect()
        avail: dict[str, int] = {}
        for r in rows:
            avail[r["lang"]] = avail.get(r["lang"], 0) + r["n_tokens"]
        targets = {lang: 1.0 for lang in avail}  # uniform mix
        plan = plan_corpus_mix(avail, targets)

        docs = load_table(spark, SF_SMALL, "documents").select("doc_id", "lang", "text")
        rate = F.lit(0.0)
        for lang, p in plan.items():
            rate = F.when(F.col("lang") == lang, F.lit(p["keep_rate"] * 100)).otherwise(rate)
        keep = (
            portable_hash64(F.concat(F.lit("mixplan_"), F.col("doc_id").cast("string")))
            % 10000
        ) < rate * 100
        sampled = docs.filter(keep)
        got = {
            r["lang"]: r["t"]
            for r in sampled.groupBy("lang")
            .agg(F.sum(F.size(tokens(F.col("text")))).alias("t"))
            .collect()
        }
        total_before = sum(avail.values())
        total_after = sum(got.values())
        target_share = 1.0 / len(avail)
        for lang in avail:
            before = avail[lang] / total_before
            after = got.get(lang, 0) / total_after
            # each language's share must move toward (or stay at) target
            assert abs(after - target_share) <= abs(before - target_share) + 0.02, (
                lang, before, after
            )
