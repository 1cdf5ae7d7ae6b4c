"""Multi-file lake compatibility: a 100 TB lake is directories of many
parquet files, not the single files the driver-generated test tables use.
Every operator family must return IDENTICAL results when each table is
rewritten as a multi-file directory — this is the partitioning-independence
guarantee (exact-decimal aggregates, order-free reductions, deterministic
tie-breaks) exercised on the actual storage layout it exists for.
"""

from __future__ import annotations

import pytest

from dbsurveyor_spark import registry

from .conftest import SF_SMALL

# One representative per family: scan-agg, window, multi-way join, LSH
# dedup, trained-model ANN, vector dedup, text, sessionization, profile
# thread-pool branches, governance arithmetic, two-level prefix, basket.
FAMILY_KEYS = [
    "q1_pricing_summary",
    "q5_local_supplier",
    "window_top_orders_per_cust",
    "dedup_minhash_lsh",
    "ann_ivf_topk",
    "dedup_embedding_cosine",
    "text_stats",
    "stream_sessionization",
    "survey_column_profile",
    "quality_completeness",
    "corpus_mix_plan",
    "stream_late_data_report",
    "basket_copurchase_lift",
    # round-4 families: fixed-point iterative graph math, one-sided prefix
    # filtering, additive sketches, bounded range-join distincts, fence
    # bucketing, sweep-line two-level prefix, winnowing fingerprints
    "graph_pagerank_parts",
    "dedup_containment",
    "sketch_cm_heavy_hitters",
    "sketch_kmv_distinct",
    "active_users_report",
    "rfm_segmentation",
    "stream_peak_concurrency",
    "dedup_winnowing",
]


@pytest.fixture(scope="module")
def multifile_dir(spark, tmp_path_factory):
    """sf0.001 rewritten as 4-file directories per table."""
    from dbsurveyor_spark.catalog import TABLES, load_table

    out = tmp_path_factory.mktemp("mflake")
    for t in TABLES:
        (
            load_table(spark, SF_SMALL, t)
            .repartition(4)
            .write.mode("overwrite")
            .parquet(str(out / f"{t}.parquet"))
        )
    return str(out)


def _rows(spark, key, sf_dir):
    df = registry.queries()[key](spark, sf_dir)
    cols = sorted(df.columns)
    return sorted(
        tuple(r[c] for c in cols) for r in df.select(*cols).collect()
    )


@pytest.mark.parametrize("key", FAMILY_KEYS)
def test_multifile_results_identical(spark, multifile_dir, key):
    single = _rows(spark, key, SF_SMALL)
    multi = _rows(spark, key, multifile_dir)
    assert len(single) > 0
    assert single == multi
