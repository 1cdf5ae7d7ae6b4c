"""Persisted-index round trip (VERDICT r6 item 4): build → "new session"
(memos cleared) → identical results with ZERO training/build jobs — the
warm path must never fall back to the builder (asserted by poisoning the
builders), and warmed driver-side models must be bit-identical (JSON
round-trips doubles exactly)."""

from __future__ import annotations

import json
import os

import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture()
def store(tmp_path, monkeypatch):
    root = str(tmp_path / "indexes")
    monkeypatch.setenv("DBSURVEYOR_INDEX_DIR", root)
    # start from cold memos so the first touch actually builds + persists
    from dbsurveyor_spark.plans.cache import clear_index_memos

    clear_index_memos()
    yield root
    clear_index_memos()


def _poison(monkeypatch, module, name):
    def _boom(*a, **k):  # pragma: no cover - only on regression
        raise AssertionError(
            f"{name} ran — the warm path fell back to a fresh build"
        )

    monkeypatch.setattr(module, name, _boom)


def test_knn_graph_roundtrip_zero_build(spark, store, monkeypatch):
    from dbsurveyor_spark.operators import similarity
    from dbsurveyor_spark.plans.cache import clear_index_memos

    first = sorted(
        map(tuple, similarity.knn_edges(spark, SF).collect())
    )
    assert first, "build session produced no edges"
    assert os.path.isdir(os.path.join(store, "knn_graph"))
    # "new session": memo gone, builder poisoned — only the artifact works
    clear_index_memos()
    _poison(monkeypatch, similarity, "_build_knn_graph")
    second = sorted(
        map(tuple, similarity.knn_edges(spark, SF).collect())
    )
    assert second == first


def test_trained_models_roundtrip_bit_identical(spark, store, monkeypatch):
    from dbsurveyor_spark.operators import similarity
    from dbsurveyor_spark.plans.cache import clear_index_memos

    cent = similarity.trained_centroid_rows(spark, SF)
    pq = similarity.trained_pq_codebooks(spark, SF)
    sq = similarity.trained_residual_sq_bounds(spark, SF)
    clear_index_memos()
    _poison(monkeypatch, similarity, "_train_centroids")
    warm_cent = similarity.trained_centroid_rows(spark, SF)
    assert [(c, list(v)) for c, v in warm_cent] == [
        (c, list(v)) for c, v in cent
    ]
    warm_pq = similarity.trained_pq_codebooks(spark, SF)
    assert [
        [(c, list(v)) for c, v in book] for book in warm_pq
    ] == [[(c, list(v)) for c, v in book] for book in pq]
    warm_sq = similarity.trained_residual_sq_bounds(spark, SF)
    assert (list(warm_sq[0]), list(warm_sq[1])) == (
        list(sq[0]),
        list(sq[1]),
    )


def test_copurchase_graph_roundtrip(spark, store):
    from dbsurveyor_spark.operators import graph
    from dbsurveyor_spark.plans.cache import clear_index_memos

    half1, deg1 = graph.copurchase_graph(spark, SF)
    h1 = sorted(map(tuple, half1.collect()))
    d1 = sorted(map(tuple, deg1.collect()))
    clear_index_memos()
    half2, deg2 = graph.copurchase_graph(spark, SF)
    # warmed from parquet: the logical plan must be a store scan, not the
    # lineitem basket build
    plan = half2._jdf.queryExecution().analyzed().toString()
    assert "lineitem" not in plan
    assert sorted(map(tuple, half2.collect())) == h1
    assert sorted(map(tuple, deg2.collect())) == d1


def test_audio_pairs_roundtrip_zero_build(spark, store, monkeypatch):
    from dbsurveyor_spark.multimodal import audio
    from dbsurveyor_spark.plans.cache import clear_index_memos

    first = sorted(map(tuple, audio.aligned_pairs(spark, SF).collect()))
    clear_index_memos()
    _poison(monkeypatch, audio, "_aligned_pair_frame")
    second = sorted(map(tuple, audio.aligned_pairs(spark, SF).collect()))
    assert second == first


def test_store_disabled_is_exact_prior_behavior(spark, monkeypatch, tmp_path):
    from dbsurveyor_spark.plans import index_store

    monkeypatch.delenv("DBSURVEYOR_INDEX_DIR", raising=False)
    assert index_store.store_root() is None
    assert index_store.try_read_model("ivf_centroids", ("x",)) is None
    df = spark.range(1)
    assert index_store.write_frame(df, "knn_graph", ("x",)) is False
    assert index_store.try_read_frame(spark, "knn_graph", ("x",)) is None


def test_cli_index_build_and_list(spark, store, capsys):
    from dbsurveyor_spark import cli
    from dbsurveyor_spark.plans.cache import clear_index_memos

    clear_index_memos()
    assert cli.main(["index", "build", SF, "--store", store]) == 0
    out = json.loads(capsys.readouterr().out)
    kinds = {a["kind"] for a in out["artifacts"]}
    assert kinds >= {
        "ivf_centroids",
        "pq_codebooks",
        "ivfpq_residual_codebooks",
        "sq_residual_bounds",
        "knn_graph",
        "audio_pairs",
        "copurchase_half",
        "copurchase_deg",
    }
    assert out["total_bytes"] > 0
    assert cli.main(["index", "list", "--store", store]) == 0
    listed = json.loads(capsys.readouterr().out)
    assert len(listed) == len(out["artifacts"])


def test_cli_index_requires_store(monkeypatch):
    from dbsurveyor_spark import cli

    monkeypatch.delenv("DBSURVEYOR_INDEX_DIR", raising=False)
    assert cli.main(["index", "list"]) == 1


def test_bm25_stats_roundtrip_zero_training(spark, store, monkeypatch):
    """Round 8: BM25 corpus statistics (n_docs, Σdl, df) persist — a
    fresh session ranks identically with the trainer poisoned."""
    from dbsurveyor_spark.operators import textstats
    from dbsurveyor_spark.plans.cache import clear_index_memos

    first = sorted(
        map(tuple, textstats.text_bm25_search(spark, SF).collect())
    )
    assert first
    assert os.path.isdir(os.path.join(store, "bm25_stats"))
    clear_index_memos()
    _poison(monkeypatch, textstats, "_train_bm25_stats")
    second = sorted(
        map(tuple, textstats.text_bm25_search(spark, SF).collect())
    )
    assert second == first


def test_dsir_model_roundtrip_zero_training(spark, store, monkeypatch):
    """Round 8: the DSIR hashed-ngram log-ratio model persists — warm
    selection is bit-identical with the trainer poisoned."""
    from dbsurveyor_spark.survey import sampling
    from dbsurveyor_spark.plans.cache import clear_index_memos

    first = sorted(
        map(tuple, sampling.sample_importance_dsir(spark, SF).collect())
    )
    assert first
    assert os.path.isdir(os.path.join(store, "dsir_model"))
    clear_index_memos()
    _poison(monkeypatch, sampling, "_train_dsir_ratio")
    second = sorted(
        map(tuple, sampling.sample_importance_dsir(spark, SF).collect())
    )
    assert second == first


def test_index_gc_prunes_only_unreferenced(spark, store, capsys):
    """`index gc` removes artifacts whose fingerprint no longer matches
    any kept lake's content — and nothing else."""
    from dbsurveyor_spark import cli
    from dbsurveyor_spark.operators import similarity
    from dbsurveyor_spark.plans import index_store
    from dbsurveyor_spark.plans.cache import clear_index_memos

    similarity.trained_centroid_rows(spark, SF)
    live_before = index_store.list_artifacts()
    assert live_before
    # fabricate a stale artifact: same kind, key no lake content produces
    stale_dir = os.path.join(store, "ivf_centroids")
    stale = os.path.join(stale_dir, "deadbeefdeadbeef.json")
    with open(stale, "w", encoding="utf-8") as fh:
        fh.write("[]")
    # plus a torn tmp leftover from a crashed writer
    torn = os.path.join(stale_dir, "cafecafecafecafe.json.tmp-999")
    with open(torn, "w", encoding="utf-8") as fh:
        fh.write("{")
    assert cli.main(["index", "gc", SF, "--store", store]) == 0
    report = json.loads(capsys.readouterr().out)
    pruned_keys = {(a["kind"], a["key"]) for a in report["pruned"]}
    assert ("ivf_centroids", "deadbeefdeadbeef") in pruned_keys
    assert not os.path.exists(stale)
    assert not os.path.exists(torn)
    # every artifact the current lake addresses survived
    after = {(a["kind"], a["key"]) for a in index_store.list_artifacts()}
    assert {(a["kind"], a["key"]) for a in live_before} <= after
    clear_index_memos()
