"""Scale-behavior guards for the dedup suite (VERDICT round-1 items 4/5).

These tests pin the properties that matter at 100 TB, on synthetic inputs
built to trigger the round-1 failure modes:

- ngram-jaccard: a corpus-wide hot shingle must NOT create a quadratic
  candidate bucket (prefix filtering keeps candidates bounded by rarity).
- simhash: the Manku 3-of-6 block-combination keys must be lossless for
  Hamming ≤ 3 (candidate generation misses no near-dup pair).
"""

from __future__ import annotations

import itertools
import random

from pyspark.sql import functions as F

from dbsurveyor_spark.operators.dedup import (
    HAMMING_MAX,
    SIMHASH_BLOCK_BITS,
    SIMHASH_BLOCK_MASK,
    SIMHASH_BLOCKS,
    _jaccard_candidates,
    _simhash_combo_keys,
)


def test_jaccard_hot_shingle_bucket_is_bounded(spark):
    """200 docs all sharing one boilerplate shingle: the naive shingle-join
    yields C(200,2)=19900 candidate pairs; prefix filtering must yield none
    (each doc's prefix holds only its RARE shingles, and the hot shingle
    sorts last in the shared frequency order)."""
    n_docs = 200
    rows = []
    for d in range(n_docs):
        rows.append((d, "HOT"))  # document-frequency 200 shingle
        for s in range(4):  # four unique (df=1) shingles per doc
            rows.append((d, f"uniq_{d}_{s}"))
    exploded = spark.createDataFrame(rows, "doc_id long, shingle string")

    naive = (
        exploded.alias("a")
        .join(
            exploded.alias("b"),
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select("a.doc_id", "b.doc_id")
        .distinct()
        .count()
    )
    assert naive == n_docs * (n_docs - 1) // 2  # the round-1 quadratic bucket

    filtered = _jaccard_candidates(exploded).count()
    assert filtered == 0, f"hot shingle leaked into prefixes: {filtered} candidates"


def test_jaccard_prefix_filter_keeps_true_duplicates(spark):
    """Exactness: docs sharing ≥ τ of their shingles MUST stay candidates
    even when their shared shingles include the hot one."""
    rows = []
    # docs 1 and 2: identical 5-shingle sets (J=1.0) including HOT
    for d in (1, 2):
        rows += [(d, "HOT")] + [(d, f"pair_{s}") for s in range(4)]
    # background docs make HOT hot
    for d in range(10, 110):
        rows += [(d, "HOT")] + [(d, f"bg_{d}_{s}") for s in range(4)]
    exploded = spark.createDataFrame(rows, "doc_id long, shingle string")
    cands = {
        (r.doc_a, r.doc_b) for r in _jaccard_candidates(exploded).collect()
    }
    assert (1, 2) in cands, "prefix filter dropped an identical pair"


def _combo_key(sim: int, combo: tuple[int, ...]) -> int:
    key = 0
    for pos, bi in enumerate(combo):
        block = (sim >> (bi * SIMHASH_BLOCK_BITS)) & SIMHASH_BLOCK_MASK
        key |= block << (pos * SIMHASH_BLOCK_BITS)
    return key


def test_simhash_combo_blocking_is_lossless_for_hamming_3():
    """Any pair within Hamming ≤ 3 shares at least one 3-block combo key.

    Exhaustive over flip patterns for a few random base fingerprints: all
    1-, 2-, and 3-bit flips (48 + C(48,2) + C(48,3) = 18424 variants each).
    """
    combos = _simhash_combo_keys()
    assert len(combos) == 20  # C(6,3)
    assert len(set(combos)) == 20
    rng = random.Random(7)
    for _ in range(3):
        base = rng.getrandbits(48)
        base_keys = [(i, _combo_key(base, c)) for i, c in enumerate(combos)]
        flip_sets = itertools.chain.from_iterable(
            itertools.combinations(range(48), k) for k in (1, 2, 3)
        )
        for bits in flip_sets:
            other = base
            for b in bits:
                other ^= 1 << b
            other_keys = [(i, _combo_key(other, c)) for i, c in enumerate(combos)]
            assert any(a == b for a, b in zip(base_keys, other_keys)), (
                f"missed pair at flips {bits}"
            )


def test_simhash_blocks_cover_all_bits():
    assert SIMHASH_BLOCKS * SIMHASH_BLOCK_BITS == 48
    assert HAMMING_MAX < SIMHASH_BLOCKS - 2  # ≤3 flips leave ≥3 intact blocks


def test_winnowing_df_cap_drops_boilerplate_fingerprint(spark):
    """1,000 docs all sharing one boilerplate fingerprint (license header):
    uncapped, that bucket pair-expands C(1000,2) = 499,500 pairs; with the
    MOSS df cap it must produce NONE — while true near-dup pairs (docs
    sharing ≥ MIN_SHARED rare fingerprints) survive."""
    from dbsurveyor_spark.operators.dedup import (
        WINNOW_DF_CAP,
        WINNOW_MIN_SHARED,
        _winnow_pairs,
    )

    rows = []
    boiler = 999_999
    for d in range(1000):
        rows.append((d, boiler))  # df=1000 boilerplate fingerprint
        rows.append((d, 10_000 + d))  # one unique fp per doc
    # docs 1 and 2 share two RARE fingerprints → a true near-dup pair
    for fp in (555, 556):
        rows += [(1, fp), (2, fp)]
    fps = spark.createDataFrame(rows, "doc_id long, fp long")

    got = {
        (r.doc_a, r.doc_b): r.shared_fingerprints
        for r in _winnow_pairs(fps).collect()
    }
    assert got == {(1, 2): WINNOW_MIN_SHARED}, got
    assert WINNOW_DF_CAP < 1000  # the boilerplate fp is actually capped


def test_star_contraction_chain_and_mixed_components(spark):
    """Star contraction must label a 5-doc chain plus disjoint shapes
    (triangle, pair) with each component's min, in either edge
    orientation, with duplicate edges present."""
    from dbsurveyor_spark.operators.dedup import star_contraction_labels

    edges = spark.createDataFrame(
        [
            (11, 10), (11, 12), (12, 13), (13, 14),  # chain 10..14
            (20, 21), (21, 22), (22, 20),  # triangle
            (31, 30), (31, 30),  # duplicate pair edges
        ],
        "src long, dst long",
    )
    got = {
        r["node"]: r["label"]
        for r in star_contraction_labels(edges).collect()
    }
    # every node maps to its component min; roots, if present, map to
    # themselves
    expect_component = {
        **{i: 10 for i in (10, 11, 12, 13, 14)},
        **{i: 20 for i in (20, 21, 22)},
        **{i: 30 for i in (30, 31)},
    }
    for node, label in got.items():
        assert label == expect_component[node], (node, label)
    assert {11, 12, 13, 14, 21, 22, 31} <= set(got)


def test_star_contraction_adversarial_chain_logarithmic_rounds(
    spark, monkeypatch
):
    """A 1,000-node path — the adversarial case for plain min-label
    propagation (diameter rounds ≈ 1,000). Star contraction must converge
    within max_rounds=12 ≈ O(log n): correct labels under that cap PROVE
    the round bound, since an unconverged run cannot produce them.
    (Forces the DISTRIBUTED loop: the driver union-find fast path would
    otherwise absorb a frame this small.)"""
    from dbsurveyor_spark.operators.dedup import star_contraction_labels

    monkeypatch.setenv("DBSURVEYOR_CC_DRIVER_MAX_EDGES", "0")
    n = 1000
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(1, n)], "src long, dst long"
    )
    labels = star_contraction_labels(edges, max_rounds=12)
    got = {r["node"]: r["label"] for r in labels.collect()}
    assert set(got.values()) == {1}, f"labels not converged: {set(got.values())}"
    assert set(got) >= set(range(2, n + 1))


def test_pinned_loops_concurrent_stable(spark, monkeypatch):
    """Two conf-pinning iterative loops on the SAME session from two
    threads (r8 verdict item #8): the process pin lock must serialize the
    set/restore so neither loop sees the other's pin mid-flight — labels
    stay correct and the session conf is restored afterwards."""
    from concurrent.futures import ThreadPoolExecutor

    from dbsurveyor_spark.operators.dedup import star_contraction_labels

    monkeypatch.setenv("DBSURVEYOR_CC_DRIVER_MAX_EDGES", "0")
    before = {
        k: spark.conf.get(k)
        for k in (
            "spark.sql.adaptive.enabled",
            "spark.sql.shuffle.partitions",
        )
    }
    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(1, 60)], "src long, dst long"
    )
    tris = spark.createDataFrame(
        [(j, j + 1) for j in range(100, 160, 3)]
        + [(j + 1, j + 2) for j in range(100, 160, 3)]
        + [(j + 2, j) for j in range(100, 160, 3)],
        "src long, dst long",
    )

    def run(edges):
        return {
            r["node"]: r["label"]
            for r in star_contraction_labels(edges).collect()
        }

    with ThreadPoolExecutor(max_workers=2) as pool:
        f1 = pool.submit(run, chain)
        f2 = pool.submit(run, tris)
        got_chain, got_tris = f1.result(), f2.result()
    assert set(got_chain.values()) == {1}
    for node, label in got_tris.items():
        assert label == (node - 100) // 3 * 3 + 100, (node, label)
    after = {k: spark.conf.get(k) for k in before}
    assert after == before, (before, after)


def test_star_contraction_driver_path_matches_distributed(
    spark, monkeypatch
):
    """The driver union-find fast path must emit EXACTLY the distributed
    fixpoint's rows — same (node, label) set, non-root members only — on
    a mixed graph (chain + triangle + duplicate/self-noise pair edges in
    both orientations)."""
    from dbsurveyor_spark.operators.dedup import star_contraction_labels

    edges = spark.createDataFrame(
        [(11, 10), (12, 11), (13, 12), (20, 21), (21, 22), (22, 20),
         (30, 31), (31, 30), (40, 41)],
        "src long, dst long",
    )
    monkeypatch.setenv("DBSURVEYOR_CC_DRIVER_MAX_EDGES", "0")
    distributed = {
        (r["node"], r["label"])
        for r in star_contraction_labels(edges).collect()
    }
    monkeypatch.setenv("DBSURVEYOR_CC_DRIVER_MAX_EDGES", "200000")
    driver = {
        (r["node"], r["label"])
        for r in star_contraction_labels(edges).collect()
    }
    assert driver == distributed, (driver, distributed)
    assert (10, 10) not in driver  # roots never appear as members


def test_neardup_clusters_collapse_exact_template_group(spark):
    """300 exact copies of one template (the hot-bucket hazard): the
    representative collapse must put them all in ONE cluster with the
    min-id survivor, link a genuine near-dup variant into that cluster,
    keep unrelated docs singleton, and keep sub-3-token docs singleton
    even when identical to each other (they cannot shingle-pair)."""
    from dbsurveyor_spark.operators.dedup import _neardup_cluster_frame

    template = "the quick brown fox jumps over the lazy dog again and again"
    near = "the quick brown fox jumps over the lazy dog again and once"
    rows = [(d, template) for d in range(100, 400)]
    rows.append((50, near))  # near-dup of the template, smaller id
    rows.append((7, "completely different text about spark partitions here"))
    rows += [(900, "hi there"), (901, "hi there")]  # < 3 tokens, identical
    corpus = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r.doc_id: (r.cluster_id, r.is_survivor)
        for r in _neardup_cluster_frame(corpus).collect()
    }
    assert len(got) == len(rows)
    # near-dup doc 50 pulls the whole template group to cluster 50
    assert got[50] == (50, True)
    for d in range(100, 400):
        assert got[d] == (50, False), (d, got[d])
    assert got[7] == (7, True)
    assert got[900] == (900, True) and got[901] == (901, True)


def test_neardup_clusters_operator_matches_star_labels(spark):
    from dbsurveyor_spark.operators import dedup

    sf = "/root/testdata/sf0.001"
    rows = dedup.dedup_neardup_clusters(spark, sf).collect()
    assert rows, "clusters query returned nothing"
    by_doc = {r["doc_id"]: r for r in rows}
    # every cluster_id is the min doc_id of its member set
    members: dict[int, list[int]] = {}
    for r in rows:
        members.setdefault(r["cluster_id"], []).append(r["doc_id"])
    for cid, docs in members.items():
        assert cid == min(docs), (cid, docs)
    for r in rows:
        assert r["is_survivor"] == (r["doc_id"] == r["cluster_id"])
    assert by_doc


def test_incremental_dedup_equals_batch_restricted_to_new(spark):
    """dedup_minhash_incremental must return EXACTLY the batch LSH pairs
    that involve at least one delta-batch doc — the correctness contract
    that lets a pipeline skip old-by-old re-pairing per ingest."""
    from pyspark.sql import functions as F

    from dbsurveyor_spark.operators.dedup import (
        _delta_flag,
        dedup_minhash_incremental,
        dedup_minhash_lsh,
    )

    sf = "/root/testdata/sf0.001"
    inc = {
        (r["doc_a"], r["doc_b"], r["shared_bands"])
        for r in dedup_minhash_incremental(spark, sf).collect()
    }
    batch = dedup_minhash_lsh(spark, sf)
    restricted = {
        (r["doc_a"], r["doc_b"], r["shared_bands"])
        for r in batch.filter(
            _delta_flag(F.col("doc_a")) | _delta_flag(F.col("doc_b"))
        ).collect()
    }
    assert inc == restricted
    assert len(inc) > 0  # non-vacuous: the delta batch has near-dups


def test_lsh_quality_report_estimator_properties(spark):
    """The quality report's estimator must behave like MinHash theory says:
    exact clones estimate 1.0 with collision probability 1.0; estimates are
    k-quantized; shared_bands within [1, BANDS]; and the mean estimator
    error over candidates stays within a few standard errors of the k=16
    binomial bound (~1/sqrt(k))."""
    from dbsurveyor_spark.operators import dedup

    sf = "/root/testdata/sf0.001"
    rows = dedup.dedup_lsh_quality_report(spark, sf).collect()
    assert rows
    k = 16
    clones = [r for r in rows if r.doc_b - r.doc_a == dedup.ID_OFFSET
              and r.doc_a % 10 == 0]
    assert clones, "injected exact clones must surface as candidates"
    for r in clones:
        assert r.est_jaccard == 1.0
        assert r.exact_jaccard == 1.0
        assert r.p_collision == 1.0
    for r in rows:
        assert 1 <= r.shared_bands <= dedup.BANDS
        q = r.est_jaccard * k
        assert abs(q - round(q)) < 1e-6  # k-quantized estimates
        assert 0.0 <= r.p_collision <= 1.0
        assert r.abs_err == round(abs(r.est_jaccard - r.exact_jaccard), 9)
    mean_err = sum(r.abs_err for r in rows) / len(rows)
    assert mean_err < 3.0 / (k ** 0.5)
