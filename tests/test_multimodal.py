"""Multimodal plumbing: binary columns + Arrow-batched mapInPandas decode."""

from __future__ import annotations

import pytest

from dbsurveyor_spark.catalog import load_table
from dbsurveyor_spark.multimodal.codec import (
    attach_payload,
    decode_stats,
    resize_stub,
)

from .conftest import SF_ORACLE


def test_decode_stats_schema_and_determinism(spark):
    docs = load_table(spark, SF_ORACLE, "documents")
    media = attach_payload(docs)
    assert dict(media.dtypes)["payload"] == "binary"
    out = decode_stats(media)
    assert [f.name for f in out.schema.fields] == [
        "doc_id", "n_bytes", "width", "height", "media_format",
    ]
    rows = {r.doc_id: r for r in out.collect()}
    docs_n = docs.count()
    assert len(rows) == docs_n
    # deterministic fake decode: n_bytes == utf-8 length of text
    sample = docs.limit(5).collect()
    for d in sample:
        r = rows[d.doc_id]
        assert r.n_bytes == len(d.text.encode("utf-8"))
        assert r.width == 64 + r.n_bytes % 640
        assert r.height == 64 + (r.n_bytes * 7) % 480
        assert r.media_format in ("jpeg", "png", "webp")


def test_custom_decode_fn_injection(spark):
    docs = load_table(spark, SF_ORACLE, "documents").limit(10)
    out = decode_stats(attach_payload(docs), decode_fn=lambda b: (1, 2))
    assert {(r.width, r.height) for r in out.collect()} == {(1, 2)}


def test_resize_stub_raises(spark):
    docs = attach_payload(load_table(spark, SF_ORACLE, "documents"))
    with pytest.raises(NotImplementedError):
        resize_stub(docs, 224, 224)


class TestFrameSample:
    def test_frame_rows_and_stride(self, spark):
        from dbsurveyor_spark.multimodal.codec import (
            FRAME_STRIDE,
            attach_payload,
            frame_sample,
        )

        docs = spark.createDataFrame(
            [(1, "x" * 300), (2, "y" * 10)], "doc_id bigint, text string"
        )
        rows = frame_sample(attach_payload(docs)).collect()
        by_doc = {}
        for r in rows:
            by_doc.setdefault(r.doc_id, []).append(r)
        # doc 1: 300 bytes → 4 full frames → indices 0 (stride 4)
        assert [r.frame_idx for r in by_doc[1]] == [0]
        assert by_doc[1][0].frame_n_bytes == 64
        # doc 2: short payload still yields one (partial) frame
        assert [r.frame_idx for r in by_doc[2]] == [0]
        assert by_doc[2][0].frame_n_bytes == 10
        assert FRAME_STRIDE == 4

    def test_long_payload_multiple_frames(self, spark):
        from dbsurveyor_spark.multimodal.codec import attach_payload, frame_sample

        docs = spark.createDataFrame(
            [(7, "z" * (64 * 9))], "doc_id bigint, text string"
        )
        rows = frame_sample(attach_payload(docs)).collect()
        assert sorted(r.frame_idx for r in rows) == [0, 4, 8]


class TestExtractFeatures:
    def test_fixed_dim_deterministic(self, spark):
        from dbsurveyor_spark.multimodal.codec import (
            EMBED_DIM,
            attach_payload,
            extract_features,
        )

        docs = spark.createDataFrame(
            [(1, "hello world"), (2, "other text")], "doc_id bigint, text string"
        )
        out1 = {r.doc_id: r.feature for r in extract_features(attach_payload(docs)).collect()}
        out2 = {r.doc_id: r.feature for r in extract_features(attach_payload(docs)).collect()}
        assert out1 == out2  # deterministic
        assert all(len(v) == EMBED_DIM for v in out1.values())
        assert all(0.0 <= x < 1.0 for v in out1.values() for x in v)


class TestImageNearDup:
    def test_dhash_one_byte_edit_is_local(self):
        """Appending one byte perturbs one stride cell → ≤ 2 gradient bits,
        the locality property the whole near-dup operator rests on."""
        from dbsurveyor_spark.multimodal.codec import image_dhash

        for text in ("the quick brown fox " * 9, "x" * 300, "abc def " * 40):
            base = image_dhash(text.encode())
            edited = image_dhash((text + "!").encode())
            assert bin(base ^ edited).count("1") <= 2, text
        # and an unrelated payload differs in many bits
        a = image_dhash(("spark " * 60).encode())
        b = image_dhash(("duck! " * 61).encode())
        assert bin(a ^ b).count("1") > 3

    def test_injected_edits_pair_with_originals(self, spark):
        from dbsurveyor_spark.multimodal.codec import mm_image_neardup
        from dbsurveyor_spark.operators.dedup import ID_OFFSET

        rows = mm_image_neardup(spark, "/root/testdata/sf0.001").collect()
        assert rows, "no near-dup pairs found"
        pairs = {(r.doc_a, r.doc_b) for r in rows}
        # every injected edited copy must pair with its original
        injected = {b - ID_OFFSET for _a, b in pairs if b >= ID_OFFSET}
        originals_with_copy = {a for a, b in pairs if b == a + ID_OFFSET}
        assert originals_with_copy, pairs
        assert injected and injected <= {a for a, _ in pairs}
        assert all(r.hamming <= 3 for r in rows)


class TestMultimodalPlans:
    """Plan-shape guards: Arrow-batched mapInPandas is the ONLY Python on
    these paths (never row-at-a-time), scans prune to (doc_id, text), and
    the frame near-dup join carries no uncapped broadcast."""

    def test_neardup_plans_prune_and_stay_arrow(self, spark):
        from dbsurveyor_spark.multimodal.codec import (
            mm_frame_neardup,
            mm_frame_scene_cuts,
            mm_image_neardup,
        )
        from dbsurveyor_spark.plans.asserts import (
            assert_read_schema_only,
            formatted_plan,
        )

        sf = "/root/testdata/sf0.001"
        for q in (mm_image_neardup, mm_frame_neardup, mm_frame_scene_cuts):
            df = q(spark, sf)
            plan = formatted_plan(df)
            # Arrow-batched kernels show up as MapInPandas; row-at-a-time
            # Python would be BatchEvalPython
            assert "MapInPandas" in plan, plan
            assert "BatchEvalPython" not in plan, plan
            assert_read_schema_only(
                df, "documents.parquet", {"doc_id", "text"}
            )

    def test_scene_cuts_single_shuffle(self, spark):
        from dbsurveyor_spark.multimodal.codec import mm_frame_scene_cuts
        from dbsurveyor_spark.plans.asserts import formatted_plan

        plan = formatted_plan(
            mm_frame_scene_cuts(spark, "/root/testdata/sf0.001")
        )
        # one exchange: hash(doc_id) for the window; the groupBy reuses it
        assert plan.count("Exchange (") == 1, plan


class TestAudioFingerprintMatch:
    def test_shift_invariance_of_subfingerprints(self):
        """A 2-frame pad shifts the subfingerprint SEQUENCE without
        changing its values — the property offset voting exploits."""
        from dbsurveyor_spark.multimodal.audio import (
            AUDIO_SHIFT_BYTES,
            audio_subfingerprints,
        )

        base = ("the quick brown fox jumps over the lazy dog " * 8).encode()
        shifted = b"x" * AUDIO_SHIFT_BYTES + base
        s0, s1 = audio_subfingerprints(base), audio_subfingerprints(shifted)
        assert s1[2 : 2 + len(s0)] == s0  # same values, two frames later

    def test_injected_shifted_copies_found_at_offset_two(self, spark):
        from dbsurveyor_spark.multimodal.audio import (
            mm_audio_fingerprint_match,
        )
        from dbsurveyor_spark.operators.dedup import ID_OFFSET

        rows = mm_audio_fingerprint_match(
            spark, "/root/testdata/sf0.001"
        ).collect()
        assert rows, "no audio matches found"
        injected = [r for r in rows if r.doc_b == r.doc_a + ID_OFFSET]
        assert injected, rows
        # the shifted copy's frames sit 2 later → copy.t - orig.t = 2,
        # and doc_b (the copy) is the larger id, so offset = a.t - b.t = -2
        assert all(r.offset == -2 for r in injected), injected

    def test_constant_payload_hazard_is_capped(self):
        """A constant-byte 'silent' payload repeats ONE subfingerprint at
        every position (the |occ|^2 join hazard); the operator caps
        per-(doc,sfp) occurrences at AUDIO_OCC_CAP."""
        from dbsurveyor_spark.multimodal.audio import (
            AUDIO_OCC_CAP,
            audio_subfingerprints,
        )

        sfps = audio_subfingerprints(b"\x07" * 4096)
        assert len(sfps) > 200 and len(set(sfps)) == 1  # the degenerate case
        assert AUDIO_OCC_CAP <= 8


def test_image_dedup_corpus_removes_every_injected_clone(spark):
    """Survivors are min-id representatives: no injected clone (original id
    + ID_OFFSET) may survive, every original must, and the survivor count
    equals media minus the clustered-away rows."""
    from pyspark.sql import functions as F

    from dbsurveyor_spark.multimodal import codec
    from dbsurveyor_spark.operators.dedup import ID_OFFSET

    sf = "/root/testdata/sf0.001"
    rows = codec.mm_image_dedup_corpus(spark, sf).collect()
    assert rows
    ids = {r.doc_id for r in rows}
    media_ids = {
        r.doc_id for r in codec._image_media(spark, sf).select("doc_id").collect()
    }
    clones = {i for i in media_ids if i >= ID_OFFSET}
    assert clones
    # a clone's original (clone - ID_OFFSET) is in media and has a smaller
    # id, and the one-byte edit keeps Hamming <= 3 → clone never survives
    assert not ids & clones
    assert ids <= media_ids
    # survivors keep exactly one representative per cluster: at minimum,
    # all non-clustered originals survive
    pairs = codec.mm_image_neardup(spark, sf).select("doc_a", "doc_b").collect()
    paired = {p.doc_a for p in pairs} | {p.doc_b for p in pairs}
    singletons = media_ids - paired
    assert singletons <= ids


class TestAudioActivitySegments:
    """mm_audio_activity_segments: segment invariants + python replay."""

    def test_segments_match_python_replay(self, spark):
        import numpy as np

        from dbsurveyor_spark.multimodal import audio as A

        rows = A.mm_audio_activity_segments(spark, SF_ORACLE).collect()
        got = sorted((r.doc_id, r.seg_id, r.start_frame, r.end_frame,
                      r.n_frames, r.sum_energy) for r in rows)
        want = []
        for d in load_table(spark, SF_ORACLE, "documents").collect():
            buf = d.text.encode()
            nf = max(0, (len(buf) - A.AUDIO_WIN) // A.AUDIO_STRIDE + 1)
            if nf == 0:
                continue
            e = [
                sum(buf[t * A.AUDIO_STRIDE: t * A.AUDIO_STRIDE + A.AUDIO_WIN])
                for t in range(nf)
            ]
            tot = sum(e)
            active = [v * nf > tot for v in e]
            sid, t = 0, 0
            while t < nf:
                if active[t]:
                    s = t
                    while t < nf and active[t]:
                        t += 1
                    sid += 1
                    want.append((d.doc_id, sid, s, t - 1, t - s,
                                 sum(e[s:t])))
                else:
                    t += 1
        assert got == sorted(want)
        # every doc's segments are disjoint, ordered, within frame range
        by_doc = {}
        for r in rows:
            by_doc.setdefault(r.doc_id, []).append(r)
        for d, rs in by_doc.items():
            rs.sort(key=lambda r: r.seg_id)
            assert [r.seg_id for r in rs] == list(range(1, len(rs) + 1))
            for a, b in zip(rs, rs[1:]):
                assert a.end_frame + 1 < b.start_frame  # gap between runs


class TestAudioPairMemo:
    """aligned_pairs memo (multimodal/audio.py): one build per lake."""

    def test_same_lake_returns_same_cached_frame(self, spark):
        from dbsurveyor_spark.multimodal import audio as A

        p1 = A.aligned_pairs(spark, SF_ORACLE)
        p2 = A.aligned_pairs(spark, SF_ORACLE)
        assert p1 is p2
        assert p1.storageLevel.useMemory

    def test_reregisters_after_clear_cache(self, spark):
        from dbsurveyor_spark.multimodal import audio as A

        A.aligned_pairs(spark, SF_ORACLE)
        spark.catalog.clearCache()
        p = A.aligned_pairs(spark, SF_ORACLE)
        assert p.storageLevel.useMemory  # re-registered on memo hit
