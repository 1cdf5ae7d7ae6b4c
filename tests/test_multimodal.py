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
