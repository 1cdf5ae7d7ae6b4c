"""True Structured Streaming: file source + watermark + availableNow."""

from __future__ import annotations

import shutil
import tempfile

from dbsurveyor_spark.streaming.events import (
    stream_tumbling_counts,
    stream_windowed_counts_job,
)

from .conftest import SF_ORACLE


def test_streaming_matches_batch(spark):
    ckpt = tempfile.mkdtemp(prefix="ckpt_", dir="/root/repo/.tmp")
    try:
        streamed = stream_windowed_counts_job(spark, SF_ORACLE, ckpt)
        batch = stream_tumbling_counts(spark, SF_ORACLE).select(
            "window_start", "event_type", "event_count"
        )
        s = {tuple(r) for r in streamed.collect()}
        b = {tuple(r) for r in batch.collect()}
        assert s == b, f"stream/batch divergence: {len(s ^ b)} rows differ"
        assert len(s) > 0
    finally:
        shutil.rmtree(ckpt, ignore_errors=True)
