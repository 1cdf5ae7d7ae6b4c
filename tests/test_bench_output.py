"""bench.py driver-contract output: the LAST stdout line must carry the
per-query steady map and fit the round driver's 2,000-char stdout tail
(VERDICT r8 item #1 — r8's last line had no per-query map, so the driver's
PERF per_query/scaling blocks came out empty)."""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import HEADLINE, compact_last_line


def _fake_steady(n: int) -> dict[str, float]:
    # Worst-realistic shape: every headline query present (padded with
    # long synthetic names beyond the current set) at 2-digit-ish values.
    names = list(HEADLINE) + [
        f"future_query_with_a_long_name_{i:02d}" for i in range(n - len(HEADLINE))
    ]
    return {k: 2.4 + (i % 7) * 1.3 for i, k in enumerate(names[:n])}


def test_last_line_fits_driver_tail_and_parses():
    steady = _fake_steady(len(HEADLINE))
    line = compact_last_line(123.456, steady, 0.1, len(steady) + 4)
    assert len(line) <= 1990, len(line)
    doc = json.loads(line)
    assert doc["metric"] == "headline_queries_wall_clock"
    assert doc["unit"] == "sec"
    assert set(doc["queries"]) == set(steady)
    assert all(isinstance(v, (int, float)) for v in doc["queries"].values())


def test_last_line_guard_never_overflows():
    # 40 extra long-named queries push the encoding past the limit; the
    # guard degrades (int seconds, then dropping the smallest-steady
    # entries) but never overflows and keeps the heaviest queries.
    steady = _fake_steady(len(HEADLINE) + 40)
    line = compact_last_line(321.0, steady, 0.1, len(steady))
    assert len(line) <= 1990, len(line)
    doc = json.loads(line)
    kept = set(doc["queries"])
    assert kept <= set(steady)
    if kept != set(steady):
        assert doc["dropped"] == len(steady) - len(kept)
        # everything dropped must be <= everything kept (smallest cut first)
        max_dropped = max(steady[k] for k in set(steady) - kept)
        min_kept = min(steady[k] for k in kept)
        assert max_dropped <= min_kept


def test_build_items_stay_on_detail_line():
    steady = {"q1_pricing_summary": 1.0, "ivf_index_build": 9.0}
    doc = json.loads(compact_last_line(1.0, steady, 0.1, 2))
    assert "ivf_index_build" not in doc["queries"]
    assert "q1_pricing_summary" in doc["queries"]
