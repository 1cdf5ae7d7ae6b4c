"""Per-round plan inspection seam for iterative operators.

Every iterative operator (graph-ANN beam search, k-center coreset, star
contraction, PageRank) truncates lineage with a ``localCheckpoint`` each
round — and an EAGER checkpoint executes the round's plan at operator-
construction time, so the registry-wide plan-lint gate
(``tests/test_plan_lint.py``) only ever walks the final stitched plan:
every per-round join, window, and broadcast is invisible to the one test
meant to catch the next scale hazard at author time.

``checkpoint_round`` is the required seam: in production it is a pure
pass-through to ``DataFrame.localCheckpoint`` (zero cost — one ``None``
check per round), while tests install an inspector via ``round_inspector``
that runs the same ``_window_violations`` / ``_broadcast_violations``
walkers on each round's PRE-checkpoint DataFrame. A new iterative
operator that ships a partition-less window or a data-scaled broadcast
hint inside a checkpointed round now fails the gate like any other query.
"""

from __future__ import annotations

import threading
from contextlib import contextmanager
from typing import Callable, Iterator, Optional

from pyspark.sql import DataFrame

_HOOK: Optional[Callable[[DataFrame, str], None]] = None
_HOOK_LOCK = threading.Lock()


def checkpoint_round(
    df: DataFrame, label: str, eager: bool = True
) -> DataFrame:
    """Checkpoint one iterative round, exposing the pre-checkpoint plan to
    the test-time inspector. ``label`` is ``"<operator>:<round tag>"``."""
    hook = _HOOK
    if hook is not None:
        hook(df, label)
    return df.localCheckpoint(eager=eager)


@contextmanager
def round_inspector(
    fn: Callable[[DataFrame, str], None]
) -> Iterator[None]:
    """Install ``fn`` as the per-round inspector for the duration of the
    block (test-time only; nested installs restore the previous hook)."""
    global _HOOK
    with _HOOK_LOCK:
        prev = _HOOK
        _HOOK = fn
    try:
        yield
    finally:
        with _HOOK_LOCK:
            _HOOK = prev
