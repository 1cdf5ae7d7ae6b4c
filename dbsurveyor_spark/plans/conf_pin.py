"""Process-wide lock for session-conf pinning (r8 verdict item #8).

Several iterative operators pin session config for the duration of their
round loop (AQE off + static small shuffle partitions on metadata-small
frames — the job-latency regime fix). ``spark.conf`` is SESSION-global:
two such loops sharing one session from different threads would otherwise
interleave set/restore and leak a pin into the other query's exchanges.

``pinned_conf`` serializes every pinned region behind one re-entrant
process lock and restores the saved values in ``finally``. Loops that
skip the pin (big frames — the 100 TB path) never touch the lock, so
at-scale concurrency is unaffected; only the small-frame latency-bound
loops serialize, and those hold the lock for fractions of a second.

(A fully isolated alternative — running each loop on a
``spark.newSession()`` clone — does not compose with DataFrames already
bound to the parent session; the lock is the correct tool at this
engine's session-sharing granularity.)
"""

from __future__ import annotations

import threading
from contextlib import contextmanager
from typing import Iterator

from pyspark.sql import SparkSession

_PIN_LOCK = threading.RLock()


@contextmanager
def pinned_conf(spark: SparkSession, settings: dict[str, str]) -> Iterator[None]:
    """Set ``settings`` on the session conf for the duration of the block,
    holding the process-wide pin lock; restore saved values on exit."""
    with _PIN_LOCK:
        conf = spark.conf
        saved = {k: conf.get(k) for k in settings}
        try:
            for k, v in settings.items():
                conf.set(k, v)
            yield
        finally:
            for k, v in saved.items():
                conf.set(k, v)
