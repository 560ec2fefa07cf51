"""Bounded persist ring shared by operators whose RETURNED frames
consume persisted intermediates lazily (shingle/signature frames, BM25
term stats, sketch outputs). The operator cannot unpersist before
returning — the caller hasn't materialized yet — so without a bound a
long-lived session running many such operators (the bench/correctness
flow) accumulates one cached frame per call until executor storage
evicts under pressure. Ring eviction keeps the most recent
``RING_MAX`` pins live; evicted frames simply recompute if someone
still holds them (persist is a hint, not a correctness dependency).

The ring is keyed PER SparkSession: in multi-session processes (test
runs, session restarts in a long-lived service) a stale session's
frames are dropped wholesale instead of letting an eviction-time
Py4J call against a stopped JVM crash whichever unrelated operator
happens to call pin() next. Eviction itself is best-effort by the
same reasoning — unpersist failures are swallowed.

Same pattern as functions.text's _ZIP_CACHE, centralized so new
operators stop growing private copies.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_RINGS: dict[int, list] = {}
RING_MAX = 8


def pin(df: DataFrame) -> DataFrame:
    """persist() with bounded-ring eviction of the oldest pins."""
    df = df.persist()
    key = id(df.sparkSession)
    # Frames pinned under a different (likely stopped/replaced) session
    # are dropped wholesale — their JVM may be gone; never call into it.
    for stale in [k for k in _RINGS if k != key]:
        _RINGS.pop(stale, None)
    ring = _RINGS.setdefault(key, [])
    ring.append(df)
    while len(ring) > RING_MAX:
        try:
            ring.pop(0).unpersist(False)
        except Exception:
            pass  # best-effort: eviction must never fail the caller
    return df
