"""Bounded persist ring shared by operators whose RETURNED frames
consume persisted intermediates lazily (shingle/signature frames, BM25
term stats, sketch outputs). The operator cannot unpersist before
returning — the caller hasn't materialized yet — so without a bound a
long-lived session running many such operators (the bench/correctness
flow) accumulates one cached frame per call until executor storage
evicts under pressure. Ring eviction keeps the most recent
``RING_MAX`` pins live; evicted frames simply recompute if someone
still holds them (persist is a hint, not a correctness dependency).

Rings are keyed PER SparkSession, and multiple rings may be live at
once: a process legitimately holds several live sessions (newSession()
for temp-view isolation shares one healthy JVM), so "different session"
must NOT be treated as "stale" — dropping another live session's ring
without unpersist would leak its cached plans in the shared JVM
CacheManager, exactly the growth RING_MAX exists to bound. Instead the
NUMBER of rings is bounded too: past ``MAX_RINGS`` the oldest other
ring is evicted frame-by-frame with best-effort unpersist — a live
session's frames are actually released, a stopped session's Py4J call
raises and is swallowed (its JVM cache died with it). Eviction is
best-effort by the same reasoning everywhere: it must never fail the
operator that happens to be calling pin().

Same pattern as functions.text's _ZIP_CACHE, centralized so new
operators stop growing private copies.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_RINGS: dict[int, list] = {}
RING_MAX = 8
MAX_RINGS = 4


def pin(df: DataFrame) -> DataFrame:
    """persist() with bounded-ring eviction of the oldest pins."""
    df = df.persist()
    key = id(df.sparkSession)
    ring = _RINGS.setdefault(key, [])
    ring.append(df)
    while len(ring) > RING_MAX:
        try:
            ring.pop(0).unpersist(False)
        except Exception:
            pass  # best-effort: eviction must never fail the caller
    while len(_RINGS) > MAX_RINGS:
        stale_key = next(k for k in _RINGS if k != key)
        for frame in _RINGS.pop(stale_key, []):
            try:
                frame.unpersist(False)
            except Exception:
                pass  # stopped session: its JVM cache died with it
    return df
