"""Bounded persist ring shared by operators whose RETURNED frames
consume persisted intermediates lazily (shingle/signature frames, BM25
term stats, sketch outputs). The operator cannot unpersist before
returning — the caller hasn't materialized yet — so without a bound a
long-lived session running many such operators (the bench/correctness
flow) accumulates one cached frame per call until executor storage
evicts under pressure. Ring eviction keeps the most recent
``RING_MAX`` pins live; evicted frames simply recompute if someone
still holds them (persist is a hint, not a correctness dependency).

Same pattern as functions.text's _ZIP_CACHE, centralized so new
operators stop growing private copies.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_RING: list = []
RING_MAX = 8


def pin(df: DataFrame) -> DataFrame:
    """persist() with bounded-ring eviction of the oldest pins."""
    df = df.persist()
    _RING.append(df)
    while len(_RING) > RING_MAX:
        _RING.pop(0).unpersist(False)
    return df
