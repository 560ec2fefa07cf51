"""load_tables memoization (r16 optimization): repeated loads of the
same immutable table return the SAME lazy plan (no re-list/re-infer),
while a rewrite of the underlying parquet (new mtime) yields a fresh
frame that reads the new data — the memo caches plans, never results."""

import os
import time

import pandas as pd

from indexlab_spark.session import load_tables


def test_repeat_load_returns_same_plan(spark, sf_dir):
    a = load_tables(spark, sf_dir, ("documents",))["documents"]
    b = load_tables(spark, sf_dir, ("documents",))["documents"]
    assert a is b  # memo hit: same analyzed plan object


def test_rewrite_invalidates_memo(spark, tmp_path):
    p = tmp_path / "documents.parquet"
    pd.DataFrame({"doc_id": [1, 2], "text": ["a", "b"]}).to_parquet(p)
    d1 = load_tables(spark, str(tmp_path), ("documents",))["documents"]
    assert d1.count() == 2
    # ensure a strictly newer mtime even on coarse filesystem clocks
    pd.DataFrame({"doc_id": [1, 2, 3], "text": list("abc")}).to_parquet(p)
    now = time.time()
    os.utime(p, (now + 2, now + 2))
    d2 = load_tables(spark, str(tmp_path), ("documents",))["documents"]
    assert d2 is not d1
    assert d2.count() == 3


def test_memo_is_lazy_not_cached(spark, sf_dir):
    df = load_tables(spark, sf_dir, ("documents",))["documents"]
    # StorageLevel NONE: the memoized frame is not persisted — every
    # action recomputes from parquet (the "no result caching" contract)
    assert not df.storageLevel.useMemory and not df.storageLevel.useDisk
