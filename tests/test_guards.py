"""Round-5 guard behaviors: bounded dedup state, adaptive LSH probing,
overfull-bucket handling, per-session cache ring, non-destructive
bucketed-table orphan recovery."""

import os

import numpy as np
import pytest
from pyspark.sql import functions as F

from indexlab_spark.operators import dedup as dedup_mod
from indexlab_spark.operators.dedup import embedding_lsh_pairs, exact_dedup


def test_exact_dedup_max_ids_caps_array_not_counts(spark):
    rows = [(i, "same text for every row") for i in range(150)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    row = exact_dedup(df, max_ids=10).collect()[0]
    assert row["cnt"] == 150  # full-group stats unaffected by the cap
    assert row["keep_id"] == 0
    assert row["ids"] == list(range(10))  # first 10 by id order
    full = exact_dedup(df, max_ids=None).collect()[0]
    assert full["ids"] == list(range(150))


def _vec_corpus(spark, n_base=30, n_dups=4, dim=64, seed=7):
    """Random unit vectors + planted near-identical pairs (i, 1000+i)."""
    rng = np.random.default_rng(seed)
    base = rng.standard_normal((n_base, dim))
    base /= np.linalg.norm(base, axis=1, keepdims=True)
    rows = [(i, [float(x) for x in base[i]]) for i in range(n_base)]
    for i in range(n_dups):
        noisy = base[i] + 0.01 * rng.standard_normal(dim)
        noisy /= np.linalg.norm(noisy)
        rows.append((1000 + i, [float(x) for x in noisy]))
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_embedding_lsh_auto_gate_matches_forced_setting(spark, monkeypatch):
    corpus = _vec_corpus(spark)
    monkeypatch.setattr(dedup_mod, "MULTIPROBE_AUTO_MAX_ROWS", 4)
    gated = {(r["id_a"], r["id_b"]) for r in
             embedding_lsh_pairs(corpus, threshold=0.9).collect()}
    forced_off = {(r["id_a"], r["id_b"]) for r in
                  embedding_lsh_pairs(corpus, threshold=0.9,
                                      multiprobe=0).collect()}
    assert gated == forced_off  # corpus (34 rows) > 4 -> auto == off
    monkeypatch.setattr(dedup_mod, "MULTIPROBE_AUTO_MAX_ROWS", 10_000)
    on = {(r["id_a"], r["id_b"]) for r in
          embedding_lsh_pairs(corpus, threshold=0.9).collect()}
    forced_on = {(r["id_a"], r["id_b"]) for r in
                 embedding_lsh_pairs(corpus, threshold=0.9,
                                     multiprobe=1).collect()}
    assert on == forced_on
    # multiprobe only ever ADDS verified candidates
    assert forced_off <= forced_on
    # planted near-identical pairs collide on band 0 either way
    assert (0, 1000) in forced_off


def test_embedding_lsh_overfull_bucket_guard(spark):
    # 20 byte-identical vectors: every (band, key) bucket holds all 20 —
    # a degenerate clique whose pair count is O(occupancy^2)
    v = [float(x) for x in np.ones(64) / 8.0]
    df = spark.createDataFrame(
        [(i, v) for i in range(20)], "vec_id long, embedding array<double>"
    )
    unguarded = embedding_lsh_pairs(
        df, threshold=0.99, multiprobe=0, max_bucket=None
    ).count()
    assert unguarded == 20 * 19 // 2  # full clique found
    guarded = embedding_lsh_pairs(
        df, threshold=0.99, multiprobe=0, max_bucket=5
    ).count()
    assert guarded == 0  # every bucket overfull -> dropped, loudly


def test_minhash_lsh_overfull_bucket_guard(spark):
    from indexlab_spark.operators.dedup import minhash_lsh_pairs

    # 20 identical texts + 2 near-dup texts. The identical group fills
    # every one of its band buckets past max_bucket=5 -> dropped (its
    # pairs are exact dups, exact_dedup territory); the near-dup pair,
    # whose buckets stay small, must survive the guard.
    # the small pair is identical text so its band collision is certain
    # (the test pins GUARD behavior — occupancy 2 < max_bucket survives)
    boiler = "the same boilerplate line repeated in every mirror page"
    small = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    rows = [(i, boiler) for i in range(20)] + [(100, small), (101, small)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    unguarded = minhash_lsh_pairs(df, threshold=0.5, max_bucket=None)
    un_pairs = {(r["id_a"], r["id_b"]) for r in unguarded.collect()}
    assert sum(1 for a, b in un_pairs if a < 20 and b < 20) == 20 * 19 // 2
    guarded = minhash_lsh_pairs(df, threshold=0.5, max_bucket=5)
    g_pairs = {(r["id_a"], r["id_b"]) for r in guarded.collect()}
    assert not any(a < 20 and b < 20 for a, b in g_pairs)  # clique dropped
    assert (100, 101) in g_pairs  # small-bucket near-dups unaffected


def test_duplicated_spans_merges_maximal_ranges(spark):
    from indexlab_spark.operators.dedup import duplicated_spans

    shared = "alpha beta gamma delta epsilon zeta"  # 6 shared tokens
    rows = [
        (0, f"{shared} unique tail zero xx yy"),
        (1, f"own head one {shared} own tail one"),
        (2, "totally different content with no overlap at all here"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    spans = {
        r["doc_id"]: (r["start_tok"], r["end_tok"], r["n_tokens"])
        for r in duplicated_spans(df, k=6, min_count=2).collect()
    }
    # the shared 6-gram marks exactly its own range in each doc
    assert spans[0] == (0, 5, 6)
    assert spans[1] == (3, 8, 6)
    assert 2 not in spans
    # overlapping duplicated windows merge into ONE maximal span
    long_shared = "one two three four five six seven eight"  # 8 tokens
    df2 = spark.createDataFrame(
        [(0, f"{long_shared} tail a"), (1, f"head b {long_shared}")],
        "doc_id long, text string",
    )
    spans2 = {
        r["doc_id"]: (r["start_tok"], r["end_tok"], r["n_tokens"])
        for r in duplicated_spans(df2, k=6, min_count=2).collect()
    }
    # 3 overlapping 6-grams (pos 0,1,2) merge to tokens [0, 7] in doc 0
    assert spans2[0] == (0, 7, 8)
    assert spans2[1] == (2, 9, 8)
    # GAP-AWARE merge: marked positions 0 and 2 with k=3 overlap on
    # token 2 — one maximal span, not two overlapping rows; marked
    # positions farther apart than k stay separate spans
    df3 = spark.createDataFrame(
        [
            (0, "a b c d e"),                     # 'a b c' + 'c d e' dup
            (1, "a b c q r"),                     # donor of 'a b c'
            (2, "p q c d e"),                     # donor of 'c d e'
            (3, "a b c m1 m2 m3 m4 c d e"),       # gap 7 > k -> 2 spans
        ],
        "doc_id long, text string",
    )
    spans3 = {}
    for r in duplicated_spans(df3, k=3, min_count=2).collect():
        spans3.setdefault(r["doc_id"], []).append(
            (r["start_tok"], r["end_tok"], r["n_tokens"])
        )
    assert spans3[0] == [(0, 4, 5)]  # merged maximal span, no overlap
    assert spans3[1] == [(0, 2, 3)]
    assert spans3[2] == [(2, 4, 3)]
    assert sorted(spans3[3]) == [(0, 2, 3), (7, 9, 3)]


def test_remove_duplicated_spans_cuts_and_passes_through(spark):
    from indexlab_spark.operators.dedup import remove_duplicated_spans

    shared = "alpha beta gamma delta epsilon zeta"  # 6 shared tokens
    rows = [
        (0, f"{shared} unique tail zero xx yy"),
        (1, f"own head one {shared} own tail one"),
        (2, "totally different content with no overlap at all here"),
        (3, shared),  # entirely one duplicated span -> empty clean text
        (4, "tiny doc"),  # < k tokens: never enters gram generation
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r["doc_id"]: (r["n_tokens"], r["n_kept"], r["clean_text"])
        for r in remove_duplicated_spans(df, k=6, min_count=2).collect()
    }
    assert out[0] == (11, 5, "unique tail zero xx yy")
    assert out[1] == (12, 6, "own head one own tail one")
    # clean doc passes through whole (NULL-span coalesce guard)
    assert out[2] == (9, 9, rows[2][1])
    assert out[3] == (6, 0, "")
    assert out[4] == (2, 2, "tiny doc")


def test_cache_ring_survives_stale_sessions(spark):
    from indexlab_spark.functions import cache

    class _Broken:
        def unpersist(self, *_):
            raise RuntimeError("stopped session")

    class _Live:
        released = 0

        def unpersist(self, *_):
            _Live.released += 1

    cache._RINGS.clear()
    # another session's ring is NOT dropped just for being another
    # session (newSession() shares a live JVM — dropping would leak)
    cache._RINGS[12345] = [_Broken()] * 3
    df = spark.range(5)
    out = cache.pin(df)
    assert out.count() == 5
    assert 12345 in cache._RINGS
    # ... but past MAX_RINGS the oldest other ring is evicted with
    # best-effort unpersist: broken (stopped-session) frames are
    # swallowed, live frames are actually released
    cache._RINGS.clear()
    cache._RINGS[1] = [_Broken()] * 2
    cache._RINGS[2] = [_Live(), _Live()]
    for k in range(3, 3 + cache.MAX_RINGS - 1):
        cache._RINGS[k] = []  # 5 rings total; pin() makes 6 -> evict 2
    assert cache.pin(spark.range(2)).count() == 2
    assert 1 not in cache._RINGS and 2 not in cache._RINGS
    assert _Live.released == 2
    assert len(cache._RINGS) == cache.MAX_RINGS
    # eviction of a broken entry inside the LIVE ring must not raise
    key = id(df.sparkSession)
    cache._RINGS[key] = [_Broken()] * cache.RING_MAX
    assert cache.pin(spark.range(3)).count() == 3
    cache._RINGS.clear()


def test_write_bucketed_orphan_renamed_not_deleted(spark, tmp_path):
    from urllib.parse import urlparse

    from indexlab_spark.plans.colocate import write_bucketed

    wh = urlparse(
        str(spark._jsparkSession.sessionState().conf().warehousePath())
    ).path
    table = "orphan_guard_t1"
    orphan = os.path.join(wh, table)
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    os.makedirs(orphan, exist_ok=True)
    marker = os.path.join(orphan, "stale.marker")
    open(marker, "w").write("old data")
    try:
        df = spark.range(10).select(
            F.col("id").alias("k"), (F.col("id") * 2).alias("v")
        )
        write_bucketed(df, table, "k", buckets=2, mode="overwrite")
        assert spark.table(table).count() == 10
        # old directory renamed aside, contents preserved
        assert os.path.exists(os.path.join(wh, f"{table}.orphan-0", "stale.marker"))
        assert not os.path.exists(marker)
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {table}")
        import shutil

        shutil.rmtree(os.path.join(wh, f"{table}.orphan-0"), ignore_errors=True)


def test_write_bucketed_non_overwrite_never_touches_orphan(spark):
    from urllib.parse import urlparse

    from indexlab_spark.plans.colocate import write_bucketed

    wh = urlparse(
        str(spark._jsparkSession.sessionState().conf().warehousePath())
    ).path
    table = "orphan_guard_t2"
    orphan = os.path.join(wh, table)
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    os.makedirs(orphan, exist_ok=True)
    marker = os.path.join(orphan, "stale.marker")
    open(marker, "w").write("old data")
    try:
        df = spark.range(4).select(F.col("id").alias("k"))
        with pytest.raises(Exception):
            # catalog doesn't know the table but its location exists:
            # error-mode must surface the conflict, not clear it
            write_bucketed(df, table, "k", buckets=2, mode="error")
        assert os.path.exists(marker)  # orphan untouched
    finally:
        spark.sql(f"DROP TABLE IF EXISTS {table}")
        import shutil

        shutil.rmtree(orphan, ignore_errors=True)


def test_read_html_tree_literal_glob_filenames(spark, tmp_path):
    from indexlab_spark.sources.reader import read_html_tree

    # 'intro[1].htm' is a common CHM/browser-cache artifact name; the
    # content load must treat collected paths literally, not as Hadoop
    # globs (where [1] is a character class matching 'intro1.htm')
    d = tmp_path / "tree"
    d.mkdir()
    (d / "intro[1].htm").write_text("<html><body>bracket page</body></html>")
    (d / "intro1.htm").write_text("<html><body>plain page</body></html>")
    out = {
        os.path.basename(r["path"]): r["text"]
        for r in read_html_tree(spark, str(d)).collect()
    }
    assert len(out) == 2
    assert any("bracket page" in t for t in out.values())
    assert any("plain page" in t for t in out.values())


def test_minhash_incremental_matches_batch(spark, sf_dir):
    from indexlab_spark.operators.dedup import (
        minhash_incremental_pairs,
        minhash_lsh_pairs,
        minhash_signatures,
    )
    from indexlab_spark.session import load_tables

    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    old = docs.filter(F.col("doc_id") % 5 != 0)
    new = docs.filter(F.col("doc_id") % 5 == 0)
    kw = dict(num_hashes=16, bands=8, threshold=0.5)

    def pairs(df_):
        return {
            (r["id_a"], r["id_b"], r["jaccard"])
            for r in df_.collect()
        }

    full = pairs(minhash_lsh_pairs(docs, **kw))
    old_only = pairs(minhash_lsh_pairs(old, **kw))
    inc = pairs(minhash_incremental_pairs(new, old, **kw))
    # every incremental pair involves a new doc, and the union is EXACTLY
    # the batch result — the contract that makes the index trustworthy
    assert all(a % 5 == 0 or b % 5 == 0 for a, b, _ in inc)
    assert old_only | inc == full
    assert old_only.isdisjoint(inc)
    # a persisted signature index gives the identical answer
    sigs = minhash_signatures(old, num_hashes=16)
    inc2 = pairs(minhash_incremental_pairs(new, old, old_sigs=sigs, **kw))
    assert inc2 == inc
