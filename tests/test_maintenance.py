"""Maintenance operators: merge-upsert, compaction, range clustering."""

import pyspark.sql.functions as F
import pytest

from indexlab_spark.operators.maintenance import (
    compact_files,
    merge_upsert,
    parquet_file_ranges,
    write_range_clustered,
)


@pytest.fixture()
def docs(tables):
    return tables["documents"]


def test_merge_upsert_latest_wins(spark, docs):
    base = docs.withColumn("rev", F.lit(0))
    updates = (
        docs.filter(F.col("doc_id") % 5 == 0)
        .withColumn("text", F.upper("text"))
        .withColumn("rev", F.lit(1))
    )
    merged = merge_upsert(base, updates, keys=["doc_id"], order_col="rev")

    assert merged.count() == base.count()  # upsert, not append
    got = {r["doc_id"]: r for r in merged.collect()}
    for r in base.collect():
        if r["doc_id"] % 5 == 0:
            assert got[r["doc_id"]]["text"] == r["text"].upper()
            assert got[r["doc_id"]]["rev"] == 1
        else:
            assert got[r["doc_id"]]["text"] == r["text"]
            assert got[r["doc_id"]]["rev"] == 0


def test_merge_upsert_tie_prefers_updates(spark):
    base = spark.createDataFrame([(1, "old", 7)], "k long, v string, rev long")
    upd = spark.createDataFrame([(1, "new", 7)], "k long, v string, rev long")
    out = merge_upsert(base, upd, keys=["k"], order_col="rev").collect()
    assert out[0]["v"] == "new"  # same rev: MERGE semantics, update wins


def test_merge_upsert_single_shuffle(spark, docs):
    base = docs.withColumn("rev", F.lit(0))
    upd = base.limit(10).withColumn("rev", F.lit(1))
    plan = merge_upsert(base, upd, keys=["doc_id"], order_col="rev")._jdf.queryExecution().executedPlan().toString()
    # one hash aggregation shuffle; no SortMergeJoin / Window in the plan
    assert "Window" not in plan
    assert "SortMergeJoin" not in plan


def test_compact_files(spark, docs, tmp_path):
    frag = str(tmp_path / "fragmented")
    docs.repartition(64).write.parquet(frag)
    out = str(tmp_path / "compacted")
    stats = compact_files(spark, frag, out, target_file_bytes=1 << 40)
    assert stats["files_in"] == 64
    assert stats["files_out"] == 1
    a = sorted(r["doc_id"] for r in spark.read.parquet(frag).collect())
    b = sorted(r["doc_id"] for r in spark.read.parquet(out).collect())
    assert a == b

    # honest sizing: tiny target -> more than one output file
    stats2 = compact_files(
        spark, frag, str(tmp_path / "c2"),
        target_file_bytes=max(1, stats["bytes_in"] // 4),
    )
    assert 2 <= stats2["files_out"] <= 8


def test_range_clustered_layout_is_disjoint_and_prunes(spark, tables, tmp_path):
    ev = tables["events"]
    path = str(tmp_path / "clustered")
    write_range_clustered(ev, path, "event_id", n_ranges=8)

    ranges = parquet_file_ranges(path, "event_id")
    assert len(ranges) >= 4
    for (lo, hi) in ranges:
        assert lo <= hi
    ordered = sorted(ranges)
    for (_, hi_prev), (lo_next, _) in zip(ordered, ordered[1:]):
        assert hi_prev < lo_next  # files cover disjoint event_id ranges

    # the predicate reaches the scan, so footer stats can prune files
    df = spark.read.parquet(path).filter(F.col("event_id").between(10, 20))
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "GreaterThanOrEqual(event_id,10)" in plan or "PushedFilters" in plan
    assert df.count() == ev.filter(F.col("event_id").between(10, 20)).count()


def test_incremental_rollup_refresh_matches_full(spark, tables):
    """refresh_rollup(rollup(base), delta) == rollup(base + delta) for
    the decomposable (count, sum) shape — three micro-batches applied
    incrementally converge to the full-recompute answer, with per-refresh
    work bounded by key count, not history size."""
    import pyspark.sql.functions as F

    from indexlab_spark.operators.maintenance import (
        refresh_rollup,
        rollup_events_daily,
    )

    ev = tables["events"].withColumn(
        "_b", (F.col("event_id") % 3).cast("int")
    ).persist()

    state = None
    for b in range(3):
        delta = rollup_events_daily(ev.filter(F.col("_b") == b))
        state = refresh_rollup(
            state, delta, keys=["day", "event_type"], sum_cols=("sum_value",)
        )
        state = state.localCheckpoint(eager=True)  # what a real job persists

    full = rollup_events_daily(ev)
    key = lambda r: (r["day"], r["event_type"])  # noqa: E731
    got = {key(r): (r["n"], round(r["sum_value"], 6)) for r in state.collect()}
    expect = {key(r): (r["n"], round(r["sum_value"], 6)) for r in full.collect()}
    assert got == expect and len(got) > 100


def test_scd2_from_changes_semantics(spark):
    """Tie at equal ts resolves to max tie_col; no-op changes collapse
    into the surrounding version; last version per key stays open."""
    from indexlab_spark.operators.maintenance import scd2_from_changes

    df = spark.createDataFrame(
        [
            (1, 10, 100, "A"),
            (1, 20, 101, "B"),
            (1, 20, 102, "C"),  # tie winner at ts=20
            (1, 30, 103, "C"),  # no-op -> collapsed
            (1, 40, 104, "A"),
            (2, 15, 200, "X"),
        ],
        "user_id int, ts int, event_id int, state string",
    )
    out = scd2_from_changes(
        df, "user_id", "ts", ["state"], tie_col="event_id"
    ).orderBy("user_id", "valid_from").collect()
    got = [
        (r["user_id"], r["state"], r["valid_from"], r["valid_to"], r["is_current"])
        for r in out
    ]
    assert got == [
        (1, "A", 10, 20, False),
        (1, "C", 20, 40, False),
        (1, "A", 40, None, True),
        (2, "X", 15, None, True),
    ]
    # without collapse, the no-op change opens its own version
    raw = scd2_from_changes(
        df, "user_id", "ts", ["state"], tie_col="event_id",
        collapse_unchanged=False,
    ).filter("user_id = 1").collect()
    assert len(raw) == 4


def test_zorder_clustering_tightens_both_columns(spark, tmp_path):
    """Z-order layout vs single-column range clustering on a 2-D grid:
    per-file min/max ranges (the stats a pruning scan consults) must be
    tight on BOTH dimensions under Z-order, while 1-D clustering leaves
    the second column's per-file range at ~full width. Also: zval is
    deterministic, and monotone along the diagonal."""
    from indexlab_spark.operators.maintenance import (
        parquet_file_ranges,
        write_range_clustered,
        write_zorder_clustered,
        zorder_key,
    )

    n = 64
    rows = [(i * n + j, float(i), float(j)) for i in range(n) for j in range(n)]
    df = spark.createDataFrame(rows, "id long, x double, y double")

    zpath = str(tmp_path / "zorder")
    rpath = str(tmp_path / "range_x")
    write_zorder_clustered(df, zpath, ["x", "y"], n_ranges=16)
    write_range_clustered(df, rpath, "x", n_ranges=16)

    def avg_span(path, col):
        spans = [hi - lo for lo, hi in parquet_file_ranges(path, col)]
        return sum(spans) / len(spans)

    # both layouts keep x tight-ish; the y spans are the story: 1-D
    # clustering leaves y at ~full width per file, Z-order cuts it
    assert avg_span(rpath, "y") > 0.9 * (n - 1)
    assert avg_span(zpath, "y") < 0.5 * (n - 1)
    assert avg_span(zpath, "x") < 0.5 * (n - 1)
    # rewrite preserved content
    assert spark.read.parquet(zpath).count() == n * n

    keyed = zorder_key(df, ["x", "y"])
    z = {r["id"]: r["zval"] for r in keyed.collect()}
    assert z == {r["id"]: r["zval"] for r in zorder_key(df, ["x", "y"]).collect()}
    # diagonal monotonicity: (0,0) < (1,1) < (2,2) in Morton order
    assert z[0] < z[n + 1] < z[2 * n + 2]


def test_zorder_key_guards(spark):
    import pytest as _pytest

    from indexlab_spark.operators.maintenance import zorder_key

    df = spark.createDataFrame([(1, 1.0, 2.0)], "id long, x double, y double")
    with _pytest.raises(ValueError):
        zorder_key(df, ["x"])
    with _pytest.raises(ValueError):
        zorder_key(df, ["x", "y"], bits=32)
    # constant column ranks 0 everywhere -> key still well-defined
    const = spark.createDataFrame(
        [(1, 5.0, 1.0), (2, 5.0, 2.0)], "id long, x double, y double"
    )
    out = {r["id"]: r["zval"] for r in zorder_key(const, ["x", "y"]).collect()}
    assert out[1] < out[2]


try:
    from hypothesis import given, settings
    from hypothesis import strategies as st

    _HAVE_HYP = True
except ImportError:  # pragma: no cover
    _HAVE_HYP = False

if _HAVE_HYP:

    @settings(max_examples=10, deadline=None)
    @given(
        seed=st.integers(0, 10**6),
        n=st.integers(2, 40),
        bits=st.sampled_from([4, 8, 16]),
    )
    def test_zorder_key_matches_python_morton(spark, seed, n, bits):
        """zorder_key == a pure-Python morton reference (same min-max
        quantization, same clamp, same interleave) on random points —
        shares the suite's session fixture across examples."""
        import random

        from indexlab_spark.operators.maintenance import zorder_key

        rng = random.Random(seed)
        rows = [
            (i, rng.uniform(-50, 50), rng.uniform(0, 9)) for i in range(n)
        ]
        df = spark.createDataFrame(rows, "id long, x double, y double")
        got = {
            r["id"]: r["zval"]
            for r in zorder_key(df, ["x", "y"], bits=bits).collect()
        }
        top = (1 << bits) - 1
        xs = [r[1] for r in rows]
        ys = [r[2] for r in rows]
        mnx, mxx, mny, mxy = min(xs), max(xs), min(ys), max(ys)

        def rank(v, mn, mx):
            if mx <= mn:
                return 0
            import math

            return min(max(int(math.floor((v - mn) / (mx - mn) * top)), 0), top)

        for i, x, y in rows:
            rx, ry = rank(x, mnx, mxx), rank(y, mny, mxy)
            z = 0
            for b in range(bits):
                z |= ((rx >> b) & 1) << (2 * b)
                z |= ((ry >> b) & 1) << (2 * b + 1)
            assert got[i] == z, (i, got[i], z)


def test_expire_versions_keeps_latest_and_deletes_dirs(spark, tmp_path):
    """Snapshot retention: older versions' partition directories vanish,
    the latest keep_n survive and stay readable, manifests rewrite to
    the survivors."""
    import os

    from pyspark.sql import functions as F

    from indexlab_spark.operators.maintenance import expire_versions

    chunks = str(tmp_path / "chunks")
    manifests = str(tmp_path / "manifests")
    rows = []
    for idx in ("a", "b"):
        for v in ("v1", "v2", "v3"):
            rows += [(idx, v, i, f"{idx}-{v}-{i}") for i in range(5)]
    df = spark.createDataFrame(
        rows, "index_name string, version string, pos int, text string"
    )
    df.write.partitionBy("index_name", "version").parquet(chunks)
    spark.createDataFrame(
        [
            (idx, v, f"2024-01-0{n}")
            for idx in ("a", "b")
            for n, v in enumerate(("v1", "v2", "v3"), start=1)
        ],
        "index_name string, version string, created_at string",
    ).write.parquet(manifests)

    out = expire_versions(spark, chunks, manifests, keep_n=2)
    assert sorted(out["deleted"]) == [("a", "v1"), ("b", "v1")]
    assert out["kept"] == 4
    assert not os.path.exists(f"{chunks}/index_name=a/version=v1")
    assert os.path.exists(f"{chunks}/index_name=a/version=v3")
    # survivors still readable with correct rows
    left = spark.read.parquet(chunks)
    assert left.count() == 20
    assert left.filter(F.col("version") == "v1").count() == 0
    mf = spark.read.parquet(manifests)
    assert mf.count() == 4
    assert mf.filter(F.col("version") == "v1").count() == 0
    # the staging dir used for the manifest swap is cleaned up
    assert not os.path.exists(manifests.rstrip("/") + "__staging")

    # keep_n=1 expires one more round; keep_n<1 refused
    out2 = expire_versions(spark, chunks, manifests, keep_n=1)
    assert sorted(out2["deleted"]) == [("a", "v2"), ("b", "v2")]
    import pytest as _pytest

    with _pytest.raises(ValueError):
        expire_versions(spark, chunks, manifests, keep_n=0)
    # no-op when nothing to expire
    assert expire_versions(spark, chunks, manifests, keep_n=5)["deleted"] == []


def test_table_diff_classifies_all_four_states(spark):
    from pyspark.sql import functions as F

    from indexlab_spark.operators.maintenance import table_diff

    old = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", None), (4, "d", 40.0)],
        "id long, name string, v double",
    )
    new = spark.createDataFrame(
        [(1, "a", 10.0), (2, "B", 20.0), (3, "c", 30.0), (5, "e", 50.0)],
        "id long, name string, v double",
    )
    out = {r["id"]: r["status"] for r in table_diff(old, new, ["id"]).collect()}
    assert out == {
        1: "unchanged",
        2: "changed",       # name differs
        3: "changed",       # NULL -> value counts as change
        4: "removed",
        5: "added",
    }
    # restricted compare: only v — id 2's name change becomes invisible
    out_v = {
        r["id"]: r["status"]
        for r in table_diff(old, new, ["id"], compare_cols=["v"]).collect()
    }
    assert out_v[2] == "unchanged" and out_v[3] == "changed"
    import pytest as _pytest

    with _pytest.raises(ValueError):
        table_diff(old, new, [])


def test_vacuum_orphans_reclaims_unreferenced_versions(spark, tmp_path):
    """r8 ADVICE: a crash between expire_versions' manifest rewrite and
    its directory deletes leaves orphaned-but-unreferenced partition
    dirs; vacuum_orphans is the out-of-band sweep that reclaims them —
    referenced dirs stay, unreferenced dirs (and only those) vanish."""
    import os

    from indexlab_spark.operators.maintenance import vacuum_orphans

    chunks = str(tmp_path / "chunks")
    manifests = str(tmp_path / "manifests")
    rows = []
    for idx in ("a", "b"):
        for v in ("v1", "v2"):
            rows += [(idx, v, i, f"{idx}-{v}-{i}") for i in range(3)]
    spark.createDataFrame(
        rows, "index_name string, version string, pos int, text string"
    ).write.partitionBy("index_name", "version").parquet(chunks)
    # manifests reference only a/v2 and b/v1 -> a/v1 and b/v2 are the
    # simulated crash orphans
    spark.createDataFrame(
        [("a", "v2", "2024-01-02"), ("b", "v1", "2024-01-01")],
        "index_name string, version string, created_at string",
    ).write.parquet(manifests)

    out = vacuum_orphans(spark, chunks, manifests)
    assert out["deleted"] == [("a", "v1"), ("b", "v2")]
    assert out["kept"] == 2
    assert not os.path.exists(f"{chunks}/index_name=a/version=v1")
    assert not os.path.exists(f"{chunks}/index_name=b/version=v2")
    assert os.path.exists(f"{chunks}/index_name=a/version=v2")
    assert os.path.exists(f"{chunks}/index_name=b/version=v1")
    # survivors still readable; second sweep is a no-op
    assert spark.read.parquet(chunks).count() == 6
    again = vacuum_orphans(spark, chunks, manifests)
    assert again == {"deleted": [], "kept": 2}


def test_vacuum_orphans_missing_root(spark, tmp_path):
    from indexlab_spark.operators.maintenance import vacuum_orphans

    manifests = str(tmp_path / "m2")
    spark.createDataFrame(
        [("a", "v1", "2024-01-01")],
        "index_name string, version string, created_at string",
    ).write.parquet(manifests)
    out = vacuum_orphans(spark, str(tmp_path / "nope"), manifests)
    assert out == {"deleted": [], "kept": 0}
