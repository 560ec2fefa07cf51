"""A1-A9 analytics parity vs pure-Python ports of the reference formulas
(/root/reference/app/api/analytics.py:106-135) + catalog functions."""

import math

import pytest
from pyspark.sql import functions as F

from indexlab_spark.operators.analytics import (
    catalog,
    histogram,
    index_stats,
    length_stats,
    list_versions,
    sum_source_rows,
)


def ref_percentile(vals, p):
    """Port of analytics.py:106-115 (exact linear interpolation)."""
    if not vals:
        return None
    a = sorted(vals)
    k = (len(a) - 1) * p
    f, c = math.floor(k), math.ceil(k)
    if f == c:
        return float(a[int(k)])
    return a[f] + (a[c] - a[f]) * (k - f)


def ref_histogram(vals, bins=20):
    """Port of analytics.py:118-135 (integer-step binning)."""
    if not vals:
        return {"bins": [], "counts": []}
    vmin, vmax = min(vals), max(vals)
    if vmin == vmax:
        return {"bins": [vmin, vmax], "counts": [len(vals)]}
    step = max(1, math.ceil((vmax - vmin) / bins))
    edges = [vmin + i * step for i in range(bins)] + [vmax]
    counts = [0] * (len(edges) - 1)
    for x in vals:
        idx = len(counts) - 1 if x == vmax else min(len(counts) - 1, (x - vmin) // step)
        counts[idx] += 1
    return {"bins": edges, "counts": counts}


@pytest.fixture(scope="module")
def doc_lengths(tables):
    return [r[0] for r in tables["documents"].select(F.length("text")).collect()]


def test_p95_matches_reference_port(tables, doc_lengths):
    got = length_stats(tables["documents"]).collect()[0]
    assert abs(got["p95_len"] - ref_percentile(doc_lengths, 0.95)) < 1e-9
    assert got["min_len"] == min(doc_lengths)
    assert got["max_len"] == max(doc_lengths)
    assert abs(got["avg_len"] - sum(doc_lengths) / len(doc_lengths)) < 1e-9


def test_histogram_matches_reference_port(tables, doc_lengths):
    expect = ref_histogram(doc_lengths)
    rows = histogram(tables["documents"], F.length("text")).collect()
    got_counts = {r["bin"]: r["cnt"] for r in rows}
    for b, cnt in enumerate(expect["counts"]):
        assert got_counts.get(b, 0) == cnt, f"bin {b}"
    # edges: lo of bin b == reference edge b
    for r in rows:
        assert r["lo"] == expect["bins"][r["bin"]]


def test_histogram_single_value_spike(spark):
    df = spark.createDataFrame([(7,)] * 5, "v long")
    rows = histogram(df, "v").collect()
    assert len(rows) == 1 and rows[0]["cnt"] == 5
    assert rows[0]["lo"] == 7 and rows[0]["hi"] == 7


def test_histogram_small_range_integer_step(spark):
    # max-min < bins -> step clamps to 1 (reference: step = max(1, ...))
    vals = [1, 2, 2, 3, 3, 3]
    df = spark.createDataFrame([(v,) for v in vals], "v long")
    rows = {r["bin"]: r["cnt"] for r in histogram(df, "v").collect()}
    expect = ref_histogram(vals)
    for b, cnt in enumerate(expect["counts"]):
        assert rows.get(b, 0) == cnt


@pytest.fixture(scope="module")
def warehouse(spark, tmp_path_factory):
    """Small warehouse with two indexes / three versions for catalog tests."""
    from indexlab_spark.config import EngineConfig, IngestConfig
    from indexlab_spark.pipeline import build_index

    eng = EngineConfig(warehouse_dir=str(tmp_path_factory.mktemp("cat_wh")))
    docs = spark.createDataFrame(
        [(i, f"document number {i} with some words") for i in range(10)],
        "doc_no long, text string",
    )
    build_index(spark, docs, IngestConfig(index_name="alpha"), eng, version="20260101-000000")
    build_index(spark, docs, IngestConfig(index_name="alpha"), eng, version="20260102-000000")
    build_index(spark, docs, IngestConfig(index_name="beta", chunk_mode="sentences"), eng,
                version="20260103-000000")
    return eng


def test_catalog_listing(spark, warehouse):
    mf = spark.read.parquet(warehouse.manifests_path())
    rows = catalog(mf).collect()
    assert [r["index_name"] for r in rows] == ["alpha", "beta"]
    alpha = rows[0]
    assert alpha["latest_version"] == "20260102-000000"  # A8 latest enrichment
    assert alpha["count"] == 10
    assert alpha["chunking"]["mode"] == "fixed_chars"
    assert rows[1]["chunking"]["mode"] == "sentences"


def test_version_listing_desc(spark, warehouse):
    mf = spark.read.parquet(warehouse.manifests_path())
    rows = list_versions(mf, "alpha").collect()
    assert [r["version"] for r in rows] == ["20260102-000000", "20260101-000000"]


def test_index_stats_join(spark, warehouse):
    ch = spark.read.parquet(warehouse.chunks_path())
    mf = spark.read.parquet(warehouse.manifests_path())
    row = index_stats(ch, mf, "alpha").collect()[0]
    assert row["count"] == 10
    assert row["version"] == "20260102-000000"
    assert row["model"] == "hash-ngram-64"
    assert row["min_len"] > 0


def test_sum_source_rows(spark, warehouse):
    mf = spark.read.parquet(warehouse.manifests_path())
    rows = {(r["index_name"], r["version"]): r["total_rows"]
            for r in sum_source_rows(mf).collect()}
    assert rows[("alpha", "20260101-000000")] == 10


def test_pretty_source_name(spark):
    from indexlab_spark.functions.text import pretty_source_name

    df = spark.createDataFrame(
        [("550e8400-e29b-41d4-a716-446655440000_report.csv",), ("plain.csv",)],
        "name string",
    )
    got = [r[0] for r in df.select(pretty_source_name("name")).collect()]
    assert got == ["report.csv", "plain.csv"]


def test_approx_sketches_within_error_bounds(tables):
    """Sketch aggregates are the 100 TB scale path for distinct counts
    and quantiles (fixed-size state, one pass, mergeable across
    executors) — exact distinct/percentile shuffle every value. No
    cross-engine hash oracle exists (sketch internals differ), so the
    contract is the published error bound against the exact answer."""
    import pyspark.sql.functions as F

    ev = tables["events"]

    exact_users = ev.select(F.countDistinct("user_id")).collect()[0][0]
    approx_users = ev.select(
        F.approx_count_distinct("user_id", rsd=0.05)
    ).collect()[0][0]
    assert abs(approx_users - exact_users) <= max(3 * 0.05 * exact_users, 5)

    exact_ids = ev.select(F.countDistinct("event_id")).collect()[0][0]
    approx_ids = ev.select(
        F.approx_count_distinct("event_id", rsd=0.02)
    ).collect()[0][0]
    assert abs(approx_ids - exact_ids) <= max(3 * 0.02 * exact_ids, 5)

    qs = [0.1, 0.5, 0.9]
    exact_q = ev.select(
        F.expr("percentile(value, array(0.1, 0.5, 0.9))")
    ).collect()[0][0]
    approx_q = ev.approxQuantile("value", qs, 0.01)
    n = ev.count()
    # approxQuantile contract: rank error <= relativeError * n; convert
    # to a value bound via the exact quantiles at rank +/- tolerance
    ranked = sorted(r[0] for r in ev.select("value").collect())
    for q, a in zip(qs, approx_q):
        lo = ranked[max(0, int((q - 0.015) * n))]
        hi = ranked[min(n - 1, int((q + 0.015) * n))]
        assert lo <= a <= hi, (q, a, lo, hi)
    # sanity: approx quantiles are ordered like the exact ones
    assert approx_q == sorted(approx_q) and list(exact_q) == sorted(exact_q)


def test_profile_table_nulls_and_modes(spark):
    """Profile counts nulls per column, handles string vs numeric min/max
    typing, and the approx mode agrees with exact on tiny cardinality."""
    from indexlab_spark.operators.analytics import profile_table

    import datetime as _dt

    df = spark.createDataFrame(
        [
            (1, "a", 1.5, _dt.date(1970, 1, 2)),
            (2, None, 2.5, _dt.date(1970, 1, 11)),
            (3, "b", None, None),
            (4, "a", 4.0, _dt.date(1969, 12, 31)),
        ],
        "id int, s string, v double, d date",
    )
    prof = {r["column"]: r for r in profile_table(df, distinct="exact").collect()}
    # DATE columns profile as days-since-epoch (direct DATE→DOUBLE casts
    # are illegal in Spark; regression for the r5 ADVICE finding)
    assert prof["d"]["n_null"] == 1 and prof["d"]["n_distinct"] == 3
    assert prof["d"]["min_num"] == -1.0 and prof["d"]["max_num"] == 10.0
    assert prof["id"]["n"] == 4 and prof["id"]["n_null"] == 0
    assert prof["s"]["n_null"] == 1 and prof["s"]["n_distinct"] == 2
    assert prof["s"]["min_str"] == "a" and prof["s"]["max_str"] == "b"
    assert prof["s"]["min_num"] is None
    assert prof["v"]["n_null"] == 1
    assert prof["v"]["min_num"] == 1.5 and prof["v"]["max_num"] == 4.0
    approx = {r["column"]: r for r in profile_table(df).collect()}
    # HLL is exact at these cardinalities
    for c in ("id", "s", "v"):
        assert approx[c]["n_distinct"] == prof[c]["n_distinct"]
    import pytest as _pytest

    with _pytest.raises(ValueError):
        profile_table(df, distinct="bogus")


def test_mad_outliers_robustness(spark):
    """MAD flags the extreme value a stddev z-score would mask, and a
    constant-majority group (MAD = 0) flags nothing."""
    from indexlab_spark.operators.analytics import mad_outliers

    rows = [(i, "a", 10.0 + (i % 5) * 0.1) for i in range(20)]
    rows.append((99, "a", 1000.0))            # the outlier
    rows += [(200 + i, "b", 5.0) for i in range(10)]  # MAD = 0 group
    rows.append((299, "b", 50.0))
    df = spark.createDataFrame(rows, "event_id long, g string, v double")
    out = mad_outliers(df, "g", "v", k=3.5).collect()
    flagged = {(r["g"], r["event_id"]) for r in out}
    assert ("a", 99) in flagged
    assert all(g != "b" for g, _ in flagged)  # MAD=0 -> no flags
    z = {r["event_id"]: r["robust_z"] for r in out}
    assert z[99] > 1000  # enormous robust score, not masked


def test_check_rules_counts_and_null_violations(spark):
    """Each rule produces one row; NULL rule results count as
    violations; rates are exact; empty rules dict raises."""
    from pyspark.sql import functions as FN

    from indexlab_spark.operators.analytics import check_rules

    df = spark.createDataFrame(
        [(1, 10.0), (2, -5.0), (3, None), (4, 20.0)],
        "id int, v double",
    )
    out = {
        r["rule"]: r
        for r in check_rules(
            df,
            {
                "v_positive": FN.col("v") > 0,   # -5 violates, NULL violates
                "id_present": FN.col("id").isNotNull(),
            },
        ).collect()
    }
    assert out["v_positive"]["n_rows"] == 4
    assert out["v_positive"]["n_violations"] == 2  # -5.0 and NULL
    assert out["v_positive"]["violation_rate"] == 0.5
    assert out["id_present"]["n_violations"] == 0
    import pytest as _pytest

    with _pytest.raises(ValueError):
        check_rules(df, {})


def test_embedding_drift_identical_and_shifted(spark):
    """Identical snapshots -> cosine 1, shift 0; a known translation
    shows the exact L2 shift; labels missing from one side drop; zero
    centroids get cosine 0."""
    from indexlab_spark.operators.analytics import embedding_drift

    old = spark.createDataFrame(
        [
            (0, 0, [1.0, 0.0]), (1, 0, [3.0, 0.0]),   # label 0: centroid (2, 0)
            (2, 1, [0.0, 1.0]),                        # label 1: centroid (0, 1)
            (3, 2, [0.0, 0.0]),                        # label 2: zero centroid
            (4, 9, [5.0, 5.0]),                        # label only in old
        ],
        "vec_id long, label int, embedding array<double>",
    )
    new = spark.createDataFrame(
        [
            (10, 0, [2.0, 0.0]),                       # label 0: centroid (2, 0) — same
            (11, 1, [0.0, 4.0]),                       # label 1: centroid (0, 4) — shift 3
            (12, 2, [0.0, 0.0]),                       # label 2: zero centroid
        ],
        "vec_id long, label int, embedding array<double>",
    )
    out = {r["label"]: r for r in embedding_drift(old, new).collect()}
    assert set(out) == {0, 1, 2}  # label 9 dropped (absent from new)
    assert out[0]["centroid_cosine"] == 1.0 and out[0]["l2_shift"] == 0.0
    assert out[0]["n_old"] == 2 and out[0]["n_new"] == 1
    assert out[1]["centroid_cosine"] == 1.0 and out[1]["l2_shift"] == 3.0
    assert out[2]["centroid_cosine"] == 0.0 and out[2]["l2_shift"] == 0.0


def test_sketch_rollup_merges_without_rescan(spark, tables):
    """HLL sketch rollup: per-(day, type) sketches union up to per-day,
    per-type, and grand-total estimates within the published HLL error
    of the exact distinct counts — computed from the SKETCH table
    alone. The union of disjoint groups must estimate the union of
    their sets (mergeable state), which count(DISTINCT) partials are
    not."""
    from pyspark.sql import functions as FN

    from indexlab_spark.operators.analytics import (
        sketch_rollup,
        sketch_union_estimate,
    )

    ev = tables["events"].withColumn("day", FN.to_date("ts"))
    rollup = sketch_rollup(ev, ["day", "event_type"], "user_id").persist()

    def exact(*cols):
        if cols:
            return {
                tuple(r[c] for c in cols): r["n"]
                for r in ev.groupBy(*cols)
                .agg(FN.countDistinct("user_id").alias("n"))
                .collect()
            }
        return {(): ev.select("user_id").distinct().count()}

    # lg_k=12 -> relative error ~1.6%; allow 3 sigma + small-count slack
    def close(est, act):
        return abs(est - act) <= max(3 * 0.016 * act, 6)

    by_type = {
        (r["event_type"],): r["estimate"]
        for r in sketch_union_estimate(rollup, ["event_type"]).collect()
    }
    exact_type = exact("event_type")
    assert set(by_type) == set(exact_type)
    for k in exact_type:
        assert close(by_type[k], exact_type[k]), (k, by_type[k], exact_type[k])

    total = sketch_union_estimate(rollup, []).collect()[0]["estimate"]
    assert close(total, exact()[()])
    # per-group estimates in the rollup itself are also in-bound
    some = rollup.limit(20).collect()
    ex_dt = exact("day", "event_type")
    for r in some:
        assert close(r["estimate"], ex_dt[(r["day"], r["event_type"])])
    rollup.unpersist()


def test_psi_drift_detects_shift_and_is_zero_on_identity(spark):
    """PSI ~ 0 when old == new; a planted location shift produces a
    large PSI concentrated in the shifted buckets; bucket edges come
    from the OLD side; total row has bucket == -1."""
    from indexlab_spark.operators.analytics import psi_drift

    base = spark.range(2000).select((F.col("id") % 100).cast("double").alias("v"))
    same = psi_drift(base, base, "v", n_buckets=5).collect()
    total = next(r for r in same if r["bucket"] == -1)
    assert abs(total["contrib"]) < 1e-9
    assert len(same) == 6  # 5 buckets + total

    shifted = spark.range(2000).select(
        ((F.col("id") % 100) + 60).cast("double").alias("v")
    )
    drift = psi_drift(base, shifted, "v", n_buckets=5).collect()
    t2 = next(r for r in drift if r["bucket"] == -1)
    assert t2["contrib"] > 0.25  # rule-of-thumb 'drifted'
    # mass left the low buckets and entered the high ones
    by_b = {r["bucket"]: r for r in drift if r["bucket"] >= 0}
    assert by_b[0]["p_new"] < by_b[0]["p_old"]
    assert by_b[4]["p_new"] > by_b[4]["p_old"]
    import pytest as _pytest

    with _pytest.raises(ValueError):
        psi_drift(base, base, "v", n_buckets=1)
