"""Round-7 operators: mergeable quantile sketches, skew diagnostics,
Markov transition matrix, distributed PCA."""

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from indexlab_spark.operators.analytics import (
    quantile_sketch_rollup,
    quantile_union_estimate,
    skew_report,
    transition_matrix,
)
from indexlab_spark.operators.decompose import pca_fit, pca_project


# ---------------------------------------------------------------- quantile


def test_quantile_rollup_equals_direct_bottom_k(spark, sf_dir):
    """The merge contract: estimating at a coarse grain THROUGH the
    fine-grained sketch table must EXACTLY equal the direct bottom-k
    computation at that grain (bottom-k is associative over disjoint
    groups). This is the property the gate oracle attests."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet").withColumn(
        "day", F.to_date("ts")
    )
    fine = quantile_sketch_rollup(
        ev, ["event_type", "day"], "value", "event_id", k=64
    )
    via_rollup = quantile_union_estimate(
        fine, ["event_type"], qs=(0.5, 0.95), k=64
    )
    direct = quantile_union_estimate(
        quantile_sketch_rollup(ev, ["event_type"], "value", "event_id", k=64),
        ["event_type"],
        qs=(0.5, 0.95),
        k=64,
    )
    a = {r["event_type"]: (r["q50"], r["q95"]) for r in via_rollup.collect()}
    b = {r["event_type"]: (r["q50"], r["q95"]) for r in direct.collect()}
    assert a == b and len(a) > 0


def test_quantile_estimate_within_sampling_error(spark, sf_dir):
    """k=256 bottom-k sample: estimated quantile must sit within ~3
    sigma of the exact one IN RANK SPACE — checked by measuring the
    exact CDF position of the estimate, q_hat_rank ~ q +-
    3*sqrt(q(1-q)/k)."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    est = quantile_union_estimate(
        quantile_sketch_rollup(ev, ["event_type"], "value", "event_id", k=256),
        ["event_type"],
        qs=(0.5, 0.95),
        k=256,
    ).collect()
    vals = {}
    for r in ev.select("event_type", "value").collect():
        vals.setdefault(r["event_type"], []).append(float(r["value"]))
    for r in est:
        arr = np.sort(np.array(vals[r["event_type"]]))
        for q, col in ((0.5, "q50"), (0.95, "q95")):
            rank = np.searchsorted(arr, float(r[col])) / len(arr)
            tol = 3 * math.sqrt(q * (1 - q) / 256) + 2 / len(arr)
            assert abs(rank - q) <= tol, (
                f"{r['event_type']} {col}: rank {rank:.3f} vs {q} (tol {tol:.3f})"
            )


def test_quantile_rollup_sample_is_bounded_and_sorted(spark, sf_dir):
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    fine = quantile_sketch_rollup(ev, ["event_type"], "value", "event_id", k=16)
    for r in fine.collect():
        ranks = [s["rank"] for s in r["sample"]]
        assert len(ranks) <= 16
        assert ranks == sorted(ranks)
        assert r["n_sampled"] == len(ranks)


def test_quantile_rollup_excludes_nulls_and_rejects_bad_k(spark):
    df = spark.createDataFrame(
        [(1, "a", 1.0), (2, "a", None), (3, "a", 3.0)], "id long, g string, v double"
    )
    out = quantile_sketch_rollup(df, ["g"], "v", "id", k=10).collect()
    assert out[0]["n_sampled"] == 2
    with pytest.raises(ValueError):
        quantile_sketch_rollup(df, ["g"], "v", "id", k=0)


# ---------------------------------------------------------------- skew


def test_skew_report_flags_planted_hot_key(spark):
    rows = [(i, "hot") for i in range(900)] + [
        (i, f"k{i % 20}") for i in range(900, 1000)
    ]
    df = spark.createDataFrame(rows, "id long, k string")
    rep = skew_report(df, ["k"], top_n=3).collect()
    assert rep[0]["k"] == "hot" and rep[0]["rank"] == 1
    assert rep[0]["cnt"] == 900
    assert abs(rep[0]["share"] - 0.9) < 1e-9
    assert rep[0]["n_keys"] == 21
    # max/mean: 900 / (1000/21)
    assert abs(rep[0]["skew_ratio"] - 900 / (1000 / 21)) < 1e-3
    assert len(rep) == 3
    assert [r["rank"] for r in rep] == [1, 2, 3]


def test_skew_report_uniform_keys_low_cv(spark):
    df = spark.createDataFrame(
        [(i, f"k{i % 10}") for i in range(1000)], "id long, k string"
    )
    rep = skew_report(df, ["k"], top_n=2).collect()
    assert rep[0]["cv"] == 0.0 and rep[0]["skew_ratio"] == 1.0


# ---------------------------------------------------------------- transitions


def test_transition_matrix_counts_and_probs(spark):
    rows = [
        (1, 1, "a"), (1, 2, "b"), (1, 3, "a"),
        (2, 1, "a"), (2, 2, "b"), (2, 3, "b"),
    ]
    df = spark.createDataFrame(rows, "uid long, t long, s string")
    out = {
        (r["from_state"], r["to_state"]): (r["cnt"], r["prob"])
        for r in transition_matrix(df, "uid", "t", "s").collect()
    }
    # a->b twice, b->a once, b->b once
    assert out[("a", "b")] == (2, 1.0)
    assert out[("b", "a")][0] == 1 and abs(out[("b", "a")][1] - 0.5) < 1e-9
    assert out[("b", "b")][0] == 1
    assert ("a", "a") not in out


def test_transition_matrix_no_cross_sequence_pairs(spark):
    """The last event of one sequence must not chain into the first of
    another."""
    rows = [(1, 1, "a"), (2, 2, "b")]
    df = spark.createDataFrame(rows, "uid long, t long, s string")
    assert transition_matrix(df, "uid", "t", "s").count() == 0


def test_transition_matrix_deterministic_tie_order(spark):
    """Equal timestamps order by state so reruns agree."""
    rows = [(1, 1, "b"), (1, 1, "a"), (1, 2, "c")]
    df = spark.createDataFrame(rows, "uid long, t long, s string")
    out = {
        (r["from_state"], r["to_state"]): r["cnt"]
        for r in transition_matrix(df, "uid", "t", "s").collect()
    }
    assert out == {("a", "b"): 1, ("b", "c"): 1}


# ---------------------------------------------------------------- PCA


def test_pca_matches_numpy_reference(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    model = pca_fit(emb, "embedding", k=4)
    mat = np.array(
        [r["embedding"] for r in emb.select("embedding").collect()],
        dtype=np.float64,
    )
    mean = mat.mean(axis=0)
    cov = np.cov(mat.T, bias=True)
    evals, evecs = np.linalg.eigh(cov)
    order = np.argsort(evals)[::-1][:4]
    ref = evecs[:, order].T.copy()
    for i in range(ref.shape[0]):
        j = int(np.argmax(np.abs(ref[i])))
        if ref[i, j] < 0:
            ref[i] = -ref[i]
    np.testing.assert_allclose(model.mean, mean, atol=1e-8)
    np.testing.assert_allclose(model.components, ref, atol=1e-6)
    np.testing.assert_allclose(
        model.explained_variance, np.maximum(evals[order], 0.0), rtol=1e-6
    )
    # projection parity
    proj = pca_project(emb, model).select("vec_id", "pca").collect()
    got = {r["vec_id"]: np.array(r["pca"]) for r in proj}
    ids = [r["vec_id"] for r in emb.select("vec_id").collect()]
    ref_proj = (mat - mean) @ ref.T
    for i, vid in enumerate(ids):
        np.testing.assert_allclose(got[vid], ref_proj[i], atol=1e-6)


def test_pca_components_orthonormal_variance_descending(spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    model = pca_fit(emb, "embedding", k=6)
    gram = model.components @ model.components.T
    np.testing.assert_allclose(gram, np.eye(6), atol=1e-8)
    ev = model.explained_variance
    assert all(ev[i] >= ev[i + 1] - 1e-12 for i in range(len(ev) - 1))


def test_pca_fit_fixed_matches_python_replay_and_eigh(spark, sf_dir):
    """pca_fit_fixed (the r12 oracle-replay contract): the Spark fit
    must equal a pure-python replay of the quantized deflated power
    iteration — the exact arithmetic the generated SQL oracle runs —
    and its components must be variance-near-optimal vs eigh's
    eigenvalues (Rayleigh quotient — the honest parity claim on this
    corpus, whose top eigenvalue ratios are ~0.99: with a
    near-degenerate spectrum individual eigenvectors are
    ill-conditioned and NO fixed-round iteration pins them, but any
    unit vector a power iteration lands on carries near-maximal
    variance, which is what PCA is for)."""
    from indexlab_spark.operators.decompose import pca_fit_fixed

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    model = pca_fit_fixed(emb, "embedding", k=4, iters=24, quantize_dp=9)
    mat = np.array(
        [r["embedding"] for r in emb.select("embedding").collect()],
        dtype=np.float64,
    )
    n = mat.shape[0]
    dim = mat.shape[1]
    scale = 1e9

    def q(a):
        return np.floor(np.asarray(a) * scale + 0.5) / scale

    mean_raw = mat.sum(axis=0) / n
    gram = (mat.T @ mat) / n
    cov = gram - np.outer(mean_raw, mean_raw)
    cov = (cov + cov.T) / 2.0
    a_mat = q(cov)
    comps, evs = [], []
    for _ in range(4):
        v = q(np.full(dim, 1.0 / np.sqrt(dim)))
        for _ in range(24):
            w = a_mat @ v
            if comps:
                cm = np.array(comps)
                w = w - cm.T @ (cm @ w)
            nrm = np.linalg.norm(w)
            v = q(w / nrm) if nrm else v
        j = int(np.argmax(np.abs(v)))
        if v[j] < 0:
            v = -v
        w = a_mat @ v
        lam = float(np.floor(float(v @ w) * scale + 0.5) / scale)
        comps.append(v)
        evs.append(lam)
        a_mat = q(a_mat - lam * np.outer(v, v))
    np.testing.assert_allclose(model.mean, q(mean_raw), atol=1e-12)
    np.testing.assert_allclose(model.components, np.array(comps), atol=1e-12)
    np.testing.assert_allclose(
        model.explained_variance, np.maximum(np.array(evs), 0.0), atol=1e-12
    )
    # variance near-optimality vs the production eigh fit: each fixed
    # component's Rayleigh quotient reaches >= 95% of the matching
    # eigenvalue, and the quantized basis stays orthonormal
    ref = pca_fit(emb, "embedding", k=4)
    cov_full = np.cov(mat.T, bias=True)
    for i in range(4):
        v = model.components[i]
        rq = float(v @ cov_full @ v) / float(v @ v)
        assert rq >= 0.95 * ref.explained_variance[i], (
            i, rq, ref.explained_variance[i],
        )
    gram_c = model.components @ model.components.T
    np.testing.assert_allclose(gram_c, np.eye(4), atol=1e-6)


def test_pca_empty_and_ragged_raise(spark):
    empty = spark.createDataFrame([], "embedding array<double>")
    with pytest.raises(ValueError):
        pca_fit(empty)
    ragged = spark.createDataFrame(
        [([1.0, 2.0],), ([1.0, 2.0, 3.0],)], "embedding array<double>"
    )
    with pytest.raises(Exception):
        pca_fit(ragged, k=2)


# ---------------------------------------------------------------- merge


def test_quantile_sketch_merge_equals_rebuild(spark, sf_dir):
    """Incremental contract: merging a new batch's sketch into the old
    state must EXACTLY equal the sketch built from scratch over
    old ∪ new (bottom-k associativity)."""
    from indexlab_spark.operators.analytics import quantile_sketch_merge

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    old = ev.filter(F.col("event_id") % 5 != 0)
    new = ev.filter(F.col("event_id") % 5 == 0)
    merged = quantile_sketch_merge(
        quantile_sketch_rollup(old, ["event_type"], "value", "event_id", k=64),
        quantile_sketch_rollup(new, ["event_type"], "value", "event_id", k=64),
        ["event_type"],
        k=64,
    )
    rebuilt = quantile_sketch_rollup(
        ev, ["event_type"], "value", "event_id", k=64
    )
    a = {
        r["event_type"]: [(s["rank"], s["value"]) for s in r["sample"]]
        for r in merged.collect()
    }
    b = {
        r["event_type"]: [(s["rank"], s["value"]) for s in r["sample"]]
        for r in rebuilt.collect()
    }
    assert a == b and len(a) > 0


def test_quantile_sketch_merge_one_sided_groups_pass_through(spark):
    from indexlab_spark.operators.analytics import quantile_sketch_merge

    a = spark.createDataFrame(
        [(1, "only_a", 1.0), (2, "both", 2.0)], "id long, g string, v double"
    )
    b = spark.createDataFrame(
        [(3, "only_b", 3.0), (4, "both", 4.0)], "id long, g string, v double"
    )
    sa = quantile_sketch_rollup(a, ["g"], "v", "id", k=8)
    sb = quantile_sketch_rollup(b, ["g"], "v", "id", k=8)
    from indexlab_spark.operators.analytics import quantile_sketch_merge as m

    out = {r["g"]: r["n_sampled"] for r in m(sa, sb, ["g"], k=8).collect()}
    assert out == {"only_a": 1, "only_b": 1, "both": 2}


def test_quantile_sketch_merge_updated_id_is_deterministic(spark):
    """r7 ADVICE regression: when the SAME id reappears with a
    DIFFERENT value (an update, not an exact replay), the per-(group,
    rank) collapse used to keep an arbitrary row; it now keeps
    min(value), so merge order can never change the sketch."""
    from indexlab_spark.operators.analytics import (
        quantile_sketch_merge,
        quantile_sketch_rollup,
    )

    a = spark.createDataFrame(
        [(1, "g", 5.0), (2, "g", 7.0)], "id long, g string, v double"
    )
    # id 1 reappears with an updated value
    b = spark.createDataFrame(
        [(1, "g", 9.0), (3, "g", 2.0)], "id long, g string, v double"
    )
    sa = quantile_sketch_rollup(a, ["g"], "v", "id", k=8)
    sb = quantile_sketch_rollup(b, ["g"], "v", "id", k=8)

    def sample(m):
        return [
            (s["rank"], s["value"])
            for r in m.collect()
            for s in r["sample"]
        ]

    ab = sample(quantile_sketch_merge(sa, sb, ["g"], k=8))
    ba = sample(quantile_sketch_merge(sb, sa, ["g"], k=8))
    assert ab == ba
    # id 1's rank carries min(5.0, 9.0) = 5.0
    assert 9.0 not in {v for _, v in ab}
    assert {5.0, 7.0, 2.0} == {v for _, v in ab}


# ---------------------------------------------------------------- join explosion


def test_join_explosion_exact_arithmetic(spark):
    from indexlab_spark.operators.analytics import join_explosion_report

    a = spark.createDataFrame(
        [(i, "hot") for i in range(100)] + [(i, "cold") for i in range(3)],
        "id long, k string",
    )
    b = spark.createDataFrame(
        [(i, "hot") for i in range(50)] + [(i, "cold") for i in range(2)]
        + [(0, "b_only")],
        "id long, k string",
    )
    rep = join_explosion_report(a, b, ["k"], top_n=5).collect()
    by_key = {r["k"]: r for r in rep}
    assert by_key["hot"]["out_rows"] == 5000 and by_key["hot"]["rank"] == 1
    assert by_key["cold"]["out_rows"] == 6
    assert "b_only" not in by_key  # inner keys only
    assert rep[0]["est_total_rows"] == 5006
    assert rep[0]["n_join_keys"] == 2
    # it never ran the join: verify against the real join size
    assert a.join(b, "k").count() == 5006


# ---------------------------------------------------------------- triangles


def _tri(spark, edges):
    from indexlab_spark.operators.dedup import triangle_count

    df = spark.createDataFrame(edges, "id_a long, id_b long")
    return triangle_count(df).collect()[0]


def test_triangle_count_k4(spark):
    k4 = [(a, b) for a in range(4) for b in range(4) if a < b]
    r = _tri(spark, k4)
    assert (r["n_nodes"], r["n_edges"], r["n_triangles"]) == (4, 6, 4)
    assert r["n_wedges"] == 12
    assert r["global_clustering"] == 1.0


def test_triangle_count_path_and_pendant(spark):
    r = _tri(spark, [(1, 2), (2, 3)])
    assert (r["n_triangles"], r["n_wedges"]) == (0, 1)
    assert r["global_clustering"] == 0.0
    r = _tri(spark, [(1, 2), (2, 3), (3, 1), (3, 4)])
    assert (r["n_nodes"], r["n_edges"], r["n_triangles"], r["n_wedges"]) == (
        4, 4, 1, 5,
    )
    assert abs(r["global_clustering"] - 0.6) < 1e-9


def test_triangle_count_multigraph_input_collapses(spark):
    """Self-loops, duplicates and reversed duplicates must not change
    the census."""
    r = _tri(spark, [(1, 2), (2, 1), (1, 1), (2, 3), (3, 1), (1, 3)])
    assert (r["n_edges"], r["n_triangles"]) == (3, 1)


def test_triangle_count_matches_bruteforce_on_random_graph(spark):
    import hashlib
    from itertools import combinations

    nodes = list(range(30))
    edges = [
        (a, b)
        for a, b in combinations(nodes, 2)
        if int(hashlib.md5(f"{a}|{b}".encode()).hexdigest(), 16) % 5 == 0
    ]
    adj = {n: set() for n in nodes}
    for a, b in edges:
        adj[a].add(b)
        adj[b].add(a)
    expected = sum(
        1
        for a, b, c in combinations(nodes, 3)
        if b in adj[a] and c in adj[a] and c in adj[b]
    )
    r = _tri(spark, edges)
    assert r["n_triangles"] == expected
    assert r["n_edges"] == len(edges)


def test_sketch_rollup_merge_equals_rebuild_and_replay(spark, sf_dir):
    """HLL union is associative and idempotent: merged old+batch state
    must estimate identically to a from-scratch rebuild, and re-merging
    an already-merged batch must change nothing."""
    from indexlab_spark.operators.analytics import (
        sketch_rollup,
        sketch_rollup_merge,
    )

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    old = ev.filter(F.col("event_id") % 4 != 0)
    batch = ev.filter(F.col("event_id") % 4 == 0)
    merged = sketch_rollup_merge(
        sketch_rollup(old, ["event_type"], "user_id"),
        sketch_rollup(batch, ["event_type"], "user_id"),
        ["event_type"],
    )
    rebuilt = sketch_rollup(ev, ["event_type"], "user_id")
    est = lambda df: {  # noqa: E731
        r["event_type"]: r["estimate"] for r in df.collect()
    }
    assert est(merged) == est(rebuilt) and len(est(merged)) > 0
    replayed = sketch_rollup_merge(
        merged, sketch_rollup(batch, ["event_type"], "user_id"),
        ["event_type"],
    )
    assert est(replayed) == est(merged)


# ---------------------------------------------------------------- KS drift


def test_ks_drift_identity_is_zero_and_shift_detected(spark, sf_dir):
    from indexlab_spark.operators.analytics import ks_drift

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    same = ks_drift(docs, docs, "n_chars").collect()[0]
    assert same["ks_stat"] == 0.0
    shifted = docs.withColumn("n_chars", F.col("n_chars") + 200)
    moved = ks_drift(docs, shifted, "n_chars").collect()[0]
    assert moved["ks_stat"] > 0.3


def test_ks_drift_matches_scipy_style_reference(spark):
    """Exact KS vs a direct numpy two-sample computation."""
    import numpy as np

    from indexlab_spark.operators.analytics import ks_drift

    a = [float(x) for x in [1, 1, 2, 3, 5, 8, 13, 21, 34, 55]]
    b = [float(x) for x in [2, 3, 3, 4, 6, 9, 14, 22, 40, 80, 100]]
    old = spark.createDataFrame([(x,) for x in a], "v double")
    new = spark.createDataFrame([(x,) for x in b], "v double")
    got = ks_drift(old, new, "v", n_buckets=4).collect()[0]
    xs = np.sort(np.unique(np.array(a + b)))
    f_old = np.searchsorted(np.sort(a), xs, side="right") / len(a)
    f_new = np.searchsorted(np.sort(b), xs, side="right") / len(b)
    want = float(np.max(np.abs(f_old - f_new)))
    assert abs(got["ks_stat"] - round(want, 6)) < 1e-9
    assert got["n_old"] == 10 and got["n_new"] == 11
    # at_value is the smallest value achieving the sup
    best = xs[np.abs(np.abs(f_old - f_new) - want) < 1e-12]
    assert got["at_value"] == float(best.min())


def test_ks_drift_empty_side_raises(spark):
    from indexlab_spark.operators.analytics import ks_drift

    df = spark.createDataFrame([(1.0,)], "v double")
    empty = spark.createDataFrame([], "v double")
    with pytest.raises(ValueError):
        ks_drift(df, empty, "v")


# ---------------------------------------------------------------- Count-Min


def test_cm_sketch_never_undercounts_and_is_tight_here(spark, sf_dir):
    from indexlab_spark.operators.analytics import (
        cm_sketch_build,
        cm_sketch_estimate,
    )

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    cm = cm_sketch_build(ev, "event_type")
    est = {
        r["key"]: r["est"]
        for r in cm_sketch_estimate(cm, ev, "event_type").collect()
    }
    true = {
        r["event_type"]: r["n"]
        for r in ev.groupBy("event_type").agg(
            F.count(F.lit(1)).alias("n")
        ).collect()
    }
    n = sum(true.values())
    for k, t in true.items():
        assert est[k] >= t, f"{k}: CM undercounted"
        assert est[k] - t <= 2 * n / 1024 + 1, f"{k}: overcount beyond bound"


def test_cm_sketch_merge_is_exactly_linear(spark, sf_dir):
    from indexlab_spark.operators.analytics import (
        cm_sketch_build,
        cm_sketch_merge,
    )

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    a = ev.filter(F.col("event_id") % 2 == 0)
    b = ev.filter(F.col("event_id") % 2 == 1)
    merged = cm_sketch_merge(
        cm_sketch_build(a, "event_type"), cm_sketch_build(b, "event_type")
    )
    rebuilt = cm_sketch_build(ev, "event_type")
    m = {(r["j"], r["bucket"]): r["cnt"] for r in merged.collect()}
    r2 = {(r["j"], r["bucket"]): r["cnt"] for r in rebuilt.collect()}
    assert m == r2 and len(m) > 0


def test_cm_sketch_bounded_size(spark, sf_dir):
    from indexlab_spark.operators.analytics import cm_sketch_build

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    cm = cm_sketch_build(ev, "user_id", width=64, depth=3)
    assert cm.count() <= 64 * 3


def test_cm_sketch_param_mismatch_raises(spark):
    """r7 ADVICE regression: estimating or merging with a (width,
    depth) contract different from the one the table was built with
    used to silently remap buckets (and could UNDERCOUNT); now the
    params ride in the table and a mismatch raises."""
    import pytest

    from indexlab_spark.operators.analytics import (
        cm_sketch_build,
        cm_sketch_estimate,
        cm_sketch_merge,
    )

    df = spark.createDataFrame([("a",), ("b",), ("a",)], "k string")
    cm64 = cm_sketch_build(df, "k", width=64, depth=3)
    cm32 = cm_sketch_build(df, "k", width=32, depth=3)
    with pytest.raises(ValueError, match="64x3"):
        cm_sketch_estimate(cm64, df, "k", width=1024, depth=4)
    with pytest.raises(ValueError, match="incompatible"):
        cm_sketch_merge(cm64, cm32).collect()
    # params read off the table: no explicit width/depth needed
    est = {
        r["key"]: r["est"]
        for r in cm_sketch_estimate(cm64, df, "k").collect()
    }
    assert est["a"] >= 2 and est["b"] >= 1


# ---------------------------------------------------------------- trends


def test_segment_trend_exact_lines_and_degenerate_groups(spark):
    from indexlab_spark.operators.analytics import segment_trend

    rows = (
        [("a", float(x), 2.0 * x + 1.0) for x in range(5)]
        + [("b", float(x), -0.5 * x + 3.0) for x in range(4)]
        + [("c", 1.0, 7.0), ("c", 1.0, 9.0)]  # zero x-variance
    )
    df = spark.createDataFrame(rows, "g string, x double, y double")
    out = {r["g"]: r for r in segment_trend(df, ["g"], "x", "y").collect()}
    assert out["a"]["slope"] == 2.0 and out["a"]["intercept"] == 1.0
    assert out["a"]["r2"] == 1.0 and out["a"]["n"] == 5
    assert out["b"]["slope"] == -0.5 and out["b"]["intercept"] == 3.0
    assert out["c"]["slope"] is None  # zero-variance group


# ---------------------------------------------------------------- overlap


def test_sketch_overlap_estimates_within_bounds(spark, sf_dir):
    """Planted overlap: sides share exactly the users with
    user_id % 3 == 0; inclusion-exclusion over HLL sketches must land
    within ~3x single-sketch error of the true intersection."""
    from indexlab_spark.operators.analytics import (
        sketch_overlap,
        sketch_rollup,
    )

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    a = ev.filter((F.col("user_id") % 3 == 0) | (F.col("user_id") % 3 == 1))
    b = ev.filter((F.col("user_id") % 3 == 0) | (F.col("user_id") % 3 == 2))
    out = sketch_overlap(
        sketch_rollup(a, ["event_type"], "user_id"),
        sketch_rollup(b, ["event_type"], "user_id"),
        ["event_type"],
    ).collect()
    true = {
        r["event_type"]: r["n"]
        for r in ev.filter(F.col("user_id") % 3 == 0)
        .groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    assert len(out) > 0
    for r in out:
        t = true.get(r["event_type"], 0)
        tol = 3 * 0.026 * max(r["est_union"], 1) + 2  # lgK=12 rse~2.6%
        assert abs(r["est_intersection"] - t) <= tol, (
            f"{r['event_type']}: est {r['est_intersection']} vs true {t}"
        )
        assert 0.0 <= r["jaccard_est"] <= 1.0


# ---------------------------------------------------------------- enrich


def test_enrich_stream_matches_batch_join(spark, sf_dir, tmp_path):
    from indexlab_spark.streaming.events import (
        enrich_stream,
        read_events_stream,
        run_stream_to_memory,
    )

    dim = spark.createDataFrame(
        [("click", "interactive"), ("view", "passive")],
        "event_type string, kind string",
    )
    stream = read_events_stream(spark, f"{sf_dir}/events.parquet")
    enriched = enrich_stream(stream, dim, "event_type")
    q = run_stream_to_memory(enriched, "enrich_t", output_mode="append")
    got = spark.table("enrich_t").groupBy("kind").agg(
        F.count(F.lit(1)).alias("n")
    )
    from indexlab_spark.session import load_tables

    ev = load_tables(spark, sf_dir, ("events",))["events"]
    want = ev.join(F.broadcast(dim), "event_type", "left").groupBy(
        "kind"
    ).agg(F.count(F.lit(1)).alias("n"))
    g = {r["kind"]: r["n"] for r in got.collect()}
    w = {r["kind"]: r["n"] for r in want.collect()}
    assert g == w and sum(w.values()) == ev.count()
    with pytest.raises(ValueError):
        enrich_stream(stream, dim, "event_type", how="full")


# ---------------------------------------------------------------- RFM


def test_rfm_scores_monotone_and_tie_stable(spark):
    from indexlab_spark.operators.analytics import rfm_segments

    import datetime as dt

    base = dt.date(2024, 1, 1)
    rows = []
    for c in range(10):
        # customer c: c+1 orders, last order base + c days, spend 100*(c+1)
        for k in range(c + 1):
            rows.append((c, base + dt.timedelta(days=c), 100.0 * (c + 1)))
    df = spark.createDataFrame(
        rows, "o_custkey long, o_orderdate date, o_totalprice double"
    )
    out = {r["cust"]: r for r in rfm_segments(df).collect()}
    # most recent + most frequent + biggest spender gets the top label
    assert out[9]["r_score"] == 5 and out[9]["f_score"] == 5
    assert out[9]["m_score"] == 5 and out[9]["rfm"] == "555"
    assert out[0]["r_score"] == 1 and out[0]["f_score"] == 1
    # monotone: better recency never lowers r_score
    for a in range(9):
        assert out[a]["r_score"] <= out[a + 1]["r_score"]
    # recency_days anchored at the global max order date
    assert out[9]["recency_days"] == 0 and out[0]["recency_days"] == 9


def test_rfm_empty_raises(spark):
    from indexlab_spark.operators.analytics import rfm_segments

    empty = spark.createDataFrame(
        [], "o_custkey long, o_orderdate date, o_totalprice double"
    )
    with pytest.raises(ValueError):
        rfm_segments(empty)


# ---------------------------------------------------------------- funnel


def _wf(spark, rows, steps, w):
    from indexlab_spark.operators.analytics import window_funnel

    df = spark.createDataFrame(rows, "uid long, t timestamp, s string")
    return {
        r["uid"]: r["level"]
        for r in window_funnel(df, "uid", "t", "s", steps, w).collect()
    }


def _ts(sec):
    import datetime as dt

    return dt.datetime(2024, 1, 1) + dt.timedelta(seconds=sec)


def test_window_funnel_basic_and_window_cut(spark):
    steps = ["view", "click", "buy"]
    rows = [
        # user 1: full chain inside 100s
        (1, _ts(0), "view"), (1, _ts(50), "click"), (1, _ts(90), "buy"),
        # user 2: buy falls outside the window of the only anchor
        (2, _ts(0), "view"), (2, _ts(50), "click"), (2, _ts(150), "buy"),
        # user 3: a LATER anchor rescues the chain
        (3, _ts(0), "view"), (3, _ts(120), "view"),
        (3, _ts(130), "click"), (3, _ts(200), "buy"),
        # user 4: steps out of order never chain
        (4, _ts(0), "click"), (4, _ts(10), "view"),
        # user 5: no step events at all -> absent from output
        (5, _ts(0), "scroll"),
    ]
    out = _wf(spark, rows, steps, 100)
    assert out[1] == 3
    assert out[2] == 2
    assert out[3] == 3
    assert out[4] == 1
    assert 5 not in out


def test_window_funnel_equal_timestamps_never_chain(spark):
    steps = ["view", "click"]
    rows = [(1, _ts(10), "view"), (1, _ts(10), "click")]
    assert _wf(spark, rows, steps, 100)[1] == 1
    rows = [(2, _ts(10), "view"), (2, _ts(11), "click")]
    assert _wf(spark, rows, steps, 100)[2] == 2


def test_window_funnel_matches_bruteforce_chains(spark):
    """Exists-chain reference: enumerate every strictly-increasing
    chain; the DP must agree on random event soups (incl. ties)."""
    import hashlib
    from itertools import combinations

    steps = ["a", "b", "c"]
    w = 30
    rows = []
    per_user = {}
    for uid in range(12):
        evs = []
        for i in range(14):
            h = int(
                hashlib.md5(f"{uid}|{i}".encode()).hexdigest(), 16
            )
            t = h % 80
            s = steps[(h // 100) % 3]
            evs.append((t, s))
            rows.append((uid, _ts(t), s))
        per_user[uid] = evs

    def brute(evs):
        best = 0
        n = len(evs)
        for k in (3, 2, 1):
            for combo in combinations(range(n), k):
                ts = [evs[i][0] for i in combo]
                ss = [evs[i][1] for i in combo]
                # any permutation? combinations keep list order, not ts
                # order — sort the chosen events by ts and require
                # strict increase + step labels in order
                pairs = sorted(zip(ts, ss))
                ok = all(
                    pairs[i][1] == steps[i] for i in range(k)
                ) and all(
                    pairs[i][0] < pairs[i + 1][0] for i in range(k - 1)
                ) and (pairs[-1][0] - pairs[0][0] <= w)
                if ok:
                    best = k
                    break
            if best:
                break
        return best

    got = _wf(spark, rows, steps, w)
    for uid, evs in per_user.items():
        want = brute(evs)
        assert got.get(uid, 0) == want, f"user {uid}: {got.get(uid)} != {want}"


def test_window_funnel_empty_steps_raise(spark):
    from indexlab_spark.operators.analytics import window_funnel

    df = spark.createDataFrame([(1, _ts(0), "a")], "uid long, t timestamp, s string")
    with pytest.raises(ValueError):
        window_funnel(df, "uid", "t", "s", [], 10)


def test_window_funnel_string_sequence_ids(spark):
    """The output key type must follow the input sequence column."""
    from indexlab_spark.operators.analytics import window_funnel

    rows = [("u1", _ts(0), "view"), ("u1", _ts(5), "click")]
    df = spark.createDataFrame(rows, "uid string, t timestamp, s string")
    out = window_funnel(df, "uid", "t", "s", ["view", "click"], 100)
    assert dict(out.dtypes)["uid"] == "string"
    assert out.collect()[0]["level"] == 2


def test_triangle_count_empty_graph_all_zero(spark):
    from indexlab_spark.operators.dedup import triangle_count

    empty = spark.createDataFrame([], "id_a long, id_b long")
    r = triangle_count(empty).collect()[0]
    assert (r["n_nodes"], r["n_edges"], r["n_triangles"], r["n_wedges"]) == (
        0, 0, 0, 0,
    )
    assert r["global_clustering"] == 0.0


def test_pca_fit_skips_null_embeddings(spark):
    import numpy as np

    from indexlab_spark.operators.decompose import pca_fit

    rows = [([1.0, 2.0],), (None,), ([3.0, 4.0],), ([5.0, 6.0],)]
    df = spark.createDataFrame(rows, "embedding array<double>")
    model = pca_fit(df, k=2)
    assert model.n == 3
    np.testing.assert_allclose(model.mean, [3.0, 4.0], atol=1e-12)


# ---------------------------------------------------------------- CUSUM


def test_cusum_constant_series_never_flags(spark):
    from indexlab_spark.operators.analytics import cusum_changepoints

    rows = [("a", i, 10.0) for i in range(20)]
    df = spark.createDataFrame(rows, "g string, t int, v double")
    out = cusum_changepoints(df, ["g"], "t", "v").collect()
    assert all(not r["flag"] for r in out)
    assert all(r["cusum_pos"] == 0.0 and r["cusum_neg"] == 0.0 for r in out)


def test_cusum_flags_after_planted_step(spark):
    """Step change at t=20: the positive-side statistic must first
    exceed h AFTER the shift; the negative side accumulates in the
    below-mean early regime (the retrospective two-sided behavior)."""
    from indexlab_spark.operators.analytics import cusum_changepoints

    rows = [("a", i, 10.0) for i in range(20)] + [
        ("a", i, 20.0) for i in range(20, 30)
    ]
    df = spark.createDataFrame(rows, "g string, t int, v double")
    out = sorted(
        cusum_changepoints(df, ["g"], "t", "v").collect(),
        key=lambda r: r["t"],
    )
    pos_flags = [r["t"] for r in out if r["cusum_pos"] > 0 and r["flag"]]
    assert pos_flags and min(pos_flags) >= 20
    assert any(r["flag"] for r in out)


def test_cusum_matches_python_reference(spark):
    import hashlib

    from indexlab_spark.operators.analytics import cusum_changepoints

    vals = [
        (int(hashlib.md5(f"{i}".encode()).hexdigest(), 16) % 100) / 10.0
        for i in range(25)
    ]
    rows = [("g", i, v) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "g string, t int, v double")
    got = {
        r["t"]: (r["cusum_pos"], r["cusum_neg"])
        for r in cusum_changepoints(df, ["g"], "t", "v").collect()
    }
    import statistics

    mu = statistics.mean(vals)
    sd = statistics.pstdev(vals)
    kk = 0.5 * sd
    sp = sn = 0.0
    for i, x in enumerate(vals):
        sp = max(0.0, sp + (x - mu - kk))
        sn = max(0.0, sn - (x - mu) - kk)
        assert got[i] == (round(sp, 6), round(sn, 6)), i


def test_cusum_zero_variance_group_never_flags(spark):
    from indexlab_spark.operators.analytics import cusum_changepoints

    rows = [("z", i, 5.0) for i in range(5)]
    df = spark.createDataFrame(rows, "g string, t int, v double")
    assert all(
        not r["flag"] for r in cusum_changepoints(df, ["g"], "t", "v").collect()
    )


# ---------------------------------------------------------------- paths


def test_transition_paths_triples_and_no_cross_sequence(spark):
    from indexlab_spark.operators.analytics import transition_paths

    rows = [
        (1, 1, "a"), (1, 2, "b"), (1, 3, "c"), (1, 4, "a"),
        (2, 1, "x"), (2, 2, "y"),  # too short for depth 3
    ]
    df = spark.createDataFrame(rows, "uid long, t long, s string")
    out = {
        (r["s1"], r["s2"], r["s3"]): (r["cnt"], r["share"])
        for r in transition_paths(df, "uid", "t", "s").collect()
    }
    assert out[("a", "b", "c")][0] == 1
    assert out[("b", "c", "a")][0] == 1
    assert len(out) == 2
    assert abs(sum(v[1] for v in out.values()) - 1.0) < 1e-9
    # depth=2 equals pair counts
    pairs = {
        (r["s1"], r["s2"]): r["cnt"]
        for r in transition_paths(df, "uid", "t", "s", depth=2).collect()
    }
    assert pairs == {("a", "b"): 1, ("b", "c"): 1, ("c", "a"): 1, ("x", "y"): 1}
    import pytest as _pytest

    with _pytest.raises(ValueError):
        transition_paths(df, "uid", "t", "s", depth=1)


# ---------------------------------------------------------------- ICWS


def test_icws_collision_rate_estimates_weighted_jaccard():
    """The ICWS guarantee: P(sig_A[i] == sig_B[i]) == weighted Jaccard.
    Check the empirical agreement over many hashes against the exact
    J_w within 3-sigma binomial error."""
    import math

    from indexlab_spark.operators.dedup import icws_signature

    a = {"x": 5, "y": 3, "z": 1}
    b = {"x": 2, "y": 3, "w": 4}
    summin = 2 + 3 + 0 + 0
    summax = 5 + 3 + 1 + 4
    jw = summin / summax
    n = 400
    sa = icws_signature(a, n)
    sb = icws_signature(b, n)
    agree = sum(1 for p, q in zip(sa, sb) if p == q) / n
    tol = 3 * math.sqrt(jw * (1 - jw) / n)
    assert abs(agree - jw) <= tol, f"{agree} vs {jw} (tol {tol})"


def test_icws_identical_weights_identical_signatures():
    from indexlab_spark.operators.dedup import icws_signature

    w = {"a": 3, "b": 7}
    assert icws_signature(w, 16) == icws_signature(dict(w), 16)
    # scaling all weights preserves each hash's argmin ELEMENT often
    # but not the t component — only exact equality of dicts is pinned


def test_wminhash_pairs_exact_weighted_jaccard(spark):
    """Planted docs with known tf overlap: the verify must produce the
    exact sum-min / sum-max value, and the repeated-boilerplate doc
    must NOT look identical to the single-copy doc (the failure mode of
    unweighted MinHash)."""
    from indexlab_spark.operators.dedup import wminhash_lsh_pairs

    d1 = "alpha beta gamma " * 10          # tf: each word 10
    d2 = "alpha beta gamma " * 9 + "delta "  # close in tf space
    d3 = "alpha beta gamma"                 # same SET, far in tf space
    df = spark.createDataFrame(
        [(1, d1), (2, d2), (3, d3)], "doc_id long, text string"
    )
    out = {
        (r["id_a"], r["id_b"]): r["wjaccard"]
        for r in wminhash_lsh_pairs(df, threshold=0.1).collect()
    }
    # exact: summin(d1,d2) = 27, sums 30 and 28 -> 27/31
    assert (1, 2) in out
    assert abs(out[(1, 2)] - round(27 / 31, 6)) < 1e-9
    # unweighted jaccard(d1, d3) = 1.0; weighted = 3/30 = 0.1 — the
    # multiplicity difference must be visible if the pair surfaces
    if (1, 3) in out:
        assert out[(1, 3)] <= round(3 / 30, 6) + 1e-9


def test_wminhash_spark_signature_matches_local_reference(spark):
    from indexlab_spark.operators.dedup import (
        icws_signature,
        wminhash_signatures,
    )

    text = "red blue red green red blue"
    df = spark.createDataFrame([(7, text)], "doc_id long, text string")
    row = wminhash_signatures(df, num_hashes=8).collect()[0]
    tf = {"red": 3, "blue": 2, "green": 1}
    want = [f"{k}|{t}" for k, t in icws_signature(tf, 8)]
    assert list(row["sig"]) == want
    assert row["sumw"] == 6.0
    # tf counts ride along from the same tokenization pass
    assert dict(row["tf"]) == tf


def test_wminhash_string_ids_and_unicode_whitespace(spark):
    """r7 ADVICE regression: (a) the signature schema must follow the
    id column's actual type — string doc ids used to fail on a
    hardcoded 'id long'; (b) unicode whitespace (NBSP, ideographic
    space) must tokenize identically in the signature pass and the
    exact-verify tf frame — a SQL '\\s+' split would treat
    'alpha\\u00a0beta' as ONE token and skew summin vs sumw."""
    from indexlab_spark.operators.dedup import wminhash_lsh_pairs

    d1 = "alpha beta　gamma alpha"   # NBSP + ideographic space
    d2 = "alpha beta gamma alpha"
    df = spark.createDataFrame(
        [("doc-a", d1), ("doc-b", d2)], "doc_id string, text string"
    )
    out = {
        (r["id_a"], r["id_b"]): r["wjaccard"]
        for r in wminhash_lsh_pairs(df, threshold=0.5).collect()
    }
    # identical tf after unicode-aware tokenization -> exact 1.0
    assert out == {("doc-a", "doc-b"): 1.0}


# ---------------------------------------------------------------- A-Res


def _ares_key_local(salt, doc_id, w):
    """Local replica of weighted_sample's key formula."""
    import hashlib
    import math

    h = int(
        hashlib.md5(f"{salt}|{doc_id}".encode()).hexdigest()[:15], 16
    )
    u = (float(h) + 1.0) / float(2**60 + 2)
    return math.log(u) / w


def test_weighted_sample_k1_inclusion_probability(spark):
    """A-Res guarantee at k=1: P(select i) == w_i / sum(w). ONE Spark
    draw is pinned against the local key-formula replica (so the local
    sweep provably simulates the operator), then 600 independent local
    salts check the heavy item wins ~2/3 of draws (3-sigma band)."""
    import math

    from indexlab_spark.operators.curation import weighted_sample

    df = spark.createDataFrame(
        [(1, 1.0), (2, 2.0)], "doc_id long, w double"
    )
    got = weighted_sample(df, "w", 1, salt="s0").collect()[0]["doc_id"]
    want = max(
        [(1, 1.0), (2, 2.0)],
        key=lambda t: _ares_key_local("s0", t[0], t[1]),
    )[0]
    assert got == want

    n = 600
    wins = sum(
        1
        for s in range(n)
        if _ares_key_local(f"s{s}", 2, 2.0) > _ares_key_local(f"s{s}", 1, 1.0)
    )
    p = wins / n
    tol = 3 * math.sqrt((2 / 3) * (1 / 3) / n)
    assert abs(p - 2 / 3) <= tol, f"{p} vs 2/3 (tol {tol:.3f})"


def test_weighted_sample_grouped_exact_k_and_determinism(spark):
    from indexlab_spark.operators.curation import weighted_sample

    rows = [(i, "g1" if i < 50 else "g2", float(1 + i % 5)) for i in range(80)]
    df = spark.createDataFrame(rows, "doc_id long, g string, w double")
    a = weighted_sample(df, "w", 7, group_cols=["g"])
    counts = {r["g"]: r["n"] for r in a.groupBy("g").count().withColumnRenamed("count", "n").collect()}
    assert counts == {"g1": 7, "g2": 7}
    # determinism: same salt, same selection; repartition-invariant
    b = weighted_sample(df.repartition(13), "w", 7, group_cols=["g"])
    ids = lambda d: sorted(r["doc_id"] for r in d.collect())  # noqa: E731
    assert ids(a) == ids(b)


def test_weighted_sample_excludes_nonpositive_weights(spark):
    from indexlab_spark.operators.curation import weighted_sample

    df = spark.createDataFrame(
        [(1, 1.0), (2, 0.0), (3, -1.0), (4, None)],
        "doc_id long, w double",
    )
    out = weighted_sample(df, "w", 10)
    assert [r["doc_id"] for r in out.collect()] == [1]
    import pytest as _pytest

    with _pytest.raises(ValueError):
        weighted_sample(df, "w", 0)


def test_quantile_union_estimate_grand_total(spark, sf_dir):
    """Empty group_cols = grand total: merged-sketch estimate must
    equal the direct bottom-k estimate over everything (associativity
    again), and the single-partition window it uses is sketch-sized by
    construction."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    fine = quantile_sketch_rollup(ev, ["event_type"], "value", "event_id", k=64)
    via = quantile_union_estimate(fine, [], qs=(0.5,), k=64).collect()[0]
    direct_sample = quantile_sketch_rollup(
        ev.withColumn("_one", F.lit(1)), ["_one"], "value", "event_id", k=64
    )
    direct = quantile_union_estimate(
        direct_sample, ["_one"], qs=(0.5,), k=64
    ).collect()[0]
    assert via["q50"] == direct["q50"]


def test_binseg_oracle_sql_stop_branches_match_python():
    """The r12 binseg_revenue oracle (_binseg_sql) on a synthetic
    events table that exercises what the gate corpus doesn't: a FLAT
    group (no admissible split — emits nothing), a one-step group
    (stops after 1 cp on the threshold rule), and a three-step group
    (uses all max_cp stages). Compared against a pure-python replay of
    the operator's greedy (plain argmax — reductions are well
    separated by construction)."""
    import datetime
    import sys

    import duckdb

    sys.path.insert(0, ".")
    import __spark_entry__ as entry_mod

    base = datetime.datetime(2024, 1, 1)
    rows = []
    # flat group: constant revenue
    for d in range(24):
        rows.append(("flat", base + datetime.timedelta(days=d), 5.0))
    # one clear step
    for d in range(24):
        rows.append(
            ("one", base + datetime.timedelta(days=d),
             10.0 if d < 12 else 50.0)
        )
    # three steps
    for d in range(24):
        lvl = [10.0, 80.0, 30.0, 160.0][d // 6]
        rows.append(("three", base + datetime.timedelta(days=d), lvl))
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE events(event_type VARCHAR, ts TIMESTAMP,"
        " value DOUBLE)"
    )
    con.executemany("INSERT INTO events VALUES (?,?,?)", rows)
    got = {
        (r[0], r[1]): (r[2], r[3], r[4], r[5])
        for r in con.execute(
            entry_mod._binseg_sql(max_cp=3, min_seg=3, ratio=0.05)
        ).fetchall()
    }

    # pure-python replay of the operator's greedy on the daily series
    from collections import defaultdict

    daily = defaultdict(dict)
    for g, ts, v in rows:
        day = ts.date().isoformat()
        daily[g][day] = daily[g].get(day, 0.0) + v
    ref = {}
    for g, dd in daily.items():
        days = sorted(dd)
        xs = [round(dd[d], 6) for d in days]
        n = len(xs)
        s, q = [0.0], [0.0]
        for x in xs:
            s.append(s[-1] + x)
            q.append(q[-1] + x * x)

        def sse(a, b):
            if b <= a:
                return 0.0
            d2 = s[b] - s[a]
            return (q[b] - q[a]) - d2 * d2 / (b - a)

        thresh = 0.05 * sse(0, n)
        segments = [(0, n)]
        found = []
        for _ in range(3):
            cand = None
            for (a, b) in segments:
                if b - a < 6:
                    continue
                for i in range(a + 3, b - 3 + 1):
                    red = sse(a, b) - sse(a, i) - sse(i, b)
                    if cand is None or red > cand[0] or (
                        red == cand[0] and i < cand[1]
                    ):
                        cand = (red, i, (a, b))
            if cand is None or cand[0] <= max(thresh, 0.0) + 1e-12:
                break
            red, i, seg = cand
            segments.remove(seg)
            segments.extend([(seg[0], i), (i, seg[1])])
            found.append((i, red))
        for rank, (i, red) in enumerate(found, 1):
            ref[(g, rank)] = (i, days[i - 1], round(red, 6), n)
    assert got == ref
    assert not any(g == "flat" for g, _ in got)  # flat emits nothing
    assert sum(1 for g, _ in got if g == "one") == 1
    assert sum(1 for g, _ in got if g == "three") == 3


def test_pca_oracle_sql_well_conditioned_matches_replay_and_eigh():
    """The r12 pca_embeddings oracle (_pca_fixed_sql) cross-engine on a
    SYNTHETIC well-conditioned spectrum (eigenvalues 16/4/1/0.25 —
    clear gaps, unlike the near-degenerate gate corpus): the DuckDB
    replay must equal the pure-python quantized power iteration
    bit-for-bit AND, with real gaps, the components must now also
    align with eigh's (cosine > 0.999) — demonstrating the fixed
    variant recovers true axes whenever they are identifiable."""
    import sys

    import duckdb

    sys.path.insert(0, ".")
    import __spark_entry__ as entry_mod

    rng = np.random.default_rng(7)
    dim, n, kc = 16, 400, 4
    # anisotropic gaussian: distinct variances on the first 4 axes
    scales = np.ones(dim) * 0.05
    scales[:4] = [4.0, 2.0, 1.0, 0.5]
    basis, _ = np.linalg.qr(rng.normal(size=(dim, dim)))
    mat = (rng.normal(size=(n, dim)) * scales) @ basis.T
    mat = mat.astype(np.float32).astype(np.float64)  # parquet-float32 parity

    con = duckdb.connect()
    con.execute(
        "CREATE TABLE embeddings(vec_id BIGINT, label INT,"
        " embedding DOUBLE[])"
    )
    con.executemany(
        "INSERT INTO embeddings VALUES (?,?,?)",
        [(i, int(i % 3), [float(v) for v in mat[i]]) for i in range(n)],
    )
    sql = entry_mod._pca_fixed_sql(k=kc, iters=24, dim=dim)
    got = {
        r[0]: (r[2], r[3], r[4], r[5])
        for r in con.execute(sql).fetchall()
    }

    # pure-python quantized replay (the pca_fit_fixed arithmetic)
    scale = 1e9

    def q(a):
        return np.floor(np.asarray(a) * scale + 0.5) / scale

    mean_raw = mat.sum(axis=0) / n
    gram = (mat.T @ mat) / n
    cov = gram - np.outer(mean_raw, mean_raw)
    cov = (cov + cov.T) / 2.0
    a_mat = q(cov)
    comps = []
    for _ in range(kc):
        v = q(np.full(dim, 1.0 / np.sqrt(dim)))
        for _ in range(24):
            w = a_mat @ v
            if comps:
                cm = np.array(comps)
                w = w - cm.T @ (cm @ w)
            nrm = np.linalg.norm(w)
            v = q(w / nrm) if nrm else v
        j = int(np.argmax(np.abs(v)))
        if v[j] < 0:
            v = -v
        w = a_mat @ v
        lam = float(np.floor(float(v @ w) * scale + 0.5) / scale)
        comps.append(v)
        a_mat = q(a_mat - lam * np.outer(v, v))
    cm = np.array(comps)
    mean_q = q(mean_raw)
    proj = (mat - mean_q) @ cm.T
    for i in range(n):
        want = tuple(
            np.round(np.round(proj[i][c] * 1e6) / 1e6, 6)
            for c in range(kc)
        )
        assert got[i] == pytest.approx(want, abs=1.5e-6), i

    # with clear eigengaps the fixed components align with eigh
    evals, evecs = np.linalg.eigh(np.cov(mat.T, bias=True))
    order = np.argsort(evals)[::-1][:kc]
    for c in range(kc):
        cos = abs(float(cm[c] @ evecs[:, order[c]]))
        assert cos > 0.999, (c, cos)
