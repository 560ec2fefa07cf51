"""Round-9 operator tests: theta-sketch set algebra (distinct
intersection/difference — the query HLL cannot answer)."""

import pytest
from pyspark.sql import functions as F


def _build(spark, rows, group="g", key="k", **kw):
    from indexlab_spark.operators.analytics import theta_sketch_build

    df = spark.createDataFrame(rows, f"{group} string, {key} string")
    return theta_sketch_build(df, [group], key, **kw)


class TestThetaSketchExactRegime:
    """Below saturation theta stays 1.0 and every estimate is an exact
    distinct count — the regime the oracle-backed gate query runs in."""

    def test_build_exact_distinct(self, spark):
        rows = [("a", f"k{i}") for i in range(30)] * 3 + [
            ("b", f"k{i}") for i in range(12)
        ]
        out = {
            r["g"]: r for r in _build(spark, rows, k=64).collect()
        }
        assert out["a"]["est"] == 30.0 and out["a"]["theta"] == 1.0
        assert out["b"]["est"] == 12.0
        assert out["a"]["n_retained"] == 30
        assert list(out["a"]["sample"]) == sorted(out["a"]["sample"])

    def test_null_keys_excluded(self, spark):
        rows = [("a", "x"), ("a", None), ("a", "y")]
        out = _build(spark, rows, k=8).collect()
        assert out[0]["est"] == 2.0

    def test_union_equals_direct_build(self, spark):
        """Bottom-k merge property: fine-grain sketches unioned up to a
        coarser grain equal the direct build at that grain — samples
        and all."""
        from indexlab_spark.operators.analytics import (
            theta_sketch_build,
            theta_sketch_union,
        )

        rows = [
            (g, d, f"{g}-{i % 37}")
            for g in ("a", "b")
            for d in ("d1", "d2", "d3")
            for i in range(25)
        ]
        df = spark.createDataFrame(rows, "g string, d string, k string")
        fine = theta_sketch_build(df, ["g", "d"], "k", k=64)
        merged = {
            r["g"]: r
            for r in theta_sketch_union(fine, ["g"], k=64).collect()
        }
        direct = {
            r["g"]: r
            for r in theta_sketch_build(df, ["g"], "k", k=64).collect()
        }
        for g in ("a", "b"):
            assert list(merged[g]["sample"]) == list(direct[g]["sample"])
            assert merged[g]["est"] == direct[g]["est"] == 25.0

    def test_grand_total_union(self, spark):
        from indexlab_spark.operators.analytics import (
            theta_sketch_build,
            theta_sketch_union,
        )

        rows = [("a", f"k{i}") for i in range(10)] + [
            ("b", f"k{i}") for i in range(5, 20)
        ]
        df = spark.createDataFrame(rows, "g string, k string")
        fine = theta_sketch_build(df, ["g"], "k", k=64)
        out = theta_sketch_union(fine, [], k=64).collect()
        assert len(out) == 1 and out[0]["est"] == 20.0  # |{k0..k19}|

    def test_intersect_exact_counts(self, spark):
        """Planted overlap: A = {0..29}, B = {20..49} -> common 10,
        a_only 20, b_only 20 — exact in the unsaturated regime."""
        from indexlab_spark.operators.analytics import (
            theta_sketch_build,
            theta_sketch_intersect,
        )

        rows = [("A", f"k{i}") for i in range(30)] + [
            ("B", f"k{i}") for i in range(20, 50)
        ]
        df = spark.createDataFrame(rows, "g string, k string")
        sk = theta_sketch_build(df, ["g"], "k", k=256)
        a = sk.filter(F.col("g") == "A").withColumnRenamed("g", "g_a")
        b = sk.filter(F.col("g") == "B").withColumnRenamed("g", "g_b")
        r = theta_sketch_intersect(a, b).collect()[0]
        assert (r["est_common"], r["est_a_only"], r["est_b_only"]) == (
            10.0,
            20.0,
            20.0,
        )
        assert r["theta"] == 1.0

    def test_intersect_on_keyed_join(self, spark):
        """on=[...] joins matching groups (old-vs-new per segment)."""
        from indexlab_spark.operators.analytics import (
            theta_sketch_build,
            theta_sketch_intersect,
        )

        old = _build(
            spark, [("s1", f"k{i}") for i in range(8)], k=64
        )
        new = _build(
            spark, [("s1", f"k{i}") for i in range(4, 12)], k=64
        )
        r = theta_sketch_intersect(old, new, on=["g"]).collect()[0]
        assert (r["est_common"], r["est_a_only"], r["est_b_only"]) == (
            4.0,
            4.0,
            4.0,
        )

    def test_rejects_bad_k(self, spark):
        from indexlab_spark.operators.analytics import theta_sketch_build

        df = spark.createDataFrame([("a", "x")], "g string, k string")
        with pytest.raises(ValueError, match="k must be"):
            theta_sketch_build(df, ["g"], "k", k=1)


class TestThetaSketchSaturated:
    """Above saturation the estimate carries ~1/sqrt(k) relative error;
    md5 hashing makes the 'noise' deterministic per corpus, so these
    bounds are stable assertions, not flaky statistics."""

    def test_build_estimate_within_bound(self, spark):
        n, k = 5000, 64
        rows = [("a", f"key-{i}") for i in range(n)]
        r = _build(spark, rows, k=k).collect()[0]
        assert r["theta"] < 1.0 and r["n_retained"] == k
        assert abs(r["est"] - n) / n < 3.0 / (k**0.5)  # 3/sqrt(k)

    def test_union_of_saturated_members(self, spark):
        from indexlab_spark.operators.analytics import (
            theta_sketch_build,
            theta_sketch_union,
        )

        n, k = 4000, 128
        rows = [("a", "d1", f"x-{i}") for i in range(n)] + [
            ("a", "d2", f"y-{i}") for i in range(n)
        ]
        df = spark.createDataFrame(rows, "g string, d string, k string")
        fine = theta_sketch_build(df, ["g", "d"], "k", k=k)
        r = theta_sketch_union(fine, ["g"], k=k).collect()[0]
        assert abs(r["est"] - 2 * n) / (2 * n) < 3.0 / (k**0.5)

    def test_intersect_estimate_within_bound(self, spark):
        """50% planted overlap at k=256: the intersection estimator's
        error grows with 1/(J*sqrt(k)) — allow a generous fixed band
        (deterministic, so this pins the actual md5 outcome)."""
        from indexlab_spark.operators.analytics import (
            theta_sketch_build,
            theta_sketch_intersect,
        )

        n, k = 4000, 256
        rows = [("A", f"c-{i}") for i in range(n)] + [
            ("B", f"c-{i}") for i in range(n // 2, n + n // 2)
        ]
        df = spark.createDataFrame(rows, "g string, k string")
        sk = theta_sketch_build(df, ["g"], "k", k=k)
        a = sk.filter(F.col("g") == "A").withColumnRenamed("g", "g_a")
        b = sk.filter(F.col("g") == "B").withColumnRenamed("g", "g_b")
        r = theta_sketch_intersect(a, b).collect()[0]
        true_common = n // 2
        assert abs(r["est_common"] - true_common) / true_common < 0.3
        assert abs(r["est_a_only"] - true_common) / true_common < 0.3


class TestAssociationRules:
    """Hand-computed market-basket: baskets {x,y}, {x,y}, {x,z}, {y}."""

    def _df(self, spark):
        rows = [
            (1, "x"), (1, "y"),
            (2, "x"), (2, "y"),
            (3, "x"), (3, "z"),
            (4, "y"),
        ]
        return spark.createDataFrame(rows, "b int, i string")

    def test_hand_computed_pair_stats(self, spark):
        from indexlab_spark.operators.analytics import association_rules

        out = {
            (r["item_a"], r["item_b"]): r
            for r in association_rules(
                self._df(spark), "b", "i", min_support=0.01
            ).collect()
        }
        # n=4 baskets; n_x=3, n_y=3, n_z=1; xy=2, xz=1, yz=0
        xy = out[("x", "y")]
        assert xy["n_ab"] == 2
        assert xy["support"] == 0.5
        assert xy["conf_a_to_b"] == round(2 / 3, 6)
        assert xy["conf_b_to_a"] == round(2 / 3, 6)
        assert xy["lift"] == round(0.5 / (0.75 * 0.75), 6)
        xz = out[("x", "z")]
        assert xz["n_ab"] == 1 and xz["lift"] == round(
            0.25 / (0.75 * 0.25), 6
        )
        assert ("y", "z") not in out  # never co-occur

    def test_min_support_prunes_items_before_pairing(self, spark):
        from indexlab_spark.operators.analytics import association_rules

        out = association_rules(
            self._df(spark), "b", "i", min_support=0.5
        ).collect()
        # z (support .25) pruned -> only the xy pair can survive
        assert {(r["item_a"], r["item_b"]) for r in out} == {("x", "y")}

    def test_min_pair_support_cut(self, spark):
        from indexlab_spark.operators.analytics import association_rules

        out = association_rules(
            self._df(spark), "b", "i",
            min_support=0.01, min_pair_support=0.4,
        ).collect()
        assert {(r["item_a"], r["item_b"]) for r in out} == {("x", "y")}

    def test_duplicate_rows_in_basket_count_once(self, spark):
        from indexlab_spark.operators.analytics import association_rules

        rows = [(1, "x"), (1, "x"), (1, "y"), (2, "x")]
        df = spark.createDataFrame(rows, "b int, i string")
        out = association_rules(df, "b", "i", min_support=0.01).collect()
        assert len(out) == 1 and out[0]["n_ab"] == 1
        assert out[0]["support"] == 0.5

    def test_rejects_bad_support(self, spark):
        from indexlab_spark.operators.analytics import association_rules

        with pytest.raises(ValueError, match="min_support"):
            association_rules(self._df(spark), "b", "i", min_support=0.0)


class TestMultiTouchAttribution:
    """Hand-computed path: user u1 touches view@0s, click@10s, view@20s,
    converts@30s; user u2 touches click@5s, converts@40s; u3 converts
    with no touch in window."""

    def _df(self, spark):
        import datetime as dt

        base = dt.datetime(2024, 1, 1, 12, 0, 0)
        rows = [
            ("u1", base + dt.timedelta(seconds=0), "view"),
            ("u1", base + dt.timedelta(seconds=10), "click"),
            ("u1", base + dt.timedelta(seconds=20), "view"),
            ("u1", base + dt.timedelta(seconds=30), "purchase"),
            ("u2", base + dt.timedelta(seconds=5), "click"),
            ("u2", base + dt.timedelta(seconds=40), "purchase"),
            ("u3", base - dt.timedelta(seconds=7200), "view"),
            ("u3", base + dt.timedelta(seconds=50), "purchase"),
        ]
        return spark.createDataFrame(rows, "u string, ts timestamp, et string")

    def _run(self, spark, model):
        from indexlab_spark.operators.analytics import (
            multi_touch_attribution,
        )

        return {
            r["touch_type"]: r
            for r in multi_touch_attribution(
                self._df(spark), "u", "ts", "et", "purchase",
                window_seconds=3600, model=model,
            ).collect()
        }

    def test_linear(self, spark):
        out = self._run(spark, "linear")
        # u1: view 2/3, click 1/3; u2: click 1
        assert out["view"]["credit"] == round(2 / 3, 6)
        assert out["click"]["credit"] == round(1 / 3 + 1.0, 6)
        assert out["view"]["touches"] == 2
        assert out["click"]["conversions"] == 2
        assert out["view"]["conversions"] == 1  # u3's old view out of window

    def test_first_touch(self, spark):
        out = self._run(spark, "first_touch")
        assert out["view"]["credit"] == 1.0  # u1's first touch
        assert out["click"]["credit"] == 1.0  # u2's only touch
        assert out["view"]["conversions"] == 1
        assert out["click"]["conversions"] == 1

    def test_last_touch(self, spark):
        out = self._run(spark, "last_touch")
        assert out["view"]["credit"] == 1.0  # u1's last touch is a view
        assert out["click"]["credit"] == 1.0  # u2

    def test_position(self, spark):
        out = self._run(spark, "position")
        # u1 (3 touches): first view .4, middle click .2, last view .4
        # u2 (1 touch): click 1.0
        assert out["view"]["credit"] == 0.8
        assert out["click"]["credit"] == 1.2

    def test_total_credit_is_attributed_conversions(self, spark):
        """Every model hands out exactly 1.0 per conversion that had
        any in-window touch (2 of the 3 conversions here)."""
        for model in ("linear", "first_touch", "last_touch", "position"):
            out = self._run(spark, model)
            assert round(sum(r["credit"] for r in out.values()), 6) == 2.0

    def test_unknown_model_rejected(self, spark):
        from indexlab_spark.operators.analytics import (
            multi_touch_attribution,
        )

        with pytest.raises(ValueError, match="unknown model"):
            multi_touch_attribution(
                self._df(spark), "u", "ts", "et", "purchase",
                model="shapley",
            )


class TestQualityClassifier:
    """Distributed full-batch logistic regression: spark == numpy
    parity, separable-data sanity, codegen scoring parity."""

    def _data(self, n=200, d=8, seed=7):
        import numpy as np

        rng = np.random.default_rng(seed)
        x = rng.normal(size=(n, d))
        w_true = rng.normal(size=d)
        y = (x @ w_true + 0.25 * rng.normal(size=n) > 0).astype(float)
        return x, y

    def _numpy_train(self, x, y, iters=30, lr=1.0, l2=1e-3):
        import numpy as np

        w = np.zeros(x.shape[1])
        b = 0.0
        n = len(y)
        for _ in range(iters):
            p = 1.0 / (1.0 + np.exp(-(x @ w + b)))
            err = p - y
            gw = x.T @ err / n + l2 * w
            gb = err.sum() / n
            w, b = w - lr * gw, b - lr * gb
        return w, b

    def test_spark_matches_numpy(self, spark):
        import numpy as np

        from indexlab_spark.operators.curation import (
            train_quality_classifier,
        )

        x, y = self._data()
        rows = [(x[i].tolist(), float(y[i])) for i in range(len(y))]
        df = spark.createDataFrame(
            rows, "embedding array<double>, label double"
        ).repartition(4)
        m = train_quality_classifier(df, "label", iters=30)
        w_np, b_np = self._numpy_train(x, y, iters=30)
        assert np.allclose(m.weights, w_np, atol=1e-6)
        assert abs(m.bias - b_np) < 1e-6
        assert m.n_rows == len(y)

    def test_separable_accuracy_and_scoring_parity(self, spark):
        import numpy as np

        from indexlab_spark.operators.curation import (
            score_quality_classifier,
            train_quality_classifier,
        )

        x, y = self._data(n=300, seed=3)
        rows = [
            (i, x[i].tolist(), float(y[i])) for i in range(len(y))
        ]
        df = spark.createDataFrame(
            rows, "id long, embedding array<double>, label double"
        )
        m = train_quality_classifier(df, "label", iters=50)
        scored = score_quality_classifier(df, m).orderBy("id").collect()
        probs = np.array([r["quality_prob"] for r in scored])
        want = 1.0 / (1.0 + np.exp(-(x @ m.weights + m.bias)))
        assert np.allclose(probs, want, atol=1e-9)
        acc = ((probs > 0.5) == (y > 0.5)).mean()
        assert acc > 0.9
        assert np.isfinite(m.final_loss) and m.final_loss < 0.69  # < ln 2

    def test_quantized_matches_python_replay(self, spark):
        """quantize_dp (the r12 oracle-replay contract): the Spark fit
        must equal a pure-python replay that floor-quantizes (w, b) to
        the same scaled-integer state after every update — the exact
        arithmetic the generated SQL oracle runs."""
        import numpy as np

        from indexlab_spark.operators.curation import (
            train_quality_classifier,
        )

        x, y = self._data()
        n = len(y)
        w = np.zeros(x.shape[1])
        b = 0.0
        scale = 1e9
        for _ in range(10):
            p = 1.0 / (1.0 + np.exp(-(x @ w + b)))
            err = p - y
            w = w - 1.0 * (x.T @ err / n + 1e-3 * w)
            b = b - 1.0 * (err.sum() / n)
            w = np.floor(w * scale + 0.5) / scale
            b = float(np.floor(b * scale + 0.5) / scale)

        rows = [(x[i].tolist(), float(y[i])) for i in range(n)]
        df = spark.createDataFrame(
            rows, "embedding array<double>, label double"
        ).repartition(4)
        m = train_quality_classifier(df, "label", iters=10, quantize_dp=9)
        assert np.allclose(m.weights, w, atol=1e-12)
        assert abs(m.bias - b) < 1e-12

    def test_null_rows_excluded_and_empty_raises(self, spark):
        from indexlab_spark.operators.curation import (
            train_quality_classifier,
        )

        df = spark.createDataFrame(
            [([0.1, 0.2], None), (None, 1.0), ([0.3, 0.1], 1.0)],
            "embedding array<double>, label double",
        )
        m = train_quality_classifier(df, "label", iters=2)
        assert m.n_rows == 1
        empty = df.filter(F.col("label") < -1)
        with pytest.raises(Exception):
            train_quality_classifier(empty, "label", iters=1)


def _lev(a, b):
    if len(a) < len(b):
        a, b = b, a
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1,
                           prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


class TestEditDistanceJoin:
    """q-gram count-filter + short-path pigeonhole candidate scheme:
    the filters must only PRUNE — output equals brute force exactly."""

    def _corpus(self, seed=42, n=80):
        import random

        rng = random.Random(seed)
        alphabet = "abcde"
        out = []
        for _ in range(n):
            w = "".join(
                rng.choice(alphabet) for _ in range(rng.randint(2, 12))
            )
            out.append(w)
            if rng.random() < 0.5:  # substitution neighbor
                i = rng.randrange(len(w))
                out.append(w[:i] + rng.choice(alphabet) + w[i + 1:])
            if rng.random() < 0.3 and len(w) > 2:  # deletion neighbor
                i = rng.randrange(len(w))
                out.append(w[:i] + w[i + 1:])
        return [w for w in out if w]

    def _brute(self, corpus, d):
        from itertools import combinations

        distinct = sorted(set(corpus))
        return {
            (a, b, _lev(a, b))
            for a, b in combinations(distinct, 2)
            if _lev(a, b) <= d
        }

    def _run(self, spark, corpus, d, q):
        from indexlab_spark.operators.dedup import edit_distance_join

        df = spark.createDataFrame([(w,) for w in corpus], "t string")
        return {
            (r["text_a"], r["text_b"], r["dist"])
            for r in edit_distance_join(df, "t", max_dist=d, q=q).collect()
        }

    def test_equals_bruteforce_d1(self, spark):
        corpus = self._corpus()
        assert self._run(spark, corpus, 1, 3) == self._brute(corpus, 1)

    def test_equals_bruteforce_d2_q2(self, spark):
        corpus = self._corpus(seed=7, n=50)
        assert self._run(spark, corpus, 2, 2) == self._brute(corpus, 2)

    def test_multiplicities_carried(self, spark):
        from indexlab_spark.operators.dedup import edit_distance_join

        df = spark.createDataFrame(
            [("abcdef",)] * 3 + [("abcdxf",)] * 2 + [("zzz",)],
            "t string",
        )
        rows = edit_distance_join(df, "t", max_dist=1, q=3).collect()
        assert len(rows) == 1
        r = rows[0]
        assert (r["text_a"], r["text_b"], r["dist"]) == (
            "abcdef", "abcdxf", 1,
        )
        assert (r["n_a"], r["n_b"]) == (3, 2)

    def test_rejects_bad_params(self, spark):
        from indexlab_spark.operators.dedup import edit_distance_join

        df = spark.createDataFrame([("x",)], "t string")
        with pytest.raises(ValueError, match="max_dist"):
            edit_distance_join(df, "t", max_dist=0)
        with pytest.raises(ValueError, match="q must"):
            edit_distance_join(df, "t", q=1)


class TestSeasonalAnomalies:
    def test_planted_spike_flagged_peers_not(self, spark):
        """4 weeks of a flat Monday-9am series plus one 10x spike: the
        spike's z is computed against its own (dow, hour) slot and
        flags; the flat siblings do not; a different slot with constant
        values gets NULL z (zero variance)."""
        import datetime as dt

        from indexlab_spark.operators.analytics import seasonal_anomalies

        base = dt.datetime(2024, 1, 1, 9, 0)  # a Monday
        rows = []
        for wk in range(5):
            v = 1000.0 if wk == 4 else 100.0 + wk  # slight jitter
            rows.append((base + dt.timedelta(weeks=wk), v))
        # constant Tuesday-3pm slot -> zero variance -> NULL z
        tue = dt.datetime(2024, 1, 2, 15, 0)
        for wk in range(3):
            rows.append((tue + dt.timedelta(weeks=wk), 50.0))
        df = spark.createDataFrame(rows, "ts timestamp, v double")
        out = seasonal_anomalies(df, "ts", "v", z_thresh=1.5).collect()
        by_ts = {r["ts"]: r for r in out}
        spike = by_ts[base + dt.timedelta(weeks=4)]
        assert spike["anomaly"] is True and spike["z"] > 1.5
        assert spike["dow"] == 1 and spike["hour"] == 9
        for wk in range(4):
            assert by_ts[base + dt.timedelta(weeks=wk)]["anomaly"] is False
        flat = by_ts[tue]
        assert flat["z"] is None and flat["anomaly"] is False

    def test_matches_manual_z(self, spark):
        import datetime as dt
        import statistics

        from indexlab_spark.operators.analytics import seasonal_anomalies

        base = dt.datetime(2024, 3, 6, 12, 0)
        vals = [10.0, 14.0, 9.0, 13.0]
        rows = [
            (base + dt.timedelta(weeks=i), v) for i, v in enumerate(vals)
        ]
        df = spark.createDataFrame(rows, "ts timestamp, v double")
        out = {r["ts"]: r for r in seasonal_anomalies(df, "ts", "v").collect()}
        m = statistics.mean(vals)
        s = statistics.stdev(vals)
        for i, v in enumerate(vals):
            r = out[base + dt.timedelta(weeks=i)]
            assert r["z"] == round((v - m) / s, 6)
            assert r["expected"] == round(m, 6)


class TestSurvivalCurve:
    """Kaplan-Meier against the textbook worked example and a
    lifelines-style hand computation."""

    def test_textbook_km(self, spark):
        """Durations 1,2+,3,4+,5 (+'= censored): S(1)=4/5, S(3)=4/5 *
        2/3, S(5)=0 (last subject dies when alone at risk)."""
        from indexlab_spark.operators.analytics import survival_curve

        rows = [(1, 1), (2, 0), (3, 1), (4, 0), (5, 1)]
        df = spark.createDataFrame(rows, "t int, e int")
        out = {r["t"]: r for r in survival_curve(df, "t", "e").collect()}
        assert out[1]["n_risk"] == 5 and out[1]["d"] == 1
        assert out[1]["survival"] == round(4 / 5, 6)
        assert out[2]["survival"] == round(4 / 5, 6)  # censoring: no drop
        assert out[2]["censored"] == 1
        assert out[3]["n_risk"] == 3
        assert out[3]["survival"] == round(4 / 5 * 2 / 3, 6)
        assert out[5]["n_risk"] == 1 and out[5]["survival"] == 0.0

    def test_no_censoring_matches_empirical(self, spark):
        """Without censoring KM is the empirical survival function."""
        from indexlab_spark.operators.analytics import survival_curve

        durs = [1, 1, 2, 3, 3, 3, 7]
        df = spark.createDataFrame([(t, 1) for t in durs], "t int, e int")
        out = {r["t"]: r["survival"] for r in
               survival_curve(df, "t", "e").collect()}
        n = len(durs)
        import collections

        c = collections.Counter(durs)
        seen = 0
        for t in sorted(c):
            seen += c[t]
            assert out[t] == round((n - seen) / n, 6)

    def test_grouped_curves_independent(self, spark):
        from indexlab_spark.operators.analytics import survival_curve

        rows = [("a", 1, 1), ("a", 2, 1), ("b", 1, 0), ("b", 5, 1)]
        df = spark.createDataFrame(rows, "g string, t int, e int")
        out = {(r["g"], r["t"]): r for r in
               survival_curve(df, "t", "e", ["g"]).collect()}
        assert out[("a", 1)]["survival"] == 0.5
        assert out[("a", 2)]["survival"] == 0.0
        assert out[("b", 1)]["survival"] == 1.0  # censored only
        assert out[("b", 5)]["survival"] == 0.0


class TestHoltForecast:
    """Holt linear-trend forecast (analytics.holt_forecast): closed
    forms on constant/linear series, exact pure-python parity on a
    noisy one, and the degenerate n == 1 contract."""

    def _run(self, spark, series, **kw):
        from indexlab_spark.operators.analytics import holt_forecast

        rows = [("g", i, float(v)) for i, v in enumerate(series)]
        df = spark.createDataFrame(rows, "g string, t int, x double")
        return holt_forecast(df, ["g"], "t", "x", **kw).collect()

    def test_constant_series_is_fixed_point(self, spark):
        out = self._run(spark, [5.0] * 10, horizon=3)
        assert len(out) == 3
        for r in out:
            assert r["level"] == 5.0 and r["trend"] == 0.0
            assert r["forecast"] == 5.0 and r["sse"] == 0.0
            assert r["n_obs"] == 10

    def test_linear_series_extrapolates_exactly(self, spark):
        """x_t = 2 + 3t: classic init (b1 = x2 - x1) makes every
        one-step error zero, so level tracks x_n, trend stays 3, and
        the h-step forecast is the true line continuation."""
        xs = [2.0 + 3.0 * t for t in range(8)]
        out = sorted(self._run(spark, xs, horizon=4), key=lambda r: r["h"])
        for r in out:
            assert r["trend"] == 3.0 and r["sse"] == 0.0
            assert r["level"] == xs[-1]
            assert r["forecast"] == xs[-1] + 3.0 * r["h"]

    def test_python_parity_noisy_series(self, spark):
        alpha, beta = 0.4, 0.2
        xs = [float(((7 * i * i + 3 * i) % 23) - 5) for i in range(20)]
        lvl, trd, sse = xs[0], xs[1] - xs[0], 0.0
        for x in xs[1:]:
            err = x - (lvl + trd)
            sse += err * err
            new = alpha * x + (1 - alpha) * (lvl + trd)
            trd = beta * (new - lvl) + (1 - beta) * trd
            lvl = new
        out = sorted(
            self._run(spark, xs, alpha=alpha, beta=beta, horizon=2),
            key=lambda r: r["h"],
        )
        assert out[0]["level"] == round(lvl, 6)
        assert out[0]["trend"] == round(trd, 6)
        assert out[0]["sse"] == round(sse, 6)
        assert out[1]["forecast"] == round(lvl + 2 * trd, 6)

    def test_single_point_group(self, spark):
        out = self._run(spark, [7.5], horizon=2)
        for r in out:
            assert r["level"] == 7.5 and r["trend"] == 0.0
            assert r["forecast"] == 7.5 and r["n_obs"] == 1

    def test_groups_independent(self, spark):
        from indexlab_spark.operators.analytics import holt_forecast

        rows = [("a", i, float(i)) for i in range(5)] + [
            ("b", i, 10.0) for i in range(5)
        ]
        df = spark.createDataFrame(rows, "g string, t int, x double")
        out = {
            (r["g"], r["h"]): r
            for r in holt_forecast(df, ["g"], "t", "x", horizon=1).collect()
        }
        assert out[("a", 1)]["forecast"] == 5.0  # line continues
        assert out[("b", 1)]["forecast"] == 10.0


class TestLinkPrediction:
    """Neighborhood link prediction (dedup.link_prediction):
    hand-computed scores, adjacency exclusion, hub cap, multigraph
    collapse."""

    def _run(self, spark, edges, **kw):
        from indexlab_spark.operators.dedup import link_prediction

        df = spark.createDataFrame(edges, "id_a string, id_b string")
        return {
            (r["id_a"], r["id_b"]): r
            for r in link_prediction(df, **kw).collect()
        }

    def test_square_scores(self, spark):
        import math

        out = self._run(
            spark, [("a", "b"), ("b", "c"), ("c", "d"), ("a", "d")]
        )
        assert set(out) == {("a", "c"), ("b", "d")}
        r = out[("a", "c")]
        assert r["common_neighbors"] == 2
        assert r["adamic_adar"] == round(2.0 / math.log(2.0), 6)
        assert r["jaccard"] == 1.0  # N(a) == N(c) == {b, d}

    def test_existing_edges_excluded(self, spark):
        # triangle a-b-c plus pendant c-d: (a,b) share c but are
        # adjacent -> excluded; (a,d)/(b,d) share c -> predicted
        out = self._run(
            spark, [("a", "b"), ("b", "c"), ("a", "c"), ("c", "d")]
        )
        assert set(out) == {("a", "d"), ("b", "d")}
        assert out[("a", "d")]["common_neighbors"] == 1
        # deg(a)=2, deg(d)=1, common=1 -> jaccard 1/2
        assert out[("a", "d")]["jaccard"] == 0.5

    def test_hub_cap_drops_star_center(self, spark):
        star = [("s", f"l{i}") for i in range(6)]
        assert len(self._run(spark, star)) == 15  # all leaf pairs via s
        assert self._run(spark, star, max_hub_degree=5) == {}

    def test_multigraph_and_reversed_edges_collapse(self, spark):
        base = [("a", "b"), ("b", "c")]
        noisy = base + [("b", "a"), ("a", "b"), ("c", "b"), ("a", "a")]
        assert self._run(spark, noisy) == self._run(spark, base)

    def test_min_common_filters(self, spark):
        edges = [("a", "b"), ("b", "c"), ("c", "d"), ("a", "d")]
        out = self._run(spark, edges, min_common=3)
        assert out == {}


def _pav(ns, ss):
    """Textbook pool-adjacent-violators on integer (count, positives)
    bins — the reference the operator's minimax formula must equal."""
    blocks = []  # (n, s, span)
    for n, s in zip(ns, ss):
        blocks.append([n, s, 1])
        while len(blocks) >= 2 and (
            blocks[-1][1] * blocks[-2][0]
            < blocks[-2][1] * blocks[-1][0]  # exact rate compare
        ):
            n2, s2, c2 = blocks.pop()
            blocks[-1][0] += n2
            blocks[-1][1] += s2
            blocks[-1][2] += c2
    out = []
    for n, s, c in blocks:
        out.extend([s / n] * c)
    return out


class TestIsotonicCalibrate:
    """Isotonic calibration (curation.isotonic_calibrate): hand-built
    violation pooling, PAV ≡ minimax equivalence, monotonicity, and
    the null-exclusion contract."""

    def _run(self, spark, rows, **kw):
        from indexlab_spark.operators.curation import isotonic_calibrate

        df = spark.createDataFrame(rows, "s double, y int")
        out = isotonic_calibrate(df, "s", "y", **kw).collect()
        return sorted(out, key=lambda r: r["bin"])

    def test_hand_example_pools_violation(self, spark):
        # 4 quantile bins of 10 (scores 1..40), raw rates
        # [0.1, 0.3, 0.2, 0.4]: PAV pools the middle violation -> 0.25
        rates = {0: 1, 1: 3, 2: 2, 3: 4}
        rows = []
        for b in range(4):
            for i in range(10):
                rows.append((float(b * 10 + i + 1), int(i < rates[b])))
        out = self._run(spark, rows, n_bins=4)
        assert [r["raw_rate"] for r in out] == [0.1, 0.3, 0.2, 0.4]
        assert [r["calibrated"] for r in out] == [0.1, 0.25, 0.25, 0.4]
        assert [r["n"] for r in out] == [10] * 4

    def test_already_monotone_is_identity(self, spark):
        rates = {0: 1, 1: 4, 2: 7}
        rows = []
        for b in range(3):
            for i in range(10):
                rows.append((float(b * 10 + i), int(i < rates[b])))
        out = self._run(spark, rows, n_bins=3)
        assert [r["calibrated"] for r in out] == [0.1, 0.4, 0.7]
        assert [r["calibrated"] for r in out] == [
            r["raw_rate"] for r in out
        ]

    def test_minimax_equals_pav_and_monotone(self, spark):
        # adversarial pseudo-random labels; the operator's minimax
        # fit must equal textbook PAV pooling and be non-decreasing
        rows = [
            (float(i), int((i * 7 + 3) % 11 < 4)) for i in range(200)
        ]
        out = self._run(spark, rows, n_bins=8)
        ns = [r["n"] for r in out]
        ss = [r["positives"] for r in out]
        expect = [round(v, 6) for v in _pav(ns, ss)]
        got = [r["calibrated"] for r in out]
        assert got == expect
        assert got == sorted(got)

    def test_null_rows_excluded(self, spark):
        rows = [(float(i), i % 2) for i in range(20)]
        rows += [(None, 1), (5.0, None)]
        out = self._run(spark, rows, n_bins=2)
        assert sum(r["n"] for r in out) == 20

    def test_edges_and_counts(self, spark):
        rows = [(float(i), 0) for i in range(100)]
        out = self._run(spark, rows, n_bins=4)
        assert out[0]["lo"] is None and out[-1]["hi"] is None
        assert all(r["calibrated"] == 0.0 for r in out)


class TestKmeansSummary:
    """Public k-means (knn.kmeans_summary): blob recovery, inertia
    parity with a local recomputation, and same-input determinism."""

    def _blobs(self, spark, per=30, k=3, dim=8):
        rows = []
        for c in range(k):
            for i in range(per):
                # tight separated blobs at 10*c with small spread
                v = [
                    10.0 * c + 0.01 * ((i * 7 + j * 3) % 5)
                    for j in range(dim)
                ]
                rows.append((c * per + i, v))
        return spark.createDataFrame(
            rows, "id int, embedding array<float>"
        )

    def test_recovers_separated_blobs(self, spark):
        from indexlab_spark.operators.knn import kmeans_summary

        df = self._blobs(spark)
        out = kmeans_summary(df, k=3, iters=10).collect()
        assert sorted(r["n"] for r in out) == [30, 30, 30]
        # tight blobs: inertia per cluster is tiny vs separation
        assert all(r["inertia"] < 1.0 for r in out)
        assert all(r["centroid_norm"] > 0 for r in out)

    def test_inertia_matches_local_recompute(self, spark):
        import numpy as np

        from indexlab_spark.operators.knn import build_ivf, kmeans_summary

        df = self._blobs(spark, per=20, k=2, dim=4)
        out = {
            r["cluster_id"]: r
            for r in kmeans_summary(df, k=2, iters=5).collect()
        }
        assigned, cents = build_ivf(df, nlist=2, iters=5)
        cmap = {
            r["cluster_id"]: np.array(r["centroid"])
            for r in cents.collect()
        }
        loc = {}
        for r in assigned.collect():
            x = np.array([float(v) for v in r["embedding"]])
            d = float(((x - cmap[r["cluster_id"]]) ** 2).sum())
            loc[r["cluster_id"]] = loc.get(r["cluster_id"], 0.0) + d
        for cid, r in out.items():
            assert abs(r["inertia"] - loc[cid]) < 1e-6

    def test_deterministic_same_input(self, spark):
        from indexlab_spark.operators.knn import kmeans_summary

        df = self._blobs(spark)
        a = sorted(
            kmeans_summary(df, k=3, iters=10).collect(),
            key=lambda r: r["cluster_id"],
        )
        b = sorted(
            kmeans_summary(df, k=3, iters=10).collect(),
            key=lambda r: r["cluster_id"],
        )
        assert [tuple(r) for r in a] == [tuple(r) for r in b]


class TestClusterRepresentatives:
    """Dedup keep decision (dedup.cluster_representatives): argmax
    score per cluster, smallest-id tie-break, missing-score exclusion;
    and the leakage-safe cluster_split co-assignment contract."""

    def _run(self, spark, members, scores):
        from indexlab_spark.operators.dedup import cluster_representatives

        m = spark.createDataFrame(members, "id bigint, cluster bigint")
        s = spark.createDataFrame(scores, "id bigint, score double")
        out = cluster_representatives(m, s).collect()
        return {r["cluster"]: r for r in out}

    def test_argmax_with_smallest_id_tiebreak(self, spark):
        members = [(1, 1), (2, 1), (3, 1), (4, 4), (5, 4), (6, 6)]
        scores = [
            (1, 10.0), (2, 30.0), (3, 30.0),  # tie at 30 -> id 2
            (4, 5.0), (5, 2.0), (6, 7.0),
        ]
        out = self._run(spark, members, scores)
        assert out[1]["rep_id"] == 2 and out[1]["best_score"] == 30.0
        assert out[1]["n_members"] == 3
        assert out[4]["rep_id"] == 4 and out[4]["n_members"] == 2
        assert out[6]["rep_id"] == 6 and out[6]["n_members"] == 1

    def test_members_without_scores_excluded(self, spark):
        members = [(1, 1), (2, 1), (3, 3)]
        scores = [(1, 1.0), (3, 9.0)]  # no score for 2
        out = self._run(spark, members, scores)
        assert out[1]["rep_id"] == 1 and out[1]["n_members"] == 1
        assert out[3]["rep_id"] == 3

    def test_cluster_split_coassigns_and_delegates(self, spark):
        from indexlab_spark.operators.dedup import cluster_split
        from indexlab_spark.operators.textstats import stratified_split

        members = [(i, i % 7) for i in range(200)]
        m = spark.createDataFrame(members, "id bigint, cluster bigint")
        out = cluster_split(m)
        # every cluster maps to exactly one split (the leakage contract)
        per = (
            out.groupBy("cluster")
            .agg(F.countDistinct("split").alias("k"))
            .collect()
        )
        assert all(r["k"] == 1 for r in per)
        # and the bucket arithmetic is stratified_split's, verbatim
        want = {
            (r["id"], r["split"])
            for r in stratified_split(m, id_col="cluster").collect()
        }
        got = {(r["id"], r["split"]) for r in out.collect()}
        assert got == want


def _acf_local(xs, max_lag):
    n = len(xs)
    m = sum(xs) / n
    xc = [x - m for x in xs]
    den = sum(v * v for v in xc)
    out = []
    for k in range(1, max_lag + 1):
        num = sum(xc[t] * xc[t - k] for t in range(k, n))
        out.append(num / den if den else None)
    return out


class TestAcf:
    """Autocorrelation (analytics.acf): local-estimator parity, the
    alternating-series anchor, constant-series NULLs, and bounds."""

    def _run(self, spark, series, max_lag=3):
        from indexlab_spark.operators.analytics import acf

        rows = [("g", i, float(v)) for i, v in enumerate(series)]
        df = spark.createDataFrame(rows, "g string, t int, v double")
        out = acf(df, ["g"], "t", "v", max_lag=max_lag).collect()
        return {r["lag"]: r for r in out}

    def test_matches_local_estimator(self, spark):
        series = [3.0, 1.0, 4.0, 1.0, 5.0, 9.0, 2.0, 6.0, 5.0, 3.0]
        got = self._run(spark, series, max_lag=4)
        want = _acf_local(series, 4)
        for k in range(1, 5):
            assert abs(got[k]["autocorr"] - round(want[k - 1], 6)) < 1e-9
            assert got[k]["n"] == 10

    def test_alternating_series_lag1_near_minus_one(self, spark):
        series = [1.0, -1.0] * 10
        got = self._run(spark, series, max_lag=2)
        assert got[1]["autocorr"] < -0.9
        assert got[2]["autocorr"] > 0.85

    def test_constant_series_null(self, spark):
        got = self._run(spark, [5.0] * 8, max_lag=2)
        assert got[1]["autocorr"] is None

    def test_bounded_and_validates(self, spark):
        import pytest as _pytest

        from indexlab_spark.operators.analytics import acf

        series = [float((i * 13 + 5) % 7) for i in range(30)]
        got = self._run(spark, series, max_lag=5)
        assert all(abs(got[k]["autocorr"]) <= 1.0 for k in range(1, 6))
        df = spark.createDataFrame([("g", 1, 1.0)], "g string, t int, v double")
        with _pytest.raises(ValueError, match="max_lag"):
            acf(df, ["g"], "t", "v", max_lag=0)


class TestTheilSen:
    """Robust trend (analytics.theilsen_trend): exact hand values,
    outlier robustness vs OLS, and the <2-distinct-x drop contract."""

    def _run(self, spark, rows):
        from indexlab_spark.operators.analytics import theilsen_trend

        df = spark.createDataFrame(rows, "g string, x double, y double")
        return {
            r["g"]: r
            for r in theilsen_trend(df, ["g"], "x", "y").collect()
        }

    def test_exact_line_recovered(self, spark):
        rows = [("a", float(x), 2.0 * x + 3.0) for x in range(10)]
        out = self._run(spark, rows)
        assert out["a"]["slope"] == 2.0
        assert out["a"]["intercept"] == 3.0
        assert out["a"]["n"] == 10

    def test_outlier_robustness_vs_ols(self, spark):
        from indexlab_spark.operators.analytics import segment_trend

        rows = [("a", float(x), 1.0 * x) for x in range(11)]
        rows[10] = ("a", 10.0, 500.0)  # one corrupted endpoint day
        out = self._run(spark, rows)
        assert abs(out["a"]["slope"] - 1.0) < 0.2  # barely moves
        df = spark.createDataFrame(rows, "g string, x double, y double")
        ols = segment_trend(df, ["g"], "x", "y").collect()[0]
        assert ols["slope"] > 2.0  # OLS follows the outlier

    def test_median_of_pairwise_slopes(self, spark):
        pts = [(0.0, 0.0), (1.0, 2.0), (2.0, 1.0), (3.0, 6.0)]
        rows = [("a", x, y) for x, y in pts]
        slopes = sorted(
            (y2 - y1) / (x2 - x1)
            for i, (x1, y1) in enumerate(pts)
            for x2, y2 in pts[i + 1:]
        )
        n = len(slopes)
        med = (slopes[n // 2 - 1] + slopes[n // 2]) / 2 if n % 2 == 0 \
            else slopes[n // 2]
        out = self._run(spark, rows)
        assert abs(out["a"]["slope"] - round(med, 6)) < 1e-9

    def test_single_point_group_dropped(self, spark):
        rows = [("a", 1.0, 1.0), ("b", 1.0, 1.0), ("b", 2.0, 3.0)]
        out = self._run(spark, rows)
        assert "a" not in out and out["b"]["slope"] == 2.0


class TestGiniConcentration:
    """Gini (analytics.gini_concentration): closed-form anchors,
    local-formula parity, tie/order invariance, null exclusion."""

    def _run(self, spark, weights, extra_rows=()):
        from indexlab_spark.operators.analytics import gini_concentration

        rows = [("g", float(w)) for w in weights] + list(extra_rows)
        df = spark.createDataFrame(rows, "g string, w double")
        out = gini_concentration(df, ["g"], "w").collect()
        return {r["g"]: r for r in out}

    def test_uniform_is_zero(self, spark):
        out = self._run(spark, [5.0] * 10)
        assert out["g"]["gini"] == 0.0
        assert out["g"]["n"] == 10 and out["g"]["total"] == 50.0

    def test_total_concentration(self, spark):
        # one entity holds everything: G = (n-1)/n
        out = self._run(spark, [0.0] * 9 + [100.0])
        assert abs(out["g"]["gini"] - 0.9) < 1e-9

    def test_matches_local_formula_and_order_invariant(self, spark):
        ws = [float((i * 17 + 3) % 23 + 1) for i in range(40)]
        xs = sorted(ws)
        n = len(xs)
        want = 2 * sum((i + 1) * x for i, x in enumerate(xs)) / (
            n * sum(xs)
        ) - (n + 1) / n
        a = self._run(spark, ws)["g"]["gini"]
        b = self._run(spark, list(reversed(ws)))["g"]["gini"]
        assert a == b == round(want, 6)

    def test_null_excluded_single_entity_zero(self, spark):
        out = self._run(spark, [7.0], extra_rows=[("g", None)])
        assert out["g"]["n"] == 1 and out["g"]["gini"] == 0.0


class TestBenfordTest:
    """Benford screen (analytics.benford_test): hand-computed chi2,
    string digit extraction edge cases, zero/null exclusion."""

    def _run(self, spark, values):
        from indexlab_spark.operators.analytics import benford_test

        df = spark.createDataFrame([(v,) for v in values], "v double")
        out = benford_test(df, "v").collect()
        return {r["digit"]: r for r in out}

    def test_hand_chi2(self, spark):
        import math

        values = [1.0, 1.5, 19.0, 2.0, 3.0]  # digits 1,1,1,2,3
        out = self._run(spark, values)
        assert out[-1]["n"] == 5
        obs = {1: 3, 2: 1, 3: 1}
        chi2 = 0.0
        for d in range(1, 10):
            e = 5 * math.log10(1 + 1 / d)
            chi2 += (obs.get(d, 0) - e) ** 2 / e
            assert out[d]["n"] == obs.get(d, 0)
            assert out[d]["p_benford"] == round(math.log10(1 + 1 / d), 6)
        assert abs(out[-1]["chi2_contrib"] - round(chi2, 6)) < 1e-6
        assert out[1]["p_obs"] == 0.6

    def test_digit_extraction_edges(self, spark):
        out = self._run(spark, [0.052, -34.0, 0.0001234, 7e9])
        # digits: 5, 3, 1, 7
        assert out[5]["n"] == 1 and out[3]["n"] == 1
        assert out[1]["n"] == 1 and out[7]["n"] == 1
        assert out[-1]["n"] == 4

    def test_zero_and_null_excluded(self, spark):
        out = self._run(spark, [0.0, None, 5.0])
        assert out[-1]["n"] == 1 and out[5]["n"] == 1

    def test_total_is_sum_of_contribs(self, spark):
        vals = [float(i) for i in range(1, 60)]
        out = self._run(spark, vals)
        s = sum(out[d]["chi2_contrib"] for d in range(1, 10))
        assert abs(out[-1]["chi2_contrib"] - s) < 1e-4


class TestContingencyStats:
    """Categorical association (analytics.contingency_stats): local
    chi2/V/MI parity, exact independence, perfect association, and
    zero-cell inclusion."""

    def _run(self, spark, rows):
        from indexlab_spark.operators.analytics import contingency_stats

        df = spark.createDataFrame(rows, "a string, b string")
        return contingency_stats(df, "a", "b").collect()[0]

    def test_matches_local_computation(self, spark):
        import math

        rows = []
        counts = {("x", "p"): 10, ("x", "q"): 20, ("y", "p"): 30,
                  ("y", "q"): 5, ("z", "q"): 15}
        for (a, b), c in counts.items():
            rows += [(a, b)] * c
        r = self._run(spark, rows)
        n = sum(counts.values())
        ra = {"x": 30, "y": 35, "z": 15}
        rb = {"p": 40, "q": 40}
        chi2 = mi = 0.0
        for a in ra:
            for b in rb:
                o = counts.get((a, b), 0)
                e = ra[a] * rb[b] / n
                chi2 += (o - e) ** 2 / e
                if o:
                    mi += (o / n) * math.log(o * n / (ra[a] * rb[b]))
        assert r["n"] == n and r["n_a"] == 3 and r["n_b"] == 2
        assert r["dof"] == 2
        assert abs(r["chi2"] - round(chi2, 6)) < 1e-6
        assert abs(r["mi_nats"] - round(mi, 6)) < 1e-6
        v = math.sqrt(chi2 / (n * 1))
        assert abs(r["cramers_v"] - round(v, 6)) < 1e-6

    def test_exact_independence_is_zero(self, spark):
        rows = []
        for a, na in (("x", 2), ("y", 3)):
            for b, nb in (("p", 4), ("q", 6)):
                rows += [(a, b)] * (na * nb)
        r = self._run(spark, rows)
        assert r["chi2"] == 0.0 and r["cramers_v"] == 0.0
        assert r["mi_nats"] == 0.0

    def test_perfect_association(self, spark):
        import math

        rows = [("x", "x")] * 10 + [("y", "y")] * 20 + [("z", "z")] * 10
        r = self._run(spark, rows)
        assert r["cramers_v"] == 1.0
        # MI equals the (shared) entropy
        h = -(0.25 * math.log(0.25) * 2 + 0.5 * math.log(0.5))
        assert abs(r["mi_nats"] - round(h, 6)) < 1e-6

    def test_nulls_excluded(self, spark):
        rows = [("x", "p"), ("x", None), (None, "p"), ("y", "q")]
        r = self._run(spark, rows)
        assert r["n"] == 2


class TestHitsScores:
    """HITS (dedup.hits_scores): numpy power-iteration parity, the
    bipartite star anchor, determinism, and validation."""

    def _numpy_hits(self, edges, nodes, iters):
        import numpy as np

        idx = {n: i for i, n in enumerate(nodes)}
        A = np.zeros((len(nodes), len(nodes)))
        for s, d in edges:
            A[idx[s], idx[d]] = 1.0
        h = np.full(len(nodes), 1.0 / len(nodes) ** 0.5)
        a = h.copy()
        for _ in range(iters):
            a_raw = A.T @ h
            h_raw = A @ a_raw
            a = a_raw / (np.linalg.norm(a_raw) or 1.0)
            h = h_raw / (np.linalg.norm(h_raw) or 1.0)
        return {n: (h[idx[n]], a[idx[n]]) for n in nodes}

    def _run(self, spark, edges, iters=20):
        from indexlab_spark.operators.dedup import hits_scores

        df = spark.createDataFrame(edges, "id_a string, id_b string")
        out = hits_scores(df, iters=iters).collect()
        return {r["node"]: r for r in out}

    def test_matches_numpy_power_iteration(self, spark):
        edges = [
            ("u1", "v1"), ("u1", "v2"), ("u1", "v3"),
            ("u2", "v2"), ("u2", "v3"),
            ("u3", "v3"), ("v1", "u3"),
        ]
        nodes = sorted({x for e in edges for x in e})
        got = self._run(spark, edges, iters=15)
        want = self._numpy_hits(edges, nodes, 15)
        for n in nodes:
            assert abs(got[n]["hub"] - round(want[n][0], 6)) < 1e-5
            assert abs(got[n]["authority"] - round(want[n][1], 6)) < 1e-5

    def test_bipartite_star(self, spark):
        # one hub pointing at 3 authorities: hub=1, authorities equal
        edges = [("h", "x"), ("h", "y"), ("h", "z")]
        got = self._run(spark, edges, iters=5)
        assert abs(got["h"]["hub"] - 1.0) < 1e-9
        assert got["h"]["authority"] == 0.0
        tri = 1.0 / 3 ** 0.5
        for n in ("x", "y", "z"):
            assert abs(got[n]["authority"] - round(tri, 6)) < 1e-6
            assert got[n]["hub"] == 0.0

    def test_deterministic(self, spark):
        edges = [(f"a{i % 5}", f"b{(i * 3) % 7}") for i in range(30)]
        x = self._run(spark, edges, iters=8)
        y = self._run(spark, edges, iters=8)
        assert {k: tuple(v) for k, v in x.items()} == {
            k: tuple(v) for k, v in y.items()
        }

    def test_rejects_bad_iters(self, spark):
        import pytest as _pytest

        from indexlab_spark.operators.dedup import hits_scores

        df = spark.createDataFrame([("a", "b")], "id_a string, id_b string")
        with _pytest.raises(ValueError, match="iters"):
            hits_scores(df, iters=0)

    def test_quantized_matches_python_replay(self, spark):
        """quantize_dp=6 (the r12 oracle-replay contract): the Spark
        iteration must equal a pure-python replay that re-syncs to the
        same scaled-integer-rounded 6dp state each round — the exact
        arithmetic the recursive-CTE oracle runs."""
        import math

        from indexlab_spark.operators.dedup import hits_scores

        edges = [
            ("u1", "v1"), ("u1", "v2"), ("u1", "v3"),
            ("u2", "v2"), ("u2", "v3"),
            ("u3", "v3"), ("v1", "u3"),
        ]
        nodes = sorted({x for e in edges for x in e})
        init = math.floor(1.0 / len(nodes) ** 0.5 * 1e6 + 0.5) / 1e6
        h = {v: init for v in nodes}

        def q(x):
            y = x * 1e6
            f = math.floor(y)
            return (f + 1 if y - f >= 0.5 else f) / 1e6

        for _ in range(10):
            a_raw = {v: 0.0 for v in nodes}
            h_raw = {v: 0.0 for v in nodes}
            for s, d in edges:
                a_raw[d] += h[s]
            for s, d in edges:
                h_raw[s] += a_raw[d]
            nh = math.sqrt(sum(x * x for x in h_raw.values()))
            na = math.sqrt(sum(x * x for x in a_raw.values()))
            h = {v: q(h_raw[v] / nh) if nh else 0.0 for v in nodes}
            a = {v: q(a_raw[v] / na) if na else 0.0 for v in nodes}

        df = spark.createDataFrame(edges, "id_a string, id_b string")
        got = {
            r["node"]: r
            for r in hits_scores(df, iters=10, quantize_dp=6).collect()
        }
        for n in nodes:
            assert abs(got[n]["hub"] - round(h[n], 6)) < 1e-9, n
            assert abs(got[n]["authority"] - round(a[n], 6)) < 1e-9, n


class TestMannWhitneyU:
    """Mann-Whitney U (analytics.mann_whitney_u): pure-python midrank
    parity, brute-force pairwise-U equality, tie/degenerate contracts."""

    @staticmethod
    def _ref(av, bv, continuity=True):
        from collections import Counter

        cnt = Counter(av + bv)
        ranks, cum = {}, 0
        for v in sorted(cnt):
            ranks[v] = cum + (cnt[v] + 1) / 2.0
            cum += cnt[v]
        n_a, n_b = len(av), len(bv)
        n = n_a + n_b
        r_a = sum(ranks[v] for v in av)
        u_a = r_a - n_a * (n_a + 1) / 2.0
        mu = n_a * n_b / 2.0
        tie = sum(t**3 - t for t in cnt.values())
        sigma = (n_a * n_b / 12.0 * ((n + 1) - tie / (n * (n - 1)))) ** 0.5
        diff = u_a - mu
        cc = (
            (-0.5 if diff > 0 else (0.5 if diff < 0 else 0.0))
            if continuity
            else 0.0
        )
        z = (diff + cc) / sigma if sigma > 0 else None
        return u_a, n_a * n_b - u_a, mu, sigma, z

    def _run(self, spark, av, bv, **kw):
        from indexlab_spark.operators.analytics import mann_whitney_u

        rows = [("a", float(v)) for v in av] + [("b", float(v)) for v in bv]
        df = spark.createDataFrame(rows, "g string, v double")
        return mann_whitney_u(df, "g", "v", "a", "b", **kw).collect()[0]

    def test_matches_reference_with_ties(self, spark):
        av = [1.0, 2.0, 2.0, 3.5, 7.0, 7.0, 9.0, 4.2]
        bv = [2.0, 3.5, 5.0, 7.0, 8.0, 10.0, 1.0]
        got = self._run(spark, av, bv)
        u_a, u_b, mu, sigma, z = self._ref(av, bv)
        assert got["n_a"] == 8 and got["n_b"] == 7
        assert abs(got["u_a"] - u_a) < 1e-6
        assert abs(got["u_b"] - u_b) < 1e-6
        assert abs(got["mu"] - mu) < 1e-6
        assert abs(got["sigma"] - round(sigma, 6)) < 1e-5
        assert abs(got["z_stat"] - round(z, 6)) < 1e-5

    def test_u_equals_bruteforce_pair_count(self, spark):
        av = [3.0, 1.0, 4.0, 1.0, 5.0, 9.0, 2.0]
        bv = [6.0, 5.0, 3.0, 5.0, 8.0]
        got = self._run(spark, av, bv)
        brute = sum(
            1.0 if a > b else (0.5 if a == b else 0.0)
            for a in av
            for b in bv
        )
        assert abs(got["u_a"] - brute) < 1e-9

    def test_no_continuity(self, spark):
        av, bv = [1.0, 2.0, 3.0], [4.0, 5.0, 6.0, 7.0]
        got = self._run(spark, av, bv, continuity=False)
        *_, z = self._ref(av, bv, continuity=False)
        assert abs(got["z_stat"] - round(z, 6)) < 1e-6

    def test_all_tied_gives_null_sigma(self, spark):
        got = self._run(spark, [5.0, 5.0, 5.0], [5.0, 5.0])
        assert got["sigma"] is None and got["z_stat"] is None
        assert got["z_sig"] is False
        assert abs(got["u_a"] - 3.0) < 1e-9  # all pairs tie at 0.5

    def test_empty_arm_gives_nulls(self, spark):
        from indexlab_spark.operators.analytics import mann_whitney_u

        df = spark.createDataFrame(
            [("a", 1.0), ("a", 2.0)], "g string, v double"
        )
        r = mann_whitney_u(df, "g", "v", "a", "b").collect()[0]
        assert r["n_b"] == 0 and r["u_a"] is None and r["z_sig"] is False

    def test_many_buckets_vs_few(self, spark):
        av = [float(i % 13) for i in range(60)]
        bv = [float((i * 7) % 17) for i in range(45)]
        r1 = self._run(spark, av, bv, n_buckets=2)
        r2 = self._run(spark, av, bv, n_buckets=32)
        assert r1 == r2


class TestBootstrapCI:
    """Poisson bootstrap (analytics.bootstrap_ci): full local replica
    (md5 uniforms -> Poisson weights -> replicate means -> interpolated
    percentiles), determinism, point-estimate exactness, validation."""

    def _local(self, vals, ids, n_boot=50, level=0.95, seed=1):
        import hashlib

        import numpy as np

        from indexlab_spark.operators.analytics import _POIS1_CDF

        def pois_w(b, i):
            h = hashlib.md5(f"{seed}|{b}|{i}".encode()).hexdigest()
            u = int(h[:15], 16) / 2.0**60
            for k, c in enumerate(_POIS1_CDF):
                if u < c:
                    return k
            return len(_POIS1_CDF)

        means = []
        for b in range(1, n_boot + 1):
            ws = [pois_w(b, i) for i in ids]
            sw = sum(ws)
            if sw > 0:
                means.append(
                    sum(w * v for w, v in zip(ws, vals)) / sw
                )
        alpha = (1 - level) / 2
        lo, hi = np.quantile(means, [alpha, 1 - alpha], method="linear")
        return float(lo), float(hi)

    def _run(self, spark, vals, ids, **kw):
        from indexlab_spark.operators.analytics import bootstrap_ci

        df = spark.createDataFrame(
            list(zip(ids, [float(v) for v in vals])), "id string, x double"
        )
        return bootstrap_ci(df, "x", "id", **kw).collect()[0]

    def test_matches_local_replica(self, spark):
        vals = [float((i * 37) % 101) for i in range(40)]
        ids = [str(1000 + i) for i in range(40)]
        got = self._run(spark, vals, ids, n_boot=50)
        lo, hi = self._local(vals, ids, n_boot=50)
        assert abs(got["lo"] - round(lo, 6)) < 1e-6
        assert abs(got["hi"] - round(hi, 6)) < 1e-6
        assert got["n"] == 40
        assert abs(got["mean"] - round(sum(vals) / 40, 6)) < 1e-6
        assert got["lo"] <= got["mean"] <= got["hi"]

    def test_deterministic(self, spark):
        vals = list(range(25))
        ids = [str(i) for i in range(25)]
        a = self._run(spark, vals, ids, n_boot=30)
        b = self._run(spark, vals, ids, n_boot=30)
        assert a == b

    def test_seed_moves_interval(self, spark):
        vals = [float((i * 13) % 37) for i in range(30)]
        ids = [str(i) for i in range(30)]
        a = self._run(spark, vals, ids, n_boot=30, seed=1)
        b = self._run(spark, vals, ids, n_boot=30, seed=2)
        assert (a["lo"], a["hi"]) != (b["lo"], b["hi"])
        assert a["mean"] == b["mean"]  # point estimate is weight-free

    def test_empty_input(self, spark):
        from indexlab_spark.operators.analytics import bootstrap_ci

        df = spark.createDataFrame([], "id string, x double")
        r = bootstrap_ci(df, "x", "id", n_boot=10).collect()[0]
        assert r["n"] == 0 and r["mean"] is None and r["lo"] is None

    def test_validation(self, spark):
        import pytest as _pytest

        from indexlab_spark.operators.analytics import bootstrap_ci

        df = spark.createDataFrame([("1", 1.0)], "id string, x double")
        with _pytest.raises(ValueError, match="n_boot"):
            bootstrap_ci(df, "x", "id", n_boot=0)
        with _pytest.raises(ValueError, match="level"):
            bootstrap_ci(df, "x", "id", level=1.0)


class TestNegativeSamples:
    """Training-pair negatives (curation.negative_samples): full local
    hash replica, positive exclusion, determinism, contracts."""

    @staticmethod
    def _h(s):
        import hashlib

        return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)

    def _local(self, queries, positives, docs, k, seed=1,
               bucket_target=8, margin=3):
        nb = max(1, -(-len(set(docs)) // bucket_target))
        by_bucket = {}
        for d in sorted(set(docs)):
            by_bucket.setdefault(self._h(d) % nb, []).append(d)
        out = {}
        pos = set(positives)
        for q in queries:
            picked, seen = [], set()
            for i in range(1, k + margin + 1):
                b = self._h(f"{seed}|{q}|{i}") % nb
                cand = by_bucket.get(b, [])
                if not cand:
                    continue
                win = min(cand, key=lambda d: (self._h(f"{seed}|{q}|{i}|{d}"), d))
                if (q, win) in pos or win in seen:
                    continue
                seen.add(win)
                picked.append(win)
                if len(picked) == k:
                    break
            out[q] = picked
        return out

    def _run(self, spark, positives, docs, **kw):
        from indexlab_spark.operators.curation import negative_samples

        pos_df = spark.createDataFrame(
            positives, "query_id string, doc_id string"
        )
        doc_df = spark.createDataFrame([(d,) for d in docs], "doc_id string")
        rows = negative_samples(pos_df, doc_df, **kw).collect()
        got = {}
        for r in sorted(rows, key=lambda r: (r["query_id"], r["pick_rank"])):
            got.setdefault(r["query_id"], []).append(r["doc_id"])
        return got

    def test_matches_local_replica(self, spark):
        docs = [f"d{i}" for i in range(25)]
        positives = [("q1", "d3"), ("q1", "d7"), ("q2", "d0"), ("q3", "d9")]
        got = self._run(spark, positives, docs, k=4)
        want = self._local(
            ["q1", "q2", "q3"], positives, docs, k=4
        )
        assert got == {q: v for q, v in want.items() if v}

    def test_never_emits_positives_and_no_dups(self, spark):
        docs = [f"d{i}" for i in range(12)]
        positives = [(f"q{j}", f"d{i}") for j in range(4) for i in range(6)]
        got = self._run(spark, positives, docs, k=5)
        pos = {(q, d) for q, d in positives}
        for q, ds in got.items():
            assert len(ds) == len(set(ds))
            for d in ds:
                assert (q, d) not in pos

    def test_deterministic_and_seed_sensitive(self, spark):
        docs = [f"d{i}" for i in range(30)]
        positives = [("q1", "d1"), ("q2", "d2")]
        a = self._run(spark, positives, docs, k=3, seed=1)
        b = self._run(spark, positives, docs, k=3, seed=1)
        c = self._run(spark, positives, docs, k=3, seed=9)
        assert a == b
        assert a != c

    def test_empty_corpus(self, spark):
        from indexlab_spark.operators.curation import negative_samples

        pos = spark.createDataFrame(
            [("q1", "d1")], "query_id string, doc_id string"
        )
        docs = spark.createDataFrame([], "doc_id string")
        assert negative_samples(pos, docs).count() == 0

    def test_validation(self, spark):
        import pytest as _pytest

        from indexlab_spark.operators.curation import negative_samples

        pos = spark.createDataFrame(
            [("q1", "d1")], "query_id string, doc_id string"
        )
        docs = spark.createDataFrame([("d1",)], "doc_id string")
        with _pytest.raises(ValueError, match="k must"):
            negative_samples(pos, docs, k=0)
        with _pytest.raises(ValueError, match="bucket_target"):
            negative_samples(pos, docs, bucket_target=0)


class TestTemporalSplit:
    """Purged temporal split (curation.temporal_split): boundary and
    embargo edge semantics, entity-level atomicity, validation."""

    def _run(self, spark, rows, boundary, embargo=0):
        from indexlab_spark.operators.curation import temporal_split

        df = spark.createDataFrame(rows, "user string, ts timestamp")
        out = temporal_split(df, "user", "ts", boundary, embargo)
        return {r["user"]: r["split"] for r in out.collect()}

    def test_classification(self, spark):
        import datetime as dt

        t = lambda s: dt.datetime.fromisoformat(s)
        rows = [
            ("train_u", t("2024-01-01 00:00:00")),
            ("train_u", t("2024-01-05 00:00:00")),
            ("test_u", t("2024-01-20 00:00:00")),
            ("straddle_u", t("2024-01-05 00:00:00")),
            ("straddle_u", t("2024-01-25 00:00:00")),
            ("embargo_u", t("2024-01-09 12:00:00")),  # inside the gap
        ]
        got = self._run(
            spark, rows, "2024-01-10 00:00:00", embargo=86400
        )
        assert got == {
            "train_u": "train",
            "test_u": "test",
            "straddle_u": "embargo",
            "embargo_u": "embargo",
        }

    def test_boundary_edges(self, spark):
        import datetime as dt

        t = lambda s: dt.datetime.fromisoformat(s)
        rows = [
            ("at_boundary", t("2024-01-10 00:00:00")),  # >= -> test
            ("at_cutoff", t("2024-01-09 00:00:00")),  # == cutoff -> embargo
            ("just_before", t("2024-01-08 23:59:59")),  # < cutoff -> train
        ]
        got = self._run(spark, rows, "2024-01-10 00:00:00", embargo=86400)
        assert got == {
            "at_boundary": "test",
            "at_cutoff": "embargo",
            "just_before": "train",
        }

    def test_zero_embargo_is_a_plain_entity_cut(self, spark):
        import datetime as dt

        t = lambda s: dt.datetime.fromisoformat(s)
        rows = [
            ("a", t("2024-01-01 00:00:00")),
            ("b", t("2024-01-10 00:00:00")),
        ]
        got = self._run(spark, rows, "2024-01-10 00:00:00", embargo=0)
        assert got == {"a": "train", "b": "test"}

    def test_validation(self, spark):
        import pytest as _pytest

        from indexlab_spark.operators.curation import temporal_split

        df = spark.createDataFrame([("a",)], "user string").withColumn(
            "ts", F.current_timestamp()
        )
        with _pytest.raises(ValueError, match="embargo"):
            temporal_split(df, "user", "ts", "2024-01-01", -1)


class TestFdDiscovery:
    """Approximate FDs (analytics.fd_discovery): hand-computed g3
    counts, exact-FD zero, NULL contracts, validation."""

    def _run(self, spark, rows, pairs):
        from indexlab_spark.operators.analytics import fd_discovery

        df = spark.createDataFrame(rows, "a string, b string, c string")
        out = fd_discovery(df, pairs).collect()
        return {(r["determinant"], r["dependent"]): r for r in out}

    def test_hand_computed_g3(self, spark):
        rows = [
            ("k1", "x", "p"), ("k1", "x", "p"), ("k1", "y", "p"),
            ("k2", "z", "q"), ("k2", "z", "q"),
            ("k3", "w", "r"),
        ]
        got = self._run(spark, rows, [("a", "b"), ("a", "c")])
        r = got[("a", "b")]
        # k1 majority x (2 of 3) -> 1 violation; k2, k3 clean
        assert r["n"] == 6 and r["n_keys"] == 3
        assert r["violations"] == 1 and r["violating_keys"] == 1
        assert abs(r["violation_rate"] - round(1 / 6, 6)) < 1e-9
        assert r["holds"] is False
        assert got[("a", "c")]["holds"] is True
        assert got[("a", "c")]["violations"] == 0

    def test_null_contracts(self, spark):
        rows = [
            (None, "x", "p"),   # null det: excluded entirely
            ("k1", None, "p"),  # null dep is a value...
            ("k1", "x", "p"),   # ...so k1 has {NULL, x} -> 1 violation
        ]
        got = self._run(spark, rows, [("a", "b")])
        r = got[("a", "b")]
        assert r["n"] == 2 and r["violations"] == 1

    def test_empty_input(self, spark):
        got = self._run(spark, [], [("a", "b")])
        r = got[("a", "b")]
        assert r["n"] == 0 and r["violations"] == 0 and r["holds"] is True
        assert r["violation_rate"] is None

    def test_validation(self, spark):
        import pytest as _pytest

        from indexlab_spark.operators.analytics import fd_discovery

        df = spark.createDataFrame([("a",)], "a string")
        with _pytest.raises(ValueError, match="pairs"):
            fd_discovery(df, [])


class TestTargetEncode:
    """m-estimate target encoding (curation.target_encode): hand
    arithmetic, LOO leakage semantics, degenerate contracts."""

    def _run(self, spark, rows, **kw):
        from indexlab_spark.operators.curation import target_encode

        df = spark.createDataFrame(rows, "id string, cat string, y double")
        out = target_encode(df, "cat", "y", "id", **kw).collect()
        return {r["id"]: r["te"] for r in out}

    def test_fitted_hand_arithmetic(self, spark):
        rows = [
            ("r1", "a", 1.0), ("r2", "a", 0.0),
            ("r3", "b", 1.0),
        ]
        got = self._run(spark, rows, m=2.0)
        prior = 2.0 / 3.0
        te_a = (1.0 + 2.0 * prior) / (2 + 2.0)
        te_b = (1.0 + 2.0 * prior) / (1 + 2.0)
        assert abs(got["r1"] - round(te_a, 6)) < 1e-9
        assert abs(got["r2"] - round(te_a, 6)) < 1e-9
        assert abs(got["r3"] - round(te_b, 6)) < 1e-9

    def test_loo_excludes_own_label(self, spark):
        rows = [
            ("r1", "a", 1.0), ("r2", "a", 0.0), ("r3", "a", 1.0),
        ]
        got = self._run(spark, rows, m=1.0, loo=True)
        prior = 2.0 / 3.0
        # r1: (2 - 1 + prior) / (3 - 1 + 1)
        assert abs(got["r1"] - round((1 + prior) / 3.0, 6)) < 1e-9
        assert abs(got["r2"] - round((2 + prior) / 3.0, 6)) < 1e-9

    def test_loo_singleton_with_zero_m_falls_back_to_prior(self, spark):
        rows = [("r1", "a", 1.0), ("r2", "b", 0.0)]
        got = self._run(spark, rows, m=0.0, loo=True)
        assert abs(got["r1"] - 0.5) < 1e-9
        assert abs(got["r2"] - 0.5) < 1e-9

    def test_null_target_gets_fitted_encoding_under_loo(self, spark):
        rows = [("r1", "a", 1.0), ("r2", "a", None), ("r3", "a", 0.0)]
        got = self._run(spark, rows, m=0.0, loo=True)
        assert abs(got["r2"] - 0.5) < 1e-9  # fitted mean of {1, 0}

    def test_null_category_is_a_group(self, spark):
        rows = [("r1", None, 1.0), ("r2", None, 1.0), ("r3", "a", 0.0)]
        got = self._run(spark, rows, m=0.0)
        assert abs(got["r1"] - 1.0) < 1e-9
        assert abs(got["r3"] - 0.0) < 1e-9

    def test_all_null_targets_raise(self, spark):
        import pytest as _pytest

        from indexlab_spark.operators.curation import target_encode

        df = spark.createDataFrame(
            [("r1", "a", None)], "id string, cat string, y double"
        )
        with _pytest.raises(ValueError, match="non-null"):
            target_encode(df, "cat", "y", "id")
        with _pytest.raises(ValueError, match="m must"):
            target_encode(df, "cat", "y", "id", m=-1)


class TestHardNegatives:
    """ANCE-style mining (knn.hard_negatives): numpy brute parity with
    pool-then-exclude semantics, cushion sufficiency, cosine path."""

    def _np_ref(self, qs, corpus, positives, k, metric="ip"):
        import numpy as np

        out = {}
        pos = {}
        for q, d in positives:
            pos.setdefault(q, set()).add(d)
        max_pos = max((len(v) for v in pos.values()), default=0)
        pool = k + max_pos
        for qid, qv in qs:
            scores = []
            for did, dv in corpus:
                if metric == "ip":
                    s = float(np.dot(qv, dv))
                else:
                    nq, nd = np.linalg.norm(qv), np.linalg.norm(dv)
                    s = float(np.dot(qv, dv) / (nq * nd)) if nq > 0 and nd > 0 else 0.0
                scores.append((round(s, 6), did))
            ranked = sorted(scores, key=lambda t: (-t[0], t[1]))[:pool]
            negs = [
                (did, s) for s, did in ranked if did not in pos.get(qid, set())
            ][:k]
            out[qid] = negs
        return out

    def _run(self, spark, qs, corpus, positives, k, metric="ip"):
        from indexlab_spark.operators.knn import hard_negatives

        qdf = spark.createDataFrame(
            [(q, [float(x) for x in v]) for q, v in qs],
            "query_id string, qvec array<double>",
        )
        cdf = spark.createDataFrame(
            [(d, [float(x) for x in v]) for d, v in corpus],
            "doc_id string, embedding array<double>",
        )
        pdf = spark.createDataFrame(positives, "query_id string, doc_id string")
        rows = hard_negatives(qdf, pdf, cdf, k, metric=metric).collect()
        got = {}
        for r in sorted(rows, key=lambda r: (r["query_id"], r["hard_rank"])):
            got.setdefault(r["query_id"], []).append(
                (r["doc_id"], r["score"])
            )
        return got

    def test_matches_numpy_pool_then_exclude(self, spark):
        import numpy as np

        rng = np.random.default_rng(7)
        corpus = [(f"d{i}", rng.normal(size=8)) for i in range(30)]
        qs = [(f"q{i}", rng.normal(size=8)) for i in range(4)]
        positives = [("q0", "d1"), ("q0", "d2"), ("q1", "d5"), ("q3", "d0")]
        got = self._run(spark, qs, corpus, positives, k=4)
        want = self._np_ref(qs, corpus, positives, k=4)
        assert got == want

    def test_positive_in_topk_is_excluded_and_backfilled(self, spark):
        # corpus doc equal to the query vector is its own top-1 under cos
        qs = [("q1", [1.0, 0.0])]
        corpus = [
            ("self", [1.0, 0.0]),
            ("near", [0.9, 0.1]),
            ("far", [0.0, 1.0]),
        ]
        got = self._run(
            spark, qs, corpus, [("q1", "self")], k=2, metric="cos"
        )
        docs = [d for d, _ in got["q1"]]
        assert docs == ["near", "far"]

    def test_cosine_matches_numpy(self, spark):
        import numpy as np

        rng = np.random.default_rng(3)
        corpus = [(f"d{i}", rng.normal(size=5)) for i in range(15)]
        qs = [(f"q{i}", rng.normal(size=5)) for i in range(3)]
        positives = [("q0", "d3")]
        got = self._run(spark, qs, corpus, positives, k=3, metric="cos")
        want = self._np_ref(qs, corpus, positives, k=3, metric="cos")
        assert got == want

    def test_validation(self, spark):
        import pytest as _pytest

        from indexlab_spark.operators.knn import hard_negatives

        df = spark.createDataFrame(
            [("q", [1.0])], "query_id string, qvec array<double>"
        )
        pos = spark.createDataFrame([("q", "d")], "query_id string, doc_id string")
        with _pytest.raises(ValueError, match="k must"):
            hard_negatives(df, pos, df, 0)
        with _pytest.raises(ValueError, match="metric"):
            hard_negatives(df, pos, df, 1, metric="l2")


class TestRocAuc:
    """Exact rank AUC (analytics.roc_auc): brute pair-counting parity
    (the probabilistic definition), tie halves, degenerate classes."""

    def _run(self, spark, pairs):
        from indexlab_spark.operators.analytics import roc_auc

        df = spark.createDataFrame(
            [(float(y), float(s)) for y, s in pairs], "y double, s double"
        )
        return roc_auc(df, "y", "s").collect()[0]

    @staticmethod
    def _brute(pairs):
        pos = [s for y, s in pairs if y == 1]
        neg = [s for y, s in pairs if y == 0]
        tot = sum(
            1.0 if p > n else (0.5 if p == n else 0.0)
            for p in pos
            for n in neg
        )
        return tot / (len(pos) * len(neg))

    def test_matches_brute_pair_counting(self, spark):
        pairs = [
            (1, 0.9), (1, 0.7), (1, 0.7), (1, 0.3),
            (0, 0.8), (0, 0.7), (0, 0.2), (0, 0.1), (0, 0.3),
        ]
        got = self._run(spark, pairs)
        assert got["n_pos"] == 4 and got["n_neg"] == 5
        assert abs(got["auc"] - round(self._brute(pairs), 6)) < 1e-9
        assert abs(got["gini"] - round(2 * self._brute(pairs) - 1, 6)) < 1e-9

    def test_perfect_and_inverted(self, spark):
        perfect = [(1, 0.9), (1, 0.8), (0, 0.2), (0, 0.1)]
        assert self._run(spark, perfect)["auc"] == 1.0
        inverted = [(1, 0.1), (1, 0.2), (0, 0.8), (0, 0.9)]
        assert self._run(spark, inverted)["auc"] == 0.0

    def test_all_tied_is_half(self, spark):
        pairs = [(1, 0.5), (1, 0.5), (0, 0.5)]
        assert abs(self._run(spark, pairs)["auc"] - 0.5) < 1e-9

    def test_single_class_is_null(self, spark):
        r = self._run(spark, [(1, 0.5), (1, 0.7)])
        assert r["auc"] is None and r["n_neg"] == 0

    def test_non_binary_and_null_rows_excluded(self, spark):
        from indexlab_spark.operators.analytics import roc_auc

        df = spark.createDataFrame(
            [(1.0, 0.9), (0.0, 0.1), (2.0, 0.5), (None, 0.5), (1.0, None)],
            "y double, s double",
        )
        r = roc_auc(df, "y", "s").collect()[0]
        assert r["n_pos"] == 1 and r["n_neg"] == 1 and r["auc"] == 1.0


class TestReliabilityCurve:
    """Calibration table + ECE (analytics.reliability_curve)."""

    def _run(self, spark, pairs, n_bins=10):
        from indexlab_spark.operators.analytics import reliability_curve

        df = spark.createDataFrame(
            [(float(y) if y is not None else None,
              float(p) if p is not None else None) for y, p in pairs],
            "y double, p double",
        )
        rows = reliability_curve(df, "y", "p", n_bins).collect()
        return {r["bin"]: r for r in rows}

    def test_hand_computed_ece(self, spark):
        pairs = [
            (1, 0.95), (0, 0.95),   # bin 9: conf .95, acc .5
            (1, 0.15), (0, 0.15), (0, 0.15),  # bin 1: conf .15, acc 1/3
        ]
        got = self._run(spark, pairs)
        b9, b1, tot = got[9], got[1], got[-1]
        assert b9["n"] == 2 and abs(b9["acc"] - 0.5) < 1e-9
        assert abs(b9["gap"] - round(0.5 - 0.95, 6)) < 1e-9
        assert abs(b1["conf"] - 0.15) < 1e-9
        ece = (2 * abs(0.5 - 0.95) + 3 * abs(1 / 3 - 0.15)) / 5
        assert abs(tot["ece"] - round(ece, 6)) < 1e-6
        assert tot["n"] == 5

    def test_edge_probability_one_clamps_to_last_bin(self, spark):
        got = self._run(spark, [(1, 1.0), (1, 0.0)], n_bins=4)
        assert got[3]["n"] == 1 and got[0]["n"] == 1

    def test_exclusions(self, spark):
        pairs = [(1, 0.5), (2, 0.5), (None, 0.5), (1, None), (1, 1.5)]
        got = self._run(spark, pairs)
        assert got[-1]["n"] == 1

    def test_perfectly_calibrated_bins_give_zero_ece(self, spark):
        pairs = [(1, 0.75), (1, 0.75), (1, 0.75), (0, 0.75)]
        got = self._run(spark, pairs, n_bins=2)
        assert abs(got[-1]["ece"] - 0.0) < 1e-9

    def test_empty_input(self, spark):
        got = self._run(spark, [])
        assert list(got) == [-1] and got[-1]["n"] == 0
        assert got[-1]["ece"] is None


class TestWoeIv:
    """WOE / IV feature screen (analytics.woe_iv)."""

    def _run(self, spark, rows, smoothing=0.5):
        from indexlab_spark.operators.analytics import woe_iv

        df = spark.createDataFrame(rows, "cat string, y double")
        out = woe_iv(df, "cat", "y", smoothing).collect()
        return {r["category"]: r for r in out}

    def test_hand_computed(self, spark):
        import math

        rows = (
            [("a", 1.0)] * 3 + [("a", 0.0)] * 1
            + [("b", 1.0)] * 1 + [("b", 0.0)] * 3
        )
        lam, tp, tn, k = 0.5, 4, 4, 2
        got = self._run(spark, rows, smoothing=lam)

        def share(n, tot):
            return (n + lam) / (tot + lam * k)

        woe_a = math.log(share(3, tp) / share(1, tn))
        ivc_a = (share(3, tp) - share(1, tn)) * woe_a
        woe_b = math.log(share(1, tp) / share(3, tn))
        ivc_b = (share(1, tp) - share(3, tn)) * woe_b
        assert abs(got["a"]["woe"] - round(woe_a, 6)) < 1e-9
        assert abs(got["b"]["woe"] - round(woe_b, 6)) < 1e-9
        assert abs(got["<ALL>"]["iv"] - round(ivc_a + ivc_b, 6)) < 1e-6
        assert got["<ALL>"]["n_pos"] == 4 and got["<ALL>"]["n_neg"] == 4

    def test_zero_count_cell_stays_finite_with_smoothing(self, spark):
        rows = [("a", 1.0), ("a", 1.0), ("b", 0.0)]
        got = self._run(spark, rows, smoothing=0.5)
        assert got["a"]["woe"] is not None
        assert abs(got["a"]["woe"]) < float("inf")

    def test_null_category_is_a_group(self, spark):
        rows = [(None, 1.0), (None, 0.0), ("a", 1.0)]
        got = self._run(spark, rows)
        assert got["<NULL>"]["n_pos"] == 1 and got["<NULL>"]["n_neg"] == 1

    def test_independent_predictor_has_near_zero_iv(self, spark):
        rows = (
            [("a", 1.0)] * 5 + [("a", 0.0)] * 5
            + [("b", 1.0)] * 5 + [("b", 0.0)] * 5
        )
        got = self._run(spark, rows)
        assert abs(got["<ALL>"]["iv"]) < 1e-9

    def test_validation(self, spark):
        import pytest as _pytest

        from indexlab_spark.operators.analytics import woe_iv

        df = spark.createDataFrame([("a", 1.0)], "cat string, y double")
        with _pytest.raises(ValueError, match="smoothing"):
            woe_iv(df, "cat", "y", smoothing=-1)


class TestCorrMatrix:
    """One-pass Pearson matrix (analytics.corr_matrix)."""

    def _run(self, spark, rows, cols=("a", "b", "c")):
        from indexlab_spark.operators.analytics import corr_matrix

        df = spark.createDataFrame(rows, "a double, b double, c double")
        out = corr_matrix(df, list(cols)).collect()
        return {(r["col_a"], r["col_b"]): r for r in out}

    def test_matches_numpy(self, spark):
        import numpy as np

        rng = np.random.default_rng(11)
        x = rng.normal(size=40)
        y = 2 * x + rng.normal(size=40)
        z = rng.normal(size=40)
        rows = [(float(a), float(b), float(c)) for a, b, c in zip(x, y, z)]
        got = self._run(spark, rows)
        ref = np.corrcoef(np.array(rows).T)
        assert abs(got[("a", "b")]["corr"] - round(ref[0, 1], 6)) < 1e-6
        assert abs(got[("a", "c")]["corr"] - round(ref[0, 2], 6)) < 1e-6
        assert abs(got[("b", "c")]["corr"] - round(ref[1, 2], 6)) < 1e-6
        assert got[("a", "b")]["n"] == 40
        assert len(got) == 3  # pairs only, no diagonal

    def test_listwise_deletion(self, spark):
        rows = [
            (1.0, 2.0, 3.0), (2.0, 4.0, 1.0),
            (3.0, 6.0, None),  # dropped everywhere
            (4.0, 8.0, 2.0),
        ]
        got = self._run(spark, rows)
        assert got[("a", "b")]["n"] == 3
        assert abs(got[("a", "b")]["corr"] - 1.0) < 1e-9

    def test_constant_column_is_null(self, spark):
        rows = [(1.0, 5.0, 1.0), (2.0, 5.0, 2.0), (3.0, 5.0, 1.0)]
        got = self._run(spark, rows)
        assert got[("a", "b")]["corr"] is None
        assert got[("a", "c")]["corr"] is not None

    def test_validation(self, spark):
        import pytest as _pytest

        from indexlab_spark.operators.analytics import corr_matrix

        df = spark.createDataFrame([(1.0,)], "a double")
        with _pytest.raises(ValueError, match=">= 2"):
            corr_matrix(df, ["a"])
        with _pytest.raises(ValueError, match="duplicate"):
            corr_matrix(df, ["a", "a"])


class TestLiftTable:
    """Decile lift / gains (analytics.lift_table)."""

    def _run(self, spark, pairs, n_tiles=4):
        from indexlab_spark.operators.analytics import lift_table

        df = spark.createDataFrame(
            [(float(s), float(y)) for s, y in pairs], "s double, y double"
        )
        rows = lift_table(df, "s", "y", n_tiles).collect()
        return {r["tile"]: r for r in rows}

    def test_hand_computed_quartiles(self, spark):
        # 8 rows, scores 1..8, responders are the top 3 scorers
        pairs = [(i, 1.0 if i >= 6 else 0.0) for i in range(1, 9)]
        got = self._run(spark, pairs, n_tiles=4)
        top = got[1]
        assert top["n"] == 2 and top["responders"] == 2
        assert abs(top["rate"] - 1.0) < 1e-9
        grate = 3 / 8
        assert abs(top["lift"] - round(1.0 / grate, 6)) < 1e-9
        assert abs(top["cum_capture"] - round(2 / 3, 6)) < 1e-9
        t2 = got[2]
        assert t2["cum_n"] == 4 and t2["cum_responders"] == 3
        assert abs(t2["cum_capture"] - 1.0) < 1e-9
        assert abs(got[4]["cum_lift"] - 1.0) < 1e-9  # full population

    def test_ties_share_a_tile(self, spark):
        pairs = [(5.0, 1.0)] * 6 + [(1.0, 0.0), (1.0, 1.0)]
        got = self._run(spark, pairs, n_tiles=4)
        # all 5.0-scores land together; tile count < n_tiles
        sizes = sorted(r["n"] for r in got.values())
        assert 6 in sizes

    def test_random_scores_have_unit_total_lift(self, spark):
        pairs = [((i * 17) % 29, 1.0 if i % 3 == 0 else 0.0)
                 for i in range(60)]
        got = self._run(spark, pairs, n_tiles=5)
        last = got[max(got)]
        assert abs(last["cum_lift"] - 1.0) < 1e-9
        assert abs(last["cum_capture"] - 1.0) < 1e-9

    def test_raises_on_no_responders_or_empty(self, spark):
        import pytest as _pytest

        from indexlab_spark.operators.analytics import lift_table

        df = spark.createDataFrame(
            [(1.0, 0.0), (2.0, 0.0)], "s double, y double"
        )
        with _pytest.raises(ValueError, match="zero responders"):
            lift_table(df, "s", "y")
        empty = spark.createDataFrame([], "s double, y double")
        with _pytest.raises(ValueError, match="usable|n_tiles"):
            lift_table(empty, "s", "y")
        with _pytest.raises(ValueError, match="n_tiles"):
            lift_table(df, "s", "y", n_tiles=1)


class TestCupedAb:
    """CUPED A/B (analytics.cuped_ab): pure-python parity, variance
    reduction on a correlated covariate, degenerate contracts."""

    @staticmethod
    def _ref(units):
        # units: list of (variant, y, x)
        import statistics as st

        xs = [x for _, _, x in units]
        ys = [y for _, y, _ in units]
        n = len(units)
        xbar = sum(xs) / n
        ybar = sum(ys) / n
        cov = sum((x - xbar) * (y - ybar) for _, y, x in units)
        varx = sum((x - xbar) ** 2 for x in xs)
        theta = cov / varx
        out = {}
        for arm in ("a", "b"):
            rows = [(y, x) for v, y, x in units if v == arm]
            na = len(rows)
            my = sum(y for y, _ in rows) / na
            mx = sum(x for _, x in rows) / na
            out[f"mean_{arm}"] = my - theta * (mx - xbar)
            adj = [y - theta * x for y, x in rows]
            out[f"var_{arm}"] = st.variance(adj)
            out[f"n_{arm}"] = na
        se2 = out["var_a"] / out["n_a"] + out["var_b"] / out["n_b"]
        out["t"] = (out["mean_a"] - out["mean_b"]) / se2**0.5
        out["theta"] = theta
        return out

    def _run(self, spark, units):
        from indexlab_spark.operators.analytics import cuped_ab

        df = spark.createDataFrame(
            [(v, float(y), float(x)) for v, y, x in units],
            "v string, y double, x double",
        )
        return cuped_ab(df, "v", "y", "x").collect()[0]

    def test_matches_reference(self, spark):
        import random

        rng = random.Random(5)
        units = []
        for i in range(60):
            x = rng.gauss(10, 3)
            arm = "a" if i % 2 == 0 else "b"
            lift = 0.5 if arm == "a" else 0.0
            units.append((arm, 0.8 * x + rng.gauss(0, 1) + lift, x))
        got = self._run(spark, units)
        ref = self._ref(units)
        assert abs(got["theta"] - round(ref["theta"], 6)) < 1e-6
        assert abs(got["mean_a_adj"] - round(ref["mean_a"], 6)) < 1e-6
        assert abs(got["mean_b_adj"] - round(ref["mean_b"], 6)) < 1e-6
        assert abs(got["t_stat"] - round(ref["t"], 6)) < 1e-4
        assert got["n_a"] == 30 and got["n_b"] == 30

    def test_variance_reduction_beats_raw_welch(self, spark):
        import random

        from indexlab_spark.operators.analytics import ab_test_report

        rng = random.Random(9)
        units = []
        for i in range(200):
            x = rng.gauss(100, 20)
            arm = "a" if i % 2 == 0 else "b"
            units.append((arm, x + rng.gauss(0, 2) + (1.0 if arm == "a" else 0.0), x))
        got = self._run(spark, units)
        assert got["rho2"] > 0.9  # covariate explains most variance
        raw_df = spark.createDataFrame(
            [(v, float(y), 0.0) for v, y, x in units],
            "v string, y double, c double",
        )
        raw = ab_test_report(raw_df, "v", "y", "c").collect()[0]
        assert abs(got["t_stat"]) > abs(raw["t_stat"])

    def test_null_units_leave_both_moments(self, spark):
        units = [("a", 1.0, 2.0), ("a", None, 2.0), ("b", 2.0, None),
                 ("a", 2.0, 3.0), ("b", 1.0, 1.0), ("b", 3.0, 4.0)]
        df = spark.createDataFrame(units, "v string, y double, x double")
        from indexlab_spark.operators.analytics import cuped_ab

        r = cuped_ab(df, "v", "y", "x").collect()[0]
        assert r["n_a"] == 2 and r["n_b"] == 2

    def test_constant_covariate_gives_nulls(self, spark):
        units = [("a", 1.0, 5.0), ("a", 2.0, 5.0),
                 ("b", 1.5, 5.0), ("b", 2.5, 5.0)]
        got = self._run(spark, units)
        assert got["theta"] is None and got["t_stat"] is None
        assert got["t_sig"] is False


class TestClassificationReport:
    """Confusion-matrix metrics (analytics.classification_report)."""

    def _run(self, spark, pairs):
        from indexlab_spark.operators.analytics import classification_report

        df = spark.createDataFrame(pairs, "y string, p string")
        rows = classification_report(df, "y", "p").collect()
        return {r["class"]: r for r in rows}

    def test_hand_computed(self, spark):
        pairs = (
            [("cat", "cat")] * 4 + [("cat", "dog")] * 1
            + [("dog", "dog")] * 2 + [("dog", "cat")] * 2
            + [("dog", "bird")] * 1
        )
        got = self._run(spark, pairs)
        cat = got["cat"]
        assert cat["support"] == 5
        assert abs(cat["precision"] - round(4 / 6, 6)) < 1e-9
        assert abs(cat["recall"] - 0.8) < 1e-9
        f1 = 2 * (4 / 6) * 0.8 / ((4 / 6) + 0.8)
        assert abs(cat["f1"] - round(f1, 6)) < 1e-6
        bird = got["bird"]  # prediction-only class
        assert bird["support"] == 0 and bird["recall"] is None
        assert bird["precision"] == 0.0
        tot = got["<ALL>"]
        acc = 6 / 10
        assert abs(tot["precision"] - acc) < 1e-9
        # kappa: pe = (5*6 + 5*3 + 0*1) / 100 = 0.45
        kappa = (acc - 0.45) / (1 - 0.45)
        assert abs(tot["recall"] - round(kappa, 6)) < 1e-6
        assert tot["support"] == 10

    def test_perfect_predictions(self, spark):
        pairs = [("a", "a")] * 3 + [("b", "b")] * 2
        got = self._run(spark, pairs)
        assert got["a"]["f1"] == 1.0 and got["b"]["f1"] == 1.0
        assert got["<ALL>"]["precision"] == 1.0  # accuracy
        assert got["<ALL>"]["recall"] == 1.0  # kappa
        assert got["<ALL>"]["f1"] == 1.0  # macro f1

    def test_nulls_excluded(self, spark):
        pairs = [("a", "a"), (None, "a"), ("a", None)]
        got = self._run(spark, pairs)
        assert got["<ALL>"]["support"] == 1

    def test_single_class_kappa_null(self, spark):
        # pe = 1 -> kappa 0/0 -> NULL
        got = self._run(spark, [("a", "a"), ("a", "a")])
        assert got["<ALL>"]["recall"] is None


class TestSpearmanCorr:
    """Spearman rho (analytics.spearman_corr)."""

    def _run(self, spark, pairs):
        from indexlab_spark.operators.analytics import spearman_corr

        df = spark.createDataFrame(
            [(float(a) if a is not None else None,
              float(b) if b is not None else None) for a, b in pairs],
            "a double, b double",
        )
        return spearman_corr(df, "a", "b").collect()[0]

    @staticmethod
    def _ref(pairs):
        # midrank-based Spearman, pure python
        def midranks(vals):
            from collections import Counter

            cnt = Counter(vals)
            r, cum = {}, 0
            for v in sorted(cnt):
                r[v] = cum + (cnt[v] + 1) / 2.0
                cum += cnt[v]
            return [r[v] for v in vals]

        xs = [a for a, _ in pairs]
        ys = [b for _, b in pairs]
        ra, rb = midranks(xs), midranks(ys)
        n = len(pairs)
        ma, mb = sum(ra) / n, sum(rb) / n
        cov = sum((x - ma) * (y - mb) for x, y in zip(ra, rb))
        va = sum((x - ma) ** 2 for x in ra)
        vb = sum((y - mb) ** 2 for y in rb)
        return cov / (va * vb) ** 0.5

    def test_monotone_nonlinear_is_one(self, spark):
        pairs = [(x, x**3) for x in range(-5, 6)]
        r = self._run(spark, pairs)
        assert abs(r["rho"] - 1.0) < 1e-9 and r["n"] == 11

    def test_matches_reference_with_ties(self, spark):
        pairs = [
            (1, 4), (2, 4), (2, 7), (3, 1), (3, 1), (5, 9),
            (5, 2), (8, 8), (9, 8), (4, 4),
        ]
        r = self._run(spark, pairs)
        assert abs(r["rho"] - round(self._ref(pairs), 6)) < 1e-6

    def test_listwise_and_constant(self, spark):
        pairs = [(1, 2), (2, None), (None, 3), (4, 5), (6, 7)]
        r = self._run(spark, pairs)
        assert r["n"] == 3
        const = self._run(spark, [(1, 5), (2, 5), (3, 5)])
        assert const["rho"] is None


class TestNextEventDataset:
    """Sequence training pairs (curation.next_event_dataset)."""

    def _run(self, spark, rows, **kw):
        import datetime as dt

        from indexlab_spark.operators.curation import next_event_dataset

        data = [
            (u, dt.datetime(2024, 1, 1, 0, 0, sec), e)
            for u, sec, e in rows
        ]
        df = spark.createDataFrame(data, "u string, ts timestamp, e string")
        out = next_event_dataset(df, "u", "ts", "e", **kw).collect()
        return sorted(
            (r["u"], r["pos"], r["context"], r["next_event"]) for r in out
        )

    def test_basic_sliding_context(self, spark):
        rows = [("u1", 1, "a"), ("u1", 2, "b"), ("u1", 3, "c"),
                ("u1", 4, "d"), ("u1", 5, "e")]
        got = self._run(spark, rows, context_len=3)
        assert got == [
            ("u1", 1, "a", "b"),
            ("u1", 2, "a|b", "c"),
            ("u1", 3, "a|b|c", "d"),
            ("u1", 4, "b|c|d", "e"),
        ]

    def test_min_context_zero_keeps_first_event(self, spark):
        rows = [("u1", 1, "a"), ("u1", 2, "b")]
        got = self._run(spark, rows, context_len=2, min_context=0)
        assert ("u1", 0, "", "a") in got

    def test_sequences_are_independent(self, spark):
        rows = [("u1", 1, "a"), ("u2", 2, "x"), ("u1", 3, "b"),
                ("u2", 4, "y")]
        got = self._run(spark, rows)
        assert ("u1", 1, "a", "b") in got
        assert ("u2", 1, "x", "y") in got
        assert all("x" not in c for u, p, c, n in got if u == "u1")

    def test_full_ties_give_stable_output_set(self, spark):
        rows = [("u1", 1, "a"), ("u1", 1, "a"), ("u1", 2, "b")]
        got1 = self._run(spark, rows)
        got2 = self._run(spark, list(reversed(rows)))
        assert got1 == got2
        assert ("u1", 2, "a|a", "b") in got1

    def test_validation(self, spark):
        import pytest as _pytest

        from indexlab_spark.operators.curation import next_event_dataset

        df = spark.createDataFrame(
            [("u", "2024-01-01", "a")], "u string, ts string, e string"
        )
        with _pytest.raises(ValueError, match="context_len"):
            next_event_dataset(df, "u", "ts", "e", context_len=0)
        with _pytest.raises(ValueError, match="min_context"):
            next_event_dataset(df, "u", "ts", "e", min_context=9)


class TestKfoldAssign:
    """Group k-fold (curation.kfold_assign)."""

    def test_deterministic_and_balanced(self, spark):
        from indexlab_spark.operators.curation import kfold_assign

        df = spark.createDataFrame(
            [(str(i), f"g{i % 40}") for i in range(400)],
            "id string, grp string",
        )
        a = {r["id"]: r["fold"] for r in kfold_assign(df, "id", 5).collect()}
        b = {r["id"]: r["fold"] for r in kfold_assign(df, "id", 5).collect()}
        assert a == b
        sizes = {}
        for f in a.values():
            sizes[f] = sizes.get(f, 0) + 1
        assert set(sizes) == {0, 1, 2, 3, 4}
        assert max(sizes.values()) < 2.0 * min(sizes.values())

    def test_group_mode_keeps_entities_whole(self, spark):
        from indexlab_spark.operators.curation import kfold_assign

        df = spark.createDataFrame(
            [(str(i), f"g{i % 7}") for i in range(70)],
            "id string, grp string",
        )
        rows = kfold_assign(df, "id", 4, group_col="grp").collect()
        per_group = {}
        for r in rows:
            per_group.setdefault(r["grp"], set()).add(r["fold"])
        assert all(len(v) == 1 for v in per_group.values())

    def test_salt_moves_assignment(self, spark):
        from indexlab_spark.operators.curation import kfold_assign

        df = spark.createDataFrame([(str(i),) for i in range(50)], "id string")
        a = {r["id"]: r["fold"] for r in kfold_assign(df, "id", 5).collect()}
        c = {
            r["id"]: r["fold"]
            for r in kfold_assign(df, "id", 5, salt="other").collect()
        }
        assert a != c

    def test_validation(self, spark):
        import pytest as _pytest

        from indexlab_spark.operators.curation import kfold_assign

        df = spark.createDataFrame([("1",)], "id string")
        with _pytest.raises(ValueError, match="k must"):
            kfold_assign(df, "id", 1)


class TestSlidingDistinct:
    """Trailing-window distinct (analytics.sliding_distinct)."""

    def _brute(self, pairs, w):
        import datetime as dt

        days = sorted({d for _, d in pairs})
        lo, hi = days[0], days[-1]
        out = {}
        d = lo
        while d <= hi:
            start = d - dt.timedelta(days=w - 1)
            out[d] = len({k for k, ad in pairs if start <= ad <= d})
            d += dt.timedelta(days=1)
        return out

    def _run(self, spark, pairs, w, **kw):
        import datetime as dt

        from indexlab_spark.operators.analytics import sliding_distinct

        rows = [
            (k, dt.datetime.combine(d, dt.time(12, 0)))
            for k, d in pairs
        ]
        df = spark.createDataFrame(rows, "k string, ts timestamp")
        out = sliding_distinct(df, "ts", "k", w, **kw).collect()
        return {r["day"]: r["distinct_keys"] for r in out}

    def test_exact_matches_bruteforce(self, spark):
        import datetime as dt

        d0 = dt.date(2024, 3, 1)
        pairs = [
            (f"u{i % 9}", d0 + dt.timedelta(days=(i * 3) % 15))
            for i in range(60)
        ]
        got = self._run(spark, pairs, 7)
        want = self._brute(pairs, 7)
        assert got == want

    def test_window_one_is_daily_distinct(self, spark):
        import datetime as dt

        d0 = dt.date(2024, 3, 1)
        pairs = [("a", d0), ("b", d0), ("a", d0),
                 ("a", d0 + dt.timedelta(days=2))]
        got = self._run(spark, pairs, 1)
        assert got[d0] == 2
        assert got[d0 + dt.timedelta(days=2)] == 1
        # gap day: no activity, zero distinct -> absent row is the
        # contract (only days with a covering activity appear)
        assert d0 + dt.timedelta(days=1) not in got

    def test_sketch_close_to_exact(self, spark):
        import datetime as dt

        d0 = dt.date(2024, 3, 1)
        pairs = [
            (f"u{i}", d0 + dt.timedelta(days=i % 10))
            for i in range(500)
        ]
        exact = self._run(spark, pairs, 7)
        approx = self._run(spark, pairs, 7, sketch=True)
        assert set(exact) == set(approx)
        for d, n in exact.items():
            assert abs(approx[d] - n) <= max(3, 0.05 * n)

    def test_validation(self, spark):
        import pytest as _pytest

        from indexlab_spark.operators.analytics import sliding_distinct

        df = spark.createDataFrame([("a",)], "k string").withColumn(
            "ts", F.current_timestamp()
        )
        with _pytest.raises(ValueError, match="window_days"):
            sliding_distinct(df, "ts", "k", 0)


class TestFkCheck:
    """Cross-table referential integrity (analytics.fk_check)."""

    def _run(self, spark, child, parent, keys=None):
        from indexlab_spark.operators.analytics import fk_check

        c = spark.createDataFrame(child, "ck string, x int")
        p = spark.createDataFrame(parent, "pk string")
        return fk_check(c, p, keys or [("ck", "pk")]).collect()[0]

    def test_hand_counts(self, spark):
        child = [("a", 1), ("a", 2), ("b", 3), ("zz", 4), ("zz", 5),
                 (None, 6)]
        parent = [("a",), ("b",), ("c",)]
        r = self._run(spark, child, parent)
        assert r["n_child"] == 5 and r["n_null_keys"] == 1
        assert r["n_keys"] == 3
        assert r["n_orphans"] == 2 and r["n_orphan_keys"] == 1
        assert abs(r["orphan_rate"] - 0.4) < 1e-9
        assert r["ok"] is False

    def test_clean_fk(self, spark):
        r = self._run(spark, [("a", 1), ("b", 2)], [("a",), ("b",)])
        assert r["n_orphans"] == 0 and r["ok"] is True

    def test_composite_key(self, spark):
        from indexlab_spark.operators.analytics import fk_check

        c = spark.createDataFrame(
            [("a", 1), ("a", 2), ("b", 9)], "k1 string, k2 int"
        )
        p = spark.createDataFrame(
            [("a", 1), ("a", 2)], "p1 string, p2 int"
        )
        r = fk_check(c, p, [("k1", "p1"), ("k2", "p2")]).collect()[0]
        assert r["n_orphans"] == 1 and r["n_orphan_keys"] == 1

    def test_validation(self, spark):
        import pytest as _pytest

        from indexlab_spark.operators.analytics import fk_check

        df = spark.createDataFrame([("a",)], "k string")
        with _pytest.raises(ValueError, match="keys"):
            fk_check(df, df, [])


class TestConformalInterval:
    """Split-conformal q_hat (analytics.conformal_interval)."""

    def _run(self, spark, pairs, alpha=0.1):
        from indexlab_spark.operators.analytics import conformal_interval

        df = spark.createDataFrame(
            [(float(y), float(p)) for y, p in pairs], "y double, p double"
        )
        return conformal_interval(df, "y", "p", alpha).collect()[0]

    def test_exact_order_statistic(self, spark):
        import math

        residuals = [0.5, 1.5, 0.25, 3.0, 2.0, 0.75, 1.0, 2.5, 0.1]
        pairs = [(r, 0.0) for r in residuals]
        alpha = 0.2
        got = self._run(spark, pairs, alpha)
        n = len(residuals)
        k = math.ceil((n + 1) * (1 - alpha))
        want = sorted(residuals)[k - 1]
        assert got["n"] == n and got["k"] == k
        assert abs(got["q_hat"] - round(want, 6)) < 1e-9

    def test_tied_residuals(self, spark):
        pairs = [(1.0, 0.0)] * 6 + [(2.0, 0.0)] * 2
        got = self._run(spark, pairs, alpha=0.5)
        # k = ceil(9 * 0.5) = 5 -> 5th smallest of [1]*6+[2]*2 = 1.0
        assert got["k"] == 5 and abs(got["q_hat"] - 1.0) < 1e-9

    def test_coverage_on_holdout(self, spark):
        import random

        rng = random.Random(3)
        cal = [(rng.gauss(0, 1), 0.0) for _ in range(200)]
        got = self._run(spark, cal, alpha=0.1)
        test = [abs(rng.gauss(0, 1)) for _ in range(500)]
        cover = sum(1 for t in test if t <= got["q_hat"]) / len(test)
        assert cover >= 0.85  # 0.9 target, finite-sample slack

    def test_too_small_raises(self, spark):
        import pytest as _pytest

        from indexlab_spark.operators.analytics import conformal_interval

        df = spark.createDataFrame([(1.0, 0.0)], "y double, p double")
        with _pytest.raises(ValueError, match="too small"):
            conformal_interval(df, "y", "p", alpha=0.1)
        with _pytest.raises(ValueError, match="alpha"):
            conformal_interval(df, "y", "p", alpha=1.5)


class TestWinsorize:
    """Percentile clamp (analytics.winsorize)."""

    def _run(self, spark, vals, **kw):
        from indexlab_spark.operators.analytics import winsorize

        df = spark.createDataFrame(
            [(str(i), float(v) if v is not None else None)
             for i, v in enumerate(vals)],
            "id string, v double",
        )
        rows = winsorize(df, "v", **kw).collect()
        return {r["id"]: r for r in rows}

    def test_clamps_tails_to_exact_percentiles(self, spark):
        import numpy as np

        vals = list(range(1, 101))  # 1..100
        got = self._run(spark, vals, lower=0.1, upper=0.9)
        lo = float(np.percentile(vals, 10, method="linear"))
        hi = float(np.percentile(vals, 90, method="linear"))
        assert abs(got["0"]["v_w"] - round(lo, 6)) < 1e-9   # 1 -> lo
        assert abs(got["99"]["v_w"] - round(hi, 6)) < 1e-9  # 100 -> hi
        assert got["49"]["v_w"] == 50.0  # middle untouched
        assert abs(got["0"]["_lo"] - round(lo, 6)) < 1e-9

    def test_per_group_bounds(self, spark):
        from indexlab_spark.operators.analytics import winsorize

        rows = [("a", float(v)) for v in range(10)] + [
            ("b", float(v * 100)) for v in range(10)
        ]
        df = spark.createDataFrame(rows, "g string, v double")
        out = winsorize(df, "v", 0.0, 0.5, group_cols=["g"]).collect()
        by_g = {}
        for r in out:
            by_g.setdefault(r["g"], set()).add(r["_hi"])
        assert by_g["a"] == {4.5} and by_g["b"] == {450.0}

    def test_null_passthrough(self, spark):
        got = self._run(spark, [1.0, 2.0, None, 3.0], lower=0.0, upper=1.0)
        assert got["2"]["v_w"] is None

    def test_validation(self, spark):
        import pytest as _pytest

        from indexlab_spark.operators.analytics import winsorize

        df = spark.createDataFrame([("1", 1.0)], "id string, v double")
        with _pytest.raises(ValueError, match="lower"):
            winsorize(df, "v", 0.9, 0.1)


class TestUpsertByKey:
    """Keyed MERGE semantics (maintenance.upsert_by_key)."""

    def test_update_insert_survive(self, spark):
        from indexlab_spark.operators.maintenance import upsert_by_key

        old = spark.createDataFrame(
            [("k1", 1), ("k2", 2), ("k3", 3)], "k string, v int"
        )
        upd = spark.createDataFrame(
            [("k2", 20), ("k9", 90)], "k string, v int"
        )
        got = {r["k"]: r["v"] for r in upsert_by_key(old, upd, ["k"]).collect()}
        assert got == {"k1": 1, "k2": 20, "k3": 3, "k9": 90}

    def test_schema_mismatch_raises(self, spark):
        import pytest as _pytest

        from indexlab_spark.operators.maintenance import upsert_by_key

        old = spark.createDataFrame([("k", 1)], "k string, v int")
        upd = spark.createDataFrame([("k",)], "k string")
        with _pytest.raises(ValueError, match="schemas differ"):
            upsert_by_key(old, upd, ["k"])
        with _pytest.raises(ValueError, match="key_cols"):
            upsert_by_key(old, old, [])


class TestScd2Merge:
    """SCD type-2 maintenance (maintenance.scd2_merge)."""

    def _dim(self, spark, rows):
        import datetime as dt

        return spark.createDataFrame(
            [
                (k, v, dt.date.fromisoformat(vf),
                 dt.date.fromisoformat(vt) if vt else None)
                for k, v, vf, vt in rows
            ],
            "k string, attr string, valid_from date, valid_to date",
        )

    def test_full_lifecycle(self, spark):
        from indexlab_spark.operators.maintenance import scd2_merge

        current = self._dim(spark, [
            ("a", "old", "2024-01-01", "2024-03-01"),  # closed history
            ("a", "new", "2024-03-01", None),          # open, will change
            ("b", "keep", "2024-01-01", None),         # open, unchanged
            ("c", "gone", "2024-01-01", None),         # open, deleted
        ])
        snap = spark.createDataFrame(
            [("a", "newer"), ("b", "keep"), ("d", "born")],
            "k string, attr string",
        )
        out = scd2_merge(current, snap, ["k"], ["attr"], "2024-06-01")
        rows = sorted(
            (r["k"], r["attr"], str(r["valid_from"]), str(r["valid_to"]))
            for r in out.collect()
        )
        assert rows == sorted([
            ("a", "old", "2024-01-01", "2024-03-01"),
            ("a", "new", "2024-03-01", "2024-06-01"),
            ("a", "newer", "2024-06-01", "None"),
            ("b", "keep", "2024-01-01", "None"),
            ("c", "gone", "2024-01-01", "2024-06-01"),
            ("d", "born", "2024-06-01", "None"),
        ])

    def test_null_attr_equality_is_unchanged(self, spark):
        from indexlab_spark.operators.maintenance import scd2_merge

        current = spark.createDataFrame(
            [("a", None, "2024-01-01", None)],
            "k string, attr string, valid_from string, valid_to string",
        ).select(
            "k", "attr",
            F.col("valid_from").cast("date").alias("valid_from"),
            F.col("valid_to").cast("date").alias("valid_to"),
        )
        snap = spark.createDataFrame([("a", None)], "k string, attr string")
        out = scd2_merge(current, snap, ["k"], ["attr"], "2024-06-01")
        r = out.collect()
        assert len(r) == 1 and r[0]["valid_to"] is None

    def test_idempotent_on_same_snapshot(self, spark):
        from indexlab_spark.operators.maintenance import scd2_merge

        current = self._dim(spark, [("a", "x", "2024-01-01", None)])
        snap = spark.createDataFrame([("a", "x")], "k string, attr string")
        once = scd2_merge(current, snap, ["k"], ["attr"], "2024-06-01")
        twice = scd2_merge(once, snap, ["k"], ["attr"], "2024-07-01")
        assert sorted(map(tuple, once.collect())) == sorted(
            map(tuple, twice.collect())
        )

    def test_validation(self, spark):
        import pytest as _pytest

        from indexlab_spark.operators.maintenance import scd2_merge

        df = spark.createDataFrame([("a",)], "k string")
        with _pytest.raises(ValueError, match="required"):
            scd2_merge(df, df, [], ["a"], "2024-01-01")


class TestRound9Properties:
    """Hypothesis property tests for the round-9 statistics family —
    algebraic invariants that hold for ANY input, complementing the
    hand-computed anchors."""

    def test_mwu_u_sum_invariant(self, spark):
        from hypothesis import HealthCheck, given, settings
        from hypothesis import strategies as st

        from indexlab_spark.operators.analytics import mann_whitney_u

        @given(
            av=st.lists(
                st.integers(min_value=0, max_value=9), min_size=1,
                max_size=12,
            ),
            bv=st.lists(
                st.integers(min_value=0, max_value=9), min_size=1,
                max_size=12,
            ),
        )
        @settings(
            max_examples=8, deadline=None,
            suppress_health_check=[HealthCheck.function_scoped_fixture],
        )
        def prop(av, bv):
            rows = [("a", float(v)) for v in av] + [
                ("b", float(v)) for v in bv
            ]
            df = spark.createDataFrame(rows, "g string, v double")
            r = mann_whitney_u(df, "g", "v", "a", "b").collect()[0]
            # U_a + U_b == n_a * n_b always (rank-sum identity)
            assert abs(r["u_a"] + r["u_b"] - len(av) * len(bv)) < 1e-6
            assert 0 <= r["u_a"] <= len(av) * len(bv)

        prop()

    def test_winsorize_output_always_within_bounds(self, spark):
        from hypothesis import HealthCheck, given, settings
        from hypothesis import strategies as st

        from indexlab_spark.operators.analytics import winsorize

        @given(
            vals=st.lists(
                st.floats(
                    min_value=-1e6, max_value=1e6,
                    allow_nan=False, allow_infinity=False,
                ),
                min_size=2, max_size=20,
            )
        )
        @settings(
            max_examples=8, deadline=None,
            suppress_health_check=[HealthCheck.function_scoped_fixture],
        )
        def prop(vals):
            df = spark.createDataFrame(
                [(float(v),) for v in vals], "v double"
            )
            for r in winsorize(df, "v", 0.1, 0.9).collect():
                assert r["_lo"] <= r["v_w"] <= r["_hi"]

        prop()

    def test_sliding_distinct_monotone_in_window(self, spark):
        import datetime as dt

        from indexlab_spark.operators.analytics import sliding_distinct

        d0 = dt.date(2024, 5, 1)
        rows = [
            (f"u{(i * 7) % 13}",
             dt.datetime.combine(
                 d0 + dt.timedelta(days=(i * 3) % 11), dt.time(9)
             ))
            for i in range(80)
        ]
        df = spark.createDataFrame(rows, "k string, ts timestamp")
        small = {
            r["day"]: r["distinct_keys"]
            for r in sliding_distinct(df, "ts", "k", 3).collect()
        }
        big = {
            r["day"]: r["distinct_keys"]
            for r in sliding_distinct(df, "ts", "k", 9).collect()
        }
        for day, n in small.items():
            assert big[day] >= n  # a wider window never loses keys

    def test_roc_auc_is_mwu_normalized(self, spark):
        from indexlab_spark.operators.analytics import (
            mann_whitney_u,
            roc_auc,
        )

        rows = [
            (1.0 if i % 3 == 0 else 0.0, float((i * 11) % 17))
            for i in range(40)
        ]
        df = spark.createDataFrame(rows, "y double, s double")
        auc = roc_auc(df, "y", "s").collect()[0]
        mwu_df = df.select(
            F.when(F.col("y") == 1.0, "pos").otherwise("neg").alias("g"),
            "s",
        )
        u = mann_whitney_u(mwu_df, "g", "s", "pos", "neg").collect()[0]
        assert abs(
            auc["auc"] - round(u["u_a"] / (u["n_a"] * u["n_b"]), 6)
        ) < 1e-6


class TestKAnonymity:
    """Privacy audit (analytics.k_anonymity)."""

    def _run(self, spark, rows, k=3, sensitive=None):
        from indexlab_spark.operators.analytics import k_anonymity

        df = spark.createDataFrame(rows, "zip string, age string, dx string")
        return k_anonymity(
            df, ["zip", "age"], k, sensitive_col=sensitive
        ).collect()[0]

    def test_hand_counts(self, spark):
        rows = (
            [("10001", "30", "flu")] * 4
            + [("10001", "40", "cold")] * 2   # class of 2 < k=3
            + [("10002", "30", "flu")] * 3
        )
        r = self._run(spark, rows, k=3)
        assert r["n"] == 9 and r["n_classes"] == 3
        assert r["min_class_size"] == 2
        assert r["n_violating_rows"] == 2
        assert abs(r["violating_share"] - round(2 / 9, 6)) < 1e-9
        assert r["anonymous"] is False and r["l_min"] is None

    def test_l_diversity_floor(self, spark):
        rows = (
            [("10001", "30", "flu")] * 3       # 1 distinct dx -> leaks
            + [("10002", "30", "flu")] * 2
            + [("10002", "30", "cold")] * 1    # 2 distinct dx
        )
        r = self._run(spark, rows, k=3, sensitive="dx")
        assert r["l_min"] == 1

    def test_null_qi_is_a_value(self, spark):
        rows = [(None, "30", "a")] * 3 + [("10001", "30", "b")] * 3
        r = self._run(spark, rows, k=3)
        assert r["n_classes"] == 2 and r["anonymous"] is True

    def test_validation(self, spark):
        import pytest as _pytest

        from indexlab_spark.operators.analytics import k_anonymity

        df = spark.createDataFrame([("a",)], "zip string")
        with _pytest.raises(ValueError, match="qi_cols"):
            k_anonymity(df, [], 3)
        with _pytest.raises(ValueError, match="k must"):
            k_anonymity(df, ["zip"], 1)


class TestAbPower:
    """Experiment sizing (analytics.ab_power)."""

    def _run(self, spark, units, **kw):
        from indexlab_spark.operators.analytics import ab_power

        df = spark.createDataFrame(
            [(v, float(x)) for v, x in units], "v string, x double"
        )
        return ab_power(df, "v", "x", **kw).collect()[0]

    def test_closed_form(self, spark):
        import math
        import statistics as st

        vals = [10.0, 12.0, 9.0, 11.0, 10.5, 13.0, 8.5, 12.5]
        units = [("a" if i % 2 == 0 else "b", x) for i, x in enumerate(vals)]
        got = self._run(spark, units, mde_rel=0.05)
        var = st.variance(vals)
        mean = st.mean(vals)
        kappa = 2 * (1.96 + 0.84) ** 2
        n_req = math.ceil(kappa * var / (0.05 * mean) ** 2)
        assert got["n_required_per_arm"] == n_req
        mde = math.sqrt(kappa * var / 4.0) / mean  # 4 units per arm
        assert abs(got["mde_detectable_rel"] - round(mde, 6)) < 1e-6
        assert got["n_units"] == 8

    def test_inversion_roundtrip(self, spark):
        # at n = n_required, the detectable MDE equals the asked MDE
        import random

        rng = random.Random(1)
        units = [
            ("a" if i % 2 == 0 else "b", rng.gauss(100, 10))
            for i in range(400)
        ]
        got = self._run(spark, units, mde_rel=0.02)
        n_req = got["n_required_per_arm"]
        # rebuild with exactly n_req per arm of the same distribution:
        # instead verify algebraically from the returned stats
        import math

        kappa = 2 * (1.96 + 0.84) ** 2
        mde_at_req = math.sqrt(
            kappa * got["variance"] / n_req
        ) / abs(got["mean"])
        assert abs(mde_at_req - 0.02) < 0.001

    def test_degenerate_zero_variance(self, spark):
        got = self._run(spark, [("a", 5.0), ("b", 5.0)])
        assert got["n_required_per_arm"] is None

    def test_validation(self, spark):
        import pytest as _pytest

        from indexlab_spark.operators.analytics import ab_power

        df = spark.createDataFrame([("a", 1.0)], "v string, x double")
        with _pytest.raises(ValueError, match="mde_rel"):
            ab_power(df, "v", "x", mde_rel=0.0)


class TestHoltWinters:
    """Triple exponential smoothing (analytics.holt_winters_forecast)."""

    @staticmethod
    def _ref(xs, m, alpha, beta, gamma, horizon):
        lvl = sum(xs[:m]) / m
        trd = sum((xs[m + i] - xs[i]) / m for i in range(m)) / m
        season = [xs[i] - lvl for i in range(m)]
        sse = 0.0
        for t in range(m, len(xs)):
            s_old = season[t % m]
            err = xs[t] - (lvl + trd + s_old)
            sse += err * err
            lvl_new = alpha * (xs[t] - s_old) + (1 - alpha) * (lvl + trd)
            trd = beta * (lvl_new - lvl) + (1 - beta) * trd
            season[t % m] = gamma * (xs[t] - lvl_new) + (1 - gamma) * s_old
            lvl = lvl_new
        n = len(xs)
        return [
            lvl + h * trd + season[(n + h - 1) % m]
            for h in range(1, horizon + 1)
        ], sse

    def _run(self, spark, xs, m, horizon=4, **kw):
        from indexlab_spark.operators.analytics import (
            holt_winters_forecast,
        )

        df = spark.createDataFrame(
            [("g", i, float(x)) for i, x in enumerate(xs)],
            "g string, t int, v double",
        )
        rows = holt_winters_forecast(
            df, ["g"], "t", "v", m, horizon=horizon, **kw
        ).collect()
        return sorted(rows, key=lambda r: r["h"])

    def test_matches_pure_python(self, spark):
        xs = [10, 20, 15, 12, 22, 18, 14, 25, 19, 16, 27, 20]
        got = self._run(spark, xs, m=3, horizon=5)
        want, sse = self._ref(
            [float(x) for x in xs], 3, 0.5, 0.3, 0.3, 5
        )
        assert [r["h"] for r in got] == [1, 2, 3, 4, 5]
        for r, w in zip(got, want):
            assert abs(r["forecast"] - round(w, 6)) < 1e-9
        assert abs(got[0]["sse"] - round(sse, 6)) < 1e-9
        assert got[0]["n_obs"] == 12

    def test_pure_seasonal_series_reproduces_exactly(self, spark):
        pattern = [5.0, 9.0, 2.0, 7.0]
        xs = pattern * 4
        got = self._run(spark, xs, m=4, horizon=8)
        for r in got:
            assert abs(r["forecast"] - pattern[(16 + r["h"] - 1) % 4]) < 1e-9
        assert abs(got[0]["sse"]) < 1e-18
        assert abs(got[0]["trend"]) < 1e-18

    def test_short_series_emits_nothing(self, spark):
        got = self._run(spark, [1.0, 2.0, 3.0], m=2, horizon=2)
        assert got == []

    def test_validation(self, spark):
        import pytest as _pytest

        from indexlab_spark.operators.analytics import (
            holt_winters_forecast,
        )

        df = spark.createDataFrame([("g", 1, 1.0)], "g string, t int, v double")
        with _pytest.raises(ValueError, match="period"):
            holt_winters_forecast(df, ["g"], "t", "v", 1)
        with _pytest.raises(ValueError, match="horizon"):
            holt_winters_forecast(df, ["g"], "t", "v", 4, horizon=0)


class TestSequencePairs:
    """Gap-allowed A->B mining (analytics.sequence_pairs)."""

    def _run(self, spark, rows, **kw):
        import datetime as dt

        from indexlab_spark.operators.analytics import sequence_pairs

        data = [
            (u, dt.datetime(2024, 1, 1, 0, 0, sec), e)
            for u, sec, e in rows
        ]
        df = spark.createDataFrame(data, "u string, ts timestamp, e string")
        out = sequence_pairs(df, "u", "ts", "e", **kw).collect()
        return {(r["antecedent"], r["consequent"]): r for r in out}

    def test_gap_allowed_vs_adjacent(self, spark):
        # u1: a .. x .. b  (a->b holds WITH a gap)
        rows = [("u1", 1, "a"), ("u1", 2, "x"), ("u1", 3, "b"),
                ("u2", 1, "a"), ("u2", 2, "b")]
        got = self._run(spark, rows, min_support=0.01)
        assert got[("a", "b")]["n_seqs"] == 2
        assert abs(got[("a", "b")]["support"] - 1.0) < 1e-9
        assert got[("a", "x")]["n_seqs"] == 1
        assert ("b", "a") not in got

    def test_repeat_event_supports_self_pair(self, spark):
        rows = [("u1", 1, "a"), ("u1", 5, "a"), ("u2", 1, "a")]
        got = self._run(spark, rows)
        assert got[("a", "a")]["n_seqs"] == 1  # only u1 repeats

    def test_simultaneous_never_supports(self, spark):
        rows = [("u1", 1, "a"), ("u1", 1, "b")]
        got = self._run(spark, rows)
        assert ("a", "b") not in got and ("b", "a") not in got

    def test_support_floor_and_topn(self, spark):
        rows = (
            [("u%d" % i, 1, "a") for i in range(10)]
            + [("u%d" % i, 2, "b") for i in range(10)]
            + [("u0", 3, "z")]
        )
        got = self._run(spark, rows, min_support=0.5)
        assert ("a", "b") in got and ("a", "z") not in got
        one = self._run(spark, rows, min_support=0.01, top_n=1)
        assert list(one) == [("a", "b")]

    def test_validation(self, spark):
        import pytest as _pytest

        from indexlab_spark.operators.analytics import sequence_pairs

        df = spark.createDataFrame(
            [("u", "2024-01-01", "a")], "u string, ts string, e string"
        )
        with _pytest.raises(ValueError, match="min_support"):
            sequence_pairs(df, "u", "ts", "e", min_support=0)
        with _pytest.raises(ValueError, match="top_n"):
            sequence_pairs(df, "u", "ts", "e", top_n=0)


class TestCohortLtv:
    """Revenue retention triangle (analytics.cohort_ltv)."""

    def _run(self, spark, rows):
        import datetime as dt

        from indexlab_spark.operators.analytics import cohort_ltv

        data = [
            (u, dt.datetime.fromisoformat(d), float(v)) for u, d, v in rows
        ]
        df = spark.createDataFrame(data, "u string, ts timestamp, v double")
        return {
            (r["cohort_week"], r["week_offset"]): r
            for r in cohort_ltv(df, "u", "ts", "v").collect()
        }

    def test_hand_triangle(self, spark):
        rows = [
            # cohort of Mon 2024-01-01: u1, u2
            ("u1", "2024-01-02 10:00", 10.0),
            ("u2", "2024-01-03 10:00", 20.0),
            ("u1", "2024-01-09 10:00", 5.0),    # offset 1
            # cohort of Mon 2024-01-08: u3
            ("u3", "2024-01-10 10:00", 7.0),
        ]
        got = self._run(spark, rows)
        c0 = got[("2024-01-01", 0)]
        assert c0["n_users"] == 2 and c0["revenue"] == 30.0
        assert c0["ltv"] == 15.0
        c1 = got[("2024-01-01", 1)]
        assert c1["revenue"] == 5.0 and c1["cum_revenue"] == 35.0
        assert abs(c1["ltv"] - 17.5) < 1e-9
        c2 = got[("2024-01-08", 0)]
        assert c2["n_users"] == 1 and c2["ltv"] == 7.0

    def test_null_value_marks_activity_with_zero_revenue(self, spark):
        import datetime as dt

        from indexlab_spark.operators.analytics import cohort_ltv

        df = spark.createDataFrame(
            [("u1", dt.datetime(2024, 1, 2), None)],
            "u string, ts timestamp, v double",
        )
        r = cohort_ltv(df, "u", "ts", "v").collect()
        assert len(r) == 1 and r[0]["revenue"] == 0.0

    def test_ltv_curve_is_monotone(self, spark):
        rows = [
            ("u%d" % i, "2024-01-0%d 09:00" % (2 + i % 3),
             float(1 + i % 5))
            for i in range(30)
        ] + [
            ("u%d" % i, "2024-01-1%d 09:00" % (i % 4), 2.0)
            for i in range(15)
        ]
        got = self._run(spark, rows)
        by_cohort = {}
        for (cw, off), r in got.items():
            by_cohort.setdefault(cw, []).append((off, r["cum_revenue"]))
        for curve in by_cohort.values():
            curve.sort()
            for (o1, c1), (o2, c2) in zip(curve, curve[1:]):
                assert c2 >= c1


class TestEwmaControl:
    """EWMA chart (analytics.ewma_control)."""

    @staticmethod
    def _ref(xs, lam, L):
        import math

        n = len(xs)
        mean = sum(xs) / n
        sd = math.sqrt(sum((x - mean) ** 2 for x in xs) / (n - 1))
        z = mean
        out = []
        for t, x in enumerate(xs, start=1):
            z = lam * x + (1 - lam) * z
            half = L * sd * math.sqrt(
                lam / (2 - lam) * (1 - (1 - lam) ** (2 * t))
            )
            out.append((z, mean + half, mean - half))
        return out

    def _run(self, spark, xs, **kw):
        from indexlab_spark.operators.analytics import ewma_control

        df = spark.createDataFrame(
            [("g", i, float(x)) for i, x in enumerate(xs)],
            "g string, t int, v double",
        )
        rows = ewma_control(df, ["g"], "t", "v", **kw).collect()
        return sorted(rows, key=lambda r: r["t"])

    def test_matches_reference_fold(self, spark):
        xs = [10, 11, 9, 10, 12, 10, 11, 30, 31, 30]
        got = self._run(spark, xs, lam=0.2, L=3.0)
        want = self._ref([float(x) for x in xs], 0.2, 3.0)
        for r, (z, ucl, lcl) in zip(got, want):
            assert abs(r["z"] - round(z, 6)) < 1e-9
            assert abs(r["ucl"] - round(ucl, 6)) < 1e-9
            assert abs(r["lcl"] - round(lcl, 6)) < 1e-9

    def test_sustained_shift_breaches(self, spark):
        base = [9.5, 10.5, 9.8, 10.2, 10.0,
                9.7, 10.3, 9.9, 10.1, 10.0] * 2
        xs = base + [12.0] * 3  # small sustained shift at the tail
        got = self._run(spark, xs, lam=0.5, L=3.0)
        # verified against the reference fold: the 3rd shifted point
        # crosses the UCL while every in-control point stays inside
        assert got[-1]["breach"] is True
        assert not any(r["breach"] for r in got[:20])

    def test_constant_series_has_null_limits(self, spark):
        got = self._run(spark, [5.0, 5.0, 5.0])
        assert all(r["ucl"] is None and r["breach"] is False for r in got)

    def test_validation(self, spark):
        import pytest as _pytest

        from indexlab_spark.operators.analytics import ewma_control

        df = spark.createDataFrame([("g", 1, 1.0)], "g string, t int, v double")
        with _pytest.raises(ValueError, match="lam"):
            ewma_control(df, ["g"], "t", "v", lam=0)
        with _pytest.raises(ValueError, match="L >"):
            ewma_control(df, ["g"], "t", "v", L=0)


class TestPrAuc:
    """Average precision (analytics.pr_auc)."""

    @staticmethod
    def _ref(pairs):
        # sklearn threshold-step definition over distinct scores desc
        from collections import defaultdict

        by_v = defaultdict(lambda: [0, 0])
        for y, s in pairs:
            by_v[s][0 if y == 1 else 1] += 1
        n_pos = sum(c[0] for c in by_v.values())
        ap = 0.0
        tp = fp = 0
        for v in sorted(by_v, reverse=True):
            ca, cb = by_v[v]
            tp += ca
            fp += cb
            if ca:
                ap += (ca / n_pos) * (tp / (tp + fp))
        return ap

    def _run(self, spark, pairs):
        from indexlab_spark.operators.analytics import pr_auc

        df = spark.createDataFrame(
            [(float(y), float(s)) for y, s in pairs], "y double, s double"
        )
        return pr_auc(df, "y", "s").collect()[0]

    def test_matches_reference_with_ties(self, spark):
        pairs = [
            (1, 0.9), (0, 0.9), (1, 0.8), (1, 0.7), (0, 0.7),
            (0, 0.5), (1, 0.3), (0, 0.2), (0, 0.2), (0, 0.1),
        ]
        got = self._run(spark, pairs)
        assert abs(got["pr_auc"] - round(self._ref(pairs), 6)) < 1e-6
        assert got["n_pos"] == 4 and got["n_neg"] == 6
        assert abs(got["prevalence"] - 0.4) < 1e-9

    def test_perfect_ranking_is_one(self, spark):
        pairs = [(1, 0.9), (1, 0.8), (0, 0.2), (0, 0.1)]
        assert self._run(spark, pairs)["pr_auc"] == 1.0

    def test_random_uniform_score_near_prevalence(self, spark):
        pairs = [(1 if i % 4 == 0 else 0, 0.5) for i in range(40)]
        got = self._run(spark, pairs)
        # all tied at one threshold: AP = precision at full recall
        assert abs(got["pr_auc"] - got["prevalence"]) < 1e-9

    def test_single_class_null(self, spark):
        r = self._run(spark, [(1, 0.5), (1, 0.6)])
        assert r["pr_auc"] is None and r["n_neg"] == 0


class TestQuantileMap:
    """Q-Q score calibration (analytics.quantile_map)."""

    @staticmethod
    def _ref_map(new_vals, ref_vals):
        import numpy as np
        from collections import Counter

        cnt = Counter(new_vals)
        ranks, cum = {}, 0
        for v in sorted(cnt):
            ranks[v] = cum + (cnt[v] + 1) / 2.0
            cum += cnt[v]
        n = len(new_vals)
        out = {}
        for v in sorted(cnt):
            p = (ranks[v] - 0.5) / n
            out[v] = float(
                np.quantile(sorted(ref_vals), p, method="linear")
            )
        return out

    def _run(self, spark, new_vals, ref_vals):
        from indexlab_spark.operators.analytics import quantile_map

        nd = spark.createDataFrame([(float(v),) for v in new_vals], "x double")
        rd = spark.createDataFrame([(float(v),) for v in ref_vals], "x double")
        rows = quantile_map(nd, rd, "x").collect()
        return {r["value"]: r["mapped"] for r in rows}

    def test_matches_numpy_quantile(self, spark):
        import numpy as np

        rng = np.random.default_rng(4)
        new_vals = [float(x) for x in rng.normal(0, 1, 40)]
        ref_vals = [float(x) for x in rng.normal(100, 15, 60)]
        got = self._run(spark, new_vals, ref_vals)
        want = self._ref_map(new_vals, ref_vals)
        assert set(got) == set(want)
        for v in got:
            assert abs(got[v] - round(want[v], 6)) < 1e-6

    def test_ties_and_monotonicity(self, spark):
        new_vals = [1.0, 2.0, 2.0, 2.0, 3.0, 5.0, 5.0]
        ref_vals = [10.0, 20.0, 20.0, 30.0, 40.0]
        got = self._run(spark, new_vals, ref_vals)
        want = self._ref_map(new_vals, ref_vals)
        for v in got:
            assert abs(got[v] - round(want[v], 6)) < 1e-9
        ordered = [got[v] for v in sorted(got)]
        assert ordered == sorted(ordered)

    def test_constant_reference(self, spark):
        got = self._run(spark, [1.0, 5.0, 9.0], [7.0, 7.0, 7.0])
        assert all(abs(m - 7.0) < 1e-9 for m in got.values())

    def test_empty_contracts(self, spark):
        import pytest as _pytest

        from indexlab_spark.operators.analytics import quantile_map

        nd = spark.createDataFrame([(1.0,)], "x double")
        empty = spark.createDataFrame([], "x double")
        with _pytest.raises(ValueError, match="empty reference"):
            quantile_map(nd, empty, "x")
        assert quantile_map(empty, nd, "x").count() == 0


def test_hits_oracle_sql_matches_quantized_python_replay():
    """The r12 hits_suppliers oracle SQL cross-engine on a synthetic
    orders/lineitem bipartite graph: the recursive-CTE replay
    (per-generation window norms, scaled-integer quantization,
    NULL-iteration termination) must equal the pure-python quantized
    power iteration — the branch net for graphs the gate's shape never
    produces (hub-only customers, single-edge suppliers)."""
    import math
    import sys

    import duckdb

    sys.path.insert(0, ".")
    import __spark_entry__ as entry_mod

    # (orderkey, custkey) and (orderkey, suppkey) rows
    orders = [(1, 10), (2, 10), (3, 11), (4, 12), (5, 13)]
    lineitem = [
        (1, 100), (1, 101), (2, 100), (3, 100), (3, 102),
        (4, 103), (5, 101), (5, 103), (5, 104),
    ]
    edges = sorted(
        {("c%d" % c, "s%d" % s)
         for (o1, c) in orders for (o2, s) in lineitem if o1 == o2}
    )
    nodes = sorted({a for a, _ in edges} | {b for _, b in edges})
    n = len(nodes)
    init = math.floor(1.0 / math.sqrt(n) * 1e6 + 0.5) / 1e6
    h = {v: init for v in nodes}
    a = {v: init for v in nodes}

    def q6(x):
        y = x * 1e6
        f = math.floor(y)
        return (f + 1 if y - f >= 0.5 else f) / 1e6

    for _ in range(10):
        a_raw = {v: 0.0 for v in nodes}
        h_raw = {v: 0.0 for v in nodes}
        for s_, d_ in edges:
            a_raw[d_] += h[s_]
        for s_, d_ in edges:
            h_raw[s_] += a_raw[d_]
        nh = math.sqrt(sum(x * x for x in h_raw.values()))
        na = math.sqrt(sum(x * x for x in a_raw.values()))
        h = {v: q6(h_raw[v] / nh) if nh else 0.0 for v in nodes}
        a = {v: q6(a_raw[v] / na) if na else 0.0 for v in nodes}
    ref = {v: (round(h[v], 6), round(a[v], 6)) for v in nodes}

    con = duckdb.connect()
    con.execute("CREATE TABLE orders(o_orderkey BIGINT, o_custkey BIGINT)")
    con.execute(
        "CREATE TABLE lineitem(l_orderkey BIGINT, l_suppkey BIGINT)"
    )
    con.executemany("INSERT INTO orders VALUES (?,?)", orders)
    con.executemany("INSERT INTO lineitem VALUES (?,?)", lineitem)
    sql = entry_mod.oracle_sql()["hits_suppliers"]
    got = {r[0]: (r[1], r[2]) for r in con.execute(sql).fetchall()}
    assert got == ref


def test_quality_clf_oracle_sql_matches_python_replay():
    """The r12 quality_classifier oracle (_quality_clf_sql) cross-engine
    on a synthetic separable corpus: the generated 20-step CTE unroll in
    DuckDB must equal a pure-python quantized full-batch gradient
    descent (floor(x*1e9+0.5)/1e9 re-sync per step) — completing the
    per-generator cross-engine net (every generated oracle SQL now has
    one beyond the gate corpus)."""
    import math
    import sys

    import duckdb
    import numpy as np

    sys.path.insert(0, ".")
    import __spark_entry__ as entry_mod

    rng = np.random.default_rng(3)
    n, dim = 120, 8
    labels = np.array([i % 10 for i in range(n)])
    y = (labels <= 4).astype(np.float64)
    x = rng.normal(size=(n, dim)) + np.outer(y * 2 - 1, np.ones(dim)) * 0.7
    x = x.astype(np.float32).astype(np.float64)

    scale = 1e9
    w = np.zeros(dim)
    b = 0.0
    for _ in range(20):
        p = 1.0 / (1.0 + np.exp(-(x @ w + b)))
        err = p - y
        w = w - 1.0 * (x.T @ err / n + 1e-3 * w)
        b = b - 1.0 * (err.sum() / n)
        w = np.floor(w * scale + 0.5) / scale
        b = float(np.floor(b * scale + 0.5) / scale)
    p = 1.0 / (1.0 + np.exp(-(x @ w + b)))
    ref = {}
    for lbl in range(10):
        msk = labels == lbl
        acc = float(((p[msk] > 0.5) == (y[msk] > 0.5)).mean())
        ref[lbl] = (
            int(msk.sum()), round(float(p[msk].mean()), 6), round(acc, 6)
        )

    con = duckdb.connect()
    con.execute(
        "CREATE TABLE embeddings(vec_id BIGINT, label INT,"
        " embedding DOUBLE[])"
    )
    con.executemany(
        "INSERT INTO embeddings VALUES (?,?,?)",
        [(i, int(labels[i]), [float(v) for v in x[i]]) for i in range(n)],
    )
    got = {
        r[0]: (r[1], r[2], r[3])
        for r in con.execute(
            entry_mod._quality_clf_sql(iters=20, dim=dim)
        ).fetchall()
    }
    for lbl in range(10):
        assert got[lbl][0] == ref[lbl][0]
        assert got[lbl][1] == pytest.approx(ref[lbl][1], abs=2e-6)
        assert got[lbl][2] == pytest.approx(ref[lbl][2], abs=1e-9)
