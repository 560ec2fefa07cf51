"""Round-10 operator tests: experimentation completion (SRM guard,
delta-method ratio metrics, difference-in-differences) and the
time-series diagnosis trio (classical seasonal decomposition,
cross-correlation, AMOC changepoint)."""

import math

import pytest
from pyspark.sql import functions as F


# ---------------------------------------------------------------------------
# srm_check
# ---------------------------------------------------------------------------


class TestSrmCheck:
    def _run(self, spark, counts, expected, **kw):
        from indexlab_spark.operators.analytics import srm_check

        rows = [(arm,) for arm, n in counts.items() for _ in range(n)]
        df = spark.createDataFrame(rows, "variant string")
        out = srm_check(df, "variant", expected, **kw)
        return {r["variant"]: r for r in out.collect()}

    def test_hand_computed_chi2(self, spark):
        # 60/40 observed vs 50/50 designed over 100 units:
        # chi2 = (60-50)^2/50 + (40-50)^2/50 = 4.0 > 3.841
        out = self._run(spark, {"a": 60, "b": 40}, {"a": 0.5, "b": 0.5})
        assert out["<ALL>"]["chi2"] == pytest.approx(4.0)
        assert out["<ALL>"]["srm"] is True
        assert out["a"]["chi2_contrib"] == pytest.approx(2.0)
        assert out["a"]["expected_n"] == pytest.approx(50.0)
        assert out["a"]["srm"] is None  # flag lives on the total row

    def test_balanced_no_flag(self, spark):
        out = self._run(spark, {"a": 50, "b": 50}, {"a": 0.5, "b": 0.5})
        assert out["<ALL>"]["chi2"] == pytest.approx(0.0)
        assert out["<ALL>"]["srm"] is False

    def test_designed_arm_with_zero_units_appears(self, spark):
        out = self._run(spark, {"a": 10}, {"a": 0.5, "b": 0.5})
        assert out["b"]["n"] == 0
        assert out["b"]["chi2_contrib"] == pytest.approx(5.0)  # (0-5)^2/5
        assert out["<ALL>"]["srm"] is True

    def test_unexpected_arm_forces_flag(self, spark):
        out = self._run(
            spark, {"a": 50, "b": 50, "zz": 3}, {"a": 0.5, "b": 0.5}
        )
        assert out["<UNEXPECTED>"]["n"] == 3
        assert out["<ALL>"]["srm"] is True

    def test_uneven_design(self, spark):
        # 90/10 design observed exactly -> no flag
        out = self._run(spark, {"a": 90, "b": 10}, {"a": 0.9, "b": 0.1})
        assert out["<ALL>"]["chi2"] == pytest.approx(0.0)
        assert out["<ALL>"]["srm"] is False

    def test_validation(self, spark):
        from indexlab_spark.operators.analytics import srm_check

        df = spark.createDataFrame([("a",)], "variant string")
        with pytest.raises(ValueError):
            srm_check(df, "variant", {})
        with pytest.raises(ValueError):
            srm_check(df, "variant", {"a": 0.6, "b": 0.6})
        with pytest.raises(ValueError):
            srm_check(df, "variant", {"a": 1.5, "b": -0.5})


# ---------------------------------------------------------------------------
# delta_method_ratio
# ---------------------------------------------------------------------------


def _delta_ref(units):
    """Pure-python delta-method readout for [(arm, x, y), ...]."""
    import statistics

    out = {}
    for arm in ("a", "b"):
        xs = [x for a, x, y in units if a == arm]
        ys = [y for a, x, y in units if a == arm]
        n = len(xs)
        r = sum(xs) / sum(ys)
        mx, my = sum(xs) / n, sum(ys) / n
        vx = statistics.variance(xs)
        vy = statistics.variance(ys)
        cxy = sum((x - mx) * (y - my) for x, y in zip(xs, ys)) / (n - 1)
        var_r = (vx - 2 * r * cxy + r * r * vy) / (n * my * my)
        out[arm] = (r, var_r)
    (ra, va), (rb, vb) = out["a"], out["b"]
    se = math.sqrt(va + vb)
    return ra, rb, (rb - ra) / se, se


class TestDeltaMethodRatio:
    def _units(self):
        # deterministic pseudo-random per-user (numerator, denominator)
        rows = []
        for i in range(60):
            arm = "a" if i % 2 == 0 else "b"
            y = 1.0 + (i * 7 % 5)  # sessions
            lift = 1.25 if arm == "b" else 1.0
            x = lift * (2.0 + (i * 13 % 7)) * y / 4.0  # revenue
            rows.append((arm, x, y))
        return rows

    def test_python_parity(self, spark):
        from indexlab_spark.operators.analytics import delta_method_ratio

        rows = self._units()
        df = spark.createDataFrame(rows, "variant string, x double, y double")
        got = delta_method_ratio(df, "variant", "x", "y").collect()[0]
        ra, rb, z, se = _delta_ref(rows)
        assert got["ratio_a"] == pytest.approx(ra, abs=1e-6)
        assert got["ratio_b"] == pytest.approx(rb, abs=1e-6)
        assert got["z_stat"] == pytest.approx(z, abs=1e-5)
        assert got["se"] == pytest.approx(se, abs=1e-6)
        assert got["lift_rel"] == pytest.approx((rb - ra) / abs(ra), abs=1e-6)

    def test_identical_arms_not_significant(self, spark):
        from indexlab_spark.operators.analytics import delta_method_ratio

        rows = [("a", float(2 + i % 3), 1.0 + i % 2) for i in range(40)]
        rows += [("b", x, y) for (_, x, y) in rows[:40]]
        df = spark.createDataFrame(rows, "variant string, x double, y double")
        got = delta_method_ratio(df, "variant", "x", "y").collect()[0]
        assert got["ratio_a"] == got["ratio_b"]
        assert got["z_stat"] == pytest.approx(0.0, abs=1e-9)
        assert got["z_sig"] is False

    def test_degenerate_arm_nulls(self, spark):
        from indexlab_spark.operators.analytics import delta_method_ratio

        rows = [("a", 1.0, 1.0), ("b", 2.0, 1.0), ("b", 3.0, 2.0)]
        df = spark.createDataFrame(rows, "variant string, x double, y double")
        got = delta_method_ratio(df, "variant", "x", "y").collect()[0]
        assert got["z_stat"] is None and got["z_sig"] is False
        assert got["ratio_a"] == pytest.approx(1.0)

    def test_null_rows_leave(self, spark):
        from indexlab_spark.operators.analytics import delta_method_ratio

        rows = self._units()
        df = spark.createDataFrame(rows, "variant string, x double, y double")
        noisy = df.unionByName(
            spark.createDataFrame(
                [("a", None, 1.0), ("b", 5.0, None)],
                "variant string, x double, y double",
            )
        )
        a = delta_method_ratio(df, "variant", "x", "y").collect()[0]
        b = delta_method_ratio(noisy, "variant", "x", "y").collect()[0]
        assert a == b


# ---------------------------------------------------------------------------
# did_readout
# ---------------------------------------------------------------------------


def _did_ref(units, treat="t", post="post"):
    import statistics

    cells = {}
    for g, p, v in units:
        key = ("t" if g == treat else "c", "post" if p == post else "pre")
        cells.setdefault(key, []).append(v)
    m = {k: statistics.mean(v) for k, v in cells.items()}
    did = (m[("t", "post")] - m[("t", "pre")]) - (
        m[("c", "post")] - m[("c", "pre")]
    )
    se2 = sum(
        statistics.variance(v) / len(v) for v in cells.values()
    )
    return did, math.sqrt(se2), m


class TestDidReadout:
    def _units(self, effect=3.0):
        rows = []
        for i in range(80):
            g = "t" if i % 2 == 0 else "c"
            p = "post" if i % 4 < 2 else "pre"
            base = 10.0 + (i * 11 % 7)  # shared noise
            grp_gap = 4.0 if g == "t" else 0.0  # stable group gap
            time_shock = 2.0 if p == "post" else 0.0  # shared shock
            eff = effect if (g == "t" and p == "post") else 0.0
            rows.append((g, p, base + grp_gap + time_shock + eff))
        return rows

    def test_python_parity_and_recovers_effect(self, spark):
        from indexlab_spark.operators.analytics import did_readout

        rows = self._units(effect=3.0)
        df = spark.createDataFrame(rows, "grp string, period string, v double")
        got = did_readout(df, "grp", "period", "v", "t", "post").collect()[0]
        did, se, m = _did_ref(rows)
        assert got["did"] == pytest.approx(did, abs=1e-6)
        assert got["se"] == pytest.approx(se, abs=1e-6)
        assert got["mean_t_post"] == pytest.approx(m[("t", "post")], abs=1e-6)
        assert got["mean_c_pre"] == pytest.approx(m[("c", "pre")], abs=1e-6)

    def test_parallel_trends_no_effect(self, spark):
        """Group gap + shared time shock with zero treatment effect:
        the naive post-vs-pre treated delta is biased (the shock), but
        DiD nets to exactly zero."""
        from indexlab_spark.operators.analytics import did_readout

        rows = self._units(effect=0.0)
        df = spark.createDataFrame(rows, "grp string, period string, v double")
        got = did_readout(df, "grp", "period", "v", "t", "post").collect()[0]
        assert got["did"] == pytest.approx(0.0, abs=1e-9)
        assert got["z_sig"] is False
        # the naive delta the design exists to correct is NOT zero
        # (the shared time shock of 2.0 plus cell-noise imbalance)
        assert got["mean_t_post"] - got["mean_t_pre"] > 1.5

    def test_small_cell_nulls(self, spark):
        from indexlab_spark.operators.analytics import did_readout

        rows = [
            ("t", "post", 1.0),
            ("t", "pre", 1.0),
            ("t", "pre", 2.0),
            ("c", "post", 1.0),
            ("c", "post", 2.0),
            ("c", "pre", 1.0),
            ("c", "pre", 2.0),
        ]
        df = spark.createDataFrame(rows, "grp string, period string, v double")
        got = did_readout(df, "grp", "period", "v", "t", "post").collect()[0]
        assert got["n_t_post"] == 1
        assert got["did"] is None and got["z_sig"] is False


# ---------------------------------------------------------------------------
# seasonal_decompose
# ---------------------------------------------------------------------------


def _decompose_ref(xs, m):
    """Pure-python classical additive decomposition (statsmodels
    semantics: centered MA trend, centered slot means, resid)."""
    n = len(xs)
    h = m // 2
    trend = [None] * n
    for t in range(n):
        if m % 2 == 1:
            if t - h >= 0 and t + h < n:
                trend[t] = sum(xs[t - h : t + h + 1]) / m
        else:
            if t - h >= 0 and t + h < n:
                trend[t] = (
                    0.5 * xs[t - h] + sum(xs[t - h + 1 : t + h]) + 0.5 * xs[t + h]
                ) / m
    slots = {}
    for t in range(n):
        if trend[t] is not None:
            slots.setdefault(t % m, []).append(xs[t] - trend[t])
    raw = {s: sum(v) / len(v) for s, v in slots.items()}
    mean_raw = sum(raw.values()) / len(raw)
    seas = {s: v - mean_raw for s, v in raw.items()}
    resid = [
        xs[t] - trend[t] - seas[t % m] if trend[t] is not None else None
        for t in range(n)
    ]
    return trend, seas, resid


class TestSeasonalDecompose:
    def _series(self, n=30, m=7):
        s = [3.0, -1.0, 2.0, -4.0, 1.0, 0.5, -1.5][:m]
        s = [v - sum(s) / len(s) for v in s]  # zero-mean season
        return [5.0 + 0.3 * t + s[t % m] + 0.01 * ((t * 13) % 5) for t in range(n)]

    def _run(self, spark, xs, m):
        from indexlab_spark.operators.analytics import seasonal_decompose

        rows = [("g", t, x) for t, x in enumerate(xs)]
        df = spark.createDataFrame(rows, "g string, t int, x double")
        out = seasonal_decompose(df, ["g"], "t", "x", period=m)
        return sorted(out.collect(), key=lambda r: r["t"])

    def test_python_parity_odd_period(self, spark):
        xs, m = self._series(30, 7), 7
        got = self._run(spark, xs, m)
        trend, seas, resid = _decompose_ref(xs, m)
        for r in got:
            t = r["t"]
            if trend[t] is None:
                assert r["trend"] is None and r["resid"] is None
            else:
                assert r["trend"] == pytest.approx(trend[t], abs=1e-6)
                assert r["resid"] == pytest.approx(resid[t], abs=1e-6)
            assert r["seasonal"] == pytest.approx(seas[t % m], abs=1e-6)

    def test_python_parity_even_period(self, spark):
        xs = [10.0 + 0.5 * t + [2.0, -2.0, 1.0, -1.0][t % 4] for t in range(20)]
        got = self._run(spark, xs, 4)
        trend, seas, resid = _decompose_ref(xs, 4)
        for r in got:
            t = r["t"]
            if trend[t] is not None:
                assert r["trend"] == pytest.approx(trend[t], abs=1e-6)
                assert r["seasonal"] == pytest.approx(seas[t % 4], abs=1e-6)

    def test_linear_trend_plus_period_residual_zero(self, spark):
        """Exact linear trend + exact zero-mean period (odd m): the
        centered MA recovers the line exactly, slot means recover the
        season exactly, residuals vanish."""
        m = 5
        s = [2.0, -1.0, 0.5, -3.0, 1.5]
        xs = [1.0 + 0.7 * t + s[t % m] for t in range(25)]
        got = self._run(spark, xs, m)
        for r in got:
            if r["trend"] is not None:
                assert r["resid"] == pytest.approx(0.0, abs=1e-6)
                assert r["trend"] == pytest.approx(1.0 + 0.7 * r["t"], abs=1e-6)

    def test_short_group_all_null(self, spark):
        got = self._run(spark, [1.0, 2.0, 3.0], 7)
        assert all(r["trend"] is None for r in got)
        assert all(r["seasonal"] is None for r in got)
        assert len(got) == 3  # rows still emitted

    def test_validation(self, spark):
        from indexlab_spark.operators.analytics import seasonal_decompose

        df = spark.createDataFrame([("g", 1, 1.0)], "g string, t int, x double")
        with pytest.raises(ValueError):
            seasonal_decompose(df, ["g"], "t", "x", period=1)


# ---------------------------------------------------------------------------
# ccf
# ---------------------------------------------------------------------------


def _ccf_ref(xs, ys, max_lag):
    n = len(xs)
    mx = sum(xs) / n
    my = sum(ys) / n
    dx = sum((x - mx) ** 2 for x in xs)
    dy = sum((y - my) ** 2 for y in ys)
    den = math.sqrt(dx * dy)
    out = {}
    for k in range(-max_lag, max_lag + 1):
        num = 0.0
        for t in range(n):
            if 0 <= t + k < n:
                num += (xs[t] - mx) * (ys[t + k] - my)
        out[k] = num / den if den > 0 else None
    return out


class TestCcf:
    def _run(self, spark, xs, ys, max_lag=3):
        from indexlab_spark.operators.analytics import ccf

        rows = [("g", t, x, y) for t, (x, y) in enumerate(zip(xs, ys))]
        df = spark.createDataFrame(rows, "g string, t int, x double, y double")
        out = ccf(df, ["g"], "t", "x", "y", max_lag=max_lag)
        return {r["lag"]: r["ccf"] for r in out.collect()}

    def test_python_parity(self, spark):
        xs = [float((t * 17) % 11) for t in range(40)]
        ys = [float((t * 7) % 5) + 0.5 * xs[t] for t in range(40)]
        got = self._run(spark, xs, ys, max_lag=3)
        ref = _ccf_ref(xs, ys, 3)
        for k in range(-3, 4):
            assert got[k] == pytest.approx(ref[k], abs=1e-6)

    def test_lagged_copy_peaks_at_lead(self, spark):
        """y is x delayed by 2 steps -> x LEADS y: the peak sits at
        lag +2 and is (up to edge effects) ~1."""
        xs = [float((t * 13) % 7) + (t % 3) for t in range(50)]
        ys = [xs[t - 2] if t >= 2 else 0.0 for t in range(50)]
        got = self._run(spark, xs, ys, max_lag=3)
        peak = max(got, key=lambda k: got[k])
        assert peak == 2
        assert got[2] > 0.8

    def test_lag_zero_is_pearson(self, spark):
        xs = [float(t % 9) for t in range(30)]
        ys = [2.0 * x + 1.0 for x in xs]
        got = self._run(spark, xs, ys, max_lag=1)
        assert got[0] == pytest.approx(1.0, abs=1e-9)

    def test_constant_series_null(self, spark):
        got = self._run(spark, [1.0] * 10, [float(t) for t in range(10)])
        assert all(v is None for v in got.values())

    def test_validation(self, spark):
        from indexlab_spark.operators.analytics import ccf

        df = spark.createDataFrame(
            [("g", 1, 1.0, 1.0)], "g string, t int, x double, y double"
        )
        with pytest.raises(ValueError):
            ccf(df, ["g"], "t", "x", "y", max_lag=0)


# ---------------------------------------------------------------------------
# amoc_changepoint
# ---------------------------------------------------------------------------


def _amoc_ref(xs, min_seg=2):
    n = len(xs)
    best = None
    sse_tot = sum(x * x for x in xs) - sum(xs) ** 2 / n
    for i in range(min_seg, n - min_seg + 1):
        l, r = xs[:i], xs[i:]
        sse = (
            sum(x * x for x in l)
            - sum(l) ** 2 / len(l)
            + sum(x * x for x in r)
            - sum(r) ** 2 / len(r)
        )
        if best is None or sse < best[0] - 1e-12:
            best = (sse, i, sum(l) / len(l), sum(r) / len(r))
    return best, sse_tot


class TestAmocChangepoint:
    def _run(self, spark, xs, **kw):
        from indexlab_spark.operators.analytics import amoc_changepoint

        rows = [("g", t, x) for t, x in enumerate(xs)]
        df = spark.createDataFrame(rows, "g string, t int, x double")
        out = amoc_changepoint(df, ["g"], "t", "x", **kw).collect()
        return out[0] if out else None

    def test_planted_step(self, spark):
        xs = [0.1 * ((t * 7) % 3) for t in range(20)]
        xs += [5.0 + 0.1 * ((t * 7) % 3) for t in range(20)]
        got = self._run(spark, xs)
        assert got["cp_index"] == 20
        assert got["mean_left"] == pytest.approx(
            sum(xs[:20]) / 20, abs=1e-6
        )
        assert got["mean_right"] == pytest.approx(
            sum(xs[20:]) / 20, abs=1e-6
        )
        assert got["reduction_ratio"] > 0.9

    def test_brute_force_parity(self, spark):
        xs = [float((t * 29) % 13) - (3.0 if t > 23 else 0.0) for t in range(37)]
        got = self._run(spark, xs, min_seg=3)
        (sse, i, ml, mr), sse_tot = _amoc_ref(xs, min_seg=3)
        assert got["cp_index"] == i
        assert got["sse_best"] == pytest.approx(sse, abs=1e-5)
        assert got["sse_total"] == pytest.approx(sse_tot, abs=1e-5)
        assert got["mean_left"] == pytest.approx(ml, abs=1e-6)
        assert got["mean_right"] == pytest.approx(mr, abs=1e-6)

    def test_constant_series_earliest_tie(self, spark):
        got = self._run(spark, [2.0] * 12)
        assert got["cp_index"] == 2  # earliest valid split on full tie
        assert got["reduction"] == pytest.approx(0.0, abs=1e-9)
        assert got["reduction_ratio"] is None  # sse_total == 0


class TestAmocChangepointExact:
    """amoc_changepoint_exact: DECIMAL scaled-integer prefixes for
    6dp-rounded inputs (the r16 amoc_revenue oracle-parity fix) must
    agree with the double pipeline and the brute-force reference."""

    def _run(self, spark, xs, **kw):
        from indexlab_spark.operators.analytics import amoc_changepoint_exact

        rows = [("g", t, round(x, 6)) for t, x in enumerate(xs)]
        df = spark.createDataFrame(rows, "g string, t int, x double")
        out = amoc_changepoint_exact(df, ["g"], "t", "x", **kw).collect()
        return out[0] if out else None

    def test_brute_force_parity(self, spark):
        xs = [float((t * 29) % 13) - (3.0 if t > 23 else 0.0) for t in range(37)]
        got = self._run(spark, xs, min_seg=3)
        (sse, i, ml, mr), sse_tot = _amoc_ref(xs, min_seg=3)
        assert got["cp_index"] == i
        assert got["sse_best"] == pytest.approx(sse, abs=1e-5)
        assert got["sse_total"] == pytest.approx(sse_tot, abs=1e-5)
        assert got["mean_left"] == pytest.approx(ml, abs=1e-6)
        assert got["mean_right"] == pytest.approx(mr, abs=1e-6)

    def test_large_magnitude_exactness(self, spark):
        # magnitudes where the double pipeline's q - s^2/n cancellation
        # carries ~1e-5 noise: prefixes ~3e10, SSE ~5e7 (the
        # amoc_revenue sf0.1 regime).  The exact path must still match
        # the brute-force reference tightly.
        xs = [3.0e7 + ((t * 37) % 11) * 1e5 for t in range(15)]
        xs += [3.2e7 + ((t * 37) % 11) * 1e5 for t in range(15)]
        got = self._run(spark, xs, min_seg=3)
        (sse, i, ml, mr), sse_tot = _amoc_ref(xs, min_seg=3)
        assert got["cp_index"] == i
        assert got["sse_best"] == pytest.approx(sse, rel=1e-12)
        assert got["sse_total"] == pytest.approx(sse_tot, rel=1e-12)
        assert got["mean_left"] == pytest.approx(ml, abs=1e-6)

    def test_constant_series_earliest_tie(self, spark):
        got = self._run(spark, [2.0] * 12)
        assert got["cp_index"] == 2
        assert got["reduction"] == pytest.approx(0.0, abs=1e-9)
        assert got["reduction_ratio"] is None

    def test_min_seg_validation(self, spark):
        import pytest as _pytest

        from indexlab_spark.operators.analytics import amoc_changepoint_exact

        df = spark.createDataFrame([("g", 1, 1.0)], "g string, t int, x double")
        with _pytest.raises(ValueError, match="min_seg"):
            amoc_changepoint_exact(df, ["g"], "t", "x", min_seg=0)

    def test_short_group_drops(self, spark):
        assert self._run(spark, [1.0, 2.0, 3.0], min_seg=2) is None

    def test_validation(self, spark):
        from indexlab_spark.operators.analytics import amoc_changepoint

        df = spark.createDataFrame([("g", 1, 1.0)], "g string, t int, x double")
        with pytest.raises(ValueError):
            amoc_changepoint(df, ["g"], "t", "x", min_seg=0)


# ---------------------------------------------------------------------------
# rake_keywords
# ---------------------------------------------------------------------------


class TestRakeKeywords:
    def _run(self, spark, docs, **kw):
        from indexlab_spark.operators.textstats import rake_keywords

        df = spark.createDataFrame(docs, "doc_id long, text string")
        out = rake_keywords(df, "doc_id", "text", **kw)
        return out.collect()

    def test_hand_computed_scores(self, spark):
        # phrases: "red apple pie", "red apple", "pie"
        # freq: red 2, apple 2, pie 2; deg: red 5, apple 5, pie 4
        # word scores: red 2.5, apple 2.5, pie 2.0
        # phrase scores: 7.0 / 5.0 / 2.0
        rows = self._run(
            spark,
            [(1, "red apple pie of red apple and pie")],
            stopwords=["of", "and"],
            top_n=10,
        )
        got = {r["phrase"]: (r["score"], r["rank"], r["n_words"]) for r in rows}
        assert got["red apple pie"] == (7.0, 1, 3)
        assert got["red apple"] == (5.0, 2, 2)
        assert got["pie"] == (2.0, 3, 1)

    def test_punctuation_is_boundary(self, spark):
        rows = self._run(
            spark, [(1, "alpha beta. gamma, delta")], stopwords=["zz"]
        )
        phrases = {r["phrase"] for r in rows}
        assert phrases == {"alpha beta", "gamma", "delta"}

    def test_consecutive_stopwords(self, spark):
        rows = self._run(
            spark,
            [(1, "alpha of the beta and of the gamma")],
            stopwords=["of", "the", "and"],
        )
        phrases = {r["phrase"] for r in rows}
        assert phrases == {"alpha", "beta", "gamma"}

    def test_duplicate_phrase_collapses(self, spark):
        rows = self._run(
            spark, [(1, "x y of x y")], stopwords=["of"], top_n=10
        )
        assert len(rows) == 1
        assert rows[0]["phrase"] == "x y"
        # freq x=2,y=2; deg x=4,y=4 -> word scores 2.0 -> phrase 4.0
        assert rows[0]["score"] == pytest.approx(4.0)

    def test_top_n_and_rank_determinism(self, spark):
        rows = self._run(
            spark,
            [(1, "aa bb of cc dd of ee")],
            stopwords=["of"],
            top_n=2,
        )
        assert len(rows) == 2
        assert [r["rank"] for r in sorted(rows, key=lambda r: r["rank"])] == [1, 2]
        # "aa bb" and "cc dd" tie at score 4.0 -> phrase asc breaks it
        assert sorted(rows, key=lambda r: r["rank"])[0]["phrase"] == "aa bb"

    def test_case_and_digits(self, spark):
        rows = self._run(
            spark, [(1, "Alpha BETA7 gamma")], stopwords=["zz"], top_n=1
        )
        assert rows[0]["phrase"] == "alpha beta7 gamma"

    def test_validation(self, spark):
        from indexlab_spark.operators.textstats import rake_keywords

        df = spark.createDataFrame([(1, "x")], "doc_id long, text string")
        with pytest.raises(ValueError):
            rake_keywords(df, top_n=0)
        with pytest.raises(ValueError):
            rake_keywords(df, stopwords=[])


# ---------------------------------------------------------------------------
# degree_assortativity
# ---------------------------------------------------------------------------


class TestDegreeAssortativity:
    def _run(self, spark, edges):
        from indexlab_spark.operators.dedup import degree_assortativity

        df = spark.createDataFrame(edges, "src long, dst long")
        return degree_assortativity(df, "src", "dst").collect()[0]

    def test_star_is_perfectly_disassortative(self, spark):
        got = self._run(spark, [(0, i) for i in range(1, 5)])
        assert got["assortativity"] == pytest.approx(-1.0)
        assert got["n_nodes"] == 5 and got["n_edges"] == 4
        assert got["min_degree"] == 1 and got["max_degree"] == 4
        assert got["avg_degree"] == pytest.approx(8 / 5)

    def test_regular_graph_null(self, spark):
        # cycle: every degree 2 -> zero variance -> NULL (networkx NaN)
        cyc = [(i, (i + 1) % 6) for i in range(6)]
        got = self._run(spark, cyc)
        assert got["assortativity"] is None
        assert got["avg_degree"] == pytest.approx(2.0)

    def test_path_graph_reference_value(self, spark):
        # P4 assortativity is -0.5 (networkx degree_assortativity_coefficient)
        got = self._run(spark, [(1, 2), (2, 3), (3, 4)])
        assert got["assortativity"] == pytest.approx(-0.5, abs=1e-9)

    def test_multigraph_and_self_loops_collapse(self, spark):
        base = [(1, 2), (2, 3), (3, 4)]
        noisy = base + [(2, 1), (2, 2), (1, 2), (4, 4)]
        assert self._run(spark, base) == self._run(spark, noisy)

    def test_python_parity_random_graph(self, spark):
        import statistics

        edges = sorted(
            {
                (min(a, b), max(a, b))
                for a, b in (
                    ((i * 7) % 13, (i * 11 + 3) % 13) for i in range(40)
                )
                if a != b
            }
            # hub edges break the circulant's degree regularity
            | {(0, k) for k in range(5, 11)}
        )
        got = self._run(spark, edges)
        deg = {}
        for u, v in edges:
            deg[u] = deg.get(u, 0) + 1
            deg[v] = deg.get(v, 0) + 1
        xs, ys = [], []
        for u, v in edges:
            xs += [deg[u], deg[v]]
            ys += [deg[v], deg[u]]
        mx, my = statistics.mean(xs), statistics.mean(ys)
        num = sum((x - mx) * (y - my) for x, y in zip(xs, ys))
        den = math.sqrt(
            sum((x - mx) ** 2 for x in xs) * sum((y - my) ** 2 for y in ys)
        )
        assert got["assortativity"] == pytest.approx(num / den, abs=1e-6)
        assert got["n_edges"] == len(edges)


# ---------------------------------------------------------------------------
# compaction_plan
# ---------------------------------------------------------------------------


class TestCompactionPlan:
    def _run(self, spark, files, **kw):
        from indexlab_spark.operators.maintenance import compaction_plan

        df = spark.createDataFrame(files, "part string, path string, size_bytes long")
        out = compaction_plan(
            df, "size_bytes", "path", group_cols=["part"], **kw
        )
        return {(r["part"], r["path"]): r for r in out.collect()}

    def test_hand_packing(self, spark):
        files = [
            ("p", "a", 50),
            ("p", "b", 60),
            ("p", "c", 30),
            ("p", "d", 40),
            ("p", "e", 200),
            ("p", "f", 10),
        ]
        got = self._run(spark, files, target_bytes=100)
        gid = {p: got[("p", p)]["group_id"] for p in "abcdef"}
        assert gid == {"a": 0, "b": 0, "c": 1, "d": 1, "e": 1, "f": 3}
        assert got[("p", "a")]["group_bytes"] == 110
        assert got[("p", "a")]["group_files"] == 2
        assert got[("p", "a")]["needs_compaction"] is True
        # the oversized group-1 absorbed e (next-fit overflow, documented)
        assert got[("p", "c")]["group_bytes"] == 270
        # f starts past 3 targets -> its own group, nothing to do
        assert got[("p", "f")]["needs_compaction"] is False

    def test_partitions_reset_packing(self, spark):
        files = [("p1", "a", 90), ("p1", "b", 90), ("p2", "a", 90)]
        got = self._run(spark, files, target_bytes=100)
        assert got[("p1", "a")]["group_id"] == 0
        assert got[("p1", "b")]["group_id"] == 0
        assert got[("p2", "a")]["group_id"] == 0
        assert got[("p2", "a")]["group_files"] == 1
        assert got[("p2", "a")]["needs_compaction"] is False

    def test_right_sized_file_alone(self, spark):
        files = [("p", "a", 500), ("p", "b", 20), ("p", "c", 20)]
        got = self._run(spark, files, target_bytes=100)
        assert got[("p", "a")]["group_files"] == 1
        assert got[("p", "a")]["needs_compaction"] is False
        assert got[("p", "b")]["group_id"] == got[("p", "c")]["group_id"]

    def test_null_size_excluded(self, spark):
        from indexlab_spark.operators.maintenance import compaction_plan

        df = spark.createDataFrame(
            [("p", "a", 10), ("p", "b", None)],
            "part string, path string, size_bytes long",
        )
        out = compaction_plan(df, "size_bytes", "path", group_cols=["part"])
        assert [r["path"] for r in out.collect()] == ["a"]

    def test_validation(self, spark):
        from indexlab_spark.operators.maintenance import compaction_plan

        df = spark.createDataFrame(
            [("p", "a", 10)], "part string, path string, size_bytes long"
        )
        with pytest.raises(ValueError):
            compaction_plan(df, "size_bytes", "path", target_bytes=0)


# ---------------------------------------------------------------------------
# multi_touch_attribution: time_decay model
# ---------------------------------------------------------------------------


class TestTimeDecayAttribution:
    def _run(self, spark, rows, **kw):
        from indexlab_spark.operators.analytics import multi_touch_attribution

        df = spark.createDataFrame(
            rows, "user_id long, ts timestamp, event_type string"
        )
        out = multi_touch_attribution(
            df, "user_id", "ts", "event_type", "purchase",
            model="time_decay", **kw
        )
        return {r["touch_type"]: r for r in out.collect()}

    def test_hand_computed_weights(self, spark):
        import datetime as dt

        t0 = dt.datetime(2024, 1, 1, 0, 0, 0)
        rows = [
            (1, t0 + dt.timedelta(seconds=40), "ad"),      # age 60s
            (1, t0 + dt.timedelta(seconds=90), "email"),   # age 10s
            (1, t0 + dt.timedelta(seconds=100), "purchase"),
        ]
        got = self._run(spark, rows, half_life_seconds=10)
        # raw: ad 2^-6, email 2^-1 -> ad 1/33, email 32/33
        assert got["ad"]["credit"] == pytest.approx(1 / 33, abs=1e-6)
        assert got["email"]["credit"] == pytest.approx(32 / 33, abs=1e-6)

    def test_credit_conserves_per_conversion(self, spark):
        import datetime as dt

        t0 = dt.datetime(2024, 1, 1)
        rows = []
        for u in range(5):
            for k in range(u + 1):
                rows.append(
                    (u, t0 + dt.timedelta(seconds=10 * k), f"ch{k % 3}")
                )
            rows.append((u, t0 + dt.timedelta(seconds=100), "purchase"))
        got = self._run(spark, rows, half_life_seconds=30)
        assert sum(r["credit"] for r in got.values()) == pytest.approx(
            5.0, abs=1e-5
        )

    def test_equal_ages_equal_linear(self, spark):
        import datetime as dt

        t0 = dt.datetime(2024, 1, 1)
        rows = [
            (1, t0, "a"),
            (1, t0, "b"),
            (1, t0 + dt.timedelta(seconds=50), "purchase"),
        ]
        got = self._run(spark, rows, half_life_seconds=10)
        assert got["a"]["credit"] == pytest.approx(0.5, abs=1e-9)
        assert got["b"]["credit"] == pytest.approx(0.5, abs=1e-9)

    def test_recency_monotone(self, spark):
        import datetime as dt

        t0 = dt.datetime(2024, 1, 1)
        rows = [
            (1, t0 + dt.timedelta(seconds=s), f"ch{s}")
            for s in (10, 40, 70)
        ] + [(1, t0 + dt.timedelta(seconds=100), "purchase")]
        got = self._run(spark, rows, half_life_seconds=20)
        assert (
            got["ch70"]["credit"]
            > got["ch40"]["credit"]
            > got["ch10"]["credit"]
        )

    def test_validation(self, spark):
        from indexlab_spark.operators.analytics import multi_touch_attribution

        df = spark.createDataFrame(
            [(1, None, "x")], "user_id long, ts timestamp, event_type string"
        )
        with pytest.raises(ValueError):
            multi_touch_attribution(
                df, "user_id", "ts", "event_type", "purchase",
                model="time_decay", half_life_seconds=0,
            )
        with pytest.raises(ValueError):
            multi_touch_attribution(
                df, "user_id", "ts", "event_type", "purchase", model="nope"
            )


# ---------------------------------------------------------------------------
# k_truss
# ---------------------------------------------------------------------------


def _truss_ref(edges, k):
    """Pure-python k-truss reference: peel edges with support < k-2
    until stable; returns {canonical_edge: final_support}."""
    E = {(min(a, b), max(a, b)) for a, b in edges if a != b}
    while True:
        adj = {}
        for u, v in E:
            adj.setdefault(u, set()).add(v)
            adj.setdefault(v, set()).add(u)
        sup = {
            (u, v): len(adj[u] & adj[v]) for u, v in E
        }
        keep = {e for e in E if sup[e] >= k - 2}
        if keep == E:
            return sup
        E = keep


class TestKTruss:
    def _run(self, spark, edges, k):
        from indexlab_spark.operators.dedup import k_truss

        df = spark.createDataFrame(edges, "id_a long, id_b long")
        return {
            (r["id_a"], r["id_b"]): r["support"]
            for r in k_truss(df, k).collect()
        }

    def test_k4_is_a_4_truss(self, spark):
        k4 = [(a, b) for a in range(4) for b in range(a + 1, 4)]
        got = self._run(spark, k4, 4)
        assert got == {e: 2 for e in k4}
        assert self._run(spark, k4, 5) == {}

    def test_triangle_free_graph_empty_at_3(self, spark):
        path = [(0, 1), (1, 2), (2, 3)]
        assert self._run(spark, path, 3) == {}
        # but 2-truss keeps the whole simple graph
        assert set(self._run(spark, path, 2)) == set(path)

    def test_cascading_peel(self, spark):
        """Two triangles sharing an edge: at k=4 the outer edges die
        first (support 1), which strands the shared edge (support 2
        initially, 0 after) — the cascade a one-shot filter misses."""
        tri2 = [(0, 1), (0, 2), (1, 2), (1, 3), (2, 3)]
        got3 = self._run(spark, tri2, 3)
        assert set(got3) == set(tri2)  # every edge in >= 1 triangle
        assert got3[(1, 2)] == 2  # the shared edge
        assert self._run(spark, tri2, 4) == {}

    def test_python_parity_random_graph(self, spark):
        edges = sorted(
            {
                (min(a, b), max(a, b))
                for a, b in (
                    ((i * i + i) % 23, (i * 7 + 3) % 23) for i in range(90)
                )
                if a != b
            }
        )
        for k in (3, 4):
            got = self._run(spark, edges, k)
            assert got == _truss_ref(edges, k), f"k={k}"

    def test_multigraph_and_self_loops_collapse(self, spark):
        base = [(0, 1), (0, 2), (1, 2), (2, 3)]
        noisy = base + [(1, 0), (0, 1), (2, 2), (3, 3)]
        assert self._run(spark, base, 3) == self._run(spark, noisy, 3)

    def test_validation(self, spark):
        from indexlab_spark.operators.dedup import k_truss

        df = spark.createDataFrame([(1, 2)], "id_a long, id_b long")
        with pytest.raises(ValueError):
            k_truss(df, 1)


# ---------------------------------------------------------------------------
# dp_noisy_counts
# ---------------------------------------------------------------------------


def _lap_ref(seed, keyparts, eps):
    import hashlib
    import math as m

    h = hashlib.md5(("|".join([seed, *keyparts])).encode()).hexdigest()
    u = (int(h[:15], 16) + 1.0) / (2**60 + 2)
    c = u - 0.5
    return -(1.0 / eps) * m.copysign(1.0, c) * m.log(1.0 - 2.0 * abs(c))


class TestDpNoisyCounts:
    def _run(self, spark, rows, **kw):
        from indexlab_spark.operators.analytics import dp_noisy_counts

        df = spark.createDataFrame(rows, "g string, x long")
        out = dp_noisy_counts(df, ["g"], **kw)
        return {r["g"]: r for r in out.collect()}

    def test_python_replica_parity(self, spark):
        rows = [(f"g{i % 7}", i) for i in range(200)]
        got = self._run(spark, rows, epsilon=2.0, seed="s1",
                        clamp_nonneg=False)
        true = {}
        for g, _ in rows:
            true[g] = true.get(g, 0) + 1
        for g, n in true.items():
            want = n + _lap_ref("s1", [g], 2.0)
            assert got[g]["n_released"] == pytest.approx(want, abs=1e-5)
            assert got[g]["scale"] == pytest.approx(0.5)

    def test_clamp_nonnegative(self, spark):
        # find a group whose noise is negative enough to push a count
        # of 1 below zero at tiny epsilon, then confirm the clamp
        rows = [(f"g{i}", i) for i in range(50)]  # all counts == 1
        unclamped = self._run(
            spark, rows, epsilon=0.05, seed="s2", clamp_nonneg=False
        )
        clamped = self._run(
            spark, rows, epsilon=0.05, seed="s2", clamp_nonneg=True
        )
        neg = [g for g, r in unclamped.items() if r["n_released"] < 0]
        assert neg, "tiny epsilon should push some releases negative"
        for g in neg:
            assert clamped[g]["n_released"] == 0.0

    def test_epsilon_scales_noise(self, spark):
        rows = [(f"g{i}", i) for i in range(300)]
        loose = self._run(spark, rows, epsilon=0.5, clamp_nonneg=False)
        tight = self._run(spark, rows, epsilon=5.0, clamp_nonneg=False)
        mean_abs = lambda d: sum(
            abs(r["n_released"] - 1.0) for r in d.values()
        ) / len(d)
        # E|Laplace(b)| = b: 2.0 vs 0.2 — an order of magnitude apart
        assert mean_abs(loose) > 4 * mean_abs(tight)

    def test_deterministic_and_seed_sensitive(self, spark):
        rows = [(f"g{i % 5}", i) for i in range(40)]
        a = self._run(spark, rows, seed="s")
        b = self._run(spark, rows, seed="s")
        c = self._run(spark, rows, seed="t")
        assert a == b
        assert any(a[g] != c[g] for g in a)

    def test_validation(self, spark):
        from indexlab_spark.operators.analytics import dp_noisy_counts

        df = spark.createDataFrame([("g", 1)], "g string, x long")
        with pytest.raises(ValueError):
            dp_noisy_counts(df, ["g"], epsilon=0.0)
        with pytest.raises(ValueError):
            dp_noisy_counts(df, [])


# ---------------------------------------------------------------------------
# hilbert_key
# ---------------------------------------------------------------------------


def _xy2d(order_n, x, y):
    """Canonical Hilbert xy2d (Wikipedia form): grid side order_n =
    2^bits, reflection over the full width."""
    d = 0
    s = order_n // 2
    while s > 0:
        rx = 1 if (x & s) > 0 else 0
        ry = 1 if (y & s) > 0 else 0
        d += s * s * ((3 * rx) ^ ry)
        if ry == 0:
            if rx == 1:
                x = order_n - 1 - x
                y = order_n - 1 - y
            x, y = y, x
        s //= 2
    return d


def _d2xy(order_n, d):
    x = y = 0
    t = d
    s = 1
    while s < order_n:
        rx = 1 & (t // 2)
        ry = 1 & (t ^ rx)
        if ry == 0:
            if rx == 1:
                x = s - 1 - x
                y = s - 1 - y
            x, y = y, x
        x += s * rx
        y += s * ry
        t //= 4
        s *= 2
    return x, y


class TestHilbertKey:
    def test_reference_adjacency(self):
        """The defining Hilbert property: consecutive d values are
        grid NEIGHBORS (step distance exactly 1) — where the Z-curve
        jumps. Validates the reference the Spark parity test then
        transfers to the operator."""
        n = 16
        prev = _d2xy(n, 0)
        for d in range(1, n * n):
            cur = _d2xy(n, d)
            assert abs(cur[0] - prev[0]) + abs(cur[1] - prev[1]) == 1
            prev = cur
        # and xy2d inverts d2xy
        for d in range(n * n):
            assert _xy2d(n, *_d2xy(n, d)) == d

    def test_spark_parity_full_grid(self, spark):
        """Every cell of a 2^5 x 2^5 integer grid: the operator's key
        equals the canonical xy2d. Integer inputs spanning exactly
        [0, top] quantize to themselves, so the curve fold is tested
        in isolation."""
        from indexlab_spark.operators.maintenance import hilbert_key

        bits = 5
        n = 1 << bits
        rows = [(x, y) for x in range(n) for y in range(n)]
        df = spark.createDataFrame(rows, "x long, y long")
        got = {
            (r["x"], r["y"]): r["hval"]
            for r in hilbert_key(df, ["x", "y"], bits=bits).collect()
        }
        for (x, y), hv in got.items():
            assert hv == _xy2d(n, x, y), (x, y)
        # bijective over the grid
        assert len(set(got.values())) == n * n

    def test_hilbert_beats_zorder_on_range_query_runs(self, spark):
        """The reason this operator exists: over all 8x8 query
        rectangles on a 32x32 grid, the number of CONTIGUOUS key runs
        covering the rectangle (= files touched per file-sized run) is
        lower for Hilbert than for Morton on average."""
        bits, n = 5, 32

        def morton(x, y):
            z = 0
            for b in range(bits):
                z |= ((x >> b) & 1) << (2 * b)
                z |= ((y >> b) & 1) << (2 * b + 1)
            return z

        def runs(keys):
            ks = sorted(keys)
            return 1 + sum(
                1 for a, b in zip(ks, ks[1:]) if b != a + 1
            )

        tot_h = tot_z = 0
        for x0 in range(0, n - 8, 5):
            for y0 in range(0, n - 8, 5):
                cells = [
                    (x, y)
                    for x in range(x0, x0 + 8)
                    for y in range(y0, y0 + 8)
                ]
                tot_h += runs([_xy2d(n, x, y) for x, y in cells])
                tot_z += runs([morton(x, y) for x, y in cells])
        assert tot_h < tot_z

    def test_quantization_and_guards(self, spark):
        from indexlab_spark.operators.maintenance import hilbert_key

        # constant column -> rank 0 (a line along the other axis)
        df = spark.createDataFrame(
            [(1.0, float(i)) for i in range(8)], "x double, y double"
        )
        out = hilbert_key(df, ["x", "y"], bits=3).collect()
        ys = sorted((r["y"], r["hval"]) for r in out)
        assert len({h for _, h in ys}) == 8  # distinct keys along y
        # empty frame -> key 0 path, no crash
        empty = spark.createDataFrame([], "x double, y double")
        assert hilbert_key(empty, ["x", "y"]).count() == 0
        with pytest.raises(ValueError):
            hilbert_key(df, ["x"], bits=3)
        with pytest.raises(ValueError):
            hilbert_key(df, ["x", "y"], bits=32)

    def test_write_clustered_roundtrip(self, spark, tmp_path):
        from indexlab_spark.operators.maintenance import (
            write_hilbert_clustered,
        )

        df = spark.createDataFrame(
            [(float(i % 13), float(i % 7), i) for i in range(200)],
            "x double, y double, i long",
        )
        path = str(tmp_path / "hc")
        write_hilbert_clustered(df, path, ["x", "y"], n_ranges=4, bits=8)
        back = spark.read.parquet(path)
        assert back.count() == 200
        assert set(back.columns) == {"x", "y", "i"}


# ---------------------------------------------------------------------------
# weighted_quantiles
# ---------------------------------------------------------------------------


def _wq_ref(pairs, p):
    """Type-1 weighted quantile: smallest v with cumW >= p * W."""
    pairs = sorted(pairs)
    total = sum(w for _, w in pairs)
    acc = 0.0
    for v, w in pairs:
        acc += w
        if acc >= p * total - 1e-12:
            return v
    return pairs[-1][0]


class TestWeightedQuantiles:
    def _run(self, spark, rows, probs):
        from indexlab_spark.operators.analytics import weighted_quantiles

        df = spark.createDataFrame(rows, "g string, v double, w double")
        out = weighted_quantiles(df, ["g"], "v", "w", probs)
        return {(r["g"], r["p"]): r["quantile"] for r in out.collect()}

    def test_python_parity_with_ties(self, spark):
        rows = [
            ("a", float(i % 9), 0.5 + (i * 3 % 5)) for i in range(60)
        ] + [("b", float(i % 4), 1.0 + (i % 3)) for i in range(30)]
        got = self._run(spark, rows, [0.1, 0.5, 0.9, 1.0])
        for g in ("a", "b"):
            pairs = [(v, w) for gg, v, w in rows if gg == g]
            for p in (0.1, 0.5, 0.9, 1.0):
                assert got[(g, p)] == _wq_ref(pairs, p), (g, p)

    def test_replication_equivalence(self, spark):
        """Integer weight w == the row appearing w times: the weighted
        quantile equals the type-1 quantile of the exploded multiset."""
        rows = [("g", float(v), float(w)) for v, w in
                [(1, 3), (2, 1), (5, 4), (9, 2)]]
        exploded = sorted(
            v for _, v, w in rows for _ in range(int(w))
        )
        got = self._run(spark, rows, [0.25, 0.5, 0.75])
        import math as m

        for p in (0.25, 0.5, 0.75):
            k = m.ceil(p * len(exploded))
            assert got[("g", p)] == exploded[k - 1], p

    def test_unit_weights_are_order_stats(self, spark):
        rows = [("g", float(i), 1.0) for i in range(1, 11)]
        got = self._run(spark, rows, [0.3, 0.5, 1.0])
        assert got[("g", 0.3)] == 3.0  # ceil(0.3*10) = 3rd order stat
        assert got[("g", 0.5)] == 5.0
        assert got[("g", 1.0)] == 10.0

    def test_nonpositive_weights_excluded(self, spark):
        rows = [("g", 1.0, 1.0), ("g", 100.0, 0.0), ("g", 200.0, -5.0),
                ("g", 2.0, 1.0)]
        got = self._run(spark, rows, [1.0])
        assert got[("g", 1.0)] == 2.0

    def test_validation(self, spark):
        from indexlab_spark.operators.analytics import weighted_quantiles

        df = spark.createDataFrame([("g", 1.0, 1.0)], "g string, v double, w double")
        with pytest.raises(ValueError):
            weighted_quantiles(df, ["g"], "v", "w", [0.0])
        with pytest.raises(ValueError):
            weighted_quantiles(df, ["g"], "v", "w", [])


# ---------------------------------------------------------------------------
# binseg_changepoints
# ---------------------------------------------------------------------------


def _binseg_ref(xs, max_cp, min_seg, ratio):
    """Independent greedy binseg reference."""
    n = len(xs)
    s, q = [0.0], [0.0]
    for x in xs:
        s.append(s[-1] + x)
        q.append(q[-1] + x * x)

    def sse(a, b):
        if b <= a:
            return 0.0
        d = s[b] - s[a]
        return (q[b] - q[a]) - d * d / (b - a)

    thresh = ratio * sse(0, n)
    segs = [(0, n)]
    out = []
    for _ in range(max_cp):
        cand = None
        for a, b in segs:
            if b - a < 2 * min_seg:
                continue
            whole = sse(a, b)
            for i in range(a + min_seg, b - min_seg + 1):
                red = whole - sse(a, i) - sse(i, b)
                if cand is None or red > cand[0] + 1e-12:
                    cand = (red, i, (a, b))
        if cand is None or cand[0] <= max(thresh, 0.0) + 1e-12:
            break
        red, i, seg = cand
        segs.remove(seg)
        segs += [(seg[0], i), (i, seg[1])]
        out.append((i, red))
    return out


class TestBinsegChangepoints:
    def _run(self, spark, xs, **kw):
        from indexlab_spark.operators.analytics import binseg_changepoints

        rows = [("g", t, x) for t, x in enumerate(xs)]
        df = spark.createDataFrame(rows, "g string, t int, x double")
        out = binseg_changepoints(df, ["g"], "t", "x", **kw).collect()
        return sorted(
            ((r["cp_rank"], r["cp_index"], r["reduction"]) for r in out)
        )

    def test_two_planted_steps_recovered(self, spark):
        xs = [0.0 + 0.01 * (t % 3) for t in range(15)]
        xs += [8.0 + 0.01 * (t % 3) for t in range(15)]
        xs += [3.0 + 0.01 * (t % 3) for t in range(15)]
        got = self._run(spark, xs, max_cp=2)
        idx = sorted(i for _, i, _ in got)
        assert idx == [15, 30]

    def test_max_cp_1_matches_amoc(self, spark):
        from indexlab_spark.operators.analytics import amoc_changepoint

        xs = [float((t * 29) % 13) - (3.0 if t > 23 else 0.0) for t in range(37)]
        got = self._run(spark, xs, max_cp=1, min_reduction_ratio=0.0)
        rows = [("g", t, x) for t, x in enumerate(xs)]
        df = spark.createDataFrame(rows, "g string, t int, x double")
        amoc = amoc_changepoint(df, ["g"], "t", "x").collect()[0]
        assert len(got) == 1
        assert got[0][1] == amoc["cp_index"]

    def test_constant_series_no_changepoints(self, spark):
        assert self._run(spark, [5.0] * 20) == []

    def test_python_parity(self, spark):
        xs = [float((t * 17) % 7) + (4.0 if 20 < t <= 35 else 0.0)
              for t in range(50)]
        got = self._run(spark, xs, max_cp=4, min_seg=3,
                        min_reduction_ratio=0.005)
        ref = _binseg_ref(xs, 4, 3, 0.005)
        assert got == sorted(
            (rank, i, round(red, 6))
            for rank, (i, red) in enumerate(ref, start=1)
        )

    def test_penalty_stops_overfitting(self, spark):
        # pure noise: a high ratio threshold places no changepoints
        xs = [float((t * 13) % 5) for t in range(40)]
        assert self._run(spark, xs, min_reduction_ratio=0.5) == []

    def test_validation(self, spark):
        from indexlab_spark.operators.analytics import binseg_changepoints

        df = spark.createDataFrame([("g", 1, 1.0)], "g string, t int, x double")
        for kw in ({"max_cp": 0}, {"min_seg": 0},
                   {"min_reduction_ratio": -1.0}):
            with pytest.raises(ValueError):
                binseg_changepoints(df, ["g"], "t", "x", **kw)


# ---------------------------------------------------------------------------
# mmr_rerank
# ---------------------------------------------------------------------------


def _mmr_ref(cands, k, lam):
    """Independent MMR reference: cands = [(doc, score, vec)]."""
    import math as m

    def cos(a, b):
        na = m.sqrt(sum(x * x for x in a)) or 1.0
        nb = m.sqrt(sum(x * x for x in b)) or 1.0
        return sum(x * y for x, y in zip(a, b)) / (na * nb)

    lo = min(s for _, s, _ in cands)
    hi = max(s for _, s, _ in cands)
    rel = {
        d: ((s - lo) / (hi - lo) if hi > lo else 1.0)
        for d, s, _ in cands
    }
    vec = {d: v for d, _, v in cands}
    remaining = sorted(vec)
    sel = []
    out = []
    while remaining and len(sel) < k:
        best = None
        for d in remaining:
            red = max((cos(vec[d], vec[s]) for s in sel), default=0.0)
            obj = round(lam * rel[d] - (1 - lam) * red, 9)
            if best is None or obj > best[1] or (
                obj == best[1] and d < best[0]
            ):
                best = (d, obj)
        sel.append(best[0])
        remaining.remove(best[0])
        out.append((best[0], len(sel)))
    return out


class TestMmrRerank:
    def _run(self, spark, cands, k=10, lam=0.7):
        from indexlab_spark.operators.fusion import mmr_rerank

        hits = spark.createDataFrame(
            [("q1", d, s) for d, s, _ in cands],
            "query_id string, doc_id long, score double",
        )
        vecs = spark.createDataFrame(
            [(d, v) for d, _, v in cands],
            "doc_id long, embedding array<double>",
        )
        out = mmr_rerank(hits, vecs, k=k, lam=lam)
        return [(r["doc_id"], r["rank"]) for r in sorted(
            out.collect(), key=lambda r: r["rank"]
        )]

    def test_near_duplicate_demoted(self, spark):
        """Docs 1 and 2 are identical vectors with top scores; doc 3 is
        orthogonal with a lower score. Plain ranking: 1, 2, 3. MMR:
        the duplicate is demoted below the diverse doc."""
        cands = [
            (1, 10.0, [1.0, 0.0]),
            (2, 9.9, [1.0, 0.0]),
            (3, 7.0, [0.0, 1.0]),
        ]
        got = self._run(spark, cands, k=3, lam=0.5)
        assert [d for d, _ in got] == [1, 3, 2]

    def test_lambda_one_is_score_order(self, spark):
        cands = [
            (d, 10.0 - d, [1.0, 0.0]) for d in range(1, 6)
        ]
        got = self._run(spark, cands, k=5, lam=1.0)
        assert [d for d, _ in got] == [1, 2, 3, 4, 5]

    def test_python_parity(self, spark):
        cands = [
            (
                d,
                float((d * 7) % 11),
                [float((d * 3 + i) % 5) - 2.0 for i in range(4)],
            )
            for d in range(1, 13)
        ]
        got = self._run(spark, cands, k=8, lam=0.6)
        assert got == _mmr_ref(cands, 8, 0.6)

    def test_k_clamps(self, spark):
        cands = [(d, float(d), [1.0, float(d)]) for d in range(1, 4)]
        got = self._run(spark, cands, k=10)
        assert len(got) == 3

    def test_validation(self, spark):
        from indexlab_spark.operators.fusion import mmr_rerank

        hits = spark.createDataFrame(
            [("q", 1, 1.0)], "query_id string, doc_id long, score double"
        )
        vecs = spark.createDataFrame(
            [(1, [1.0])], "doc_id long, embedding array<double>"
        )
        with pytest.raises(ValueError):
            mmr_rerank(hits, vecs, lam=1.5)
        with pytest.raises(ValueError):
            mmr_rerank(hits, vecs, k=0)


# ---------------------------------------------------------------------------
# layout file-skipping evidence: hilbert vs zorder vs unsorted
# ---------------------------------------------------------------------------


def _file_ranges_2d(path, col_a, col_b):
    import os

    import pyarrow.parquet as pq

    out = []
    for name in sorted(os.listdir(path)):
        if not name.endswith(".parquet"):
            continue
        md = pq.ParquetFile(os.path.join(path, name)).metadata
        rng = {col_a: [None, None], col_b: [None, None]}
        for rg in range(md.num_row_groups):
            row_group = md.row_group(rg)
            for ci in range(row_group.num_columns):
                col = row_group.column(ci)
                if col.path_in_schema in rng and col.statistics:
                    s = col.statistics
                    lo, hi = rng[col.path_in_schema]
                    rng[col.path_in_schema] = [
                        s.min if lo is None else min(lo, s.min),
                        s.max if hi is None else max(hi, s.max),
                    ]
        if rng[col_a][0] is not None:
            out.append((tuple(rng[col_a]), tuple(rng[col_b])))
    return out


def test_hilbert_layout_skips_files_end_to_end(spark, tmp_path):
    """The layout family's actual value, measured from parquet footers
    (the exact metadata a stats-pruning scan consults): for 2-D
    rectangle predicates over a grid-uniform dataset written as 16
    files, the Hilbert layout touches no more files in total than the
    Z-order layout, and BOTH touch far fewer than the unsorted
    round-robin write (whose every file covers the full range)."""
    from indexlab_spark.operators.maintenance import (
        write_hilbert_clustered,
        write_zorder_clustered,
    )

    n = 64
    rows = [
        (float(x), float(y)) for x in range(n) for y in range(n)
    ]
    df = spark.createDataFrame(rows, "x double, y double")
    paths = {}
    for name, writer in (
        ("hilbert", write_hilbert_clustered),
        ("zorder", write_zorder_clustered),
    ):
        p = str(tmp_path / name)
        writer(df, p, ["x", "y"], n_ranges=16, bits=8)
        paths[name] = p
    p_plain = str(tmp_path / "plain")
    df.repartition(16).write.parquet(p_plain)
    paths["plain"] = p_plain

    def files_touched(path, x0, x1, y0, y1):
        cnt = 0
        for (xlo, xhi), (ylo, yhi) in _file_ranges_2d(path, "x", "y"):
            if xlo <= x1 and xhi >= x0 and ylo <= y1 and yhi >= y0:
                cnt += 1
        return cnt

    totals = {k: 0 for k in paths}
    for x0 in range(0, n - 16, 13):
        for y0 in range(0, n - 16, 13):
            for k, p in paths.items():
                totals[k] += files_touched(
                    p, x0, x0 + 15, y0, y0 + 15
                )
    assert totals["hilbert"] <= totals["zorder"], totals
    assert totals["zorder"] < totals["plain"] * 0.6, totals


# ---------------------------------------------------------------------------
# prf_expand
# ---------------------------------------------------------------------------


class TestPrfExpand:
    def _setup(self, spark, docs, queries):
        from indexlab_spark.operators.bm25 import bm25_build, bm25_score

        ddf = spark.createDataFrame(docs, "doc_id long, text string")
        qdf = spark.createDataFrame(queries, "query_id long, query string")
        ts, dl, g = bm25_build(ddf)
        hits = bm25_score(qdf, ts, dl, g, k=3)
        return qdf, hits, ts, dl, g

    def test_expansion_terms_and_order(self, spark):
        from indexlab_spark.operators.bm25 import prf_expand

        docs = [
            (1, "spark shuffle exchange partition partition"),
            (2, "spark shuffle broadcast"),
            (3, "cooking pasta recipe"),
        ]
        qdf, hits, ts, _, _ = self._setup(spark, docs, [(1, "shuffle")])
        out = prf_expand(qdf, hits, ts, n_terms=2).collect()
        q = out[0]["query"]
        # original term first, then expansion terms in weight order;
        # 'shuffle' itself excluded
        assert q.startswith("shuffle ")
        toks = q.split()
        assert "shuffle" not in toks[1:]
        assert len(toks) == 3
        # both docs 1 and 2 contain 'spark'; 'partition' has tf 2 in
        # doc 1 — the mined terms must come from the hit docs only
        assert set(toks[1:]) <= {
            "spark", "partition", "exchange", "broadcast"
        }

    def test_no_admissible_terms_passthrough(self, spark):
        from indexlab_spark.operators.bm25 import prf_expand

        docs = [(1, "alpha alpha"), (2, "alpha")]
        qdf, hits, ts, _, _ = self._setup(spark, docs, [(1, "alpha")])
        out = prf_expand(qdf, hits, ts, n_terms=2).collect()
        assert out[0]["query"] == "alpha"

    def test_recall_improves_second_pass(self, spark):
        """A doc sharing NO original query term becomes retrievable
        after expansion — the recall lever the operator exists for."""
        from indexlab_spark.operators.bm25 import bm25_score, prf_expand

        docs = [
            (1, "neural retrieval embedding model"),
            (2, "retrieval embedding index"),
            (3, "embedding model training corpus"),  # no 'retrieval'
            (4, "weather forecast sunny"),
        ]
        qdf, hits, ts, dl, g = self._setup(
            spark, docs, [(1, "retrieval")]
        )
        first_ids = {r["doc_id"] for r in hits.collect()}
        assert 3 not in first_ids
        q2 = prf_expand(qdf, hits, ts, n_terms=2)
        hits2 = bm25_score(q2, ts, dl, g, k=4)
        second_ids = {r["doc_id"] for r in hits2.collect()}
        assert 3 in second_ids
        assert 4 not in second_ids  # junk stays out

    def test_validation(self, spark):
        from indexlab_spark.operators.bm25 import prf_expand

        df = spark.createDataFrame([(1, "x")], "query_id long, query string")
        with pytest.raises(ValueError):
            prf_expand(df, df, df, n_terms=0)


# ---------------------------------------------------------------------------
# decayed_sum
# ---------------------------------------------------------------------------


class TestDecayedSum:
    def _rows(self):
        import datetime as dt

        t0 = dt.datetime(2024, 1, 1)
        return [
            ("u1", t0 + dt.timedelta(seconds=s), float(v))
            for s, v in ((0, 10.0), (30, 20.0), (60, 40.0))
        ]

    def _run(self, spark, rows, **kw):
        from indexlab_spark.operators.analytics import decayed_sum

        df = spark.createDataFrame(rows, "u string, ts timestamp, v double")
        out = decayed_sum(df, ["u"], "ts", "v", **kw)
        return {r["u"]: r for r in out.collect()}

    def test_hand_computed_self_anchored(self, spark):
        # anchor = last event (t=60); half-life 30s:
        # 40*1 + 20*2^-1 + 10*2^-2 = 52.5
        got = self._run(spark, self._rows(), half_life_seconds=30)
        assert got["u1"]["decayed"] == pytest.approx(52.5)
        assert got["u1"]["raw_sum"] == pytest.approx(70.0)
        assert got["u1"]["n"] == 3

    def test_explicit_anchor_excludes_future(self, spark):
        # as_of = t+30: the t+60 event is in the future and excluded;
        # 20*1 + 10*2^-1 = 25
        got = self._run(
            spark, self._rows(),
            half_life_seconds=30, as_of="2024-01-01 00:00:30",
        )
        assert got["u1"]["decayed"] == pytest.approx(25.0)
        assert got["u1"]["n"] == 2

    def test_long_half_life_approaches_raw_sum(self, spark):
        got = self._run(
            spark, self._rows(), half_life_seconds=1_000_000
        )
        assert got["u1"]["decayed"] == pytest.approx(70.0, abs=0.01)

    def test_groups_anchor_independently(self, spark):
        import datetime as dt

        t0 = dt.datetime(2024, 1, 1)
        rows = self._rows() + [
            ("u2", t0, 8.0),
            ("u2", t0 + dt.timedelta(seconds=30), 8.0),
        ]
        got = self._run(spark, rows, half_life_seconds=30)
        # u2 anchor is ITS latest (t+30): 8*1 + 8*0.5 = 12
        assert got["u2"]["decayed"] == pytest.approx(12.0)
        assert got["u1"]["decayed"] == pytest.approx(52.5)

    def test_as_of_column_name_resolves_per_row(self, spark):
        # as_of naming an existing column anchors each row on that
        # column (docstring contract): anchor == ts means age 0, so
        # decayed == raw_sum exactly
        import datetime as dt

        from indexlab_spark.operators.analytics import decayed_sum

        t0 = dt.datetime(2024, 1, 1)
        rows = [
            ("u1", t0 + dt.timedelta(seconds=s), float(v),
             t0 + dt.timedelta(seconds=s))
            for s, v in ((0, 10.0), (30, 20.0))
        ]
        df = spark.createDataFrame(
            rows, "u string, ts timestamp, v double, anchor timestamp"
        )
        got = {
            r["u"]: r
            for r in decayed_sum(
                df, ["u"], "ts", "v", half_life_seconds=30,
                as_of="anchor",
            ).collect()
        }
        assert got["u1"]["decayed"] == pytest.approx(30.0)
        assert got["u1"]["n"] == 2

    def test_validation(self, spark):
        from indexlab_spark.operators.analytics import decayed_sum

        df = spark.createDataFrame(
            [("u", None, 1.0)], "u string, ts timestamp, v double"
        )
        with pytest.raises(ValueError):
            decayed_sum(df, ["u"], "ts", "v", half_life_seconds=0)


# ---------------------------------------------------------------------------
# compact_groups
# ---------------------------------------------------------------------------


class TestCompactGroups:
    def test_rewrites_only_small_groups(self, spark, tmp_path):
        import os

        from indexlab_spark.operators.maintenance import compact_groups

        src = str(tmp_path / "in")
        os.makedirs(src)
        # 6 tiny files + 1 big one
        for i in range(6):
            spark.range(i * 10, i * 10 + 10).coalesce(1).write.parquet(
                str(tmp_path / f"tmp{i}")
            )
            import glob
            import shutil

            f = glob.glob(str(tmp_path / f"tmp{i}") + "/*.parquet")[0]
            shutil.copy(f, f"{src}/small{i}.parquet")
        spark.range(100, 4000).coalesce(1).write.parquet(
            str(tmp_path / "tmpbig")
        )
        import glob
        import shutil

        big = glob.glob(str(tmp_path / "tmpbig") + "/*.parquet")[0]
        shutil.copy(big, f"{src}/abig.parquet")
        big_size = os.path.getsize(f"{src}/abig.parquet")

        out = str(tmp_path / "out")
        stats = compact_groups(
            spark, src, out, target_bytes=big_size
        )
        # content preserved exactly
        a = sorted(r["id"] for r in spark.read.parquet(src).collect())
        b = sorted(r["id"] for r in spark.read.parquet(out).collect())
        assert a == b
        # fewer files out; the big file was copied, not rewritten
        assert stats["files_out"] < stats["files_in"]
        assert stats["files_copied"] >= 1
        assert os.path.exists(f"{out}/abig.parquet")
        assert os.path.getsize(f"{out}/abig.parquet") == big_size
        assert stats["groups_rewritten"] >= 1

    def test_refuses_inplace(self, spark, tmp_path):
        from indexlab_spark.operators.maintenance import compact_groups

        with pytest.raises(ValueError):
            compact_groups(spark, str(tmp_path), str(tmp_path))

    def test_refuses_nonempty_out_path(self, spark, tmp_path):
        # the append-per-group rewrite is not idempotent: re-running
        # into a populated target would duplicate rewritten groups'
        # rows, so a non-empty out_path must fail fast
        import os

        from indexlab_spark.operators.maintenance import compact_groups

        src = str(tmp_path / "in")
        os.makedirs(src)
        spark.range(10).coalesce(1).write.parquet(str(tmp_path / "t"))
        import glob
        import shutil

        f = glob.glob(str(tmp_path / "t") + "/*.parquet")[0]
        shutil.copy(f, f"{src}/a.parquet")
        out = str(tmp_path / "out")
        os.makedirs(out)
        with open(f"{out}/stale.parquet", "wb") as fh:
            fh.write(b"x")
        with pytest.raises(ValueError, match="non-empty"):
            compact_groups(spark, src, out)


# ---------------------------------------------------------------------------
# hypothesis property tests for the round-10 statistics family
# ---------------------------------------------------------------------------


def test_weighted_quantiles_property_random(spark):
    """Hypothesis: on arbitrary (value, integer-weight) multisets, the
    weighted quantile equals the type-1 quantile of the exploded
    multiset for arbitrary probs — replication equivalence holds off
    the fixture."""
    import math

    from hypothesis import given, settings, strategies as st

    from indexlab_spark.operators.analytics import weighted_quantiles

    @settings(max_examples=5, deadline=None)
    @given(
        st.lists(
            st.tuples(
                st.integers(min_value=-50, max_value=50),
                st.integers(min_value=1, max_value=5),
            ),
            min_size=1,
            max_size=30,
        ),
        st.sampled_from([0.1, 0.5, 0.9, 1.0]),
    )
    def inner(pairs, p):
        rows = [("g", float(v), float(w)) for v, w in pairs]
        df = spark.createDataFrame(rows, "g string, v double, w double")
        got = {
            r["p"]: r["quantile"]
            for r in weighted_quantiles(df, ["g"], "v", "w", [p]).collect()
        }
        exploded = sorted(float(v) for v, w in pairs for _ in range(w))
        k = math.ceil(p * len(exploded))
        assert got[p] == exploded[k - 1]

    inner()


def test_amoc_property_brute_force_random(spark):
    """Hypothesis: on arbitrary series, the AMOC split equals the
    brute-force minimum over all admissible splits (earliest tie)."""
    from hypothesis import given, settings, strategies as st

    from indexlab_spark.operators.analytics import amoc_changepoint

    @settings(max_examples=5, deadline=None)
    @given(
        st.lists(
            st.integers(min_value=-20, max_value=20),
            min_size=4,
            max_size=40,
        )
    )
    def inner(vals):
        xs = [float(v) for v in vals]
        rows = [("g", t, x) for t, x in enumerate(xs)]
        df = spark.createDataFrame(rows, "g string, t int, x double")
        got = amoc_changepoint(df, ["g"], "t", "x", min_seg=2).collect()
        (sse, i, ml, mr), sse_tot = _amoc_ref(xs, min_seg=2)
        assert got[0]["cp_index"] == i
        assert got[0]["sse_best"] == pytest.approx(sse, abs=1e-4)

    inner()


def test_srm_property_chi2_random_counts(spark):
    """Hypothesis: for arbitrary arm counts and designed shares, the
    chi-square total equals the textbook sum and the flag fires
    exactly at crit."""
    from hypothesis import given, settings, strategies as st

    from indexlab_spark.operators.analytics import srm_check

    @settings(max_examples=5, deadline=None)
    @given(
        st.lists(
            st.integers(min_value=0, max_value=200),
            min_size=2,
            max_size=4,
        ),
        st.floats(min_value=0.5, max_value=10.0),
    )
    def inner(counts, crit):
        if sum(counts) == 0:
            return
        arms = [f"a{i}" for i in range(len(counts))]
        share = 1.0 / len(arms)
        expected = {a: share for a in arms}
        rows = [(a,) for a, n in zip(arms, counts) for _ in range(n)]
        df = spark.createDataFrame(rows, "variant string")
        out = {
            r["variant"]: r
            for r in srm_check(df, "variant", expected, crit=crit).collect()
        }
        tot = sum(counts)
        chi2 = sum(
            (n - share * tot) ** 2 / (share * tot) for n in counts
        )
        assert out["<ALL>"]["chi2"] == pytest.approx(chi2, abs=1e-5)
        assert out["<ALL>"]["srm"] is (chi2 > crit)

    inner()


# ---------------------------------------------------------------------------
# clustering_coefficients
# ---------------------------------------------------------------------------


def _lcc_ref(edges):
    E = {(min(a, b), max(a, b)) for a, b in edges if a != b}
    adj = {}
    for u, v in E:
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    out = {}
    for n, nb in adj.items():
        d = len(nb)
        tri = sum(
            1
            for x in nb
            for y in nb
            if x < y and (min(x, y), max(x, y)) in E
        )
        out[n] = (d, tri, (tri / (d * (d - 1) / 2)) if d >= 2 else None)
    return out


class TestClusteringCoefficients:
    def _run(self, spark, edges):
        from indexlab_spark.operators.dedup import clustering_coefficients

        df = spark.createDataFrame(edges, "id_a long, id_b long")
        return {
            r["node"]: (r["degree"], r["triangles"], r["lcc"])
            for r in clustering_coefficients(df).collect()
        }

    def test_triangle_plus_pendant(self, spark):
        # triangle 0-1-2 with a pendant 3 hanging off 2
        got = self._run(spark, [(0, 1), (0, 2), (1, 2), (2, 3)])
        assert got[0] == (2, 1, 1.0)
        assert got[1] == (2, 1, 1.0)
        assert got[2][0] == 3 and got[2][1] == 1
        assert got[2][2] == pytest.approx(1 / 3)
        assert got[3] == (1, 0, None)  # degree-1: undefined

    def test_k4_all_one(self, spark):
        k4 = [(a, b) for a in range(4) for b in range(a + 1, 4)]
        got = self._run(spark, k4)
        assert all(v == (3, 3, 1.0) for v in got.values())

    def test_star_hub_zero(self, spark):
        got = self._run(spark, [(0, i) for i in range(1, 6)])
        assert got[0] == (5, 0, 0.0)

    def test_python_parity_random(self, spark):
        edges = sorted(
            {
                (min(a, b), max(a, b))
                for a, b in (
                    ((i * i) % 19, (i * 5 + 2) % 19) for i in range(70)
                )
                if a != b
            }
        )
        got = self._run(spark, edges)
        ref = _lcc_ref(edges)
        for n, (d, tri, lcc) in ref.items():
            gd, gt, gl = got[n]
            assert (gd, gt) == (d, tri), n
            if lcc is None:
                assert gl is None
            else:
                assert gl == pytest.approx(lcc, abs=1e-6)

    def test_multigraph_collapse(self, spark):
        base = [(0, 1), (0, 2), (1, 2)]
        noisy = base + [(1, 0), (2, 2)]
        assert self._run(spark, base) == self._run(spark, noisy)


# ---------------------------------------------------------------------------
# pairwise_winrates
# ---------------------------------------------------------------------------


class TestPairwiseWinrates:
    def _run(self, spark, rows, **kw):
        from indexlab_spark.operators.evaluate import pairwise_winrates

        df = spark.createDataFrame(rows, "u long, s string, m double")
        out = pairwise_winrates(df, "u", "s", "m", **kw)
        return {(r["system_a"], r["system_b"]): r for r in out.collect()}

    def test_hand_matrix(self, spark):
        rows = [
            (1, "A", 3.0), (1, "B", 1.0), (1, "C", 3.0),
            (2, "A", 2.0), (2, "B", 5.0), (2, "C", 1.0),
            (3, "A", 4.0), (3, "B", 4.0), (3, "C", 0.0),
        ]
        got = self._run(spark, rows)
        ab = got[("A", "B")]
        assert (ab["wins_a"], ab["wins_b"], ab["ties"]) == (1, 1, 1)
        assert ab["win_rate_a"] == pytest.approx(0.5)
        ac = got[("A", "C")]
        assert (ac["wins_a"], ac["wins_b"], ac["ties"]) == (2, 0, 1)
        assert ac["win_rate_a"] == pytest.approx(5 / 6)

    def test_lower_is_better(self, spark):
        rows = [(1, "A", 1.0), (1, "B", 2.0)]
        got = self._run(spark, rows, higher_is_better=False)
        assert got[("A", "B")]["wins_a"] == 1

    def test_missing_units_dont_pair(self, spark):
        rows = [
            (1, "A", 1.0), (1, "B", 2.0),
            (2, "A", 9.0),  # B missing on unit 2
        ]
        got = self._run(spark, rows)
        assert got[("A", "B")]["n_units"] == 1

    def test_null_metric_excluded(self, spark):
        rows = [(1, "A", 1.0), (1, "B", None), (2, "A", 1.0), (2, "B", 0.0)]
        got = self._run(spark, rows)
        assert got[("A", "B")]["n_units"] == 1
        assert got[("A", "B")]["wins_a"] == 1

    def test_repeated_trials_averaged_not_fanned_out(self, spark):
        # two rows for (unit 1, A) average to 2.0 — the unit still
        # counts ONCE and A's 2.0 beats B's 1.0 (without the pre-agg
        # the self-join would fan out to 2 pairs on unit 1)
        rows = [
            (1, "A", 1.0), (1, "A", 3.0), (1, "B", 1.0),
            (2, "A", 0.0), (2, "B", 5.0),
        ]
        got = self._run(spark, rows)
        ab = got[("A", "B")]
        assert ab["n_units"] == 2
        assert (ab["wins_a"], ab["wins_b"], ab["ties"]) == (1, 1, 0)


# ---------------------------------------------------------------------------
# stratified_ab
# ---------------------------------------------------------------------------


def _strat_ref(units):
    """Pure-python post-stratified readout: [(arm, stratum, y)]."""
    import statistics

    strata = {}
    for a, s, y in units:
        strata.setdefault(s, {"a": [], "b": []})[a].append(y)
    used = {
        s: d for s, d in strata.items()
        if len(d["a"]) >= 2 and len(d["b"]) >= 2
    }
    n_tot = sum(len(d["a"]) + len(d["b"]) for d in used.values())
    est = sum(
        (len(d["a"]) + len(d["b"]))
        * (statistics.mean(d["b"]) - statistics.mean(d["a"]))
        for d in used.values()
    ) / n_tot
    se2 = sum(
        (len(d["a"]) + len(d["b"])) ** 2
        * (
            statistics.variance(d["a"]) / len(d["a"])
            + statistics.variance(d["b"]) / len(d["b"])
        )
        for d in used.values()
    ) / n_tot**2
    return est, se2**0.5


class TestStratifiedAb:
    def _units(self, effect=1.0):
        rows = []
        for i in range(120):
            arm = "a" if i % 2 == 0 else "b"
            s = f"s{i % 3}"
            base = {"s0": 10.0, "s1": 50.0, "s2": 100.0}[s]
            y = base + (i * 7 % 5) * 0.5 + (effect if arm == "b" else 0.0)
            rows.append((arm, s, y))
        return rows

    def _run(self, spark, rows):
        from indexlab_spark.operators.analytics import stratified_ab

        df = spark.createDataFrame(rows, "variant string, s string, y double")
        return stratified_ab(df, "variant", "s", "y").collect()[0]

    def test_python_parity(self, spark):
        rows = self._units()
        got = self._run(spark, rows)
        est, se = _strat_ref(rows)
        assert got["estimate"] == pytest.approx(est, abs=1e-6)
        assert got["se"] == pytest.approx(se, abs=1e-6)
        assert got["n_strata"] == 3 and got["n_used"] == 3

    def test_stratification_shrinks_se_vs_raw(self, spark):
        """Between-strata variance (base 10 vs 50 vs 100) dominates the
        raw Welch SE; post-stratification removes it — the z becomes
        significant where the raw delta is noise-drowned."""
        from indexlab_spark.operators.analytics import ab_test_report

        rows = self._units(effect=1.0)
        got = self._run(spark, rows)
        assert got["z_sig"] is True
        df = spark.createDataFrame(
            [(a, y, 0.0) for a, _, y in rows],
            "variant string, metric double, conv double",
        )
        raw = ab_test_report(df, "variant", "metric", "conv").collect()[0]
        assert abs(raw["t_stat"]) < abs(got["z_stat"])
        # same point estimate direction, comparable magnitude
        assert got["unstratified_delta"] == pytest.approx(
            got["estimate"], abs=0.5
        )

    def test_small_stratum_excluded_loudly(self, spark):
        rows = self._units() + [("a", "tiny", 5.0), ("b", "tiny", 6.0),
                                ("a", "tiny2", 1.0)]
        got = self._run(spark, rows)
        assert got["n_strata"] == 5
        assert got["n_used"] == 3
        assert got["n_excluded_units"] == 3

    def test_no_usable_strata_nulls(self, spark):
        rows = [("a", "s", 1.0), ("b", "s", 2.0)]
        got = self._run(spark, rows)
        assert got["estimate"] is None and got["z_sig"] is False


# ---------------------------------------------------------------------------
# partial_corr_matrix
# ---------------------------------------------------------------------------


class TestPartialCorrMatrix:
    def _confounded(self):
        # z drives both x and y; x and y share nothing else
        rows = []
        for i in range(200):
            z = float((i * 13) % 17)
            ex = float((i * 7) % 5) - 2.0
            ey = float((i * 11) % 7) - 3.0
            rows.append((2.0 * z + ex, -1.5 * z + ey, z))
        return rows

    def test_confounder_vanishes_in_partial(self, spark):
        from indexlab_spark.operators.analytics import partial_corr_matrix

        df = spark.createDataFrame(self._confounded(), "x double, y double, z double")
        got = {
            (r["col_a"], r["col_b"]): r
            for r in partial_corr_matrix(df, ["x", "y", "z"]).collect()
        }
        xy = got[("x", "y")]
        # marginally strongly negative (both driven by z)...
        assert xy["corr"] < -0.8
        # ...but nearly independent once z is controlled
        assert abs(xy["partial_corr"]) < 0.15
        # x-z stays strong in partial (the genuine link)
        assert got[("x", "z")]["partial_corr"] > 0.8

    def test_numpy_reference_parity(self, spark):
        import numpy as np

        from indexlab_spark.operators.analytics import partial_corr_matrix

        rows = self._confounded()
        df = spark.createDataFrame(rows, "x double, y double, z double")
        got = {
            (r["col_a"], r["col_b"]): r["partial_corr"]
            for r in partial_corr_matrix(df, ["x", "y", "z"]).collect()
        }
        m = np.array(rows)
        r = np.corrcoef(m.T)
        p = np.linalg.inv(r)
        for (a, b), (i, j) in ((("x", "y"), (0, 1)), (("x", "z"), (0, 2)),
                               (("y", "z"), (1, 2))):
            want = -p[i, j] / np.sqrt(p[i, i] * p[j, j])
            assert got[(a, b)] == pytest.approx(want, abs=1e-5)

    def test_collinear_raises(self, spark):
        from indexlab_spark.operators.analytics import partial_corr_matrix

        rows = [(float(i), 2.0 * i, float(i % 3)) for i in range(50)]
        df = spark.createDataFrame(rows, "x double, y double, z double")
        with pytest.raises(ValueError):
            partial_corr_matrix(df, ["x", "y", "z"])

    def test_constant_column_raises(self, spark):
        from indexlab_spark.operators.analytics import partial_corr_matrix

        rows = [(float(i), 1.0, float(i % 3)) for i in range(50)]
        df = spark.createDataFrame(rows, "x double, y double, z double")
        with pytest.raises(ValueError):
            partial_corr_matrix(df, ["x", "y", "z"])


# ---------------------------------------------------------------------------
# brier_decomposition
# ---------------------------------------------------------------------------


class TestBrierDecomposition:
    def _scored(self, miscal=0.0):
        rows = []
        for i in range(400):
            p = ((i * 37) % 100) / 100.0
            # outcome drawn deterministically with P(y=1) ~ p
            y = 1.0 if ((i * 61) % 100) / 100.0 < p else 0.0
            rows.append((min(1.0, p + miscal * (0.5 - p)), y))
        return rows

    def _run(self, spark, rows, **kw):
        from indexlab_spark.operators.analytics import brier_decomposition

        df = spark.createDataFrame(rows, "p double, y double")
        return brier_decomposition(df, "p", "y", **kw).collect()[0]

    def test_exact_identity(self, spark):
        got = self._run(spark, self._scored())
        lhs = got["brier"]
        rhs = (
            got["reliability"]
            - got["resolution"]
            + got["uncertainty"]
            + got["within_bin_var"]
            - 2 * got["within_bin_cov"]
        )
        assert lhs == pytest.approx(rhs, abs=5e-6)

    def test_python_parity(self, spark):
        rows = self._scored()
        got = self._run(spark, rows, n_bins=10)
        n = len(rows)
        bins = {}
        for p, y in rows:
            b = min(int(p * 10), 9)
            bins.setdefault(b, []).append((p, y))
        ybar = sum(y for _, y in rows) / n
        rel = sum(
            len(m) * (sum(p for p, _ in m) / len(m)
                      - sum(y for _, y in m) / len(m)) ** 2
            for m in bins.values()
        ) / n
        res = sum(
            len(m) * (sum(y for _, y in m) / len(m) - ybar) ** 2
            for m in bins.values()
        ) / n
        brier = sum((p - y) ** 2 for p, y in rows) / n
        assert got["brier"] == pytest.approx(brier, abs=1e-6)
        assert got["reliability"] == pytest.approx(rel, abs=1e-6)
        assert got["resolution"] == pytest.approx(res, abs=1e-6)
        assert got["uncertainty"] == pytest.approx(
            ybar * (1 - ybar), abs=1e-6
        )

    def test_miscalibration_raises_reliability_only(self, spark):
        good = self._run(spark, self._scored(0.0))
        bad = self._run(spark, self._scored(0.8))
        assert bad["reliability"] > good["reliability"] + 0.01
        # uncertainty is a property of the OUTCOMES, which changed
        # little; resolution may shift, reliability must dominate
        assert abs(bad["uncertainty"] - good["uncertainty"]) < 0.05

    def test_exclusions_and_validation(self, spark):
        from indexlab_spark.operators.analytics import brier_decomposition

        rows = [(0.5, 1.0), (1.5, 0.0), (None, 1.0), (0.2, 2.0),
                (0.3, 0.0)]
        df = spark.createDataFrame(rows, "p double, y double")
        got = brier_decomposition(df, "p", "y").collect()[0]
        assert got["n"] == 2
        with pytest.raises(ValueError):
            brier_decomposition(df, "p", "y", n_bins=1)


# ---------------------------------------------------------------------------
# ann_recall
# ---------------------------------------------------------------------------


class TestAnnRecall:
    def _frames(self, spark, exact, approx):
        mk = lambda rows: spark.createDataFrame(
            [(q, d, r) for q, docs in rows.items()
             for r, d in enumerate(docs, start=1)],
            "query_id long, doc_id long, rank int",
        )
        return mk(exact), mk(approx)

    def test_hand_recall(self, spark):
        from indexlab_spark.operators.evaluate import ann_recall

        ex, ap = self._frames(
            spark,
            {1: [10, 11, 12], 2: [20, 21, 22]},
            {1: [10, 12, 99], 2: [20, 21, 22]},
        )
        got = {r["query_id"]: r for r in ann_recall(ex, ap, k=3).collect()}
        assert got["1"]["recall"] == pytest.approx(2 / 3)
        assert got["2"]["recall"] == pytest.approx(1.0)
        assert got["<ALL>"]["recall"] == pytest.approx((2 / 3 + 1.0) / 2)
        assert got["<ALL>"]["n_hit"] == 5

    def test_missing_query_scores_zero(self, spark):
        from indexlab_spark.operators.evaluate import ann_recall

        ex, ap = self._frames(
            spark, {1: [10, 11], 2: [20, 21]}, {1: [10, 11]}
        )
        got = {r["query_id"]: r for r in ann_recall(ex, ap, k=2).collect()}
        assert got["2"]["recall"] == 0.0
        assert got["<ALL>"]["recall"] == pytest.approx(0.5)

    def test_k_filters_both_sides(self, spark):
        from indexlab_spark.operators.evaluate import ann_recall

        ex, ap = self._frames(
            spark, {1: [10, 11, 12, 13]}, {1: [13, 12, 11, 10]}
        )
        # k=2: exact top-2 {10,11}; approx top-2 {13,12} -> 0 hits
        got = {r["query_id"]: r for r in ann_recall(ex, ap, k=2).collect()}
        assert got["1"]["recall"] == 0.0

    def test_short_exact_list_denominator(self, spark):
        from indexlab_spark.operators.evaluate import ann_recall

        ex, ap = self._frames(spark, {1: [10]}, {1: [10, 11, 12]})
        got = {r["query_id"]: r for r in ann_recall(ex, ap, k=5).collect()}
        assert got["1"]["recall"] == 1.0  # denominator min(k, 1)

    def test_end_to_end_ivf_recall(self, spark, sf_dir):
        """Real composition: IVF search recall against flat search on
        the embeddings table — the acceptance gate the ANN family's
        recall-floor tests assert, expressed as the operator."""
        from indexlab_spark.operators.evaluate import ann_recall
        from indexlab_spark.operators.knn import (
            build_ivf,
            ivf_search,
            knn_join,
        )
        from indexlab_spark.session import load_tables

        emb = load_tables(spark, sf_dir, ("embeddings",))["embeddings"]
        q = emb.filter(F.col("vec_id") < 8).select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("qvec"),
        )
        corpus = emb.select(F.col("vec_id").alias("doc_id"), "embedding")
        exact = knn_join(q, corpus, k=5)
        assigned, cents = build_ivf(corpus, nlist=8, seed=42)
        approx = ivf_search(q, assigned, cents, k=5, nprobe=8)
        got = {
            r["query_id"]: r["recall"]
            for r in ann_recall(exact, approx, k=5).collect()
        }
        # nprobe == nlist probes everything -> recall must be perfect
        assert got["<ALL>"] == pytest.approx(1.0)


# ---------------------------------------------------------------------------
# stationary_distribution
# ---------------------------------------------------------------------------


class TestStationaryDistribution:
    def _chain_df(self, spark, seqs):
        rows = [
            (u, t, s)
            for u, states in enumerate(seqs)
            for t, s in enumerate(states)
        ]
        return spark.createDataFrame(rows, "u long, t int, s string")

    def test_two_state_closed_form(self, spark):
        """Chain with P(A->B)=1/3, P(B->A)=1: pi = (q, p)/(p+q)
        = (3/4, 1/4) for p=1/3, q=1."""
        from indexlab_spark.operators.analytics import (
            stationary_distribution,
        )

        # one long walk realizing exactly those empirical frequencies
        walk = ["A", "A", "A", "B"] * 12 + ["A"]
        df = self._chain_df(spark, [walk])
        got = {
            r["state"]: r["pi"]
            for r in stationary_distribution(
                df, "u", "t", "s", damping=1.0
            ).collect()
        }
        # empirical: from A: 2/3 stay, 1/3 to B; from B: all to A
        assert got["A"] == pytest.approx(0.75, abs=1e-6)
        assert got["B"] == pytest.approx(0.25, abs=1e-6)

    def test_doubly_stochastic_uniform(self, spark):
        from indexlab_spark.operators.analytics import (
            stationary_distribution,
        )

        # symmetric 2-cycle: uniform stationary
        df = self._chain_df(spark, [["A", "B"] * 20, ["B", "A"] * 20])
        got = {
            r["state"]: r["pi"]
            for r in stationary_distribution(
                df, "u", "t", "s", damping=1.0
            ).collect()
        }
        assert got["A"] == pytest.approx(0.5, abs=1e-6)

    def test_numpy_eig_parity(self, spark):
        import numpy as np

        from indexlab_spark.operators.analytics import (
            stationary_distribution,
            transition_matrix,
        )

        seqs = [
            [f"s{(i * k + k) % 4}" for i in range(30)] for k in range(1, 6)
        ]
        df = self._chain_df(spark, seqs)
        got = {
            r["state"]: r["pi"]
            for r in stationary_distribution(
                df, "u", "t", "s", damping=0.9
            ).collect()
        }
        tm = transition_matrix(df, "u", "t", "s").collect()
        states = sorted({r["from_state"] for r in tm}
                        | {r["to_state"] for r in tm})
        idx = {s: i for i, s in enumerate(states)}
        n = len(states)
        p = np.zeros((n, n))
        for r in tm:
            p[idx[r["from_state"]], idx[r["to_state"]]] = r["cnt"]
        row = p.sum(1)
        p[row == 0] = 1.0 / n
        p[row > 0] = p[row > 0] / row[row > 0, None]
        pd_ = 0.9 * p + 0.1 / n
        w, v = np.linalg.eig(pd_.T)
        pi = np.real(v[:, np.argmax(np.real(w))])
        pi = pi / pi.sum()
        for s in states:
            assert got[s] == pytest.approx(float(pi[idx[s]]), abs=1e-5)

    def test_absorbing_state_damped(self, spark):
        from indexlab_spark.operators.analytics import (
            stationary_distribution,
        )

        # C absorbs (appears only as destination): sink row -> uniform;
        # with damping the chain stays irreducible and pi is unique
        df = self._chain_df(spark, [["A", "B", "C"], ["A", "B", "C"]])
        out = stationary_distribution(df, "u", "t", "s").collect()
        assert sum(r["pi"] for r in out) == pytest.approx(1.0, abs=1e-5)
        assert all(r["residual"] < 1e-9 for r in out)

    def test_validation(self, spark):
        from indexlab_spark.operators.analytics import (
            stationary_distribution,
        )

        df = self._chain_df(spark, [["A", "B"]])
        with pytest.raises(ValueError):
            stationary_distribution(df, "u", "t", "s", damping=0.0)
        empty = self._chain_df(spark, [["A"]])  # no transitions
        with pytest.raises(ValueError):
            stationary_distribution(empty, "u", "t", "s")


# ---------------------------------------------------------------------------
# pagerank fixed-iteration mode
# ---------------------------------------------------------------------------


def test_pagerank_fixed_iterations_no_raise(spark):
    """tol=None runs EXACTLY max_iter rounds and returns — the
    replayable contract the oracle-backed gate uses — where a numeric
    tol would raise on non-convergence at the same budget."""
    from indexlab_spark.operators.dedup import pagerank

    edges = spark.createDataFrame(
        [(i, (i + 1) % 7) for i in range(7)] + [(0, 3), (2, 5)],
        "id_a long, id_b long",
    )
    nodes = spark.createDataFrame([(i,) for i in range(7)], "id long")
    out = pagerank(edges, nodes, max_iter=3, tol=None).collect()
    total = sum(r["rank"] for r in out)
    assert total == pytest.approx(1.0, abs=1e-9)
    with pytest.raises(RuntimeError):
        pagerank(edges, nodes, max_iter=1, tol=1e-12)
    # fixed-iteration result matches a pure-python replay of the same
    # 3 rounds (undirected, no dangling)
    import collections

    und = set()
    for a, b in [(i, (i + 1) % 7) for i in range(7)] + [(0, 3), (2, 5)]:
        und.add((a, b))
        und.add((b, a))
    deg = collections.Counter(s for s, _ in und)
    r = {i: 1 / 7 for i in range(7)}
    for _ in range(3):
        nxt = {i: 0.15 / 7 for i in range(7)}
        for s, t in und:
            nxt[t] += 0.85 * r[s] / deg[s]
        r = nxt
    got = {row["id"]: row["rank"] for row in out}
    for i in range(7):
        assert got[i] == pytest.approx(r[i], abs=1e-9)
