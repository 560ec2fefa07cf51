"""Round-11 operator tests: inequality decomposition (Theil T),
always-valid sequential testing (Wald SPRT), nonparametric trend
(Mann-Kendall), intermittent-demand forecasting (Croston), rank
agreement (Kendall tau-b), and lexical richness."""

import math

import pytest
from pyspark.sql import functions as F


# ---------------------------------------------------------------------------
# theil_index
# ---------------------------------------------------------------------------


class TestTheilIndex:
    def _run(self, spark, rows, **kw):
        from indexlab_spark.operators.analytics import theil_index

        df = spark.createDataFrame(rows, "g string, x double")
        return {r["g"]: r for r in theil_index(df, ["g"], "x", **kw).collect()}

    def test_hand_computed(self, spark):
        # x = [1, 1, 4], mu = 2: T = (1/3)[0.5 ln 0.5 + 0.5 ln 0.5
        #                                + 2 ln 2] = (1/3) ln 2
        got = self._run(spark, [("g", 1.0), ("g", 1.0), ("g", 4.0)])
        assert got["g"]["theil"] == pytest.approx(math.log(2) / 3, abs=1e-6)
        assert got["g"]["mean"] == pytest.approx(2.0)
        assert got["g"]["n"] == 3

    def test_equal_weights_zero(self, spark):
        got = self._run(spark, [("g", 5.0)] * 4)
        assert got["g"]["theil"] == 0.0

    def test_single_entity_zero(self, spark):
        got = self._run(spark, [("g", 7.0)])
        assert got["g"]["theil"] == 0.0

    def test_zero_weight_contributes_limit(self, spark):
        # [0, 2]: mu = 1, T = (1/2)(0 + 2 ln 2) = ln 2
        got = self._run(spark, [("g", 0.0), ("g", 2.0)])
        assert got["g"]["theil"] == pytest.approx(math.log(2), abs=1e-6)

    def test_more_concentrated_is_larger(self, spark):
        even = self._run(spark, [("g", float(v)) for v in (3, 3, 3, 3)])
        skew = self._run(spark, [("g", float(v)) for v in (0, 0, 0, 12)])
        assert skew["g"]["theil"] > even["g"]["theil"]


# ---------------------------------------------------------------------------
# sprt_test
# ---------------------------------------------------------------------------


class TestSprtTest:
    def _run(self, spark, rows, **kw):
        from indexlab_spark.operators.analytics import sprt_test

        df = spark.createDataFrame(rows, "v string, t int, s int")
        kw.setdefault("p0", 0.1)
        kw.setdefault("p1", 0.3)
        return {r["v"]: r for r in sprt_test(df, "v", "t", "s", **kw).collect()}

    def test_h1_crossing_hand_walked(self, spark):
        # p0=.1 p1=.3 alpha=.05 beta=.2: up = ln(.8/.05) = 2.7726;
        # three successes: llr = 3 ln 3 = 3.2958 crosses at i = 3
        rows = [("a", i, s) for i, s in enumerate([1, 1, 1, 0, 0])]
        got = self._run(spark, rows)
        a = got["a"]
        assert a["decision"] == "accept_h1"
        assert a["n_decision"] == 3
        assert a["llr_decision"] == pytest.approx(3 * math.log(3), abs=1e-6)
        assert a["n"] == 5 and a["successes"] == 3

    def test_h0_crossing(self, spark):
        # failures only: inc = ln(.7/.9) = -0.25131; lo = ln(.2/.95)
        # = -1.5581 -> crossing at i = 7
        rows = [("b", i, 0) for i in range(8)]
        got = self._run(spark, rows)
        b = got["b"]
        assert b["decision"] == "accept_h0"
        assert b["n_decision"] == 7

    def test_continue_when_no_crossing(self, spark):
        got = self._run(spark, [("c", 0, 1), ("c", 1, 0)])
        c = got["c"]
        assert c["decision"] == "continue"
        assert c["n_decision"] is None and c["llr_decision"] is None

    def test_first_crossing_sticks(self, spark):
        # cross H1 at i=3, then a long failure tail: the DECISION row
        # stays at the first crossing even though llr_final returns
        # inside the boundaries
        rows = [("a", i, s) for i, s in enumerate([1, 1, 1] + [0] * 10)]
        got = self._run(spark, rows)
        assert got["a"]["decision"] == "accept_h1"
        assert got["a"]["n_decision"] == 3
        assert got["a"]["llr_final"] < got["a"]["llr_decision"]

    def test_validation(self, spark):
        from indexlab_spark.operators.analytics import sprt_test

        df = spark.createDataFrame([("a", 0, 1)], "v string, t int, s int")
        with pytest.raises(ValueError):
            sprt_test(df, "v", "t", "s", p0=0.2, p1=0.2)
        with pytest.raises(ValueError):
            sprt_test(df, "v", "t", "s", p0=0.0, p1=0.3)


# ---------------------------------------------------------------------------
# mann_kendall_trend
# ---------------------------------------------------------------------------


class TestMannKendall:
    def _run(self, spark, rows):
        from indexlab_spark.operators.analytics import mann_kendall_trend

        df = spark.createDataFrame(rows, "g string, o int, x double")
        return {
            r["g"]: r
            for r in mann_kendall_trend(df, ["g"], "o", "x").collect()
        }

    def test_strictly_increasing(self, spark):
        # n=5 ascending: S = 10, Var = 5*4*15/18, Z = 9/sqrt(16.667)
        got = self._run(spark, [("g", i, float(i)) for i in range(5)])
        g = got["g"]
        assert g["s"] == 10
        assert g["var_s"] == pytest.approx(50 / 3, abs=1e-5)
        assert g["z"] == pytest.approx(9 / math.sqrt(50 / 3), abs=1e-6)
        assert g["trend"] == "increasing"

    def test_strictly_decreasing(self, spark):
        got = self._run(spark, [("g", i, float(-i)) for i in range(5)])
        assert got["g"]["s"] == -10
        assert got["g"]["trend"] == "decreasing"

    def test_all_tied_no_information(self, spark):
        got = self._run(spark, [("g", i, 1.0) for i in range(4)])
        g = got["g"]
        assert g["s"] == 0 and g["var_s"] == 0.0
        assert g["z"] is None and g["trend"] == "no_trend"

    def test_tie_correction_hand(self, spark):
        # [1, 1, 2]: S = sign(0)+sign(1)+sign(1) = 2; one tie group
        # t=2 -> correction 2*1*9 = 18; Var = (3*2*11 - 18)/18 = 48/18
        got = self._run(spark, [("g", 0, 1.0), ("g", 1, 1.0), ("g", 2, 2.0)])
        g = got["g"]
        assert g["s"] == 2
        assert g["var_s"] == pytest.approx(48 / 18, abs=1e-6)

    def test_short_series_no_trend(self, spark):
        got = self._run(spark, [("g", 0, 1.0), ("g", 1, 2.0)])
        assert got["g"]["trend"] == "no_trend"  # |z| too small at n=2


# ---------------------------------------------------------------------------
# croston_forecast
# ---------------------------------------------------------------------------


class TestCroston:
    def _run(self, spark, rows, **kw):
        from indexlab_spark.operators.analytics import croston_forecast

        df = spark.createDataFrame(rows, "g string, o int, d double")
        kw.setdefault("alpha", 0.5)
        return {
            r["g"]: r
            for r in croston_forecast(df, ["g"], "o", "d", **kw).collect()
        }

    def test_hand_fold(self, spark):
        # demands at pos 1 (4.0) and pos 3 (6.0), alpha=.5:
        # init z=4, p=1; then q=2: z = .5*6+.5*4 = 5, p = .5*2+.5*1
        # = 1.5 -> forecast 10/3
        rows = [("a", 1, 4.0), ("a", 2, 0.0), ("a", 3, 6.0), ("a", 4, 0.0)]
        got = self._run(spark, rows)
        a = got["a"]
        assert (a["z"], a["p"]) == (5.0, 1.5)
        assert a["forecast"] == pytest.approx(10 / 3, abs=1e-6)
        assert a["n_periods"] == 4 and a["n_nonzero"] == 2

    def test_zero_only_group_emits_nothing(self, spark):
        rows = [("z", 1, 0.0), ("z", 2, 0.0), ("a", 1, 3.0)]
        got = self._run(spark, rows)
        assert "z" not in got and "a" in got

    def test_sba_factor(self, spark):
        rows = [("a", 1, 4.0), ("a", 3, 6.0)]
        classic = self._run(spark, rows)["a"]["forecast"]
        sba = self._run(spark, rows, sba=True)["a"]["forecast"]
        assert sba == pytest.approx(classic * 0.75, abs=1e-6)

    def test_single_demand_init_only(self, spark):
        # first nonzero at pos 2: z = d, p = 2, forecast = d/2
        got = self._run(spark, [("a", 1, 0.0), ("a", 2, 8.0)])
        a = got["a"]
        assert (a["z"], a["p"]) == (8.0, 2.0)
        assert a["forecast"] == pytest.approx(4.0)

    def test_validation(self, spark):
        from indexlab_spark.operators.analytics import croston_forecast

        df = spark.createDataFrame([("a", 1, 1.0)], "g string, o int, d double")
        with pytest.raises(ValueError):
            croston_forecast(df, ["g"], "o", "d", alpha=0.0)


# ---------------------------------------------------------------------------
# ranking_tau
# ---------------------------------------------------------------------------


class TestRankingTau:
    def _run(self, spark, ra, rb):
        from indexlab_spark.operators.evaluate import ranking_tau

        A = spark.createDataFrame(ra, "query_id string, doc_id string, rank int")
        B = spark.createDataFrame(rb, "query_id string, doc_id string, rank int")
        return {r["query_id"]: r for r in ranking_tau(A, B).collect()}

    def test_hand_tau(self, spark):
        # ranks [1,2,3,4] vs [2,1,3,4]: C=5, D=1, tau = 4/6
        ra = [("q", f"d{i}", i) for i in range(1, 5)]
        rb = [("q", "d1", 2), ("q", "d2", 1), ("q", "d3", 3), ("q", "d4", 4)]
        got = self._run(spark, ra, rb)["q"]
        assert (got["concordant"], got["discordant"]) == (5, 1)
        assert got["tau_b"] == pytest.approx(4 / 6, abs=1e-6)

    def test_identical_runs_tau_one(self, spark):
        ra = [("q", f"d{i}", i) for i in range(1, 5)]
        got = self._run(spark, ra, ra)["q"]
        assert got["tau_b"] == pytest.approx(1.0)

    def test_reversed_runs_tau_minus_one(self, spark):
        ra = [("q", f"d{i}", i) for i in range(1, 5)]
        rb = [("q", f"d{i}", 5 - i) for i in range(1, 5)]
        got = self._run(spark, ra, rb)["q"]
        assert got["tau_b"] == pytest.approx(-1.0)

    def test_only_shared_docs_count(self, spark):
        ra = [("q", "d1", 1), ("q", "d2", 2), ("q", "x", 3)]
        rb = [("q", "d1", 1), ("q", "d2", 2), ("q", "y", 3)]
        got = self._run(spark, ra, rb)["q"]
        assert got["n_shared"] == 2 and got["n_pairs"] == 1

    def test_all_tied_run_null_tau(self, spark):
        ra = [("q", "d1", 1), ("q", "d2", 2)]
        rb = [("q", "d1", 7), ("q", "d2", 7)]
        got = self._run(spark, ra, rb)["q"]
        assert got["tau_b"] is None

    def test_single_shared_doc_no_pairs(self, spark):
        got = self._run(spark, [("q", "d1", 1)], [("q", "d1", 3)])["q"]
        assert got["n_shared"] == 1 and got["n_pairs"] == 0
        assert got["tau_b"] is None


# ---------------------------------------------------------------------------
# lexical_richness
# ---------------------------------------------------------------------------


class TestLexicalRichness:
    def _run(self, spark, rows):
        from indexlab_spark.operators.textstats import lexical_richness

        df = spark.createDataFrame(rows, "doc_id long, text string")
        return {r["doc_id"]: r for r in lexical_richness(df).collect()}

    def test_hand_spectrum(self, spark):
        # "A a b c": N=4, V=3, hapax=2, sum m^2 = 4+1+1 = 6
        # K = 1e4 * (6 - 4) / 16 = 1250
        got = self._run(spark, [(1, "A a b c")])[1]
        assert (got["n_tokens"], got["n_types"]) == (4, 3)
        assert got["ttr"] == pytest.approx(0.75)
        assert got["hapax_rate"] == pytest.approx(2 / 3, abs=1e-6)
        assert got["yule_k"] == pytest.approx(1250.0)

    def test_empty_doc_nulls(self, spark):
        got = self._run(spark, [(2, "   ")])[2]
        assert got["n_tokens"] == 0 and got["n_types"] == 0
        assert got["ttr"] is None and got["yule_k"] is None

    def test_all_distinct_ttr_one_yule_zero(self, spark):
        got = self._run(spark, [(3, "w x y z")])[3]
        assert got["ttr"] == pytest.approx(1.0)
        assert got["hapax_rate"] == pytest.approx(1.0)
        assert got["yule_k"] == pytest.approx(0.0)

    def test_repetitive_doc_high_yule(self, spark):
        var = self._run(spark, [(4, "spam " * 50 + "x")])[4]
        rich = self._run(spark, [(5, " ".join(f"w{i}" for i in range(51)))])[5]
        assert var["yule_k"] > rich["yule_k"]
