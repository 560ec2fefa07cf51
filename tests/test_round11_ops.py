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


# ---------------------------------------------------------------------------
# fdr_bh
# ---------------------------------------------------------------------------


class TestFdrBh:
    def _run(self, spark, ps, q=0.05):
        from indexlab_spark.operators.analytics import fdr_bh

        rows = [(f"t{i}", p) for i, p in enumerate(ps)]
        df = spark.createDataFrame(rows, "t string, p double")
        return {r["t"]: r for r in fdr_bh(df, "t", "p", q=q).collect()}

    def test_hand_step_up(self, spark):
        # q=.05, m=4, sorted p = [.01, .02, .04, .2]; criticals =
        # [.0125, .025, .0375, .05]; crossings at ranks 1,2 (not 3) ->
        # k=2 -> reject first two
        got = self._run(spark, [0.2, 0.01, 0.04, 0.02])
        rej = {k: v["rejected"] for k, v in got.items()}
        assert rej == {"t1": True, "t3": True, "t2": False, "t0": False}

    def test_step_up_rejects_above_own_critical(self, spark):
        # THE step-up property: p = [.01, .049], q=.05, m=2; criticals
        # [.025, .05]: rank-2 crosses (.049 <= .05) so BOTH reject,
        # even though .049 > .025 would fail a step-DOWN rule... and
        # rank-1 (.01 <= .025) also crosses directly. Use p where only
        # the LAST crosses: [.02, .049] -> rank1 .02 <= .025 ok...
        # make rank1 NOT cross: [.03, .049]: rank1 .03 > .025, rank2
        # .049 <= .05 -> k=2, BOTH rejected including the .03.
        got = self._run(spark, [0.03, 0.049])
        assert got["t0"]["rejected"] and got["t1"]["rejected"]

    def test_no_crossing_rejects_nothing(self, spark):
        got = self._run(spark, [0.5, 0.9, 0.7])
        assert not any(v["rejected"] for v in got.values())

    def test_null_p_excluded_from_m(self, spark):
        from indexlab_spark.operators.analytics import fdr_bh

        df = spark.createDataFrame(
            [("a", 0.01), ("b", None), ("c", 0.02)], "t string, p double"
        )
        out = fdr_bh(df, "t", "p", q=0.05).collect()
        assert len(out) == 2
        assert all(r["m"] == 2 for r in out)

    def test_validation(self, spark):
        from indexlab_spark.operators.analytics import fdr_bh

        df = spark.createDataFrame([("a", 0.1)], "t string, p double")
        with pytest.raises(ValueError):
            fdr_bh(df, "t", "p", q=1.5)


# ---------------------------------------------------------------------------
# eb_shrinkage
# ---------------------------------------------------------------------------


class TestEbShrinkage:
    def _run(self, spark, rows):
        from indexlab_spark.operators.analytics import eb_shrinkage

        df = spark.createDataFrame(rows, "g string, s long, t long")
        return {
            r["g"]: r for r in eb_shrinkage(df, ["g"], "s", "t").collect()
        }

    def test_hand_mom(self, spark):
        # rates [.2, .4, .6, .8]: mu=.5, var_pop=.05;
        # mu(1-mu)/var - 1 = .25/.05 - 1 = 4 -> alpha = 2, beta = 2
        rows = [("a", 2, 10), ("b", 4, 10), ("c", 6, 10), ("d", 8, 10)]
        got = self._run(spark, rows)
        assert got["a"]["prior_alpha"] == pytest.approx(2.0, abs=1e-6)
        assert got["a"]["prior_beta"] == pytest.approx(2.0, abs=1e-6)
        # posterior for a: (2+2)/(10+4) = 2/7
        assert got["a"]["shrunk_rate"] == pytest.approx(2 / 7, abs=1e-6)

    def test_small_n_shrinks_more(self, spark):
        rows = [("big", 90, 100), ("tiny", 1, 1),
                ("m1", 5, 10), ("m2", 3, 10), ("m3", 7, 10)]
        got = self._run(spark, rows)
        # both observed above the prior mean; the n=1 item moves
        # (relatively) much farther toward it than the n=100 item
        big_move = abs(got["big"]["shrunk_rate"] - got["big"]["rate"])
        tiny_move = abs(got["tiny"]["shrunk_rate"] - got["tiny"]["rate"])
        assert tiny_move > big_move

    def test_invalid_prior_falls_back(self, spark):
        # identical rates: var = 0 -> no prior, shrunk == raw
        rows = [("a", 1, 2), ("b", 2, 4), ("c", 3, 6)]
        got = self._run(spark, rows)
        assert got["a"]["prior_alpha"] is None
        assert got["a"]["shrunk_rate"] == got["a"]["rate"]

    def test_zero_trials_excluded(self, spark):
        rows = [("a", 0, 0), ("b", 1, 2), ("c", 1, 4)]
        got = self._run(spark, rows)
        assert "a" not in got


# ---------------------------------------------------------------------------
# vocab_richness
# ---------------------------------------------------------------------------


class TestVocabRichness:
    def _run(self, spark, texts):
        from indexlab_spark.operators.textstats import vocab_richness

        df = spark.createDataFrame([(t,) for t in texts], "text string")
        return vocab_richness(df).collect()[0]

    def test_hand_spectrum(self, spark):
        # tokens: a a b c -> N=4 V=3 f1=2 f2=1
        # chao1 = 3 + 2*1/(2*2) = 3.5; gt = 2/4 = .5
        got = self._run(spark, ["a a b", "c"])
        assert (got["n_tokens"], got["n_types"]) == (4, 3)
        assert (got["f1"], got["f2"]) == (2, 1)
        assert got["chao1"] == pytest.approx(3.5)
        assert got["gt_unseen_mass"] == pytest.approx(0.5)
        assert got["herdan_c"] == pytest.approx(
            math.log(3) / math.log(4), abs=1e-6
        )

    def test_saturated_vocab_chao_equals_v(self, spark):
        # every type seen many times: f1 = 0 -> chao1 = V, gt mass 0
        got = self._run(spark, ["x y x y", "x y", "y x"])
        assert got["f1"] == 0
        assert got["chao1"] == pytest.approx(float(got["n_types"]))
        assert got["gt_unseen_mass"] == 0.0


# ---------------------------------------------------------------------------
# ipw_ate
# ---------------------------------------------------------------------------


class TestIpwAte:
    def _run(self, spark, rows):
        from indexlab_spark.operators.analytics import ipw_ate

        df = spark.createDataFrame(rows, "tr int, y double, e double")
        return ipw_ate(df, "tr", "y", "e").collect()[0]

    def test_uniform_score_equals_diff_of_means(self, spark):
        # e = .5 everywhere: weights are constant per arm, Hajek means
        # reduce to plain arm means
        rows = [(1, 10.0, 0.5), (1, 14.0, 0.5), (0, 5.0, 0.5), (0, 7.0, 0.5)]
        got = self._run(spark, rows)
        assert got["ate"] == pytest.approx(12.0 - 6.0)
        assert got["ess_treated"] == pytest.approx(2.0)

    def test_hand_weighted(self, spark):
        # treated: (y=10, e=.5 -> w=2), (y=20, e=.25 -> w=4);
        # mean_t = (2*10 + 4*20)/6 = 100/6
        # control: (y=5, e=.5 -> w=2) -> mean_c = 5
        rows = [(1, 10.0, 0.5), (1, 20.0, 0.25), (0, 5.0, 0.5)]
        got = self._run(spark, rows)
        assert got["mean_treated"] == pytest.approx(100 / 6, abs=1e-6)
        assert got["ate"] == pytest.approx(100 / 6 - 5, abs=1e-6)
        assert got["max_weight"] == pytest.approx(4.0)
        # ESS treated: (2+4)^2/(4+16) = 36/20
        assert got["ess_treated"] == pytest.approx(1.8)

    def test_out_of_range_scores_excluded(self, spark):
        rows = [(1, 10.0, 0.5), (0, 5.0, 0.5), (1, 99.0, 0.0),
                (0, 99.0, 1.0), (1, 99.0, None)]
        got = self._run(spark, rows)
        assert got["n_excluded"] == 3
        assert got["n_treated"] == 1 and got["n_control"] == 1
        assert got["ate"] == pytest.approx(5.0)


# ---------------------------------------------------------------------------
# qini_curve
# ---------------------------------------------------------------------------


class TestQiniCurve:
    def _run(self, spark, rows, **kw):
        from indexlab_spark.operators.analytics import qini_curve

        df = spark.createDataFrame(rows, "tr int, y double, s double")
        kw.setdefault("n_tiles", 2)
        return {
            r["tile"]: r
            for r in qini_curve(df, "tr", "y", "s", **kw).collect()
        }

    def test_hand_two_tiles(self, spark):
        # top half: treated converts, control doesn't -> qini 1 at
        # tile 1; bottom half both convert -> no extra uplift
        rows = [(1, 1.0, 0.9), (0, 0.0, 0.8), (1, 1.0, 0.2), (0, 1.0, 0.1)]
        got = self._run(spark, rows)
        assert got[1]["qini"] == pytest.approx(1.0)
        assert got[2]["qini"] == pytest.approx(1.0)
        # random line: Q_final * cumulative population fraction
        assert got[1]["qini_random"] == pytest.approx(0.5)
        assert got[2]["qini_random"] == pytest.approx(1.0)

    def test_useless_model_curve_tracks_line(self, spark):
        # constant uplift everywhere: curve ends exactly on the line
        rows = [(1, 1.0, 0.9), (0, 0.0, 0.85), (1, 1.0, 0.6),
                (0, 0.0, 0.55), (1, 1.0, 0.3), (0, 0.0, 0.25)]
        got = self._run(spark, rows, n_tiles=3)
        last = got[max(got)]
        assert last["qini"] == pytest.approx(last["qini_random"])

    def test_empty_arm_raises(self, spark):
        from indexlab_spark.operators.analytics import qini_curve

        df = spark.createDataFrame(
            [(1, 1.0, 0.5)], "tr int, y double, s double"
        )
        with pytest.raises(ValueError):
            qini_curve(df, "tr", "y", "s").collect()

    def test_validation(self, spark):
        from indexlab_spark.operators.analytics import qini_curve

        df = spark.createDataFrame(
            [(1, 1.0, 0.5)], "tr int, y double, s double"
        )
        with pytest.raises(ValueError):
            qini_curve(df, "tr", "y", "s", n_tiles=1)


# ---------------------------------------------------------------------------
# markov_attribution
# ---------------------------------------------------------------------------


class TestMarkovAttribution:
    def _run(self, spark, rows, **kw):
        import datetime as dt

        from indexlab_spark.operators.analytics import markov_attribution

        t0 = dt.datetime(2024, 1, 1)
        data = [
            (u, t0 + dt.timedelta(hours=h), c) for u, h, c in rows
        ]
        df = spark.createDataFrame(data, "u string, ts timestamp, t string")
        out = markov_attribution(df, "u", "ts", "t", "buy", **kw)
        return {r["channel"]: r for r in out.collect()}

    def test_hand_chain(self, spark):
        # u1: A -> B -> buy; u2: A (no conversion)
        # base p(conv) = 0.5; removing A or B each kills the only
        # converting path -> removal effect 1 for both, 50/50 credit
        rows = [("u1", 0, "A"), ("u1", 1, "B"), ("u1", 2, "buy"),
                ("u2", 0, "A")]
        got = self._run(spark, rows)
        assert set(got) == {"A", "B"}
        assert got["A"]["removal_effect"] == pytest.approx(1.0)
        assert got["A"]["share"] == pytest.approx(0.5)
        assert got["A"]["p_conv"] == pytest.approx(0.5)
        assert got["A"]["n_conversions"] == 1

    def test_differing_removal_effects(self, spark):
        # two C->buy journeys beside the A->B->buy one: C carries
        # more conversions, so its removal hurts more
        rows = [("u1", 0, "A"), ("u1", 1, "B"), ("u1", 2, "buy"),
                ("u2", 0, "A"),
                ("u3", 0, "C"), ("u3", 1, "buy"),
                ("u4", 0, "C"), ("u4", 1, "buy")]
        got = self._run(spark, rows)
        assert got["C"]["removal_effect"] == pytest.approx(2 / 3, abs=1e-6)
        assert got["A"]["removal_effect"] == pytest.approx(1 / 3, abs=1e-6)
        assert got["C"]["share"] == pytest.approx(0.5, abs=1e-6)
        assert got["C"]["attributed_conversions"] == pytest.approx(
            1.5, abs=1e-5
        )

    def test_journey_cut_at_first_conversion(self, spark):
        # events after the first buy are ignored: u1's post-buy D
        # must not become a channel
        rows = [("u1", 0, "A"), ("u1", 1, "buy"), ("u1", 2, "D")]
        got = self._run(spark, rows)
        assert "D" not in got

    def test_channel_guard(self, spark):
        import datetime as dt

        from indexlab_spark.operators.analytics import markov_attribution

        t0 = dt.datetime(2024, 1, 1)
        data = [("u", t0 + dt.timedelta(hours=i), f"c{i}")
                for i in range(5)]
        df = spark.createDataFrame(data, "u string, ts timestamp, t string")
        with pytest.raises(ValueError, match="channels"):
            markov_attribution(df, "u", "ts", "t", "buy", max_channels=2)


# ---------------------------------------------------------------------------
# review-finding pins (r11 self-review)
# ---------------------------------------------------------------------------


def test_theil_all_zero_weight_group_is_zero_not_crash(spark):
    from indexlab_spark.operators.analytics import theil_index

    df = spark.createDataFrame(
        [("z", 0.0), ("z", 0.0), ("g", 1.0), ("g", 3.0)],
        "g string, x double",
    )
    got = {r["g"]: r for r in theil_index(df, ["g"], "x").collect()}
    assert got["z"]["theil"] == 0.0  # the x->0 limit, not a crash
    assert got["g"]["theil"] > 0.0


def test_qini_zero_control_prefix_null_not_crash(spark):
    from indexlab_spark.operators.analytics import qini_curve

    # top half all-treated: tile 1 has no control -> NULL qini there,
    # later tiles (control present) still compute
    rows = [(1, 1.0, 0.9), (1, 0.0, 0.8), (1, 1.0, 0.6), (1, 0.0, 0.55),
            (0, 0.0, 0.2), (0, 1.0, 0.1), (1, 1.0, 0.15), (0, 0.0, 0.05)]
    df = spark.createDataFrame(rows, "tr int, y double, s double")
    got = {r["tile"]: r
           for r in qini_curve(df, "tr", "y", "s", n_tiles=4).collect()}
    assert got[1]["qini"] is None
    assert got[4]["qini"] is not None


def test_sprt_null_order_excluded(spark):
    from indexlab_spark.operators.analytics import sprt_test

    rows = [("a", 0, 1), ("a", 1, 1), ("a", None, 1), ("a", 2, 1)]
    df = spark.createDataFrame(rows, "v string, t int, s int")
    got = sprt_test(df, "v", "t", "s", p0=0.1, p1=0.3).collect()[0]
    assert got["n"] == 3  # the NULL-ordered row never enters the walk


def test_ranking_tau_duplicate_rows_collapse_to_best_rank(spark):
    from indexlab_spark.operators.evaluate import ranking_tau

    ra = [("q", "d1", 1), ("q", "d1", 9), ("q", "d2", 2)]  # dup d1
    rb = [("q", "d1", 1), ("q", "d2", 2)]
    A = spark.createDataFrame(ra, "query_id string, doc_id string, rank int")
    B = spark.createDataFrame(rb, "query_id string, doc_id string, rank int")
    got = ranking_tau(A, B).collect()[0]
    assert got["n_shared"] == 2  # not 3: the dup collapsed (min rank)
    assert got["n_pairs"] == 1
    assert got["tau_b"] == pytest.approx(1.0)


# ---------------------------------------------------------------------------
# diversity_index
# ---------------------------------------------------------------------------


class TestDiversityIndex:
    def _run(self, spark, rows):
        from indexlab_spark.operators.analytics import diversity_index

        df = spark.createDataFrame(rows, "g string, c string")
        return {
            r["g"]: r for r in diversity_index(df, ["g"], "c").collect()
        }

    def test_hand_entropy(self, spark):
        # classes a,a,b,c: p = [.5,.25,.25]
        got = self._run(
            spark, [("g", "a"), ("g", "a"), ("g", "b"), ("g", "c")]
        )["g"]
        H = -(0.5 * math.log(0.5) + 2 * 0.25 * math.log(0.25))
        assert got["shannon"] == pytest.approx(H, abs=1e-6)
        assert got["simpson"] == pytest.approx(1 - 0.375, abs=1e-6)
        assert got["evenness"] == pytest.approx(H / math.log(3), abs=1e-6)
        assert (got["n"], got["richness"]) == (4, 3)

    def test_single_class(self, spark):
        got = self._run(spark, [("g", "a"), ("g", "a")])["g"]
        assert got["shannon"] == 0.0 and got["simpson"] == 0.0
        assert got["evenness"] is None

    def test_uniform_mix_evenness_one(self, spark):
        got = self._run(
            spark, [("g", "a"), ("g", "b"), ("g", "c"), ("g", "d")]
        )["g"]
        assert got["evenness"] == pytest.approx(1.0)

    def test_null_class_excluded(self, spark):
        got = self._run(spark, [("g", "a"), ("g", None), ("g", "b")])["g"]
        assert got["n"] == 2


# ---------------------------------------------------------------------------
# wasserstein_1d
# ---------------------------------------------------------------------------


class TestWasserstein1d:
    def _run(self, spark, a, b, **kw):
        from indexlab_spark.operators.analytics import wasserstein_1d

        A = spark.createDataFrame([(float(v),) for v in a], "v double")
        B = spark.createDataFrame([(float(v),) for v in b], "v double")
        return wasserstein_1d(A, B, "v", **kw).collect()[0]

    def test_unit_shift(self, spark):
        got = self._run(spark, [0, 1], [1, 2])
        assert got["wasserstein"] == pytest.approx(1.0)

    def test_identical_zero(self, spark):
        got = self._run(spark, [1, 2, 3], [1, 2, 3])
        assert got["wasserstein"] == 0.0

    def test_known_mass_move(self, spark):
        # [0,0] vs [0,4]: half the mass moves 4 units -> W1 = 2
        got = self._run(spark, [0, 0], [0, 4])
        assert got["wasserstein"] == pytest.approx(2.0)

    def test_bucket_boundary_consistency(self, spark):
        # many distinct values with few buckets: the cross-bucket
        # predecessor stitch must agree with the closed form for a
        # uniform shift (W1 == shift)
        a = list(range(100))
        b = [v + 3 for v in a]
        got = self._run(spark, a, b, n_buckets=8)
        assert got["wasserstein"] == pytest.approx(3.0, abs=1e-6)

    def test_empty_side_raises(self, spark):
        from indexlab_spark.operators.analytics import wasserstein_1d

        A = spark.createDataFrame([(1.0,)], "v double")
        B = spark.createDataFrame([(None,)], "v double")
        with pytest.raises(ValueError):
            wasserstein_1d(A, B, "v")


# ---------------------------------------------------------------------------
# pacf
# ---------------------------------------------------------------------------


class TestPacf:
    def _series(self, spark, vals):
        return spark.createDataFrame(
            [("g", i, float(v)) for i, v in enumerate(vals)],
            "g string, o int, x double",
        )

    def test_lag1_equals_acf1_and_phi22_closed_form(self, spark):
        from indexlab_spark.operators.analytics import acf, pacf

        df = self._series(
            spark, [1, 3, 2, 5, 4, 6, 5, 8, 7, 9, 8, 11, 10, 12, 11, 14]
        )
        a = {r["lag"]: r["autocorr"]
             for r in acf(df, ["g"], "o", "x", 3).collect()}
        p = {r["lag"]: r["pacf"]
             for r in pacf(df, ["g"], "o", "x", 3).collect()}
        assert p[1] == a[1]
        want2 = round((a[2] - a[1] ** 2) / (1 - a[1] ** 2), 6)
        assert p[2] == pytest.approx(want2, abs=1e-6)

    def test_constant_series_all_null(self, spark):
        from indexlab_spark.operators.analytics import pacf

        df = self._series(spark, [5] * 10)
        out = pacf(df, ["g"], "o", "x", 3).collect()
        assert len(out) == 3
        assert all(r["pacf"] is None for r in out)

    def test_many_groups_executor_side(self, spark):
        """r11 VERDICT item 2: the Durbin-Levinson recursion must run
        executor-side (applyInPandas), not as a groups-sized driver
        collect — pin the plan node and the high-cardinality result
        shape."""
        from indexlab_spark.operators.analytics import pacf

        rows = [
            (f"g{g}", i, float((i * (g + 2)) % 7 + g))
            for g in range(60)
            for i in range(12)
        ]
        df = spark.createDataFrame(rows, "g string, o int, x double")
        out = pacf(df, ["g"], "o", "x", 4)
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "FlatMapGroupsInPandas" in plan
        got = out.collect()
        assert len(got) == 60 * 4
        # every group emits lags 1..4 exactly once
        from collections import Counter

        c = Counter((r["g"], r["lag"]) for r in got)
        assert all(v == 1 for v in c.values()) and len(c) == 240


# ---------------------------------------------------------------------------
# hypothesis property tests for the round-11 families
# ---------------------------------------------------------------------------


def test_theil_decomposability_property(spark):
    """Hypothesis: Theil T is additively decomposable — on arbitrary
    positive entity weights split into subgroups,
    T_total = T_between + sum_g s_g * T_g with income shares
    s_g = (n_g * mu_g) / (n * mu) and
    T_between = sum_g s_g * ln(mu_g / mu). The operator computes the
    per-group terms; the identity is checked in python."""
    import math

    from hypothesis import given, settings, strategies as st

    from indexlab_spark.operators.analytics import theil_index

    @settings(max_examples=5, deadline=None)
    @given(
        st.lists(
            st.tuples(
                st.sampled_from(["a", "b", "c"]),
                st.integers(min_value=1, max_value=40),
            ),
            min_size=2,
            max_size=25,
        )
    )
    def inner(pairs):
        rows = [(g, float(v)) for g, v in pairs]
        df = spark.createDataFrame(rows, "g string, x double")
        per_g = {
            r["g"]: r for r in theil_index(df, ["g"], "x").collect()
        }
        total = theil_index(
            df.select(F.lit("all").alias("t"), "x"), ["t"], "x"
        ).collect()[0]
        n = sum(1 for _ in pairs)
        mu = sum(v for _, v in pairs) / n
        t_between = 0.0
        t_within = 0.0
        for g, r in per_g.items():
            share = (r["n"] * r["mean"]) / (n * mu)
            t_between += share * math.log(r["mean"] / mu)
            t_within += share * r["theil"]
        assert total["theil"] == pytest.approx(
            t_between + t_within, abs=5e-5
        )

    inner()


def test_wasserstein_properties_random(spark):
    """Hypothesis: W1 is symmetric, zero on identical samples, and for
    a pure translation equals the shift exactly — across random
    samples and bucket counts (exercising the cross-bucket stitch)."""
    from hypothesis import given, settings, strategies as st

    from indexlab_spark.operators.analytics import wasserstein_1d

    @settings(max_examples=5, deadline=None)
    @given(
        st.lists(
            st.integers(min_value=-30, max_value=30),
            min_size=2,
            max_size=25,
        ),
        st.integers(min_value=1, max_value=9),
        st.integers(min_value=2, max_value=6),
    )
    def inner(vals, shift, n_buckets):
        A = spark.createDataFrame(
            [(float(v),) for v in vals], "v double"
        )
        B = spark.createDataFrame(
            [(float(v + shift),) for v in vals], "v double"
        )
        ab = wasserstein_1d(A, B, "v", n_buckets=n_buckets).collect()[0]
        ba = wasserstein_1d(B, A, "v", n_buckets=n_buckets).collect()[0]
        aa = wasserstein_1d(A, A, "v", n_buckets=n_buckets).collect()[0]
        assert ab["wasserstein"] == pytest.approx(float(shift), abs=1e-6)
        assert ba["wasserstein"] == ab["wasserstein"]  # symmetry
        assert aa["wasserstein"] == 0.0

    inner()


def test_mann_kendall_antisymmetry_property(spark):
    """Hypothesis: negating the series negates S and Z exactly and
    swaps the trend direction (the sign test's core symmetry)."""
    from hypothesis import given, settings, strategies as st

    from indexlab_spark.operators.analytics import mann_kendall_trend

    @settings(max_examples=5, deadline=None)
    @given(
        st.lists(
            st.integers(min_value=-20, max_value=20),
            min_size=3,
            max_size=20,
        )
    )
    def inner(vals):
        pos = spark.createDataFrame(
            [("g", i, float(v)) for i, v in enumerate(vals)],
            "g string, o int, x double",
        )
        neg = spark.createDataFrame(
            [("g", i, float(-v)) for i, v in enumerate(vals)],
            "g string, o int, x double",
        )
        p = mann_kendall_trend(pos, ["g"], "o", "x").collect()[0]
        m = mann_kendall_trend(neg, ["g"], "o", "x").collect()[0]
        assert p["s"] == -m["s"]
        assert p["var_s"] == m["var_s"]
        if p["z"] is not None:
            assert p["z"] == pytest.approx(-m["z"], abs=1e-6)
        flip = {"increasing": "decreasing", "decreasing": "increasing",
                "no_trend": "no_trend"}
        assert m["trend"] == flip[p["trend"]]

    inner()


def test_fdr_monotone_in_q_property(spark):
    """Hypothesis: the BH rejection set is monotone in q — everything
    rejected at a smaller q stays rejected at a larger one."""
    from hypothesis import given, settings, strategies as st

    from indexlab_spark.operators.analytics import fdr_bh

    @settings(max_examples=5, deadline=None)
    @given(
        st.lists(
            st.floats(min_value=0.001, max_value=0.999),
            min_size=2,
            max_size=15,
        )
    )
    def inner(ps):
        rows = [(f"t{i}", round(p, 4)) for i, p in enumerate(ps)]
        df = spark.createDataFrame(rows, "t string, p double")
        lo = {r["t"]: r["rejected"]
              for r in fdr_bh(df, "t", "p", q=0.05).collect()}
        hi = {r["t"]: r["rejected"]
              for r in fdr_bh(df, "t", "p", q=0.2).collect()}
        for t, rej in lo.items():
            if rej:
                assert hi[t], f"{t} rejected at q=.05 but not q=.2"

    inner()


def test_diversity_entropy_bounds_property(spark):
    """Hypothesis: 0 <= shannon <= ln(richness) and
    0 <= simpson < 1 on arbitrary class multisets; evenness in
    (0, 1] whenever defined."""
    import math

    from hypothesis import given, settings, strategies as st

    from indexlab_spark.operators.analytics import diversity_index

    @settings(max_examples=5, deadline=None)
    @given(
        st.lists(
            st.sampled_from(["a", "b", "c", "d", "e"]),
            min_size=1,
            max_size=30,
        )
    )
    def inner(classes):
        df = spark.createDataFrame(
            [("g", c) for c in classes], "g string, c string"
        )
        r = diversity_index(df, ["g"], "c").collect()[0]
        assert 0.0 <= r["shannon"] <= math.log(r["richness"]) + 1e-9
        assert 0.0 <= r["simpson"] < 1.0
        if r["evenness"] is not None:
            assert 0.0 < r["evenness"] <= 1.0 + 1e-9

    inner()
