"""As-of join operator tests vs hand-computed expectations."""

from indexlab_spark.operators.asof import asof_join


def _df(spark, rows, schema):
    return spark.createDataFrame(rows, schema)


def test_backward_asof_basic(spark):
    left = _df(
        spark,
        [(1, 5, "a"), (1, 10, "b"), (1, 2, "c"), (2, 7, "d")],
        "k long, t long, tag string",
    )
    right = _df(
        spark,
        [(1, 3, 100.0), (1, 8, 200.0), (2, 9, 300.0)],
        "k long, t long, v double",
    )
    out = {
        (r["k"], r["t"]): r["v_asof"]
        for r in asof_join(left, right, on="t", by="k").collect()
    }
    assert out == {
        (1, 5): 100.0,   # latest right at t<=5 is t=3
        (1, 10): 200.0,  # t=8
        (1, 2): None,    # nothing at t<=2
        (2, 7): None,    # right for k=2 only at t=9
    }


def test_equal_timestamp_inclusive_vs_strict(spark):
    left = _df(spark, [(1, 5, "x")], "k long, t long, tag string")
    right = _df(spark, [(1, 5, 42.0), (1, 4, 41.0)], "k long, t long, v double")
    inclusive = asof_join(left, right, on="t", by="k").collect()[0]
    assert inclusive["v_asof"] == 42.0  # <= matches same-t row
    strict = asof_join(left, right, on="t", by="k", strict=True).collect()[0]
    assert strict["v_asof"] == 41.0  # < skips same-t row


def test_multiple_value_cols_and_left_columns_preserved(spark):
    left = _df(spark, [(1, 10, "keep")], "k long, t long, payload string")
    right = _df(spark, [(1, 1, 7.0, "r1")], "k long, t long, v double, s string")
    row = asof_join(left, right, on="t", by="k").collect()[0]
    assert row["payload"] == "keep"
    assert row["v_asof"] == 7.0 and row["s_asof"] == "r1"


def test_matches_pandas_merge_asof(spark, tables):
    import pandas as pd

    ev = tables["events"].select("event_id", "user_id", "ts").limit(500)
    sign = (
        tables["events"]
        .filter("event_type = 'signup'")
        .groupBy("user_id", "ts")
        .agg({"value": "max"})
        .withColumnRenamed("max(value)", "v")
    )
    got = {
        r["event_id"]: r["v_asof"]
        for r in asof_join(ev, sign, on="ts", by="user_id").collect()
    }
    lp = ev.toPandas().sort_values("ts")
    rp = sign.toPandas().sort_values("ts")
    merged = pd.merge_asof(lp, rp, on="ts", by="user_id", direction="backward")
    for _, row in merged.iterrows():
        expect = None if pd.isna(row["v"]) else row["v"]
        assert got[row["event_id"]] == expect, f"event {row['event_id']}"


def test_asof_matches_pandas_merge_asof(spark):
    """Full merge_asof parity sweep: direction x allow_exact x tolerance
    against pandas itself on random keyed data (unique (key, t) on the
    right so tie policy cannot differ) — 18 combos incl. nearest."""
    import numpy as np
    import pandas as pd

    rng = np.random.default_rng(7)
    left_pd = pd.DataFrame(
        {
            "k": rng.integers(0, 5, 200),
            "t": rng.choice(np.arange(0, 1000), 200, replace=False).astype("int64"),
        }
    )
    right_t = rng.choice(np.arange(0, 1000), 150, replace=False)
    right_pd = pd.DataFrame(
        {
            "k": rng.integers(0, 5, 150),
            "t": right_t.astype("int64"),
            "v": rng.normal(size=150).round(6),
        }
    ).drop_duplicates(["k", "t"])
    left_df = spark.createDataFrame(left_pd)
    right_df = spark.createDataFrame(right_pd)

    for direction in ("backward", "forward", "nearest"):
        for strict in (False, True):
            for tol in (None, 50.0):
                got = (
                    asof_join(
                        left_df, right_df, on="t", by="k",
                        strict=strict, direction=direction, tolerance=tol,
                    )
                    .orderBy("k", "t")
                    .toPandas()
                )
                exp = pd.merge_asof(
                    left_pd.sort_values("t"),
                    right_pd.sort_values("t"),
                    on="t",
                    by="k",
                    direction=direction,
                    allow_exact_matches=not strict,
                    tolerance=None if tol is None else int(tol),
                ).sort_values(["k", "t"]).reset_index(drop=True)
                label = f"{direction} strict={strict} tol={tol}"
                assert len(got) == len(exp), label
                g = got["v_asof"].to_numpy()
                e = exp["v"].to_numpy()
                both_nan = np.isnan(g) & np.isnan(e)
                assert (both_nan | (np.abs(g - e) < 1e-12)).all(), label


def test_asof_null_left_on_never_matches(spark):
    """A left row with NULL `on` must return NULL payload in BOTH
    directions (forward scans descending, where NULLs sort last and
    would otherwise see every right row)."""
    left = spark.createDataFrame(
        [(1, 1, 30), (2, 1, None)], "event_id int, k int, t int"
    )
    right = spark.createDataFrame(
        [(1, 20, 5.0), (1, 50, 7.0)], "k int, t int, v double"
    )
    for direction in ("backward", "forward"):
        rows = {
            r["event_id"]: r["v_asof"]
            for r in asof_join(
                left, right, on="t", by="k", direction=direction
            ).collect()
        }
        assert rows[2] is None, direction
        assert rows[1] == (5.0 if direction == "backward" else 7.0)


def test_asof_null_payload_on_matched_row_stays_null(spark):
    """A NULL payload value on the MATCHED right row must come back
    NULL — not slide back to an older right row (pandas merge_asof
    parity; r5 ADVICE regression). With tolerance set, the slid-to row
    could even lie outside the tolerance."""
    import math

    import pandas as pd

    left_pd = pd.DataFrame({"k": [1, 1], "t": [100, 5]})
    right_pd = pd.DataFrame(
        {"k": [1, 1], "t": [1, 99], "v": [7.0, None], "s": ["old", None]}
    )
    left = spark.createDataFrame(left_pd)
    right = spark.createDataFrame(right_pd)
    for tol in (None, 10.0):
        got = {
            r["t"]: (r["v_asof"], r["s_asof"])
            for r in asof_join(
                left, right, on="t", by="k", tolerance=tol
            ).collect()
        }
        exp = pd.merge_asof(
            left_pd.sort_values("t"),
            right_pd.sort_values("t"),
            on="t",
            by="k",
            tolerance=None if tol is None else int(tol),
        )
        exp_map = {
            int(r.t): (
                None if math.isnan(r.v) else r.v,
                None if r.s is None or (isinstance(r.s, float) and math.isnan(r.s)) else r.s,
            )
            for r in exp.itertuples()
        }
        assert got == exp_map, (tol, got, exp_map)
        # t=100 matches right t=99 whose payload is NULL: stays NULL
        assert got[100] == (None, None)


def test_asof_nearest_equidistant_tie_matches_pandas(spark):
    """Exact-distance tie (backward and forward candidates equally
    far): our rule prefers the backward match — assert pandas does the
    same, on the operator's own output."""
    import pandas as pd

    left_pd = pd.DataFrame({"k": [1], "t": [10]})
    right_pd = pd.DataFrame({"k": [1, 1], "t": [5, 15], "v": [1.0, 2.0]})
    got = asof_join(
        spark.createDataFrame(left_pd),
        spark.createDataFrame(right_pd),
        on="t", by="k", direction="nearest",
    ).collect()[0]["v_asof"]
    exp = pd.merge_asof(
        left_pd, right_pd, on="t", by="k", direction="nearest"
    )["v"].iloc[0]
    assert got == exp == 1.0  # backward wins the tie
