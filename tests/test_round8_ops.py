"""Round-8 operator tests: k-core decomposition, the streaming
heavy-hitters monitor, and the A/B experiment readout."""

import pytest
from pyspark.sql import functions as F


def _local_kcore(edges, k):
    """Reference peeling in plain python: repeatedly drop nodes whose
    degree within the surviving set is < k; return {node: core_deg}."""
    adj: dict = {}
    for a, b in edges:
        if a == b:
            continue
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    alive = set(adj)
    while True:
        doomed = {n for n in alive if len(adj[n] & alive) < k}
        if not doomed:
            break
        alive -= doomed
    return {n: len(adj[n] & alive) for n in alive}


def test_k_core_hand_graph(spark):
    """Triangle 1-2-3 with a tail 3-4-5: the 2-core is exactly the
    triangle (4 peels away after 5, the cascade the one-shot degree
    filter misses)."""
    from indexlab_spark.operators.dedup import k_core

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (1, 3), (3, 4), (4, 5)], "id_a long, id_b long"
    )
    got = {r["node"]: r["deg"] for r in k_core(edges, 2).collect()}
    assert got == {1: 2, 2: 2, 3: 2}
    # k=1: every non-isolated node survives (leaves have degree 1)
    got1 = {r["node"]: r["deg"] for r in k_core(edges, 1).collect()}
    assert set(got1) == {1, 2, 3, 4, 5}
    # k above the max core: empty
    assert k_core(edges, 4).count() == 0
    with pytest.raises(ValueError):
        k_core(edges, 0)


def test_k_core_multigraph_and_self_loops(spark):
    """Duplicate, reversed and self-loop edges must collapse to
    simple-graph semantics before peeling."""
    from indexlab_spark.operators.dedup import k_core

    edges = spark.createDataFrame(
        [(1, 2), (2, 1), (1, 2), (1, 1), (2, 3), (1, 3)],
        "id_a long, id_b long",
    )
    got = {r["node"]: r["deg"] for r in k_core(edges, 2).collect()}
    assert got == {1: 2, 2: 2, 3: 2}


def test_k_core_matches_local_reference_random_graphs(spark):
    """Pseudo-random graphs (deterministic congruential edges) at
    several densities and k values: Spark peeling == local peeling,
    node for node, degree for degree."""
    from indexlab_spark.operators.dedup import k_core

    for seed, n_nodes, n_edges in ((1, 40, 80), (2, 60, 90), (3, 30, 120)):
        raw = []
        x = seed
        for _ in range(n_edges):
            x = (x * 1103515245 + 12345) % (2**31)
            a = x % n_nodes
            x = (x * 1103515245 + 12345) % (2**31)
            b = x % n_nodes
            raw.append((a, b))
        df = spark.createDataFrame(raw, "id_a long, id_b long")
        for k in (2, 3, 4):
            want = _local_kcore(raw, k)
            got = {r["node"]: r["deg"] for r in k_core(df, k).collect()}
            assert got == want, (seed, k)


def test_k_core_rounds_are_bounded_joins(spark):
    """Plan discipline: the per-round degree computation is two keyed
    joins + a partial-agg count — no cartesian product, no window."""
    from indexlab_spark.operators.dedup import k_core

    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(50)] + [(0, 49)], "id_a long, id_b long"
    )
    out = k_core(edges, 2)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "Window" not in plan


# ------------------------------------------------- streaming CM monitor


def test_cm_monitor_stream_equals_batch_and_replay(spark, tmp_path):
    """Drained CM state collapsed across batch partitions must EXACTLY
    equal the one-shot batch sketch (linearity), and a redelivered
    batch must overwrite its own partition, not double-add."""
    from indexlab_spark.operators.analytics import (
        cm_sketch_build,
        cm_sketch_estimate,
    )
    from indexlab_spark.streaming.ingest import (
        cm_monitor_totals,
        heavy_hitters_monitor_stream,
    )

    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet").select(
        "event_id", "event_type"
    )
    src = str(tmp_path / "cmsrc")
    ev.repartition(3).write.parquet(src)

    static = spark.read.parquet(src)
    stream = (
        spark.readStream.schema(static.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    state = str(tmp_path / "cmstate")
    q = heavy_hitters_monitor_stream(
        stream, state, "event_type", width=128, depth=3
    ).start()
    q.awaitTermination()

    def counters(df):
        return {(r["j"], r["bucket"]): r["cnt"] for r in df.collect()}

    totals = cm_monitor_totals(spark, state)
    want = cm_sketch_build(ev, "event_type", width=128, depth=3)
    assert counters(totals) == counters(want) and totals.count() > 0

    # estimates off the collapsed table never undercount and are exact
    # for this tiny key domain
    true = {
        r["event_type"]: r["cnt"]
        for r in ev.groupBy("event_type").count().withColumnRenamed(
            "count", "cnt"
        ).collect()
    }
    est = {
        r["key"]: r["est"]
        for r in cm_sketch_estimate(totals, ev, "event_type").collect()
    }
    assert all(est[k] >= v for k, v in true.items())

    # replay idempotence, driven directly through the state writer:
    # re-delivering a batch overwrites its partition, never double-adds
    from indexlab_spark.streaming.ingest import _write_state

    h1 = ev.filter(F.col("event_id") % 2 == 0)
    h2 = ev.filter(F.col("event_id") % 2 == 1)
    state2 = str(tmp_path / "cmstate2")
    _write_state(cm_sketch_build(h1, "event_type", width=128, depth=3),
                 state2, 0)
    _write_state(cm_sketch_build(h2, "event_type", width=128, depth=3),
                 state2, 1)
    before = counters(cm_monitor_totals(spark, state2))
    # batch 0 redelivered (at-least-once): byte-identical overwrite
    _write_state(cm_sketch_build(h1, "event_type", width=128, depth=3),
                 state2, 0)
    after = counters(cm_monitor_totals(spark, state2))
    assert before == after == counters(want)


def test_cm_monitor_rejects_mixed_contracts(spark, tmp_path):
    """A state dir accidentally holding partitions from two different
    (width, depth) configurations must refuse to collapse."""
    import pytest as _pytest

    from indexlab_spark.operators.analytics import cm_sketch_build
    from indexlab_spark.streaming.ingest import (
        _write_state,
        cm_monitor_totals,
    )

    df = spark.createDataFrame([("a",), ("b",)], "k string")
    state = str(tmp_path / "mixed")
    _write_state(cm_sketch_build(df, "k", width=64, depth=2), state, 0)
    _write_state(cm_sketch_build(df, "k", width=32, depth=2), state, 1)
    with _pytest.raises(ValueError, match="incompatible|mixes"):
        cm_monitor_totals(spark, state)


# ------------------------------------------------------ A/B test report


def test_ab_test_report_matches_local_welch(spark):
    """Planted two-arm experiment: t/z statistics equal a pure-python
    Welch + pooled-z reference to 1e-6, and the significance flags
    fire on a real difference."""
    import math

    from indexlab_spark.operators.analytics import ab_test_report

    a = [10.0, 12.0, 11.0, 13.0, 9.0, 14.0, 10.5, 12.5]
    b = [15.0, 17.0, 16.0, 18.0, 14.0, 19.0, 15.5, 17.5]
    conv_a = [1, 0, 0, 0, 1, 0, 0, 0]
    conv_b = [1, 1, 1, 0, 1, 1, 1, 0]
    rows = [("a", x, float(c)) for x, c in zip(a, conv_a)] + [
        ("b", x, float(c)) for x, c in zip(b, conv_b)
    ]
    df = spark.createDataFrame(rows, "variant string, metric double, conv double")
    r = ab_test_report(df, "variant", "metric", "conv").collect()[0]

    def mean(v):
        return sum(v) / len(v)

    def var_s(v):
        m = mean(v)
        return sum((x - m) ** 2 for x in v) / (len(v) - 1)

    na, nb = len(a), len(b)
    se2 = var_s(a) / na + var_s(b) / nb
    t = (mean(a) - mean(b)) / math.sqrt(se2)
    t_df = se2 * se2 / (
        (var_s(a) / na) ** 2 / (na - 1) + (var_s(b) / nb) ** 2 / (nb - 1)
    )
    pa, pb = mean(conv_a), mean(conv_b)
    pp = (sum(conv_a) + sum(conv_b)) / (na + nb)
    z = (pa - pb) / math.sqrt(pp * (1 - pp) * (1 / na + 1 / nb))

    assert abs(r["t_stat"] - round(t, 6)) < 1e-9
    assert abs(r["t_df"] - round(t_df, 6)) < 1e-9
    assert abs(r["z_stat"] - round(z, 6)) < 1e-9
    assert r["t_sig"] is True and r["z_sig"] is True
    assert r["n_a"] == na and r["n_b"] == nb


def test_ab_test_report_degenerate_arms(spark):
    """n=1 arm or zero variance on both sides -> NULL statistics and
    false flags, never a division error."""
    from indexlab_spark.operators.analytics import ab_test_report

    one = spark.createDataFrame(
        [("a", 1.0, 0.0), ("b", 2.0, 1.0), ("b", 3.0, 1.0)],
        "variant string, metric double, conv double",
    )
    r = ab_test_report(one, "variant", "metric", "conv").collect()[0]
    assert r["t_stat"] is None and r["t_sig"] is False

    flat = spark.createDataFrame(
        [("a", 5.0, 1.0), ("a", 5.0, 1.0), ("b", 5.0, 1.0), ("b", 5.0, 1.0)],
        "variant string, metric double, conv double",
    )
    r2 = ab_test_report(flat, "variant", "metric", "conv").collect()[0]
    # zero metric variance -> no t; pooled conversion rate 1 -> no z
    assert r2["t_stat"] is None and r2["z_stat"] is None
    assert r2["t_sig"] is False and r2["z_sig"] is False


def test_ab_test_report_single_reduction_plan(spark):
    """Plan contract: one filtered-aggregate reduction — no join, no
    pivot exchange, a single shuffle (the one-row partial agg)."""
    from indexlab_spark.operators.analytics import ab_test_report

    df = spark.createDataFrame(
        [("a", 1.0, 0.0), ("b", 2.0, 1.0)],
        "variant string, metric double, conv double",
    )
    plan = (
        ab_test_report(df, "variant", "metric", "conv")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Join" not in plan
    shuffles = sum(
        1
        for l in plan.splitlines()
        if "Exchange" in l
        and "ReusedExchange" not in l
        and "BroadcastExchange" not in l
    )
    assert shuffles == 1, plan


def test_ab_test_report_null_metric_contract(spark):
    """r8 VERDICT: pin the NULL denominator semantics — a unit row with
    a NULL metric leaves BOTH tests (it adds to neither n nor the
    conversion numerator/denominator), so the report over a frame with
    null-metric rows equals the report over the frame with those rows
    filtered out; a NULL conv on a kept row counts as not-converted."""
    from indexlab_spark.operators.analytics import ab_test_report

    clean = [
        ("a", 10.0, 1.0), ("a", 12.0, 0.0), ("a", 11.0, 1.0),
        ("b", 15.0, 1.0), ("b", 17.0, 1.0), ("b", 16.0, 0.0),
    ]
    dirty = clean + [
        ("a", None, 1.0),   # null metric + converted: fully dropped
        ("b", None, None),  # null metric: fully dropped
        ("a", 13.0, None),  # null conv on a kept row: not-converted
    ]
    schema = "variant string, metric double, conv double"
    got = ab_test_report(
        spark.createDataFrame(dirty, schema), "variant", "metric", "conv"
    ).collect()[0]
    want = ab_test_report(
        spark.createDataFrame(
            clean + [("a", 13.0, 0.0)], schema
        ),
        "variant", "metric", "conv",
    ).collect()[0]
    assert got["n_a"] == 4 and got["n_b"] == 3
    assert got["conv_a"] == want["conv_a"] == 0.5
    assert got.asDict() == want.asDict()
