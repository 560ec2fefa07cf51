"""V2-V9 eval metrics + L3 RRF fusion against hand-computed oracles."""

import math

from indexlab_spark.operators.evaluate import (
    compare_summary,
    eval_compare,
    eval_metrics,
    eval_results,
    overlap_compare,
)
from indexlab_spark.operators.fusion import hybrid_search, rrf_fuse


def _hits(spark, rows):
    return spark.createDataFrame(rows, "query_id long, doc_id string, rank int")


def test_eval_metrics_hand_computed(spark):
    gold = spark.createDataFrame(
        [(0, "a"), (1, "c"), (2, "zz"), (3, "b")], "query_id long, expected_id string"
    )
    hits = _hits(
        spark,
        [
            (0, "a", 1), (0, "b", 2),          # hit at rank 1
            (1, "a", 1), (1, "c", 2), (1, "d", 3),  # hit at rank 2
            (2, "a", 1), (2, "b", 2),          # miss
            (3, "x", 1), (3, "y", 2), (3, "b", 3),  # hit at rank 3
        ],
    )
    res = eval_results(gold, hits, k=3)
    m = eval_metrics(res).collect()[0]
    assert m["total"] == 4
    assert abs(m["recall_at_k"] - 3 / 4) < 1e-12
    assert abs(m["mrr"] - (1 + 0.5 + 1 / 3) / 4) < 1e-12
    expected_ndcg = (1 / math.log2(2) + 1 / math.log2(3) + 0 + 1 / math.log2(4)) / 4
    assert abs(m["ndcg"] - expected_ndcg) < 1e-12


def test_eval_k_trim(spark):
    gold = spark.createDataFrame([(0, "c")], "query_id long, expected_id string")
    hits = _hits(spark, [(0, "a", 1), (0, "b", 2), (0, "c", 3)])
    res2 = eval_results(gold, hits, k=2).collect()[0]
    assert not res2["found"] and res2["rank"] is None
    res3 = eval_results(gold, hits, k=3).collect()[0]
    assert res3["found"] and res3["rank"] == 3


def test_eval_compare_sentinels(spark):
    gold = spark.createDataFrame(
        [(0, "a"), (1, "a"), (2, "a"), (3, "a")], "query_id long, expected_id string"
    )
    left = _hits(spark, [(0, "a", 1), (1, "x", 1), (2, "x", 1), (2, "a", 2), (3, "a", 1)])
    right = _hits(spark, [(0, "x", 1), (1, "a", 1), (2, "a", 1), (3, "a", 1)])
    lr = eval_results(gold, left, k=3)
    rr = eval_results(gold, right, k=3)
    cmp_rows = {r["query_id"]: r for r in eval_compare(lr, rr).collect()}
    assert cmp_rows[0]["delta"] == 999     # hit -> miss (regression)
    assert cmp_rows[1]["delta"] == -999    # miss -> hit (recovered)
    assert cmp_rows[2]["delta"] == -1      # rank 2 -> 1 improved
    assert cmp_rows[3]["delta"] == 0
    s = compare_summary(eval_compare(lr, rr)).collect()[0]
    assert (s["regressions"], s["improvements"], s["changed"]) == (1, 2, 3)


def test_overlap_compare(spark):
    left = _hits(spark, [(0, "a", 1), (0, "b", 2), (1, "x", 1)])
    right = _hits(spark, [(0, "b", 1), (0, "c", 2), (1, "y", 1)])
    rows = {r["query_id"]: r for r in overlap_compare(left, right).collect()}
    assert rows[0]["overlap"] == 1 and rows[0]["left_k"] == 2
    assert rows[1]["overlap"] == 0


def _reference_rrf(vec_hits, bm_hits, k, k_rrf=60):
    """Pure port of hybrid.py:14-21 for cross-checking (0-based enumerate)."""
    rank_map = {}
    for r, (i, _) in enumerate(vec_hits):
        rank_map[i] = rank_map.get(i, 0.0) + 1.0 / (k_rrf + r + 1)
    for r, (i, _) in enumerate(bm_hits):
        rank_map[i] = rank_map.get(i, 0.0) + 1.0 / (k_rrf + r + 1)
    fused = sorted(rank_map.items(), key=lambda x: x[1], reverse=True)[:k]
    return fused


def test_rrf_matches_reference_port(spark):
    vec = [("a", 0.9), ("b", 0.8), ("c", 0.7)]
    bm = [("b", 12.0), ("d", 11.0), ("a", 10.0)]
    expect = _reference_rrf(vec, bm, k=4)
    vec_df = _hits(spark, [(0, d, i + 1) for i, (d, _) in enumerate(vec)])
    bm_df = _hits(spark, [(0, d, i + 1) for i, (d, _) in enumerate(bm)])
    got = rrf_fuse(vec_df, bm_df, k=4).orderBy("rank").collect()
    assert [r["doc_id"] for r in got] == [d for d, _ in expect]
    for r, (_, s) in zip(got, expect):
        assert abs(r["fused_score"] - s) < 1e-9


def test_hybrid_scoreless_hits(spark):
    # L4: fused docs that came only from bm25 carry NULL vector_score
    vec_df = _hits(spark, [(0, "a", 1)]).withColumn(
        "score", (1.0 / __import__("pyspark").sql.functions.col("rank"))
    )
    bm_df = _hits(spark, [(0, "b", 1)])
    out = {r["doc_id"]: r for r in hybrid_search(vec_df, bm_df, k=2).collect()}
    assert out["a"]["vector_score"] is not None
    assert out["b"]["vector_score"] is None


def test_bootstrap_delta_properties(spark):
    """Deterministic across partitionings; CI brackets the mean; a
    clearly-positive delta set is significant (CI > 0, frac_ge_0 = 1),
    a zero-centered one is not."""
    import numpy as np

    from indexlab_spark.operators.evaluate import bootstrap_delta

    rng = np.random.default_rng(11)
    pos = [(int(i), float(v)) for i, v in
           enumerate(rng.normal(1.0, 0.2, 80).round(6))]
    noise = [(int(i), float(v)) for i, v in
             enumerate(rng.normal(0.0, 1.0, 80).round(6))]
    pos_df = spark.createDataFrame(pos, "query_id int, delta double")
    out = bootstrap_delta(pos_df, n_boot=100).first()
    assert out["ci_low"] > 0 and out["frac_ge_0"] == 1.0
    assert out["ci_low"] <= out["delta_mean"] <= out["ci_high"]
    out2 = bootstrap_delta(pos_df.repartition(7), n_boot=100).first()
    assert out.asDict() == out2.asDict()
    noise_df = spark.createDataFrame(noise, "query_id int, delta double")
    nz = bootstrap_delta(noise_df, n_boot=100).first()
    assert nz["ci_low"] < 0 < nz["ci_high"]
