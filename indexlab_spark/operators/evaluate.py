"""Evaluation metrics (SURVEY §2.8, V1-V8) as one windowed aggregation.

Reference (/root/reference/app/api/eval_api.py:220-271) loops per gold
row: one embed + one FAISS call each. Here the whole gold set is a
DataFrame, retrieval is a single batch kNN join, and the three metrics
come out of one aggregation — the per-question loop disappears
(SURVEY §3.3 Spark shape).

Metric semantics (binary relevance, one expected id per question):
  found     = expected_id in top-k ids                     (V2)
  rank      = 1-based position of expected_id, else null   (V2)
  recall@k  = mean(found)                                  (V3)
  MRR       = mean(1/rank, miss -> 0)                      (V4)
  NDCG      = mean(1/log2(rank+1), miss -> 0)              (V5)

V5 equals sklearn.metrics.ndcg_score for binary single-relevant truth
with distinct scores: DCG = 1/log2(pos+1) at the score-ordered position,
IDCG = 1. sklearn averages gains across tied scores; with the
deterministic embedder scores are distinct, and golden tests freeze the
values (SURVEY §7.3 tie policy).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def eval_results(
    gold_df: DataFrame,
    hits_df: DataFrame,
    k: int,
    query_id_col: str = "query_id",
    doc_id_col: str = "doc_id",
    expected_col: str = "expected_id",
) -> DataFrame:
    """V1/V2/V6 — per-question found/rank/top-ids.

    gold_df: (query_id, expected_id [, question...])
    hits_df: (query_id, doc_id, rank) — ranked retrieval, e.g. knn top
             max(k,10) (V1 cushion, eval_api.py:226), trimmed to k here.
    Returns one row per gold row: (query_id, expected_id, found, rank,
    top_ids).
    """
    top = hits_df.filter(F.col("rank") <= k)
    agg = top.groupBy(query_id_col).agg(
        F.sort_array(
            F.collect_list(F.struct(F.col("rank"), F.col(doc_id_col).alias("id")))
        ).alias("_hits")
    )
    with_ids = agg.select(
        query_id_col,
        F.transform(F.col("_hits"), lambda h: h["id"].cast("string")).alias("top_ids"),
    )
    joined = gold_df.join(with_ids, query_id_col, "left")
    # A gold query with zero retrieved hits gets top_ids NULL from the left
    # join; coalesce to an empty array so found is false (a counted miss),
    # not NULL (which avg() would silently drop, inflating recall/MRR).
    top_ids = F.coalesce(F.col("top_ids"), F.array().cast("array<string>"))
    pos = F.array_position(top_ids, F.col(expected_col).cast("string"))  # 0 = miss
    return joined.select(
        query_id_col,
        F.col(expected_col).cast("string").alias(expected_col),
        F.coalesce(pos > 0, F.lit(False)).alias("found"),
        F.when(pos > 0, pos.cast("int")).alias("rank"),
        top_ids.alias("top_ids"),
    )


def eval_metrics(results_df: DataFrame) -> DataFrame:
    """V3-V5 — one aggregation over eval_results output."""
    return results_df.agg(
        F.count(F.lit(1)).alias("total"),
        F.avg(F.col("found").cast("double")).alias("recall_at_k"),
        F.avg(F.coalesce(1.0 / F.col("rank"), F.lit(0.0))).alias("mrr"),
        F.avg(
            F.coalesce(1.0 / F.log2(F.col("rank") + 1.0), F.lit(0.0))
        ).alias("ndcg"),
    )


def eval_compare(
    left_results: DataFrame,
    right_results: DataFrame,
    query_id_col: str = "query_id",
) -> DataFrame:
    """V7 — pair per-question results and compute rank deltas.

    Reference zips by row order trimming to the shorter side
    (eval_api.py:331-335); with a shared query_id key the join is exact.
    Sentinels: -999 = recovered (miss -> hit), 999 = regression
    (hit -> miss), null when both miss (delta None in the reference).
    """
    l = left_results.select(
        query_id_col,
        F.col("found").alias("l_found"),
        F.col("rank").alias("l_rank"),
    )
    r = right_results.select(
        query_id_col,
        F.col("found").alias("r_found"),
        F.col("rank").alias("r_rank"),
    )
    joined = l.join(r, query_id_col, "inner")
    delta = (
        F.when(~F.col("l_found") & F.col("r_found"), F.lit(-999))
        .when(F.col("l_found") & ~F.col("r_found"), F.lit(999))
        .when(F.col("l_found") & F.col("r_found"), F.col("r_rank") - F.col("l_rank"))
    )
    return joined.select(
        query_id_col, "l_found", "l_rank", "r_found", "r_rank",
        delta.cast("int").alias("delta"),
    )


def compare_summary(compare_df: DataFrame) -> DataFrame:
    """V8 — regression/improvement/changed counts
    (eval_api.py:365-374): regressions = delta > 0, improvements =
    delta < 0 (sentinels included: -999 improves, 999 regresses),
    changed = delta not in (0, null)."""
    # coalesce: an all-NULL delta column (both runs missed everything)
    # must report explicit 0s like the reference's counting loop, not
    # NULL sums
    return compare_df.agg(
        F.count(F.lit(1)).alias("total"),
        F.coalesce(
            F.sum((F.col("delta") > 0).cast("int")), F.lit(0)
        ).alias("regressions"),
        F.coalesce(
            F.sum((F.col("delta") < 0).cast("int")), F.lit(0)
        ).alias("improvements"),
        F.coalesce(
            F.sum(
                (F.col("delta").isNotNull() & (F.col("delta") != 0)).cast("int")
            ),
            F.lit(0),
        ).alias("changed"),
    )


def overlap_compare(
    left_hits: DataFrame,
    right_hits: DataFrame,
    query_id_col: str = "query_id",
    doc_id_col: str = "doc_id",
) -> DataFrame:
    """V9 — per-query overlap of two top-k id sets
    (answerless_search.py:275-315): inner join on doc id."""
    l = left_hits.select(query_id_col, doc_id_col)
    r = right_hits.select(query_id_col, doc_id_col)
    inter = l.join(r, [query_id_col, doc_id_col]).groupBy(query_id_col).agg(
        F.count(F.lit(1)).alias("overlap")
    )
    base = l.groupBy(query_id_col).agg(F.count(F.lit(1)).alias("left_k"))
    return base.join(inter, query_id_col, "left").na.fill({"overlap": 0})


def bootstrap_delta(
    per_question: DataFrame,
    value_col: str = "delta",
    question_col: str = "query_id",
    n_boot: int = 200,
    seed: str = "boot",
) -> DataFrame:
    """Paired-bootstrap confidence interval for a per-question metric
    delta between two eval runs — the standard IR significance check
    (Smucker et al. 2007, public): resample the question set with
    replacement ``n_boot`` times, average the deltas per resample, and
    report the 2.5/97.5 percentile band plus the fraction of resamples
    with mean >= 0. A CI excluding 0 (or frac_ge_0 near 0/1) marks the
    delta significant; a CI straddling 0 marks it noise.

    Resampling is DETERMINISTIC: draw i of resample b picks question
    ``md5_long(seed|b|i) % n`` — reproducible across engines, runs and
    partitionings (the same device as hash_sample), so the operator is
    oracle-checkable — no RNG state anywhere.

    Plan: questions get global 0-based positions (ordered by question
    id) via ``global_order_index`` — a range shuffle + per-partition
    zip, NOT an ``Exchange SinglePartition`` window — then a generated
    ``n_boot x n`` index frame joins back on position (keyed shuffle),
    per-resample means map-side combined, then one exact-percentile agg
    over ``n_boot`` rows. Nothing driver-side.
    """
    from indexlab_spark.functions.hashing import md5_long
    from indexlab_spark.functions.text import global_order_index

    base = per_question.select(
        F.col(question_col).alias("_q"), F.col(value_col).cast("double").alias("_v")
    )
    ranked = global_order_index(base, ["_q"], "_pos")
    n_row = base.agg(
        F.count(F.lit(1)).alias("_n"), F.avg("_v").alias("_mean")
    )
    spark = per_question.sparkSession
    draws = (
        spark.range(n_boot)
        .select(F.col("id").alias("_b"))
        .crossJoin(F.broadcast(n_row.select("_n")))
        .select(
            "_b",
            F.explode(F.sequence(F.lit(0), F.col("_n") - 1)).alias("_i"),
            "_n",
        )
        .select(
            "_b",
            (
                md5_long(
                    F.concat_ws("|", F.lit(seed), F.col("_b"), F.col("_i"))
                )
                % F.col("_n")
            ).alias("_pos"),
        )
    )
    boot_means = (
        draws.join(ranked.select("_pos", "_v"), "_pos")
        .groupBy("_b")
        .agg(F.avg("_v").alias("_bm"))
    )
    return (
        boot_means.agg(
            F.count(F.lit(1)).alias("n_boot"),
            F.round(F.expr("percentile(_bm, 0.025)"), 6).alias("ci_low"),
            F.round(F.expr("percentile(_bm, 0.975)"), 6).alias("ci_high"),
            F.round(F.avg((F.col("_bm") >= 0).cast("double")), 6).alias(
                "frac_ge_0"
            ),
        )
        .crossJoin(F.broadcast(n_row))
        .select(
            F.col("_n").alias("n_questions"),
            F.round("_mean", 6).alias("delta_mean"),
            "n_boot",
            "ci_low",
            "ci_high",
            "frac_ge_0",
        )
    )


def pairwise_winrates(
    df: DataFrame,
    unit_col: str,
    system_col: str,
    metric_col: str,
    higher_is_better: bool = True,
) -> DataFrame:
    """Pairwise win/tie/loss matrix between SYSTEMS over shared
    evaluation units (queries, days, test cases) — the many-system
    completion of eval_compare's two-run delta: when k models /
    retrieval configs / pipelines are scored on the same units, the
    honest comparison is per-unit dominance, not mean-metric deltas
    (a mean hides that A wins 80% of units by a hair and loses 20%
    catastrophically). win_rate credits ties at 1/2 (the standard
    convention, so A vs B and B vs A sum to 1).

    Distributed shape: ONE self-join KEYED ON THE UNIT (fan-out
    bounded by systems^2 per unit — systems are few by nature), then
    a map-side-combined (system_a, system_b) aggregation to the
    pair-sized matrix. Units missing a system's score simply don't
    pair for that system (documented: win rates are over units BOTH
    systems scored). Multiple rows per (unit, system) — repeated
    trials — are averaged into ONE score per (unit, system) BEFORE
    pairing (otherwise the unit-keyed self-join would fan out and
    silently inflate n_units/wins/ties).

    Output per unordered pair (system_a < system_b): n_units, wins_a,
    wins_b, ties, win_rate_a (6dp).
    """
    m = F.col(metric_col).cast("double")
    base = (
        df.filter(m.isNotNull())
        .groupBy(
            F.col(unit_col).alias("_u"),
            F.col(system_col).alias("_s"),
        )
        .agg(F.avg(m).alias("_m"))
    )
    a = base.select(
        F.col("_u"), F.col("_s").alias("system_a"), F.col("_m").alias("_ma")
    )
    b = base.select(
        F.col("_u"), F.col("_s").alias("system_b"), F.col("_m").alias("_mb")
    )
    pairs = a.join(b, "_u").filter(F.col("system_a") < F.col("system_b"))
    better = F.col("_ma") > F.col("_mb") if higher_is_better else (
        F.col("_ma") < F.col("_mb")
    )
    worse = F.col("_ma") < F.col("_mb") if higher_is_better else (
        F.col("_ma") > F.col("_mb")
    )
    agg = pairs.groupBy("system_a", "system_b").agg(
        F.count(F.lit(1)).alias("n_units"),
        F.sum(F.when(better, 1).otherwise(0)).cast("long").alias("wins_a"),
        F.sum(F.when(worse, 1).otherwise(0)).cast("long").alias("wins_b"),
        F.sum(
            F.when(F.col("_ma") == F.col("_mb"), 1).otherwise(0)
        ).cast("long").alias("ties"),
    )
    return agg.select(
        "system_a",
        "system_b",
        "n_units",
        "wins_a",
        "wins_b",
        "ties",
        F.round(
            (F.col("wins_a") + 0.5 * F.col("ties"))
            / F.col("n_units"),
            6,
        ).alias("win_rate_a"),
    )


def ann_recall(
    exact_hits: DataFrame,
    approx_hits: DataFrame,
    k: int,
    query_id_col: str = "query_id",
    doc_id_col: str = "doc_id",
    rank_col: str = "rank",
) -> DataFrame:
    """Recall@k of an APPROXIMATE retrieval run against the exact
    ground truth — the acceptance gate for every ANN config in the
    family (IVF nprobe, PQ codebooks, SQ8, LSH bands): per query,
    |approx top-k ∩ exact top-k| / min(k, |exact top-k|), summarized
    with the mean, the worst query, and the share of queries at
    perfect recall. The per-query floor matters: a 0.95 MEAN recall
    can hide queries at 0.2, which is what a user actually hits.

    Distributed shape: both inputs are top-k frames (queries x k —
    tiny); rank-filter both to k, one query+doc-keyed semi-ish join
    (inner join counts the intersection), one query-keyed agg, one
    summary row appended via a rollup-free union of the per-query
    frame with its own aggregate — both branches derive from the
    already-aggregated per-query frame (query-count-sized, so the
    re-derivation the srm audit banned is frame-local, not
    corpus-local). Queries present in exact but absent from approx
    score 0 (a config that drops queries must not look good).

    Output: query rows (query_id as string, n_exact, n_hit, recall
    6dp) + one '<ALL>' row (n_exact = total exact rows, n_hit = total
    hits, recall = MEAN of per-query recalls, 6dp).
    """
    if k < 1:
        raise ValueError(f"ann_recall: k must be >= 1, got {k}")
    ex = exact_hits.filter(F.col(rank_col) <= k).select(
        F.col(query_id_col).alias("_q"), F.col(doc_id_col).alias("_d")
    )
    ap = approx_hits.filter(F.col(rank_col) <= k).select(
        F.col(query_id_col).alias("_q"), F.col(doc_id_col).alias("_d")
    )
    per_q = (
        ex.join(ap.withColumn("_hit", F.lit(1)), ["_q", "_d"], "left")
        .groupBy("_q")
        .agg(
            F.count(F.lit(1)).alias("n_exact"),
            F.coalesce(F.sum("_hit"), F.lit(0)).alias("n_hit"),
        )
        .select(
            F.col("_q").cast("string").alias("query_id"),
            F.col("n_exact").cast("long").alias("n_exact"),
            F.col("n_hit").cast("long").alias("n_hit"),
            F.round(
                F.col("n_hit")
                / F.least(F.lit(k), F.col("n_exact")).cast("double"),
                6,
            ).alias("recall"),
        )
    )
    # summary from the (query-count-sized) per-query frame
    total = per_q.agg(
        F.lit("<ALL>").alias("query_id"),
        F.sum("n_exact").cast("long").alias("n_exact"),
        F.sum("n_hit").cast("long").alias("n_hit"),
        F.round(F.avg("recall"), 6).alias("recall"),
    )
    return per_q.unionByName(total)


def ranking_tau(
    run_a: DataFrame,
    run_b: DataFrame,
    query_col: str = "query_id",
    doc_col: str = "doc_id",
    rank_col: str = "rank",
) -> DataFrame:
    """Kendall tau-b rank agreement between two retrieval runs per
    query (Kendall 1938 with the tau-b tie correction, public) — the
    ORDER-sensitive completion of :func:`search_overlap` (set overlap
    says the two systems retrieve the same documents; tau says whether
    they RANK them the same way, which is what changes the LLM context
    window's first slots). Standard in IR evaluation for comparing a
    cheap ranker against an expensive one.

    Computed over documents BOTH runs retrieved for the query
    (documented: tau over the shared set; disjoint tails are overlap's
    job, not tau's). For every unordered shared-doc pair:
    concordant = both runs order it the same way, discordant =
    opposite ways, tied in a / tied in b otherwise;
    tau_b = (C - D) / sqrt((P - Ta) * (P - Tb)) with P = all pairs,
    Ta/Tb = pairs tied in that run alone... exactly: P = C + D + Ta +
    Tb + Tab, tau_b = (C - D) / sqrt((C + D + Ta) * (C + D + Tb)).
    NULL when either factor is 0 (a run ranked every shared doc
    equally — no order information).

    Distributed shape: one doc-keyed inner join aligns the runs, then
    ONE query-keyed self-join over the shared frame (pair fan-out
    bounded by the per-query POOL size squared — pools are top-k
    frames, never corpus-sized) + one map-side-combined agg. Repeated
    (query, doc) rows in a run — a unioned or re-ranked frame — are
    collapsed to their BEST (minimum) rank BEFORE aligning, so the
    join cannot fan out and silently inflate n_shared/n_pairs (the
    pairwise_winrates pre-aggregation discipline).

    Output per query: query_col, n_shared, n_pairs, concordant,
    discordant, tau_b (6dp).
    """
    def side(run, suffix):
        return run.groupBy(
            F.col(query_col).alias("_q"),
            F.col(doc_col).alias("_d"),
        ).agg(
            F.min(F.col(rank_col).cast("double")).alias(f"_r{suffix}")
        )

    shared = side(run_a, "a").join(side(run_b, "b"), ["_q", "_d"])
    x = shared.alias("x")
    y = shared.alias("y")
    pairs = x.join(
        y,
        (F.col("x._q") == F.col("y._q")) & (F.col("x._d") < F.col("y._d")),
    )
    da = F.col("x._ra") - F.col("y._ra")
    db = F.col("x._rb") - F.col("y._rb")
    conc = (da * db > 0).cast("long")
    disc = (da * db < 0).cast("long")
    tie_a = ((da == 0) & (db != 0)).cast("long")
    tie_b = ((db == 0) & (da != 0)).cast("long")
    counts = shared.groupBy(F.col("_q").alias(query_col)).agg(
        F.count(F.lit(1)).alias("n_shared")
    )
    agg = pairs.groupBy(F.col("x._q").alias(query_col)).agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.sum(conc).alias("concordant"),
        F.sum(disc).alias("discordant"),
        F.sum(tie_a).alias("_ta"),
        F.sum(tie_b).alias("_tb"),
    )
    c, d = F.col("concordant"), F.col("discordant")
    denom_a = (c + d + F.col("_ta")).cast("double")
    denom_b = (c + d + F.col("_tb")).cast("double")
    tau = F.when(
        (denom_a > 0) & (denom_b > 0),
        (c - d).cast("double") / F.sqrt(denom_a * denom_b),
    )
    return (
        counts.join(agg, query_col, "left")
        .select(
            query_col,
            "n_shared",
            F.coalesce(F.col("n_pairs"), F.lit(0)).alias("n_pairs"),
            F.coalesce(c, F.lit(0)).alias("concordant"),
            F.coalesce(d, F.lit(0)).alias("discordant"),
            F.round(tau, 6).alias("tau_b"),
        )
    )
