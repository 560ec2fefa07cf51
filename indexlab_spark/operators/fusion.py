"""Hybrid fusion (SURVEY §2.6, L3-L5).

Reference RRF (/root/reference/app/ingest/hybrid.py:14-21):
``score(d) = sum over lists of 1/(k_rrf + r + 1)`` with 0-based rank r
(equivalently ``1/(60 + rank)`` for 1-based ranks), summed over the
vector and BM25 lists, top-k by fused score descending.

Tie policy: the reference relies on Python sort stability (first
insertion — vector-list order — wins). A distributed engine needs a
deterministic key instead: ties break on ascending doc id. Observable
only on exact float ties of fused scores (i.e. identical rank patterns),
where the winner differs but both orders are defensible; documented here
per SURVEY §7.0.4.

Scale: both inputs are already top-k lists (tiny relative to the
corpus); the fuse is a unionByName + groupBy on (query, doc) — shuffle
volume O(queries × k), independent of corpus size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from indexlab_spark.config import RRF_K


def rrf_fuse(
    vec_hits: DataFrame,
    bm25_hits: DataFrame,
    k: int,
    k_rrf: int = RRF_K,
    query_id_col: str = "query_id",
    doc_id_col: str = "doc_id",
    rank_col: str = "rank",
    round_digits: int | None = 9,
) -> DataFrame:
    """L3 — reciprocal-rank fusion of two (query_id, doc_id, rank) lists.

    ``rank`` is 1-based (as produced by knn.* and bm25_score).
    Returns (query_id, doc_id, fused_score, rank).
    """
    a = vec_hits.select(query_id_col, doc_id_col, rank_col)
    b = bm25_hits.select(query_id_col, doc_id_col, rank_col)
    both = a.unionByName(b)
    fused = both.groupBy(query_id_col, doc_id_col).agg(
        F.sum(1.0 / (F.lit(k_rrf) + F.col(rank_col))).alias("fused_score")
    )
    if round_digits is not None:
        fused = fused.withColumn("fused_score", F.round("fused_score", round_digits))
    w = Window.partitionBy(query_id_col).orderBy(
        F.desc("fused_score"), F.asc(doc_id_col)
    )
    return fused.withColumn("rank", F.row_number().over(w).cast("int")).filter(
        F.col("rank") <= k
    )


def hybrid_search(
    vec_hits: DataFrame,
    bm25_hits: DataFrame,
    k: int,
    query_id_col: str = "query_id",
    doc_id_col: str = "doc_id",
) -> DataFrame:
    """L4 — hybrid orchestration: RRF-fused list carries NO fabricated
    score; the display score is the doc's vector score when it had one
    (answerless_search.py:246,250,265-271 — null otherwise)."""
    fused = rrf_fuse(vec_hits, bm25_hits, k, query_id_col=query_id_col,
                     doc_id_col=doc_id_col)
    vec_scores = vec_hits.select(
        query_id_col, doc_id_col, F.col("score").alias("vector_score")
    )
    return (
        fused.join(vec_scores, [query_id_col, doc_id_col], "left")
        .select(query_id_col, doc_id_col, "rank", "vector_score")
    )


def mmr_rerank(
    hits: DataFrame,
    vectors: DataFrame,
    query_col: str = "query_id",
    doc_col: str = "doc_id",
    score_col: str = "score",
    vec_id_col: str = "doc_id",
    vec_col: str = "embedding",
    k: int = 10,
    lam: float = 0.7,
) -> DataFrame:
    """Maximal Marginal Relevance re-ranking (Carbonell & Goldstein
    1998, public) — the DIVERSITY pass the retrieval stack needs
    between ranking and the LLM context window: a plain top-k happily
    returns five near-copies of the same passage; MMR greedily picks
    ``argmax lam * rel(d) - (1 - lam) * max_{s in S} cos(d, s)`` so
    each added document buys new information. lam=1 degrades to the
    input ranking (pinned in tests).

    Relevance is min-max normalized per query to [0, 1] (so lam
    trades off against the cosine term on a comparable scale;
    single-candidate or constant-score queries get rel 1.0).
    Deterministic: ties break on ascending doc id.

    Distributed shape: the candidate pool is already a top-k frame
    (queries x pool rows — tiny relative to the corpus), so the
    greedy O(k * pool) selection runs as ONE Arrow per-query pass
    after a doc-keyed join hangs each candidate's vector on its row;
    the corpus itself is never touched. Output: query_col, doc_col,
    rank (1..k), score (original), mmr_score (the greedy objective at
    selection, 6dp).
    """
    import math

    import numpy as np
    import pandas as pd

    if not (0.0 <= lam <= 1.0):
        raise ValueError(f"mmr_rerank: lam must be in [0, 1], got {lam}")
    if k < 1:
        raise ValueError(f"mmr_rerank: k must be >= 1, got {k}")
    joined = hits.select(
        F.col(query_col).alias("_q"),
        F.col(doc_col).alias("_d"),
        F.col(score_col).cast("double").alias("_s"),
    ).join(
        vectors.select(
            F.col(vec_id_col).alias("_d"),
            F.col(vec_col).cast("array<double>").alias("_v"),
        ),
        "_d",
    )
    q_type = dict(hits.dtypes)[query_col]
    d_type = dict(hits.dtypes)[doc_col]

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["_s", "_d"], ascending=[False, True],
                              kind="mergesort")
        q = pdf["_q"].iloc[0]
        docs = list(pdf["_d"])
        scores = np.array(pdf["_s"], dtype=float)
        mat = np.array(list(pdf["_v"]), dtype=float)
        norms = np.linalg.norm(mat, axis=1)
        norms[norms == 0] = 1.0
        unit = mat / norms[:, None]
        lo, hi = scores.min(), scores.max()
        rel = (
            (scores - lo) / (hi - lo)
            if hi > lo
            else np.ones_like(scores)
        )
        n = len(docs)
        selected: list[int] = []
        remaining = list(range(n))
        rows = []
        while remaining and len(selected) < k:
            best_i, best_obj = None, None
            for i in remaining:
                if selected:
                    red = float(
                        max(unit[i] @ unit[j] for j in selected)
                    )
                else:
                    red = 0.0
                obj = lam * rel[i] - (1 - lam) * red
                # round before comparing so ties break on doc id
                obj = round(obj, 9)
                if (
                    best_obj is None
                    or obj > best_obj
                    or (obj == best_obj and docs[i] < docs[best_i])
                ):
                    best_i, best_obj = i, obj
            selected.append(best_i)
            remaining.remove(best_i)
            # mmr_score output: scaled-floor, NOT round(x, 6) — the 9dp
            # round-before-compare above makes best_obj decimal-rational,
            # so it can land EXACTLY on a 6dp half boundary (observed
            # -0.0579065 at sf0.1), where Python's correctly-rounded
            # round() and DuckDB's multiply-based round() disagree.
            # floor(x*1e6 + 0.5)/1e6 is identical IEEE arithmetic on
            # both engines. Raw cosine scores are not decimal-rational,
            # so plain 6dp round stays safe for `score`.
            rows.append(
                [q, docs[best_i], len(selected),
                 round(float(scores[best_i]), 6),
                 math.floor(best_obj * 1e6 + 0.5) / 1e6]
            )
        return pd.DataFrame(
            rows, columns=["_q", "_d", "rank", "score", "mmr_score"]
        )

    return joined.groupBy("_q").applyInPandas(
        fn,
        schema=(
            f"`_q` {q_type}, `_d` {d_type}, rank long, score double, "
            "mmr_score double"
        ),
    ).withColumnRenamed("_q", query_col).withColumnRenamed("_d", doc_col)
