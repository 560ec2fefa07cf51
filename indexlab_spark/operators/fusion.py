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
