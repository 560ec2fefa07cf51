"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash -> CORRECTNESS_r{N}.json).

Implemented operators map to SURVEY.md §2 ids (see each docstring).
Floats are rounded identically on both sides before ranking/output so
the value-hash is stable across engines (double-precision math in both).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from indexlab_spark.session import load_tables

# chunking parameters shared by chunk-derived queries and their oracles
CHUNK_SIZE = 100
CHUNK_OVERLAP = 20
_STRIDE = CHUNK_SIZE - CHUNK_OVERLAP

# fixed lexical query set for BM25/hybrid queries — vocabulary drawn from
# the documents table's token space
BM25_QUERIES = [
    (0, "fast query join"),
    (1, "window sort merge table"),
    (2, "the customer data"),
    (3, "stream batch value row"),
    (4, "slow scan filter group"),
]
_BM25_K = 10


def _queries_df(spark: SparkSession):
    return spark.createDataFrame(BM25_QUERIES, "query_id long, query string")


def _bm25_values_sql() -> str:
    vals = ", ".join(f"({i}, '{q}')" for i, q in BM25_QUERIES)
    return f"(VALUES {vals}) AS queries(query_id, query)"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: document search pipeline at sf0.001.

    chunk(documents) -> deterministic embed -> batch exact kNN (K2) for
    8 query texts -> top-5 hits with previews (SURVEY §3.2 Spark shape).
    """
    from indexlab_spark.functions.embed import with_embedding
    from indexlab_spark.functions.text import preview
    from indexlab_spark.operators.chunk import explode_chunks
    from indexlab_spark.operators.knn import knn_join

    t = load_tables(spark, "/root/testdata/sf0.001", ("documents",))
    docs = t["documents"]
    chunks = explode_chunks(
        docs.select(F.col("doc_id").alias("doc_no"), "text"),
        size=CHUNK_SIZE,
        overlap=CHUNK_OVERLAP,
    )
    corpus = with_embedding(chunks, model="hash-ngram-64", normalize=True)
    queries_df = with_embedding(
        docs.filter(F.col("doc_id") < 8).select(
            F.col("doc_id").alias("query_id"),
            F.substring("text", 1, 80).alias("text"),
        ),
        out_col="qvec",
    ).select("query_id", "qvec")
    hits = knn_join(queries_df, corpus.withColumnRenamed("doc_id", "chunk_id"),
                    k=5, doc_id_col="chunk_id")
    return (
        hits.join(corpus.select(F.col("doc_id").alias("chunk_id"), "text"), "chunk_id")
        .select(
            "query_id",
            "rank",
            "chunk_id",
            F.round("score", 6).alias("score"),
            preview("text", 120).alias("preview"),
        )
        .orderBy("query_id", "rank")
    )


# --------------------------------------------------------------------------
# queries: name -> (spark, sf_dir) -> DataFrame
# --------------------------------------------------------------------------


def _q_chunk_fixed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C1/P4 — fixed-char chunking of documents via the codegen
    expression path (operators/chunk.py)."""
    from indexlab_spark.operators.chunk import explode_chunks

    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    return explode_chunks(
        docs.select(F.col("doc_id").alias("doc_no"), "text"),
        size=CHUNK_SIZE,
        overlap=CHUNK_OVERLAP,
    )


def _q_chunk_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C5 — count/avg/min/max of chunk lengths."""
    from indexlab_spark.operators.chunk import chunk_stats

    ch = _q_chunk_fixed(spark, sf_dir)
    s = chunk_stats(ch)
    return s.select(
        F.col("count"),
        F.round("avg_len", 6).alias("avg_len"),
        F.col("min_len"),
        F.col("max_len"),
    )


def _q_doc_len_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2/A3 — min/max/avg/p95 (exact interpolation) over doc lengths."""
    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    ln = F.length("text")
    return docs.agg(
        F.count(F.lit(1)).alias("count"),
        F.min(ln).alias("min_len"),
        F.max(ln).alias("max_len"),
        F.round(F.avg(ln), 6).alias("avg_len"),
        F.round(F.expr("percentile(length(text), 0.95)"), 6).alias("p95_len"),
    )


def _q_len_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4 — reference-exact histogram binning (analytics.py:118-135):
    integer step = max(1, ceil((max-min)/20)); value==max -> last bin,
    else min(19, (x-min) div step)."""
    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    ln = docs.select(F.length("text").alias("len"))
    stats = ln.agg(F.min("len").alias("vmin"), F.max("len").alias("vmax"))
    binned = ln.crossJoin(F.broadcast(stats)).select(
        F.when(F.col("len") == F.col("vmax"), F.lit(19))
        .otherwise(
            F.least(
                F.lit(19),
                F.expr(
                    "(len - vmin) div greatest(1, cast(ceil((vmax - vmin)/20.0) as int))"
                ).cast("int"),
            )
        )
        .alias("bin")
    )
    return binned.groupBy("bin").agg(F.count(F.lit(1)).alias("cnt")).orderBy("bin")


def _q_knn_ip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K2 — exact batch top-5 by inner product over the embeddings table;
    float64 accumulation, round(6) before ranking, doc_id tie-break."""
    from indexlab_spark.functions.vector import dot

    emb = load_tables(spark, sf_dir, ("embeddings",))["embeddings"]
    q = emb.filter(F.col("vec_id") < 16).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv")
    )
    scored = (
        F.broadcast(q)
        .crossJoin(emb.select(F.col("vec_id").alias("doc_id"), "embedding"))
        .select(
            "query_id",
            "doc_id",
            F.round(dot(F.col("qv"), F.col("embedding")), 6).alias("score"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("doc_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= 5)
        .select("query_id", "doc_id", "score", "rank")
    )


def _q_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L1/L2 — BM25Okapi scoring (k1=1.5, b=0.75, eps=0.25 negative-idf
    correction) over documents, top-10 per query; term stats materialized
    as DataFrames (operators/bm25.py), never rebuilt per request."""
    from indexlab_spark.operators.bm25 import bm25_search

    docs = load_tables(spark, sf_dir, ("documents",))["documents"]
    return bm25_search(docs, _queries_df(spark), k=_BM25_K).select(
        "query_id", "doc_id", "score", "rank"
    )


def _q_hybrid_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L3/L4 — RRF fusion (k_rrf=60, 1/(60+rank), rank 1-based) of the
    vector top-10 (embeddings table, inner product) and BM25 top-10 over
    documents, joined on doc id; fused top-5 per query."""
    from indexlab_spark.operators.bm25 import bm25_search
    from indexlab_spark.operators.fusion import rrf_fuse

    t = load_tables(spark, sf_dir, ("documents", "embeddings"))
    bm = bm25_search(t["documents"], _queries_df(spark), k=_BM25_K).select(
        "query_id", "doc_id", "rank"
    )
    emb = t["embeddings"]
    qv = emb.filter(F.col("vec_id").isin([q[0] for q in BM25_QUERIES])).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv")
    )
    from indexlab_spark.functions.vector import dot

    scored = (
        F.broadcast(qv)
        .crossJoin(emb.select(F.col("vec_id").alias("doc_id"), "embedding"))
        .select(
            "query_id",
            "doc_id",
            F.round(dot(F.col("qv"), F.col("embedding")), 6).alias("score"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("doc_id"))
    vec = (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= _BM25_K)
        .select("query_id", "doc_id", "rank")
    )
    fused = rrf_fuse(vec, bm, k=5)
    return fused.select("query_id", "doc_id", "fused_score", "rank")


def _eval_parts(spark: SparkSession, sf_dir: str):
    """Shared retrieval + gold construction for the eval queries.

    Retrieval: top-10 by inner product for queries vec_id < 64, self
    excluded. Gold: even query ids expect their rank-3 neighbor (always
    found), odd ids expect (id*7+3) mod n (usually a miss) — yields a
    mixed found/miss distribution with varied ranks, V2-V5 exercised.
    """
    from indexlab_spark.functions.vector import dot
    from indexlab_spark.operators.evaluate import eval_results

    emb = load_tables(spark, sf_dir, ("embeddings",))["embeddings"]
    n = emb.count()
    q = emb.filter(F.col("vec_id") < 64).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv")
    )
    scored = (
        F.broadcast(q)
        .crossJoin(emb.select(F.col("vec_id").alias("doc_id"), "embedding"))
        .filter(F.col("query_id") != F.col("doc_id"))
        .select(
            "query_id",
            "doc_id",
            F.round(dot(F.col("qv"), F.col("embedding")), 6).alias("score"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("doc_id"))
    hits = (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= 10)
        .select("query_id", "doc_id", "rank")
    )
    rank3 = hits.filter(F.col("rank") == 3).select(
        "query_id", F.col("doc_id").alias("neighbor_id")
    )
    gold = rank3.select(
        "query_id",
        F.when(F.col("query_id") % 2 == 0, F.col("neighbor_id"))
        .otherwise((F.col("query_id") * 7 + 3) % n)
        .cast("string")
        .alias("expected_id"),
    )
    results = eval_results(gold, hits, k=5)
    return results


def _q_eval_results(spark: SparkSession, sf_dir: str) -> DataFrame:
    """V1/V2/V6 — per-question found/rank over the batch kNN join."""
    res = _eval_parts(spark, sf_dir)
    return res.select(
        "query_id", "expected_id", "found", "rank",
        F.array_join("top_ids", ",").alias("top_ids_csv"),
    )


def _q_eval_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """V3/V4/V5 — recall@5 / MRR / NDCG in one aggregation (the
    reference's per-row loop, eval_api.py:220-271, collapsed)."""
    from indexlab_spark.operators.evaluate import eval_metrics

    m = eval_metrics(_eval_parts(spark, sf_dir))
    return m.select(
        "total",
        F.round("recall_at_k", 6).alias("recall_at_k"),
        F.round("mrr", 6).alias("mrr"),
        F.round("ndcg", 6).alias("ndcg"),
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "chunk_fixed": _q_chunk_fixed,
        "chunk_stats": _q_chunk_stats,
        "doc_len_stats": _q_doc_len_stats,
        "len_histogram": _q_len_histogram,
        "knn_ip": _q_knn_ip,
        "bm25_topk": _q_bm25_topk,
        "hybrid_rrf": _q_hybrid_rrf,
        "eval_results": _q_eval_results,
        "eval_metrics": _q_eval_metrics,
    }


_BM25_CTES = """
        docs AS (SELECT doc_id,
                        list_filter(regexp_split_to_array(lower(text), '\\s+'),
                                    x -> x <> '') AS toks
                 FROM documents),
        dl AS (SELECT doc_id, len(toks) AS dl FROM docs),
        g AS (SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM dl),
        tok AS (SELECT doc_id, unnest(toks) AS term FROM docs),
        tf AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY 1, 2),
        dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
        idf AS (SELECT term, ln(n_docs - df + 0.5) - ln(df + 0.5) AS idf_raw
                FROM dfreq, g),
        aidf AS (SELECT avg(idf_raw) AS avg_idf FROM idf),
        idf2 AS (SELECT term,
                        CASE WHEN idf_raw < 0 THEN 0.25 * avg_idf
                             ELSE idf_raw END AS idf_adj
                 FROM idf, aidf),
        qt AS (SELECT query_id, term, count(*) AS qtf
               FROM (SELECT query_id,
                            unnest(list_filter(
                                regexp_split_to_array(lower(query), '\\s+'),
                                x -> x <> '')) AS term
                     FROM {queries_values})
               GROUP BY 1, 2),
        bm_scores AS (
            SELECT q.query_id, t.doc_id,
                   round(sum(q.qtf * i.idf_adj * t.tf * (1.5 + 1)
                         / (t.tf + 1.5 * (1 - 0.75 + 0.75 * d.dl / g.avgdl))), 6)
                   AS score
            FROM qt q
            JOIN idf2 i USING (term)
            JOIN tf t USING (term)
            JOIN dl d ON t.doc_id = d.doc_id, g
            GROUP BY 1, 2),
        bm_ranked AS (
            SELECT query_id, doc_id, score,
                   CAST(row_number() OVER (PARTITION BY query_id
                        ORDER BY score DESC, doc_id ASC) AS INTEGER) AS rank
            FROM bm_scores)
"""

_EVAL_CTES = """
        q AS (SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
              FROM embeddings WHERE vec_id < 64),
        scored AS (SELECT q.query_id, e.vec_id AS doc_id,
                          round(list_dot_product(q.qv, CAST(e.embedding AS DOUBLE[])), 6) AS score
                   FROM q, embeddings e
                   WHERE q.query_id <> e.vec_id),
        hits AS (SELECT * FROM (
                    SELECT query_id, doc_id, score,
                           CAST(row_number() OVER (PARTITION BY query_id
                                ORDER BY score DESC, doc_id ASC) AS INTEGER) AS rank
                    FROM scored)
                 WHERE rank <= 10),
        n_emb AS (SELECT count(*) AS n FROM embeddings),
        gold AS (SELECT h.query_id,
                        CAST(CASE WHEN h.query_id % 2 = 0 THEN h.doc_id
                                  ELSE (h.query_id * 7 + 3) % n END AS VARCHAR)
                        AS expected_id
                 FROM hits h, n_emb WHERE h.rank = 3),
        per_q AS (SELECT g.query_id, g.expected_id,
                         min(CASE WHEN CAST(h.doc_id AS VARCHAR) = g.expected_id
                                  THEN h.rank END) AS rank,
                         string_agg(CAST(h.doc_id AS VARCHAR), ','
                                    ORDER BY h.rank) AS top_ids_csv
                  FROM gold g JOIN hits h ON g.query_id = h.query_id
                  WHERE h.rank <= 5
                  GROUP BY 1, 2),
        eval_rows AS (SELECT query_id, expected_id,
                             rank IS NOT NULL AS found, rank, top_ids_csv
                      FROM per_q)
"""


def oracle_sql() -> dict[str, str]:
    bm25_ctes = _BM25_CTES.format(queries_values=_bm25_values_sql())
    chunk_cte = f"""
        SELECT d.doc_id AS doc_no,
               CAST(k AS INTEGER) AS chunk_no,
               CAST(d.doc_id AS VARCHAR) || '#' || CAST(k AS VARCHAR) AS doc_id,
               substr(d.text, k * {_STRIDE} + 1, {CHUNK_SIZE}) AS text
        FROM (SELECT doc_id, text FROM documents WHERE length(text) > 0) d,
             unnest(generate_series(0,
                 greatest(0, CAST(ceil((length(d.text) - {CHUNK_SIZE}) / {_STRIDE}.0) AS INTEGER))
             )) AS t(k)
    """
    return {
        "chunk_fixed": f"SELECT doc_no, chunk_no, doc_id, text FROM ({chunk_cte})",
        "chunk_stats": f"""
            SELECT count(*) AS count,
                   round(avg(length(text)), 6) AS avg_len,
                   min(length(text)) AS min_len,
                   max(length(text)) AS max_len
            FROM ({chunk_cte})
        """,
        "doc_len_stats": """
            SELECT count(*) AS count,
                   min(length(text)) AS min_len,
                   max(length(text)) AS max_len,
                   round(avg(length(text)), 6) AS avg_len,
                   round(quantile_cont(length(text), 0.95), 6) AS p95_len
            FROM documents
        """,
        "len_histogram": """
            WITH l AS (SELECT length(text) AS len FROM documents),
                 s AS (SELECT min(len) AS vmin, max(len) AS vmax FROM l)
            SELECT CAST(CASE WHEN len = vmax THEN 19
                        ELSE least(19, (len - vmin) //
                             greatest(1, CAST(ceil((vmax - vmin) / 20.0) AS INTEGER)))
                   END AS INTEGER) AS bin,
                   count(*) AS cnt
            FROM l, s
            GROUP BY 1 ORDER BY 1
        """,
        "knn_ip": """
            WITH q AS (SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
                       FROM embeddings WHERE vec_id < 16),
                 s AS (SELECT q.query_id, e.vec_id AS doc_id,
                              round(list_dot_product(q.qv, CAST(e.embedding AS DOUBLE[])), 6) AS score
                       FROM q, embeddings e),
                 r AS (SELECT *, CAST(row_number() OVER
                              (PARTITION BY query_id ORDER BY score DESC, doc_id ASC)
                              AS INTEGER) AS rank
                       FROM s)
            SELECT query_id, doc_id, score, rank FROM r WHERE rank <= 5
        """,
        "bm25_topk": f"""
            WITH {bm25_ctes}
            SELECT query_id, doc_id, score, rank
            FROM bm_ranked WHERE rank <= {_BM25_K}
        """,
        "hybrid_rrf": f"""
            WITH {bm25_ctes},
            qv AS (SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS v
                   FROM embeddings
                   WHERE vec_id IN ({",".join(str(q[0]) for q in BM25_QUERIES)})),
            vscored AS (SELECT qv.query_id, e.vec_id AS doc_id,
                               round(list_dot_product(qv.v, CAST(e.embedding AS DOUBLE[])), 6) AS score
                        FROM qv, embeddings e),
            vranked AS (SELECT * FROM (
                           SELECT query_id, doc_id,
                                  CAST(row_number() OVER (PARTITION BY query_id
                                       ORDER BY score DESC, doc_id ASC) AS INTEGER) AS rank
                           FROM vscored)
                        WHERE rank <= {_BM25_K}),
            unioned AS (SELECT query_id, doc_id, rank FROM vranked
                        UNION ALL
                        SELECT query_id, doc_id, rank
                        FROM bm_ranked WHERE rank <= {_BM25_K}),
            fused AS (SELECT query_id, doc_id,
                             round(sum(1.0 / (60 + rank)), 9) AS fused_score
                      FROM unioned GROUP BY 1, 2),
            franked AS (SELECT query_id, doc_id, fused_score,
                               CAST(row_number() OVER (PARTITION BY query_id
                                    ORDER BY fused_score DESC, doc_id ASC) AS INTEGER) AS rank
                        FROM fused)
            SELECT query_id, doc_id, fused_score, rank FROM franked WHERE rank <= 5
        """,
        "eval_results": f"""
            WITH {_EVAL_CTES}
            SELECT query_id, expected_id, found, rank, top_ids_csv FROM eval_rows
        """,
        "eval_metrics": f"""
            WITH {_EVAL_CTES}
            SELECT count(*) AS total,
                   round(avg(CASE WHEN found THEN 1.0 ELSE 0.0 END), 6) AS recall_at_k,
                   round(avg(coalesce(1.0 / rank, 0.0)), 6) AS mrr,
                   round(avg(coalesce(1.0 / log2(rank + 1.0), 0.0)), 6) AS ndcg
            FROM eval_rows
        """,
    }
