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


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "chunk_fixed": _q_chunk_fixed,
        "chunk_stats": _q_chunk_stats,
        "doc_len_stats": _q_doc_len_stats,
        "len_histogram": _q_len_histogram,
        "knn_ip": _q_knn_ip,
    }


def oracle_sql() -> dict[str, str]:
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
    }
