"""Engine table schemas (SURVEY §1.3).

The reference's artifact set (<name>.faiss + .docs.json + .ids.json +
.manifest.json, written at app/ingest/pipeline.py:67-111 and
app/ingest/indexer.py:9-10) collapses into two tables:

- ``chunks``: one row per chunk, partitioned by (index_name, version);
  the embedding column makes the table itself the "flat index" (K1),
  and an optional cluster_id column is the IVF layout (K3).
- ``manifests``: one small row per (index_name, version) build.
"""

from __future__ import annotations

from pyspark.sql import types as T

CHUNKS_SCHEMA = T.StructType(
    [
        T.StructField("index_name", T.StringType(), False),
        T.StructField("version", T.StringType(), False),
        T.StructField("doc_no", T.LongType(), False),
        T.StructField("chunk_no", T.IntegerType(), False),
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("chunk_pos", T.LongType(), False),  # global 0-based position (FAISS internal id analog)
        T.StructField("text", T.StringType(), False),
        T.StructField("embedding", T.ArrayType(T.FloatType()), True),
        T.StructField("cluster_id", T.IntegerType(), True),  # IVF cell; null for flat
        T.StructField("source", T.StringType(), True),
    ]
)

MANIFESTS_SCHEMA = T.StructType(
    [
        T.StructField("index_name", T.StringType(), False),
        T.StructField("version", T.StringType(), False),
        T.StructField("dim", T.IntegerType(), False),
        T.StructField("count", T.LongType(), False),
        T.StructField("model", T.StringType(), False),
        T.StructField("normalize", T.BooleanType(), False),
        T.StructField("backend", T.StringType(), False),
        T.StructField("params", T.MapType(T.StringType(), T.StringType()), True),
        T.StructField(
            "chunking",
            T.StructType(
                [
                    T.StructField("mode", T.StringType()),
                    T.StructField("size", T.IntegerType()),
                    T.StructField("overlap", T.IntegerType()),
                ]
            ),
            True,
        ),
        T.StructField("metric", T.StringType(), False),  # always 'ip' (pipeline.py:105)
        T.StructField("created_at", T.TimestampType(), False),
        T.StructField(
            "sources",
            T.MapType(
                T.StringType(),
                T.StructType(
                    [
                        T.StructField("rows", T.LongType()),
                        T.StructField("sha256", T.StringType()),
                        T.StructField("added_at", T.TimestampType()),
                        T.StructField("stored_name", T.StringType()),
                    ]
                ),
            ),
            True,
        ),
    ]
)

GOLD_SCHEMA = T.StructType(
    [
        T.StructField("question", T.StringType(), False),
        T.StructField("expected_id", T.StringType(), False),
    ]
)

QUERIES_SCHEMA = T.StructType(
    [
        T.StructField("query_id", T.LongType(), False),
        T.StructField("query", T.StringType(), False),
    ]
)
