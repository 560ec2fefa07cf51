"""indexlab_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of NSKBpro/IndexLab ("vectordash").

The reference (read-only at /root/reference) is a single-process FastAPI +
pandas + FAISS app. This package re-expresses every operator it computes as
an idiomatic Spark DataFrame program designed for multi-executor scale:

- ingest: readers -> normalize -> chunk -> embed -> partitioned chunks table
  (reference: app/ingest/pipeline.py:35-185)
- search: batch exact/IVF kNN joins + BM25 + RRF hybrid
  (reference: app/api/answerless_search.py, app/ingest/backends/*)
- eval: recall@k / MRR / NDCG as one windowed aggregation
  (reference: app/api/eval_api.py:211-375)
- analytics: length stats, exact p95, reference-exact histogram
  (reference: app/api/analytics.py:86-213)
- scale extensions: dedup (exact/MinHash-LSH/SimHash/Jaccard), ANN
  similarity search, text analysis, multimodal column plumbing.
"""

__version__ = "0.1.0"

from indexlab_spark.session import get_spark  # noqa: F401
