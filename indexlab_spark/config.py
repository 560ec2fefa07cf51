"""Engine configuration — mirrors the reference's settings surface.

Reference: /root/reference/app/core/config.py:5-27 (env-driven settings,
model/backend allowlists, defaults) and app/api/config.py:6-20 (exposure).
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field


ALLOWED_BACKENDS = ["flat", "ivf"]  # reference: core/config.py:25 ["faiss_flat","faiss_ivf"]
ALLOWED_CHUNK_MODES = ["fixed_chars", "sentences", "headings"]  # pipeline.py:25-32
DEFAULT_K = 5  # reference: core/config.py:23
DEFAULT_NORMALIZE = True  # reference: core/config.py:17
DEFAULT_NLIST = 1024  # reference: app/ingest/schema.py:15
DEFAULT_NPROBE = 10  # reference: app/ingest/schema.py:16
SEARCH_POOL_MIN = 50  # reference: answerless_search.py:238 max(k, 50)
EVAL_POOL_MIN = 10  # reference: eval_api.py:226 max(k, 10)
RRF_K = 60  # reference: app/ingest/hybrid.py:18
BM25_K1 = 1.5  # rank_bm25 BM25Okapi defaults (hybrid.py:4-6)
BM25_B = 0.75
DEFAULT_BM25_K = 50  # reference: answerless_search.py:27
PREVIEW_LEN_SEARCH = 220  # reference: answerless_search.py:161
PREVIEW_LEN_COMPARE = 200  # reference: answerless_search.py:293
PREVIEW_LEN_EVAL = 180  # reference: eval_api.py:188
HIGHLIGHT_MAX_SPANS = 8  # reference: answerless_search.py:150
HIST_BINS = 20  # reference: analytics.py:120
DEFAULT_DIM = 64  # FIXTURES.md F6 deterministic embedder dim


@dataclass
class IngestConfig:
    """Build configuration — reference app/ingest/schema.py:5-20.

    The unused HNSW params (M/ef*) are carried for manifest parity; no
    HNSW backend exists in the reference (SURVEY §2.10).
    """

    index_name: str
    text_column: str | None = None
    chunk_mode: str = "fixed_chars"
    chunk_size: int = 1000
    chunk_overlap: int = 150
    model: str = "hash-ngram-64"
    normalize: bool = DEFAULT_NORMALIZE
    backend: str = "flat"
    nlist: int = DEFAULT_NLIST
    nprobe: int = DEFAULT_NPROBE
    m: int = 32
    ef_construction: int = 200
    ef_search: int = 64
    seed: int = 42  # KMeans seed recorded in manifest (SURVEY §7.0.5)
    dim: int = DEFAULT_DIM
    params: dict = field(default_factory=dict)


@dataclass
class EngineConfig:
    """Warehouse layout for the engine's tables."""

    warehouse_dir: str = field(
        default_factory=lambda: os.environ.get(
            "INDEXLAB_WAREHOUSE", "/tmp/indexlab_warehouse"
        )
    )

    def chunks_path(self) -> str:
        return os.path.join(self.warehouse_dir, "chunks")

    def manifests_path(self) -> str:
        return os.path.join(self.warehouse_dir, "manifests")

    def centroids_path(self) -> str:
        return os.path.join(self.warehouse_dir, "centroids")

    def bm25_path(self) -> str:
        return os.path.join(self.warehouse_dir, "bm25")
