"""SemDeDup (cluster-then-pairwise semantic dedup) property tests.

No hash oracle exists (the clustering step is approximate), so the
contract is property-based, mirroring the LSH/IVF test strategy:
precision is exact by construction (pairs are verified with true
cosine), recall is floored on planted near-duplicates, and the keep
policy is cross-checked against the pair set.
"""

import pyspark.sql.functions as F
import pytest

from indexlab_spark.operators.dedup import (
    embedding_dup_pairs,
    semantic_dedup_keep,
    semantic_dedup_pairs,
)

THRESHOLD = 0.85
PLANT_OFFSET = 1_000_000


@pytest.fixture(scope="module")
def planted(tables):
    """Embeddings plus planted near-dups: every vec_id % 10 == 0 vector
    reappears (id + 1M) with its first 8 coords zeroed — cosine 0.83-0.99
    vs the original (same construction as the embedding_lsh gate query)."""
    emb = tables["embeddings"]
    v = F.col("embedding").cast("array<double>")
    base = emb.select("vec_id", v.alias("embedding"))
    dup = emb.filter(F.col("vec_id") % 10 == 0).select(
        (F.col("vec_id") + PLANT_OFFSET).alias("vec_id"),
        F.concat(
            F.array(*[F.lit(0.0)] * 8), F.slice(v, 9, 56)
        ).alias("embedding"),
    )
    return base.unionAll(dup).persist()


@pytest.fixture(scope="module")
def brute_pairs(planted):
    return {
        (r.id_a, r.id_b)
        for r in embedding_dup_pairs(planted, threshold=THRESHOLD).collect()
    }


@pytest.fixture(scope="module")
def sem_pairs(planted):
    return semantic_dedup_pairs(
        planted, n_clusters=8, threshold=THRESHOLD
    ).collect()


def test_semantic_pairs_subset_of_brute(sem_pairs, brute_pairs):
    got = {(r.id_a, r.id_b) for r in sem_pairs}
    assert got, "no semantic dup pairs found at all"
    assert got <= brute_pairs  # exact-cosine verification => perfect precision


def test_semantic_recall_floor_on_planted(sem_pairs, brute_pairs):
    planted_true = {
        (a, b) for (a, b) in brute_pairs if b == a + PLANT_OFFSET
    }
    assert planted_true, "planting produced no above-threshold pairs"
    got = {(r.id_a, r.id_b) for r in sem_pairs}
    recall = len(got & planted_true) / len(planted_true)
    # near-identical vectors should quantize to the same Lloyd cell
    assert recall >= 0.9, f"planted recall {recall:.3f}"


def test_semantic_pairs_deterministic(planted, sem_pairs):
    again = semantic_dedup_pairs(planted, n_clusters=8, threshold=THRESHOLD).collect()
    key = lambda r: (r.id_a, r.id_b, r.cos)  # noqa: E731
    assert sorted(map(key, again)) == sorted(map(key, sem_pairs))


def test_keep_policy_matches_pairs(planted, sem_pairs):
    kept = {
        r.vec_id
        for r in semantic_dedup_keep(
            planted, n_clusters=8, threshold=THRESHOLD
        ).collect()
    }
    all_ids = {r.vec_id for r in planted.select("vec_id").collect()}
    dropped_expected = {r.id_b for r in sem_pairs}
    assert kept == all_ids - dropped_expected
