"""E1/E2 deterministic embedder tests (FIXTURES.md F6)."""

import numpy as np

from indexlab_spark.functions.embed import embed_texts


def test_deterministic_and_shape():
    texts = ["power requirements for nimbus one", "thermal envelope", ""]
    a = embed_texts(texts, "hash-ngram-64", True)
    b = embed_texts(texts, "hash-ngram-64", True)
    assert a.shape == (3, 64)
    assert a.dtype == np.float32
    np.testing.assert_array_equal(a, b)


def test_normalize_unit_norm():
    a = embed_texts(["some text here"], "hash-ngram-64", True)
    assert abs(np.linalg.norm(a[0]) - 1.0) < 1e-6


def test_empty_text_zero_vector():
    a = embed_texts([""], "hash-ngram-64", True)
    assert np.all(a == 0.0)


def test_unnormalized_counts():
    a = embed_texts(["aaa aaa aaa"], "hash-ngram-64", False)
    # one distinct token "aaa" repeated 3x -> ngram counts are multiples of 3
    nz = a[np.abs(a) > 0]
    assert len(nz) > 0
    assert np.all(np.abs(nz) % 3 == 0)


def test_distinct_texts_distinct_vectors():
    a = embed_texts(["alpha beta gamma", "delta epsilon zeta"], "hash-ngram-64", True)
    assert not np.allclose(a[0], a[1])


def test_dim_from_model_name():
    a = embed_texts(["x y z"], "hash-ngram-128", True)
    assert a.shape == (1, 128)


def test_spark_udf_matches_local(spark):
    from indexlab_spark.functions.embed import with_embedding

    texts = ["spark group query row", "filter window join", "merge sort scan"]
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    rows = with_embedding(df, model="hash-ngram-64").orderBy("text").collect()
    local = embed_texts(sorted(texts), "hash-ngram-64", True)
    got = np.array([r["embedding"] for r in rows], dtype=np.float32)
    np.testing.assert_allclose(got, local, rtol=0, atol=0)
