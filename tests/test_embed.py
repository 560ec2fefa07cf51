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


def test_text_embed_knn_oracle_sql_matches_python_pipeline():
    """The r12 text_embed_knn oracle (_text_embed_knn_sql) cross-engine
    on synthetic documents: the DuckDB replay (from-first-principles
    crc32, bucket/sign sums, float32-cast normalization, dot + rank)
    must equal the pure-python pipeline built from the REAL operator
    pieces — chunk_fixed + _embed_hash_ngram + a float64 matmul with
    the knn_matmul (score DESC, doc_id ASC) rank."""
    import sys

    import duckdb
    import numpy as np

    sys.path.insert(0, ".")
    import __spark_entry__ as entry_mod
    from indexlab_spark.functions.embed import _embed_hash_ngram
    from indexlab_spark.operators.chunk import chunk_fixed

    docs = [
        (0, "alpha beta gamma " * 12),
        (1, "alpha beta gamma delta " * 9),
        (2, "totally unrelated words here about benchmarks " * 5),
        (3, "short doc"),
        (4, ("alpha beta gamma " * 12) + "epsilon"),
        (5, "numbers 123 and under_scores stay word chars"),
        (6, "punctuation, splits; tokens!  multiple   spaces"),
        (7, "gamma beta alpha " * 12),
        (8, "corpus only doc, never a query " * 4),
    ]
    dim, k = 64, 5

    # python pipeline
    chunks = []
    for did, t in docs:
        for i, c in enumerate(chunk_fixed(t, 100, 20)):
            chunks.append((f"{did}#{i}", c))
    corpus_mat = _embed_hash_ngram(
        [c for _, c in chunks], dim, normalize=True
    ).astype(np.float64)
    queries = [(did, t[:80]) for did, t in docs if did < 8]
    q_mat = _embed_hash_ngram(
        [t for _, t in queries], dim, normalize=True
    ).astype(np.float64)
    scores = q_mat @ corpus_mat.T
    # round-before-rank, the entry's (and oracle's) contract since the
    # raw-ranked gate flapped on BLAS batch-shape ulp noise
    r6 = np.floor(np.abs(scores) * 1e6 + 0.5) / 1e6 * np.sign(scores)
    ref = {}
    for qi, (qid, _) in enumerate(queries):
        order = sorted(
            range(len(chunks)),
            key=lambda j: (-r6[qi, j], chunks[j][0]),
        )[:k]
        for rank, j in enumerate(order, 1):
            ref[(qid, chunks[j][0])] = (round(r6[qi, j], 6), rank)

    con = duckdb.connect()
    con.execute("CREATE TABLE documents(doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO documents VALUES (?,?)", docs)
    got = {
        (r[0], r[1]): (r[2], r[3])
        for r in con.execute(
            entry_mod._text_embed_knn_sql(dim=dim, k=k)
        ).fetchall()
    }
    assert got == ref
