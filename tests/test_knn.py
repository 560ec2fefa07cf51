"""K2/K3/K4 kNN tests against numpy brute force (SURVEY §5 property tests)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from indexlab_spark.operators.knn import build_ivf, ivf_search, knn_join, knn_matmul

K = 5
N_QUERIES = 8


@pytest.fixture(scope="module")
def emb(tables):
    return tables["embeddings"].select(
        F.col("vec_id"), F.col("embedding"), F.col("label")
    )


@pytest.fixture(scope="module")
def queries(emb):
    return (
        emb.filter(F.col("vec_id") < N_QUERIES)
        .select(F.col("vec_id").alias("query_id"), F.col("embedding").alias("qvec"))
    )


@pytest.fixture(scope="module")
def numpy_truth(emb):
    pdf = emb.orderBy("vec_id").toPandas()
    mat = np.array(pdf["embedding"].tolist(), dtype=np.float64)
    ids = pdf["vec_id"].to_numpy()
    q = mat[:N_QUERIES]
    scores = q @ mat.T
    truth = {}
    for qi in range(N_QUERIES):
        # sort by (-score, id) to mirror the deterministic tie-break
        order = sorted(range(len(ids)), key=lambda j: (-scores[qi, j], ids[j]))[:K]
        truth[qi] = [(int(ids[j]), scores[qi, j]) for j in order]
    return truth


def _check(rows, truth):
    got = {}
    for r in rows:
        got.setdefault(r["query_id"], []).append((int(r["doc_id"]), r["score"], r["rank"]))
    assert set(got) == set(truth)
    for qid, hits in got.items():
        hits.sort(key=lambda h: h[2])
        expect = truth[qid]
        assert [h[0] for h in hits] == [e[0] for e in expect], f"q{qid} ids"
        for (got_id, got_s, _), (_, exp_s) in zip(hits, expect):
            assert abs(got_s - exp_s) < 1e-9, f"q{qid} id {got_id}"


def test_knn_join_exact(emb, queries, numpy_truth):
    out = knn_join(
        queries,
        emb.select(F.col("vec_id").cast("string").alias("doc_id"), "embedding"),
        K,
        tie_col=None,
    )
    # doc_id is a string; numeric tie-break parity needs numeric sort.
    out = knn_join(
        queries,
        emb.select(F.col("vec_id").alias("doc_id"), "embedding"),
        K,
    )
    _check(out.collect(), numpy_truth)


def test_knn_matmul_exact(spark, emb, queries, numpy_truth):
    out = knn_matmul(
        spark,
        queries,
        emb.select(F.col("vec_id").alias("doc_id"), "embedding"),
        K,
    )
    _check(out.collect(), numpy_truth)


def test_knn_matmul_equals_join(spark, emb, queries):
    corpus = emb.select(F.col("vec_id").alias("doc_id"), "embedding")
    a = knn_join(queries, corpus, K).select("query_id", "doc_id", "rank")
    b = knn_matmul(spark, queries, corpus, K).select("query_id", "doc_id", "rank")
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_ivf_recall_floor(spark, emb, queries, numpy_truth):
    corpus = emb.select(F.col("vec_id").alias("doc_id"), "embedding")
    # NOTE: the driver's embeddings table is random unit vectors (no label
    # structure, measured within-label cos ~= across-label), the worst case
    # for IVF — so the property bound probes 50% of cells. Real text
    # embeddings (clustered) hit BASELINE's 0.8 floor at nprobe/nlist ~ 4%.
    assigned, centroids = build_ivf(corpus, nlist=16, seed=42)
    out = ivf_search(queries, assigned, centroids, K, nprobe=8)
    got = {}
    for r in out.collect():
        got.setdefault(r["query_id"], set()).add(int(r["doc_id"]))
    hits = total = 0
    for qid, expect in numpy_truth.items():
        expect_ids = {e[0] for e in expect}
        total += len(expect_ids)
        hits += len(expect_ids & got.get(qid, set()))
    recall = hits / total
    # BASELINE.md quality floor: IVF recall@5 >= 0.8 vs flat
    assert recall >= 0.8, f"IVF recall {recall}"


def test_ivf_nprobe_full_equals_flat(spark, emb, queries, numpy_truth):
    corpus = emb.select(F.col("vec_id").alias("doc_id"), "embedding")
    assigned, centroids = build_ivf(corpus, nlist=8, seed=42)
    out = ivf_search(queries, assigned, centroids, K, nprobe=8)
    _check(out.collect(), numpy_truth)


def test_ivf_partitioned_layout_prunes(spark, emb, queries, numpy_truth, tmp_path):
    """Partitioned-by-cluster_id layout: the scan reads ONLY probed cell
    directories (physical partition pruning), results == unpartitioned."""
    from indexlab_spark.operators.knn import (
        ivf_search_pruned,
        write_ivf_partitioned,
    )

    corpus = emb.select(F.col("vec_id").alias("doc_id"), "embedding")
    assigned, centroids = build_ivf(corpus, nlist=8, seed=42)
    path = str(tmp_path / "ivf_chunks")
    write_ivf_partitioned(assigned, path)

    out = ivf_search_pruned(spark, queries, path, centroids, K, nprobe=3)
    baseline = ivf_search(queries, assigned, centroids, K, nprobe=3)
    assert sorted(map(tuple, out.select("query_id", "doc_id", "rank").collect())) == \
        sorted(map(tuple, baseline.select("query_id", "doc_id", "rank").collect()))

    # physical evidence: the cluster_id predicate becomes a partition
    # filter in the scan (inputFiles() reflects the pre-pruning index,
    # so inspect the executed plan)
    probed = spark.read.parquet(path).filter(F.col("cluster_id").isin([0, 3]))
    plan = probed._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "cluster_id" in plan.split(
        "PartitionFilters"
    )[1].split("]")[0]
    # and the filtered scan counts rows of only those cells
    per_cell = dict(
        assigned.groupBy("cluster_id").count().rdd.map(tuple).collect()
    )
    assert probed.count() == per_cell.get(0, 0) + per_cell.get(3, 0)


def test_knn_join_blocked_equals_brute(spark, emb, queries, numpy_truth):
    """Large x large blocked similarity join == brute-force result."""
    from indexlab_spark.operators.knn import knn_join_blocked

    corpus = emb.select(F.col("vec_id").alias("doc_id"), "embedding")
    out = knn_join_blocked(queries, corpus, K, right_blocks=4)
    _check(out.collect(), numpy_truth)


def test_pq_codes_shape(spark, emb):
    from indexlab_spark.operators.knn import build_pq

    corpus = emb.select(F.col("vec_id").alias("doc_id"), "embedding")
    codes_df, books_df = build_pq(corpus, m=8, nbits=6, seed=42)
    row = codes_df.select("pq_code").first()
    assert len(row["pq_code"]) == 8
    assert all(0 <= c < 64 for c in row["pq_code"])
    assert books_df.count() == 8 * 64
    # deterministic across rebuilds
    codes2, _ = build_pq(corpus, m=8, nbits=6, seed=42)
    a = {r["doc_id"]: r["pq_code"] for r in codes_df.collect()}
    b = {r["doc_id"]: r["pq_code"] for r in codes2.collect()}
    assert a == b


def test_pq_search_recall_floor(spark, emb, queries, numpy_truth):
    from indexlab_spark.operators.knn import build_pq, pq_search

    corpus = emb.select(F.col("vec_id").alias("doc_id"), "embedding")
    codes_df, books_df = build_pq(corpus, m=8, nbits=6, seed=42)
    out = pq_search(spark, queries, codes_df, books_df, K, rerank=8)
    got = {}
    for r in out.collect():
        got.setdefault(r["query_id"], set()).add(int(r["doc_id"]))
    hits = total = 0
    for qid, expect in numpy_truth.items():
        expect_ids = {e[0] for e in expect}
        total += len(expect_ids)
        hits += len(expect_ids & got.get(qid, set()))
    recall = hits / total
    # ADC + exact rerank on 8k candidates: BASELINE-style quality floor
    assert recall >= 0.8, f"PQ recall {recall}"


def test_pq_rerank_scores_are_exact(spark, emb, queries, numpy_truth):
    """Reranked survivor scores must equal the exact inner product."""
    from indexlab_spark.operators.knn import build_pq, pq_search

    corpus = emb.select(F.col("vec_id").alias("doc_id"), "embedding")
    codes_df, books_df = build_pq(corpus, m=8, nbits=6, seed=42)
    out = pq_search(spark, queries, codes_df, books_df, K, rerank=8)
    truth_scores = {
        (qid, did): s for qid, hits in numpy_truth.items() for did, s in hits
    }
    for r in out.collect():
        key = (r["query_id"], int(r["doc_id"]))
        if key in truth_scores:
            assert abs(r["score"] - truth_scores[key]) < 1e-9


def test_knn_matmul_oversize_routes_to_blocked(spark, emb, queries, numpy_truth):
    """Driver-collect guard: a query frame larger than max_collect_rows
    must NOT be collected — knn_matmul routes to knn_join_blocked and
    still returns exact top-k."""
    corpus = emb.select(F.col("vec_id").alias("doc_id"), "embedding")
    out = knn_matmul(spark, queries, corpus, K, max_collect_rows=N_QUERIES - 1)
    plan = out._jdf.queryExecution().executedPlan().toString()
    # the blocked path is recognizable: its internal column names survive
    # into the plan, and there is no broadcast of a collected query matrix
    assert "_blk" in plan or "_lid" in plan, "expected the blocked-join plan"
    _check(out.collect(), numpy_truth)


def test_knn_matmul_oversize_normalized_routes_to_blocked(spark, emb, queries):
    """normalize_queries must survive the fallback (Spark-side l2 norm)."""
    corpus = emb.select(F.col("vec_id").alias("doc_id"), "embedding")
    a = knn_matmul(
        spark, queries, corpus, K, normalize_queries=True,
        max_collect_rows=N_QUERIES - 1,
    ).select("query_id", "doc_id", "rank")
    b = knn_matmul(
        spark, queries, corpus, K, normalize_queries=True,
    ).select("query_id", "doc_id", "rank")
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_pq_search_oversize_routes_to_blocked(spark, emb, queries, numpy_truth):
    """pq_search with an over-large query frame and raw vectors present
    falls back to the exact blocked join (a recall superset of ADC)."""
    from indexlab_spark.operators.knn import build_pq, pq_search

    corpus = emb.select(F.col("vec_id").alias("doc_id"), "embedding")
    codes, books = build_pq(corpus, m=8, nbits=4, seed=42)
    out = pq_search(
        spark, queries, codes, books, K, max_collect_rows=N_QUERIES - 1
    )
    _check(out.collect(), numpy_truth)


def test_pq_search_oversize_without_vectors_raises(spark, emb, queries):
    from indexlab_spark.operators.knn import build_pq, pq_search

    corpus = emb.select(F.col("vec_id").alias("doc_id"), "embedding")
    codes, books = build_pq(corpus, m=8, nbits=4, seed=42)
    bare = codes.drop("embedding")
    with pytest.raises(ValueError, match="max_collect_rows"):
        pq_search(spark, queries, bare, books, K, max_collect_rows=N_QUERIES - 1)


def test_ivf_pruned_oversize_routes_to_blocked(
    spark, emb, queries, numpy_truth, tmp_path
):
    from indexlab_spark.operators.knn import (
        ivf_search_pruned, write_ivf_partitioned,
    )

    corpus = emb.select(F.col("vec_id").alias("doc_id"), "embedding")
    assigned, centroids = build_ivf(corpus, nlist=16, seed=42)
    path = str(tmp_path / "ivf_guard")
    write_ivf_partitioned(assigned, path)
    out = ivf_search_pruned(
        spark, queries, path, centroids, K, nprobe=4,
        max_collect_rows=N_QUERIES - 1,
    )
    # exact blocked fallback == brute-force truth (not the nprobe subset)
    _check(out.collect(), numpy_truth)


def test_sq8_roundtrip_and_recall(spark, emb, queries, numpy_truth):
    """SQ8 keeps per-dimension 8-bit resolution: with exact rerank the
    top-K should match brute force almost everywhere (much tighter than
    PQ's floor), and rerank scores must be exact."""
    from indexlab_spark.operators.knn import build_sq8, sq8_search

    corpus = emb.select(F.col("vec_id").alias("doc_id"), "embedding")
    codes_df, params_df = build_sq8(corpus, seed=42)
    # codes are dim-length ints in [0, 255]
    row = codes_df.select("sq_code").first()
    assert len(row["sq_code"]) == 64
    assert all(0 <= c <= 255 for c in row["sq_code"])
    out = sq8_search(spark, queries, codes_df, params_df, K, rerank=4)
    got = {}
    for r in out.collect():
        got.setdefault(r["query_id"], []).append(
            (int(r["doc_id"]), r["score"], r["rank"])
        )
    hits = total = 0
    for qid, expect in numpy_truth.items():
        expect_ids = {e[0] for e in expect}
        total += len(expect_ids)
        hits += len(expect_ids & {h[0] for h in got[qid]})
        # exact rerank -> scores of true hits match brute force
        exp = dict((e[0], e[1]) for e in expect)
        for did, s, _ in got[qid]:
            if did in exp:
                assert abs(s - exp[did]) < 1e-9
    recall = hits / total
    assert recall >= 0.95, f"SQ8 recall {recall}"


def test_sq8_oversize_routes_to_blocked(spark, emb, queries, numpy_truth):
    from indexlab_spark.operators.knn import build_sq8, sq8_search

    corpus = emb.select(F.col("vec_id").alias("doc_id"), "embedding")
    codes_df, params_df = build_sq8(corpus, seed=42)
    out = sq8_search(
        spark, queries, codes_df, params_df, K, max_collect_rows=2
    )
    # exact fallback == brute force truth
    _check(out.collect(), numpy_truth)


def test_knn_graph_union_mutual_and_clusters(spark, emb):
    """Union graph ⊇ mutual graph; every mutual edge appears in both
    endpoints' top-k; + connected_components gives single-linkage-style
    clusters where planted near-dup pairs co-cluster."""
    from indexlab_spark.operators.dedup import connected_components
    from indexlab_spark.operators.knn import knn_graph

    sl = emb.filter(F.col("vec_id") < 200).select("vec_id", "embedding")
    union = knn_graph(sl, k=3).collect()
    mutual = knn_graph(sl, k=3, mutual=True).collect()
    u_pairs = {(r["id_a"], r["id_b"]) for r in union}
    m_pairs = {(r["id_a"], r["id_b"]) for r in mutual}
    assert m_pairs <= u_pairs
    assert all(r["n_directions"] == 2 for r in mutual)
    assert all(r["id_a"] < r["id_b"] for r in union)
    assert 0 < len(m_pairs) < len(u_pairs)
    # every vertex contributes at most k union-edges as the QUERY side,
    # so |union| <= |V| * k
    assert len(u_pairs) <= 200 * 3
    comp = connected_components(
        knn_graph(sl, k=3, mutual=True).select("id_a", "id_b"),
        sl.select(F.col("vec_id").alias("id")),
    )
    n_clusters = comp.select("cluster").distinct().count()
    assert 1 < n_clusters < 200  # nontrivial structure, not one blob


def test_ivf_append_assignment_consistency_and_search_parity(spark, tables):
    """A vector gets the SAME cluster_id whether it was in the original
    build's assign pass or arrives later via ivf_append with the same
    centroids — so append+search == rebuild-with-same-centroids+search
    exactly."""
    from pyspark.sql import functions as FN

    from indexlab_spark.operators.knn import build_ivf, ivf_append, ivf_search

    emb = tables["embeddings"]
    corpus = emb.select(FN.col("vec_id").alias("doc_id"), "embedding")
    old = corpus.filter(FN.col("doc_id") % 2 == 0)
    new = corpus.filter(FN.col("doc_id") % 2 == 1)
    assigned_old, centroids = build_ivf(old, nlist=8, seed=7)
    appended = ivf_append(new, centroids)
    # consistency: re-assigning the appended rows through the SAME
    # centroid set (numpy argmin) matches the operator's assignment
    import numpy as np

    cents = sorted(centroids.collect(), key=lambda r: r["cluster_id"])
    centers = np.array([r["centroid"] for r in cents])
    ids = np.array([r["cluster_id"] for r in cents])
    for r in appended.collect():
        d = ((centers - np.array(r["embedding"])) ** 2).sum(1)
        assert r["cluster_id"] == ids[d.argmin()], r["doc_id"]
    # search parity: union of (build half + appended half) == one assign
    # pass over the full corpus with the same centroids
    combined = assigned_old.unionByName(appended)
    full = ivf_append(corpus, centroids)  # same centroids, full corpus
    q = emb.filter(FN.col("vec_id") < 8).select(
        FN.col("vec_id").alias("query_id"), FN.col("embedding").alias("qvec")
    )
    a = sorted(map(tuple, ivf_search(q, combined, centroids, k=5, nprobe=3)
                   .select("query_id", "doc_id", "rank").collect()))
    b = sorted(map(tuple, ivf_search(q, full, centroids, k=5, nprobe=3)
                   .select("query_id", "doc_id", "rank").collect()))
    assert a == b and len(a) > 0


def test_pq_and_sq8_append_encode_parity(spark, tables):
    """Appending a batch through existing codebooks/params produces the
    EXACT codes the original build pass would have assigned — the
    additive-state contract shared with ivf_append/bm25_refresh."""
    from pyspark.sql import functions as FN

    from indexlab_spark.operators.knn import (
        build_pq,
        build_sq8,
        pq_append,
        sq8_append,
    )

    emb = tables["embeddings"]
    corpus = emb.select(FN.col("vec_id").alias("doc_id"), "embedding")
    old = corpus.filter(FN.col("doc_id") % 2 == 0)
    new = corpus.filter(FN.col("doc_id") % 2 == 1)

    _, books = build_pq(old, m=8, nbits=4, seed=5)
    appended = {r["doc_id"]: r["pq_code"] for r in pq_append(new, books).collect()}
    # re-encoding the FULL corpus with the same books must agree on the
    # appended half
    full = {r["doc_id"]: r["pq_code"] for r in pq_append(corpus, books).collect()}
    assert appended and all(full[d] == c for d, c in appended.items())

    _, params = build_sq8(old, seed=5)
    ap = {r["doc_id"]: r["sq_code"] for r in sq8_append(new, params).collect()}
    fl = {r["doc_id"]: r["sq_code"] for r in sq8_append(corpus, params).collect()}
    assert ap and all(fl[d] == c for d, c in ap.items())
    # codes are valid uint8 / nbits ranges
    assert all(0 <= v <= 255 for c in ap.values() for v in c)


def test_ivf_append_physical_partitioned_layout(spark, tables, tmp_path):
    """The documented grow-in-place flow: build half -> write partitioned
    -> append the other half with mode='append' -> the on-disk table
    equals the in-memory union, cluster directories stay consistent, and
    the partition-pruned search over the path matches search over the
    union frame."""
    import os

    from pyspark.sql import functions as FN

    from indexlab_spark.operators.knn import (
        build_ivf,
        ivf_append,
        ivf_search,
        ivf_search_pruned,
        write_ivf_partitioned,
    )

    emb = tables["embeddings"]
    corpus = emb.select(FN.col("vec_id").alias("doc_id"), "embedding")
    old = corpus.filter(FN.col("doc_id") % 2 == 0)
    new = corpus.filter(FN.col("doc_id") % 2 == 1)
    assigned_old, centroids = build_ivf(old, nlist=8, seed=7)
    path = str(tmp_path / "ivf")
    write_ivf_partitioned(assigned_old, path)
    appended = ivf_append(new, centroids)
    write_ivf_partitioned(appended, path, mode="append")

    on_disk = spark.read.parquet(path)
    assert on_disk.count() == corpus.count()
    # every cluster directory holds exactly the union's rows for it
    union = assigned_old.unionByName(appended)
    a = sorted((r["doc_id"], r["cluster_id"]) for r in on_disk.collect())
    b = sorted((r["doc_id"], r["cluster_id"]) for r in union.collect())
    assert a == b
    assert any(d.startswith("cluster_id=") for d in os.listdir(path))

    q = emb.filter(FN.col("vec_id") < 8).select(
        FN.col("vec_id").alias("query_id"), FN.col("embedding").alias("qvec")
    )
    got = sorted(map(tuple, ivf_search_pruned(
        spark, q, path, centroids, k=5, nprobe=3
    ).select("query_id", "doc_id", "rank").collect()))
    exp = sorted(map(tuple, ivf_search(
        q, union, centroids, k=5, nprobe=3
    ).select("query_id", "doc_id", "rank").collect()))
    assert got == exp and len(got) > 0


def test_ivfpq_recall_floor_and_exhaustive(spark, emb, queries, numpy_truth):
    from indexlab_spark.operators.knn import build_ivfpq, ivfpq_search

    corpus = emb.select(F.col("vec_id").alias("doc_id"), "embedding")
    codes, cents, books = build_ivfpq(corpus, nlist=8, m=8, nbits=6, seed=42)
    # exhaustive probe + exact rerank: residual coding should beat the
    # plain-PQ 0.8 floor on the same random-vector corpus
    out = ivfpq_search(
        spark, queries, codes, cents, books, K, nprobe=8, rerank=8
    )
    got = {}
    for r in out.collect():
        got.setdefault(r["query_id"], []).append(
            (r["rank"], int(r["doc_id"]), r["score"])
        )
    hits = total = 0
    for qid, truth in numpy_truth.items():
        ids = {d for _, d, _ in got[qid]}
        hits += len(ids & {d for d, _ in truth})
        total += K
    assert hits / total >= 0.9, got
    # partial probe still clears the random-vector floor (worst case
    # for IVF — see test_ivf_recall_floor's note)
    out2 = ivfpq_search(
        spark, queries, codes, cents, books, K, nprobe=4, rerank=8
    )
    got2 = {}
    for r in out2.collect():
        got2.setdefault(r["query_id"], set()).add(int(r["doc_id"]))
    hits2 = sum(
        len(got2.get(q, set()) & {d for d, _ in t})
        for q, t in numpy_truth.items()
    )
    assert hits2 / total >= 0.4, got2


def test_ivfpq_append_equals_rebuild_encoding(spark, emb):
    from indexlab_spark.operators.knn import build_ivfpq, ivfpq_append

    corpus = emb.select(F.col("vec_id").alias("doc_id"), "embedding")
    codes, cents, books = build_ivfpq(corpus, nlist=8, m=8, nbits=6, seed=42)
    batch = corpus.filter(F.col("doc_id") < 20)
    appended = ivfpq_append(batch, cents, books)
    want = {
        r["doc_id"]: (r["cluster_id"], tuple(r["pq_code"]))
        for r in codes.filter(F.col("doc_id") < 20).collect()
    }
    got = {
        r["doc_id"]: (r["cluster_id"], tuple(r["pq_code"]))
        for r in appended.collect()
    }
    assert got == want


def test_ivfpq_search_empty_queries(spark, emb):
    from indexlab_spark.operators.knn import build_ivfpq, ivfpq_search

    corpus = emb.select(F.col("vec_id").alias("doc_id"), "embedding")
    codes, cents, books = build_ivfpq(corpus, nlist=4, m=4, nbits=4, seed=1)
    empty_q = spark.createDataFrame(
        [], "query_id bigint, qvec array<float>"
    )
    assert ivfpq_search(spark, empty_q, codes, cents, books, K).count() == 0


# ----------------------------------------------------- fixed-iteration Lloyd
# r12: the SQL-replayable deterministic variant behind the oracle-backed
# embedding_kmeans / similarity_ivf gate entries (r11 VERDICT item 4).


def test_lloyd_fixed_deterministic_and_matches_contract(spark):
    """The fit is a pure function of the data: replay the contract in
    numpy (init = k smallest ids, argmin sq-L2 first-min, 6dp-rounded
    means, empty cells keep centers) and require exact equality."""
    from indexlab_spark.operators.knn import lloyd_fixed_centroids

    rng = np.random.default_rng(7)
    vecs = rng.normal(size=(40, 6)).round(3)
    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id int, embedding array<double>",
    )
    k, iters = 4, 3
    got = {
        r["cluster_id"]: list(r["centroid"])
        for r in lloyd_fixed_centroids(df, "embedding", "vec_id", k, iters)
        .collect()
    }

    centers = vecs[:k].astype(np.float64).copy()
    for _ in range(iters):
        d = ((vecs[:, None, :] - centers[None, :, :]) ** 2).sum(2)
        a = d.argmin(1)  # numpy argmin = first minimum
        for c in range(k):
            members = vecs[a == c]
            if len(members):
                centers[c] = np.round(members.mean(0), 6)
    want = {c: [float(x) for x in centers[c]] for c in range(k)}
    assert got == want

    got2 = {
        r["cluster_id"]: list(r["centroid"])
        for r in lloyd_fixed_centroids(df, "embedding", "vec_id", k, iters)
        .collect()
    }
    assert got2 == got  # bit-for-bit rerun determinism


def test_lloyd_fixed_empty_cell_keeps_center_and_first_min_tie(spark):
    """Duplicate init vectors: every point ties to the LOWER cluster id
    (first-minimum), so the duplicate cell goes empty and must keep its
    init center verbatim."""
    from indexlab_spark.operators.knn import lloyd_fixed_centroids

    rows = [
        (0, [0.0, 0.0]),
        (1, [0.0, 0.0]),  # identical to init 0 -> cell 1 empties
        (2, [10.0, 10.0]),
        (3, [0.1, -0.1]),
        (4, [10.2, 9.8]),
    ]
    df = spark.createDataFrame(rows, "vec_id int, embedding array<double>")
    cents = {
        r["cluster_id"]: list(r["centroid"])
        for r in lloyd_fixed_centroids(df, "embedding", "vec_id", 3, 1)
        .collect()
    }
    assert cents[1] == [0.0, 0.0]  # empty cell retained its init center
    # cell 0 got both zero points (row 1 ties to the LOWER id) + row 3
    assert cents[0] == [
        round((0.0 + 0.0 + 0.1) / 3, 6),
        round((0.0 + 0.0 - 0.1) / 3, 6),
    ]
    assert cents[2] == [round(10.1, 6), round(9.9, 6)]
    # a second round moves points BACK to the retained duplicate center
    # (cell 1 is now strictly nearer to the exact-zero rows than the
    # drifted cell 0) — pin that the retention participates in later
    # rounds rather than going dead:
    cents2 = {
        r["cluster_id"]: list(r["centroid"])
        for r in lloyd_fixed_centroids(df, "embedding", "vec_id", 3, 2)
        .collect()
    }
    assert cents2[1] == [0.0, 0.0]
    assert cents2[0] == [0.1, -0.1]


def test_lloyd_fixed_k_exceeds_corpus_raises(spark):
    from indexlab_spark.operators.knn import lloyd_fixed_centroids

    df = spark.createDataFrame(
        [(0, [1.0]), (1, [2.0])], "vec_id int, embedding array<double>"
    )
    with pytest.raises(ValueError, match="exceeds corpus"):
        lloyd_fixed_centroids(df, "embedding", "vec_id", k=5, iters=1)


def test_build_ivf_fixed_assignment_is_nearest_and_codegen(spark, emb):
    """Assignment must be the brute-force nearest (rounded) center with
    first-min ties, and the assign pass must be pure codegen — no
    Python evaluator nodes in the plan."""
    from indexlab_spark.operators.knn import build_ivf_fixed

    corpus = emb.select(F.col("vec_id").alias("doc_id"), "embedding")
    assigned, centroids = build_ivf_fixed(corpus, nlist=8, iters=2,
                                          id_col="doc_id")
    plan = assigned._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan and "FlatMapGroupsInPandas" not in plan

    cents = np.array(
        [r["centroid"] for r in centroids.orderBy("cluster_id").collect()]
    )
    vecs = {
        r["doc_id"]: np.array(r["embedding"], dtype=np.float64)
        for r in corpus.collect()
    }
    got = {r["doc_id"]: r["cluster_id"] for r in assigned.collect()}
    for doc_id, v in vecs.items():
        d = ((cents - v[None, :]) ** 2).sum(1)
        assert got[doc_id] == int(d.argmin()), doc_id


def test_kmeans_summary_fixed_matches_numpy_replay(spark):
    from indexlab_spark.operators.knn import kmeans_summary_fixed

    rng = np.random.default_rng(11)
    vecs = rng.normal(size=(30, 4)).round(3)
    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id int, embedding array<double>",
    )
    k, iters = 3, 3
    out = {
        r["cluster_id"]: (r["n"], r["inertia"], r["centroid_norm"])
        for r in kmeans_summary_fixed(df, "embedding", "vec_id", k, iters)
        .collect()
    }

    centers = vecs[:k].astype(np.float64).copy()
    for _ in range(iters):
        a = ((vecs[:, None, :] - centers[None, :, :]) ** 2).sum(2).argmin(1)
        for c in range(k):
            m = vecs[a == c]
            if len(m):
                centers[c] = np.round(m.mean(0), 6)
    a = ((vecs[:, None, :] - centers[None, :, :]) ** 2).sum(2).argmin(1)
    for c in range(k):
        m = vecs[a == c]
        if not len(m):
            assert c not in out
            continue
        n, inertia, norm = out[c]
        assert n == len(m)
        assert inertia == pytest.approx(
            round(float(((m - centers[c]) ** 2).sum()), 6), abs=2e-6
        )
        assert norm == pytest.approx(
            round(float(np.sqrt((centers[c] ** 2).sum())), 6), abs=2e-6
        )


def test_sq8_exact_range_matches_full_corpus_sample(spark, emb):
    """r12: with the corpus smaller than sample_rows the sampled path
    already sees every vector, so exact_range=True must produce the
    IDENTICAL params and codes — the upgrade changes where the ranges
    come from, never what they are."""
    from indexlab_spark.operators.knn import build_sq8

    corpus = emb.select(F.col("vec_id").alias("doc_id"), "embedding")
    c_s, p_s = build_sq8(corpus, seed=42)
    c_e, p_e = build_sq8(corpus, exact_range=True)
    ps = {r["dim_idx"]: (r["vmin"], r["vmax"]) for r in p_s.collect()}
    pe = {r["dim_idx"]: (r["vmin"], r["vmax"]) for r in p_e.collect()}
    assert pe == ps
    cs = {r["doc_id"]: tuple(r["sq_code"]) for r in c_s.collect()}
    ce = {r["doc_id"]: tuple(r["sq_code"]) for r in c_e.collect()}
    assert ce == cs


def test_ivf_append_fixed_equals_build_assignment(spark, emb):
    """Appending a batch to a build_ivf_fixed centroid frame must give
    every vector the SAME cluster_id it gets in a from-scratch fixed
    assign of the union (the append==rebuild contract, bit-identical
    argmin on both paths); dense-id guard raises on arbitrary ids."""
    from indexlab_spark.operators.knn import build_ivf_fixed, ivf_append_fixed

    corpus = emb.select(F.col("vec_id").alias("doc_id"), "embedding")
    old = corpus.filter(F.col("doc_id") % 2 == 0)
    new = corpus.filter(F.col("doc_id") % 2 == 1)
    assigned_old, cents = build_ivf_fixed(old, nlist=8, iters=2,
                                          id_col="doc_id")
    appended = ivf_append_fixed(new, cents)
    # re-assign the union against the same centroids via a fresh append
    want = {
        r["doc_id"]: r["cluster_id"]
        for r in ivf_append_fixed(corpus, cents).collect()
    }
    got = {
        r["doc_id"]: r["cluster_id"]
        for r in assigned_old.unionByName(appended).collect()
    }
    assert got == want

    sparse = spark.createDataFrame(
        [(5, [0.0, 0.0]), (9, [1.0, 1.0])],
        "cluster_id int, centroid array<double>",
    )
    with pytest.raises(ValueError, match="dense"):
        ivf_append_fixed(new, sparse)


def test_build_pq_fixed_matches_numpy_replay(spark):
    """Each subspace codebook and every code must equal a numpy replay
    of the fixed-Lloyd contract on the subspace slices; rebuilds are
    bit-identical."""
    from indexlab_spark.operators.knn import build_pq_fixed

    rng = np.random.default_rng(3)
    vecs = rng.normal(size=(40, 8)).round(3)
    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "doc_id int, embedding array<double>",
    )
    m, nbits, iters = 2, 2, 2  # dsub=4, ksub=4
    codes_df, books_df = build_pq_fixed(df, m=m, nbits=nbits, iters=iters)
    got_books = {}
    for r in books_df.collect():
        got_books[(r["subspace"], r["code"])] = list(r["centroid"])
    got_codes = {r["doc_id"]: list(r["pq_code"]) for r in codes_df.collect()}

    dsub, ksub = 8 // m, 1 << nbits
    for j in range(m):
        sub = vecs[:, j * dsub:(j + 1) * dsub].astype(np.float64)
        centers = sub[:ksub].copy()
        for _ in range(iters):
            a = ((sub[:, None, :] - centers[None, :, :]) ** 2).sum(2).argmin(1)
            for c in range(ksub):
                mm = sub[a == c]
                if len(mm):
                    centers[c] = np.round(mm.mean(0), 6)
        for c in range(ksub):
            assert got_books[(j, c)] == [float(x) for x in centers[c]]
        a = ((sub[:, None, :] - centers[None, :, :]) ** 2).sum(2).argmin(1)
        for i in range(len(vecs)):
            assert got_codes[i][j] == int(a[i]), (j, i)

    codes2, _ = build_pq_fixed(df, m=m, nbits=nbits, iters=iters)
    assert {r["doc_id"]: list(r["pq_code"]) for r in codes2.collect()} \
        == got_codes


def test_build_ivfpq_fixed_deterministic_and_searchable(spark, emb, queries):
    """The composed fixed index is a pure function of the data
    (bit-identical rebuilds) and the deterministic-probe search returns
    a full top-k per query with exact rerank scores."""
    from indexlab_spark.operators.knn import build_ivfpq_fixed, ivfpq_search

    corpus = emb.select(F.col("vec_id").alias("doc_id"), "embedding")
    codes1, cents1, books1 = build_ivfpq_fixed(
        corpus, nlist=4, m=4, nbits=4, iters=2
    )
    codes2, cents2, books2 = build_ivfpq_fixed(
        corpus, nlist=4, m=4, nbits=4, iters=2
    )
    a = {
        r["doc_id"]: (r["cluster_id"], tuple(r["pq_code"]))
        for r in codes1.collect()
    }
    b = {
        r["doc_id"]: (r["cluster_id"], tuple(r["pq_code"]))
        for r in codes2.collect()
    }
    assert a == b
    assert {
        (r["cluster_id"], tuple(r["centroid"])) for r in cents1.collect()
    } == {
        (r["cluster_id"], tuple(r["centroid"])) for r in cents2.collect()
    }

    out = ivfpq_search(
        spark, queries, codes1, cents1, books1, K,
        nprobe=4, rerank=4, round_to=6,
    )
    got = {}
    for r in out.collect():
        got.setdefault(r["query_id"], []).append((r["rank"], r["doc_id"]))
    assert set(got) == set(range(N_QUERIES))
    for qid, hits in got.items():
        assert sorted(h[0] for h in hits) == list(range(1, K + 1))
        # nprobe == nlist probes everything; exact rerank must put the
        # query's own vector (ip with itself) at rank 1
        assert hits[[h[0] for h in hits].index(1)][1] == qid
