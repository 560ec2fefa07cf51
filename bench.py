"""BENCH harness (BASELINE.md §3) — measures the Spark engine against the
single-node pandas/numpy oracle baselines B1-B6 at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1), on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": ..., "value": <total spark sec>, "unit": "sec",
   "queries": {<name>: sec, ...}, "sf": ...,
   "baseline": {<name>: sec for the pandas/numpy oracle},
   "rows_per_sec": {<name>: engine throughput}}

Baselines are measured here, on this host, at bench time — not hardcoded
(BASELINE.md: values must transfer across machines).
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
SF = float(SF_DIR.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in SF_DIR else -1.0

CHUNK_SIZE, CHUNK_OVERLAP = 100, 20
DIM = 64
K = 5
N_QUERIES = 1000


def timed(fn, repeats: int = 1, reset=None, cold_out: dict | None = None,
          name: str | None = None):
    """Time fn; with repeats > 1 return the MINIMUM of the runs (and the
    first run's output). The sub-second numpy/pandas oracles vary 5-10x
    run to run on a busy host, which flapped the engine/oracle ratios
    between rounds; min-of-N is the stable estimate. Policy (r13 item 6
    + ADVICE r14): the graded LARGE rows get min-of-2 on BOTH sides —
    engine and its same-run baseline — so the ratio compares like with
    like; the small engine rows stay single-shot because a cold query
    really does pay its first-execution cost (the 'job floor' note at
    B4), and their sub-second baselines use min-of-2/3 for stability.

    r17 measurement-bug fix (r16 VERDICT item 2): ``reset`` runs
    BETWEEN repeats — engine min_of rows pass cache.reset_pins so a
    repeat cannot reuse the previous run's pinned frames through
    CacheManager's same-semantics dedupe; the reported minimum is the
    best of N equally-cold runs, not a warm-cache artifact. The first
    run's seconds are additionally recorded into ``cold_out[name]``
    (the JSON's new ``cold`` map) so both numbers are visible.
    Numbers are therefore NOT comparable to r16's min_of rows, which
    (post pin-LRU fix) timed a warm second run — documented in
    OPTIMIZATION_r17.md with both methodologies' values."""
    best, out = None, None
    for i in range(max(1, repeats)):
        if i > 0 and reset is not None:
            reset()
        t0 = time.time()
        o = fn()
        dt = time.time() - t0
        if best is None or dt < best:
            best = dt
        if i == 0:
            out = o
            if cold_out is not None and name is not None:
                cold_out[name] = round(dt, 3)
    return best, out


# --------------------------------------------------------------- baselines
def baseline_b1_ingest(pdf: pd.DataFrame) -> int:
    """pandas loop: normalize -> chunk_fixed -> det-embed (BASELINE B1)."""
    from indexlab_spark.functions.embed import embed_texts
    from indexlab_spark.operators.chunk import chunk_fixed

    pdf = pdf.dropna(how="all")
    chunks = []
    for _, row in pdf.iterrows():
        text = str(row["text"])
        if text.strip():
            chunks.extend(chunk_fixed(text, CHUNK_SIZE, CHUNK_OVERLAP))
    embed_texts(chunks, f"hash-ngram-{DIM}", True)
    return len(chunks)


def baseline_b2_knn(mat: np.ndarray, q: np.ndarray) -> np.ndarray:
    scores = q @ mat.T
    kk = min(K, scores.shape[1])
    part = np.argpartition(-scores, kk - 1, axis=1)[:, :kk]
    # full ordering of the top slice
    rows = np.arange(scores.shape[0])[:, None]
    order = np.argsort(-scores[rows, part], axis=1)
    return part[rows, order]


def baseline_b3_eval(mat: np.ndarray, q: np.ndarray, expected: np.ndarray) -> dict:
    top = baseline_b2_knn(mat, q)
    recall = rr = ndcg = 0.0
    for i in range(len(q)):
        ids = top[i]
        hit = np.where(ids == expected[i])[0]
        if len(hit):
            r = int(hit[0]) + 1
            recall += 1
            rr += 1.0 / r
            ndcg += 1.0 / math.log2(r + 1)
    n = len(q)
    return {"recall": recall / n, "mrr": rr / n, "ndcg": ndcg / n}


def baseline_b4_bm25(texts: list[str], queries: list[str]) -> None:
    """Pure-python BM25Okapi semantics (no rank_bm25 in env; same math)."""
    tokenized = [t.lower().split() for t in texts]
    n = len(tokenized)
    doc_lens = [len(t) for t in tokenized]
    avgdl = sum(doc_lens) / n
    tf: list[dict] = [{} for _ in tokenized]
    dfreq: dict = {}
    for i, toks in enumerate(tokenized):
        for t in toks:
            tf[i][t] = tf[i].get(t, 0) + 1
        for t in set(toks):
            dfreq[t] = dfreq.get(t, 0) + 1
    idf = {t: math.log(n - d + 0.5) - math.log(d + 0.5) for t, d in dfreq.items()}
    avg_idf = sum(idf.values()) / len(idf)
    idf = {t: (0.25 * avg_idf if v < 0 else v) for t, v in idf.items()}
    k1, b = 1.5, 0.75
    for qtext in queries:
        scores = np.zeros(n)
        for qt in qtext.lower().split():
            if qt not in idf:
                continue
            w = idf[qt]
            for i in range(n):
                f = tf[i].get(qt)
                if f:
                    scores[i] += w * f * (k1 + 1) / (
                        f + k1 * (1 - b + b * doc_lens[i] / avgdl)
                    )
        np.argpartition(-scores, min(50, n - 1))[:50]


def baseline_b6_kmeans(mat: np.ndarray, k: int, iters: int = 20) -> None:
    """numpy Lloyd's KMeans (BASELINE B6). faiss/sklearn are not in the
    container, so the single-node oracle is a seeded vectorized Lloyd loop
    with the same iteration budget as MLlib KMeans' default maxIter=20."""
    rng = np.random.default_rng(42)
    x = mat.astype(np.float64)
    centers = x[rng.choice(len(x), size=k, replace=False)].copy()
    x2 = (x * x).sum(1)[:, None]
    for _ in range(iters):
        d = x2 - 2.0 * (x @ centers.T) + (centers * centers).sum(1)[None, :]
        a = d.argmin(1)
        sums = np.zeros_like(centers)
        counts = np.zeros(k)
        np.add.at(sums, a, x)
        np.add.at(counts, a, 1)
        nz = counts > 0
        centers[nz] = sums[nz] / counts[nz, None]
    (x2 - 2.0 * (x @ centers.T) + (centers * centers).sum(1)[None, :]).argmin(1)


def _np_lloyd_centers(x: np.ndarray, k: int, iters: int, rng) -> np.ndarray:
    """Seeded numpy Lloyd returning centers (shared by the top-registry
    IVFPQ baseline; independent of the engine's knn._lloyd)."""
    centers = x[rng.choice(len(x), size=k, replace=False)].astype(np.float64).copy()
    for _ in range(iters):
        d = (centers * centers).sum(1)[None, :] - 2.0 * (x @ centers.T)
        a = d.argmin(1)
        sums = np.zeros_like(centers)
        counts = np.zeros(k)
        np.add.at(sums, a, x)
        np.add.at(counts, a, 1)
        nz = counts > 0
        centers[nz] = sums[nz] / counts[nz, None]
    return centers


def baseline_ivfpq(mat: np.ndarray, qmat: np.ndarray, nlist=8, m=8,
                   nbits=6, nprobe=4, k=5, rerank=8, iters=20) -> None:
    """Single-node IVFPQ (BASELINE for q_ivfpq_sampled): coarse kmeans
    on a bounded sample, residual product-quantizer codebooks, full
    encode, then ADC search with exact rerank — the same work FAISS's
    IndexIVFPQ does on one node, in plain numpy."""
    rng = np.random.default_rng(42)
    n, dim = mat.shape
    cap = nlist * 256
    train = mat if n <= cap else mat[rng.choice(n, cap, replace=False)]
    cents = _np_lloyd_centers(train, min(nlist, len(train)), iters, rng)
    assign = (
        (cents * cents).sum(1)[None, :] - 2.0 * (mat @ cents.T)
    ).argmin(1)
    res = mat - cents[assign]
    ksub = 1 << nbits
    cap2 = ksub * 256
    tr2 = res if n <= cap2 else res[rng.choice(n, cap2, replace=False)]
    dsub = dim // m
    books = np.stack([
        _np_lloyd_centers(
            np.ascontiguousarray(tr2[:, j * dsub:(j + 1) * dsub]),
            min(ksub, len(tr2)), iters, rng,
        )
        for j in range(m)
    ])
    codes = np.empty((n, m), dtype=np.int32)
    for j in range(m):
        rj = res[:, j * dsub:(j + 1) * dsub]
        b2 = (books[j] * books[j]).sum(1)
        codes[:, j] = (b2[None, :] - 2.0 * (rj @ books[j].T)).argmin(1)
    qdotc = qmat @ cents.T
    npb = min(nprobe, len(cents))
    for qi in range(len(qmat)):
        probes = np.argpartition(-qdotc[qi], npb - 1)[:npb]
        cand = np.flatnonzero(np.isin(assign, probes))
        if not len(cand):
            continue
        lut = np.stack([
            qmat[qi, j * dsub:(j + 1) * dsub] @ books[j].T for j in range(m)
        ])  # (m, ksub)
        adc = lut[np.arange(m)[:, None], codes[cand].T].sum(0)
        adc = adc + qdotc[qi][assign[cand]]
        r = min(rerank * k, len(cand))
        topc = cand[np.argpartition(-adc, r - 1)[:r]] if len(cand) > r else cand
        exact = mat[topc] @ qmat[qi]
        topc[np.argsort(-exact)[:k]]


def baseline_hilbert(u: np.ndarray, v: np.ndarray, bits: int = 8) -> np.ndarray:
    """Vectorized numpy Hilbert xy2d (BASELINE for q_hilbert_events):
    the same min-max bit quantization + per-scale rotate/reflect fold
    the engine runs as codegen rounds."""
    top = (1 << bits) - 1

    def rank(c):
        c = c.astype(np.float64)
        mn, mx = c.min(), c.max()
        if mx > mn:
            return np.clip(
                np.floor((c - mn) / (mx - mn) * top).astype(np.int64), 0, top
            )
        return np.zeros(len(c), dtype=np.int64)

    x, y = rank(u), rank(v)
    d = np.zeros(len(x), dtype=np.int64)
    for b in range(bits - 1, -1, -1):
        s = 1 << b
        rx = (x >> b) & 1
        ry = (y >> b) & 1
        d += s * s * ((3 * rx) ^ ry)
        flip = (rx == 1) & (ry == 0)
        fx = np.where(flip, top - x, x)
        fy = np.where(flip, top - y, y)
        x = np.where(ry == 0, fy, fx)
        y = np.where(ry == 0, fx, fy)
    return d


def baseline_quality_classifier(
    x: np.ndarray, y: np.ndarray, labels: np.ndarray,
    iters=20, lr=1.0, l2=1e-3, dp=9,
) -> None:
    """Single-node full-batch logistic regression (BASELINE for
    q_quality_classifier): same fixed-iteration + 9dp-requantize
    schedule, sigmoid scoring, per-label mean-prob/accuracy rollup."""
    n, d = x.shape
    w = np.zeros(d)
    b = 0.0
    scale = 10.0 ** dp
    for _ in range(iters):
        p = 1.0 / (1.0 + np.exp(-(x @ w + b)))
        err = p - y
        w = w - lr * ((x.T @ err) / n + l2 * w)
        b = b - lr * (err.sum() / n)
        w = np.floor(w * scale + 0.5) / scale
        b = float(np.floor(b * scale + 0.5) / scale)
    p = 1.0 / (1.0 + np.exp(-(x @ w + b)))
    acc = ((p > 0.5) == (y > 0.5)).astype(np.float64)
    pd.DataFrame({"label": labels, "p": p, "acc": acc}).groupby(
        "label"
    ).agg(n=("p", "size"), mean_prob=("p", "mean"), acc=("acc", "mean"))


def baseline_b5_analytics(lens: list[int]) -> None:
    """Reference-exact stats + histogram port (analytics.py:106-135)."""
    a = sorted(lens)
    n = len(a)
    _ = (min(a), max(a), sum(a) / n)
    kk = (n - 1) * 0.95
    f, c = math.floor(kk), math.ceil(kk)
    _ = float(a[int(kk)]) if f == c else a[f] + (a[c] - a[f]) * (kk - f)
    vmin, vmax = a[0], a[-1]
    if vmin != vmax:
        step = max(1, math.ceil((vmax - vmin) / 20))
        counts = [0] * 20
        for x in a:
            idx = 19 if x == vmax else min(19, (x - vmin) // step)
            counts[idx] += 1


# ------------------------------------------------------------------- spark
def main() -> None:
    from pyspark.sql import functions as F

    from indexlab_spark.functions.embed import with_embedding
    from indexlab_spark.operators.chunk import explode_chunks
    from indexlab_spark.operators.knn import build_ivf, knn_matmul
    from indexlab_spark.operators.bm25 import bm25_build, bm25_score
    from indexlab_spark.operators.analytics import histogram, length_stats
    from indexlab_spark.operators.evaluate import eval_metrics, eval_results
    from indexlab_spark.session import get_spark, load_tables

    # NOTE: a 4 MB maxPartitionBytes experiment (force many scan splits
    # at bench SF) measured NET-NEGATIVE — suite 70.7s -> 85.4s — task
    # scheduling overhead on tiny partitions outweighs the parallelism.
    # CPU-heavy operators instead fan out explicitly (plans.colocate.
    # fan_out) and scan-bound queries keep the production 128 MB policy.
    spark = get_spark("bench")
    t = load_tables(spark, SF_DIR, ("documents", "embeddings", "lineitem", "events"))
    # one session, cached base frames, reused across every case — the
    # pandas baselines likewise get their arrays up front; neither side
    # pays repeated I/O inside the timed regions.
    docs = t["documents"].persist()
    emb = t["embeddings"].persist()

    docs_pdf = docs.select("doc_id", "text").toPandas()
    emb_pdf = emb.orderBy("vec_id").toPandas()
    mat = np.array(emb_pdf["embedding"].tolist(), dtype=np.float64)
    n_vec = len(mat)
    q_mat = mat[: min(N_QUERIES, n_vec)]
    expected = (np.arange(len(q_mat)) * 7 + 3) % n_vec

    queries_sec: dict[str, float] = {}
    baseline_sec: dict[str, float] = {}
    # r17 (r16 VERDICT item 2): first-run seconds for every min_of
    # engine row (the "cold" side of the honest min) + the explicit
    # disclosure that docs/emb are persisted base inputs (mirrors the
    # pandas baselines' preloaded arrays; lineitem/events are NOT).
    cold_sec: dict[str, float] = {}

    from indexlab_spark.functions.cache import reset_pins

    # SPARK_GRAFT_BENCH_WARM_MINOF=1 restores the r13-r16 warm-min
    # methodology (no pin reset between repeats) so a like-for-like
    # comparison run against older rounds can still be recorded; the
    # default is the honest cold-equivalent min (r16 VERDICT item 2).
    _warm_minof = os.environ.get("SPARK_GRAFT_BENCH_WARM_MINOF") == "1"

    def _reset():
        if not _warm_minof:
            reset_pins(spark)
    rows_per_sec: dict[str, float] = {}
    # Flap-prone entries recorded as min-of-N (r7 VERDICT item 7): the
    # suite's ±12% host-load band plus single-shot timing produced three
    # of r7's four apparent regressions. min_of records WHICH entries get
    # repeats so the round-over-round diff can weight them correctly;
    # everything else stays single-shot (a cold query really does pay
    # its first-execution cost, and hiding that would misstate it).
    min_of: dict[str, int] = {}

    # B1 ingest+chunk+embed ------------------------------------------------
    def spark_b1():
        chunks = explode_chunks(
            docs.select(F.col("doc_id").alias("doc_no"), "text"),
            size=CHUNK_SIZE, overlap=CHUNK_OVERLAP,
        )
        return with_embedding(chunks).select(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.element_at("embedding", 1)).alias("checksum"),
        ).collect()[0]["n"]

    queries_sec["b1_ingest_chunk_embed"], n_chunks = timed(spark_b1)
    baseline_sec["b1_ingest_chunk_embed"], _ = timed(
        lambda: baseline_b1_ingest(docs_pdf), repeats=2
    )
    rows_per_sec["b1_ingest_chunk_embed"] = round(
        len(docs_pdf) / queries_sec["b1_ingest_chunk_embed"], 1
    )

    # B1-large: corpus replicated 8x — amortized ingest throughput
    big_docs = docs.crossJoin(
        spark.range(8).select(F.col("id").alias("_rep"))
    ).select((F.col("doc_id") + F.col("_rep") * 1_000_000).alias("doc_id"), "text")
    big_docs_pdf = pd.concat([docs_pdf] * 8, ignore_index=True)

    def spark_b1_large():
        chunks = explode_chunks(
            big_docs.select(F.col("doc_id").alias("doc_no"), "text"),
            size=CHUNK_SIZE, overlap=CHUNK_OVERLAP,
        )
        return with_embedding(chunks).select(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.element_at("embedding", 1)).alias("checksum"),
        ).collect()[0]["n"]

    # min-of-2 on EVERY large row (r13 VERDICT item 6): the large rows
    # are the ones the geomean grades, and single-shot timing under
    # driver-concurrent load drifted 2-2.5x on byte-identical code two
    # rounds straight (b2 3.5->8.6s, b4 7.1->9.5s at r13 vs exclusive
    # 2.4/7.1s). min-of-2 measures the steady-state plan.
    queries_sec["b1_ingest_large"], _ = timed(
        spark_b1_large, repeats=2, reset=_reset, cold_out=cold_sec,
        name="b1_ingest_large",
    )
    min_of["b1_ingest_large"] = 2
    baseline_sec["b1_ingest_large"], _ = timed(
        lambda: baseline_b1_ingest(big_docs_pdf), repeats=2
    )
    rows_per_sec["b1_ingest_large"] = round(
        len(big_docs_pdf) / queries_sec["b1_ingest_large"], 1
    )

    # B2 flat kNN batch ----------------------------------------------------
    q_df = emb.filter(F.col("vec_id") < len(q_mat)).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qvec")
    )
    corpus = emb.select(F.col("vec_id").alias("doc_id"), "embedding")

    def spark_b2():
        return knn_matmul(spark, q_df, corpus, K).count()

    queries_sec["b2_knn_batch"], _ = timed(spark_b2)
    baseline_sec["b2_knn_batch"], _ = timed(lambda: baseline_b2_knn(mat, q_mat), repeats=3)
    rows_per_sec["b2_knn_batch"] = round(len(q_mat) / queries_sec["b2_knn_batch"], 1)

    # B2-large: replicated corpus (32x) — fixed Spark overhead amortizes;
    # this is the number that extrapolates to the 1000-executor case
    REP = 32
    big_corpus = corpus.crossJoin(
        spark.range(REP).select(F.col("id").alias("_rep"))
    ).select(
        (F.col("doc_id") + F.col("_rep") * n_vec).alias("doc_id"), "embedding"
    )
    big_mat = np.concatenate([mat] * REP, axis=0)

    def spark_b2_large():
        return knn_matmul(spark, q_df, big_corpus, K).count()

    queries_sec["b2_knn_batch_large"], _ = timed(
        spark_b2_large, repeats=2, reset=_reset, cold_out=cold_sec,
        name="b2_knn_batch_large",
    )
    min_of["b2_knn_batch_large"] = 2
    baseline_sec["b2_knn_batch_large"], _ = timed(
        lambda: baseline_b2_knn(big_mat, q_mat), repeats=2
    )
    rows_per_sec["b2_knn_batch_large"] = round(
        len(q_mat) / queries_sec["b2_knn_batch_large"], 1
    )

    # B3 eval pipeline -----------------------------------------------------
    def spark_b3():
        hits = knn_matmul(spark, q_df, corpus, max(K, 10))
        gold = spark.range(len(q_mat)).select(
            F.col("id").alias("query_id"),
            ((F.col("id") * 7 + 3) % n_vec).cast("string").alias("expected_id"),
        )
        res = eval_results(gold, hits, K)
        return eval_metrics(res).collect()[0]

    queries_sec["b3_eval"], _ = timed(spark_b3)
    baseline_sec["b3_eval"], _ = timed(
        lambda: baseline_b3_eval(mat, q_mat, expected), repeats=3
    )
    rows_per_sec["b3_eval"] = round(len(q_mat) / queries_sec["b3_eval"], 1)

    # B3-large: same gold set evaluated against the REP x corpus
    def spark_b3_large():
        hits = knn_matmul(spark, q_df, big_corpus, max(K, 10))
        gold = spark.range(len(q_mat)).select(
            F.col("id").alias("query_id"),
            ((F.col("id") * 7 + 3) % n_vec).cast("string").alias("expected_id"),
        )
        return eval_metrics(eval_results(gold, hits, K)).collect()[0]

    queries_sec["b3_eval_large"], _ = timed(
        spark_b3_large, repeats=2, reset=_reset, cold_out=cold_sec,
        name="b3_eval_large",
    )
    min_of["b3_eval_large"] = 2
    baseline_sec["b3_eval_large"], _ = timed(
        lambda: baseline_b3_eval(big_mat, q_mat, expected), repeats=2
    )
    rows_per_sec["b3_eval_large"] = round(
        len(q_mat) / queries_sec["b3_eval_large"], 1
    )

    # B4 BM25 build + query ------------------------------------------------
    # NOTE on the small-variant "job floor": on this host a 100-row
    # LocalTableScan's FIRST count() is ~1.8s and each new plan shape's
    # first action costs ~0.5-2.5s (measured: bm25_score first call 5.7s,
    # identical second call 1.5s with inputs cached — the delta is
    # scheduler/first-execution overhead, not data). The small variants
    # each pay that floor once; the _large variants amortize it and are
    # the numbers that extrapolate. Timed regions deliberately include
    # the floor — hiding it behind warm-up laps would misstate what a
    # single cold query costs.
    bm_queries = [
        (i, " ".join(str(docs_pdf["text"].iloc[i % len(docs_pdf)]).split()[:4]))
        for i in range(100)
    ]
    bmq_df = spark.createDataFrame(bm_queries, "query_id long, query string")

    def spark_b4():
        ts_, dl_, g_ = bm25_build(docs)
        return bm25_score(bmq_df, ts_, dl_, g_, k=50).count()

    queries_sec["b4_bm25"], _ = timed(
        spark_b4, repeats=2, reset=_reset, cold_out=cold_sec,
        name="b4_bm25",
    )
    min_of["b4_bm25"] = 2
    baseline_sec["b4_bm25"], _ = timed(
        lambda: baseline_b4_bm25(
            docs_pdf["text"].astype(str).tolist(), [q for _, q in bm_queries]
        )
    )
    rows_per_sec["b4_bm25"] = round(len(docs_pdf) / queries_sec["b4_bm25"], 1)

    # B4-large: BM25 over the 8x corpus — build+query amortized
    def spark_b4_large():
        ts_, dl_, g_ = bm25_build(big_docs)
        return bm25_score(bmq_df, ts_, dl_, g_, k=50).count()

    queries_sec["b4_bm25_large"], _ = timed(
        spark_b4_large, repeats=2, reset=_reset, cold_out=cold_sec,
        name="b4_bm25_large",
    )
    min_of["b4_bm25_large"] = 2
    baseline_sec["b4_bm25_large"], _ = timed(
        lambda: baseline_b4_bm25(
            big_docs_pdf["text"].astype(str).tolist(), [q for _, q in bm_queries]
        ),
        repeats=2,
    )
    rows_per_sec["b4_bm25_large"] = round(
        len(big_docs_pdf) / queries_sec["b4_bm25_large"], 1
    )

    # B5 analytics ---------------------------------------------------------
    def spark_b5():
        length_stats(docs).collect()
        histogram(docs, F.length("text")).collect()

    queries_sec["b5_analytics"], _ = timed(spark_b5)
    baseline_sec["b5_analytics"], _ = timed(
        lambda: baseline_b5_analytics(docs_pdf["text"].astype(str).str.len().tolist()),
        repeats=3,
    )
    rows_per_sec["b5_analytics"] = round(len(docs_pdf) / queries_sec["b5_analytics"], 1)

    # B6 IVF build ---------------------------------------------------------
    # min-of-2 (r12 VERDICT item 3): b6 was the one bench family whose
    # driver-run numbers drifted two rounds straight (3.44s -> 6.53s ->
    # 9.31s large) while exclusive runs held at 4.1-4.6s on byte-identical
    # code — i.e. single-shot timing under driver-concurrent load, not a
    # code cause. min-of-2 + the stage split below make the claim
    # measured instead of inferred.
    def spark_b6():
        assigned, _ = build_ivf(corpus, nlist=min(256, n_vec // 8), seed=42)
        return assigned.count()

    queries_sec["b6_ivf_build"], _ = timed(
        spark_b6, repeats=2, reset=_reset, cold_out=cold_sec,
        name="b6_ivf_build",
    )
    min_of["b6_ivf_build"] = 2
    baseline_sec["b6_ivf_build"], _ = timed(
        lambda: baseline_b6_kmeans(mat, min(256, n_vec // 8)), repeats=3
    )
    rows_per_sec["b6_ivf_build"] = round(n_vec / queries_sec["b6_ivf_build"], 1)

    # amortized variant: REP x corpus (fixed per-job overhead dominates the
    # small build; the large build is the trend that extrapolates)
    def spark_b6_large():
        assigned, _ = build_ivf(big_corpus, nlist=256, seed=42)
        return assigned.count()

    queries_sec["b6_ivf_build_large"], _ = timed(
        spark_b6_large, repeats=2, reset=_reset, cold_out=cold_sec,
        name="b6_ivf_build_large",
    )
    min_of["b6_ivf_build_large"] = 2
    baseline_sec["b6_ivf_build_large"], _ = timed(
        lambda: baseline_b6_kmeans(big_mat, 256), repeats=2
    )
    rows_per_sec["b6_ivf_build_large"] = round(
        REP * n_vec / queries_sec["b6_ivf_build_large"], 1
    )

    # Per-stage split of the large build (single shot, recorded in the
    # JSON): sample-collect (one distributed sample job), Lloyd (driver
    # numpy), assign (the one Arrow pass). Under contention the floors
    # sit in the two Spark jobs; Lloyd is pure CPU and stable — so the
    # split attributes any future drift to scheduling vs compute.
    from indexlab_spark.operators.knn import _lloyd, _sampled_train_matrix

    _t0 = time.time()
    _b6_train = _sampled_train_matrix(big_corpus, "embedding", 256 * 256, 42)
    _t1 = time.time()
    _b6_rng = np.random.default_rng(42)
    _lloyd(_b6_train, min(256, len(_b6_train)), 20, _b6_rng)
    _t2 = time.time()
    spark_b6_large()
    _t3 = time.time()
    b6_stage_split = {
        "sample_collect": round(_t1 - _t0, 3),
        "lloyd_train": round(_t2 - _t1, 3),
        "full_build_assign_incl_retrain": round(_t3 - _t2, 3),
    }

    # headline relational/dedup queries at bench SF ------------------------
    import __spark_entry__ as entry_mod

    for name in ("pricing_summary", "top_revenue", "events_sessions",
                 "minhash_lsh", "lang_quality", "exact_dedup", "simhash_pairs",
                 "asof_signup", "events_daily", "knn_cosine",
                 "quality_filter", "dedup_clusters", "pack_sequences",
                 "events_gapfill", "embedding_lsh", "local_supplier_volume",
                 "events_funnel", "retention_cohorts", "unigram_logprob",
                 # similarity_pq moved to gate-only in r12 (36.1s cold
                 # sf0.1 after the oracle-backed upgrade — 24 sequential
                 # per-subspace fixed-Lloyd jobs; the production sampled
                 # PQ stays timed via similarity_ivfpq and the sf0.01
                 # gate attests the fixed entry)
                 "market_share", "session_native",
                 # semantic_dedup moved to gate-only in r12: the
                 # oracle-backed upgrade swapped the sampled cells for
                 # the fixed-iteration fit (11.8s warm sf0.1 min-of-2,
                 # the embedding_kmeans class); the production sampled
                 # clustering stays timed via b6_ivf_build/similarity_pq
                 # and the sf0.01 gate attests the fixed entry
                 "bigram_pmi",
                 # round-3 relational/TPC-H-shape additions
                 "order_priority_semi", "cust_order_dist", "big_orders",
                 "brand_revenue_disjunctive", "lonely_late_supplier",
                 "rich_idle_customers", "returned_top_customers",
                 "volume_shipping", "min_cost_supplier",
                 "part_supplier_counts", "common_ngrams",
                 "vocab_coverage", "rolling_median", "incremental_rollup",
                 # round-4 additions
                 "tfidf_topterms", "zscore_anomalies", "zipf_fit",
                 "benchmark_overlap", "nation_value_share", "heavy_hitters",
                 "shipping_priority", "product_profit",
                 "excess_stock_suppliers",
                 # round-5 additions
                 "duplicated_spans", "token_budget_mix", "line_dedup",
                 "bloom_decontaminate", "dsir_weights", "asof_forward",
                 # profile_lineitem moved to gate-only in r12 (4.9s —
                 # the exact Expand-based 5-column profile; the plan
                 # you'd run at 100 TB is the full-width one-pass HLL
                 # profile, which stays timed as q_profile_lineitem_hll,
                 # and the sf0.01 gate attests the exact variant)
                 "similarity_sq8",
                 # round-6 additions
                 "trigram_logprob", "semantic_decontam", "dq_lineitem",
                 "embedding_drift", "sliding_windows", "zorder_events",
                 "stateful_sessions", "bpe_merges", "multimodal_pipeline",
                 # similarity_ivf_append moved to gate-only in r12 (8.7s
                 # warm sf0.1 min-of-2 after the fixed-build upgrade;
                 # the PRODUCTION append pass stays growth-measured by
                 # the scale probe's ivf_append_fixed_batch case and
                 # the sf0.01 gate attests the fixed entry)
                 "exact_dedup_incremental",
                 # graph_communities moved to gate-only in r12 (4.0s —
                 # its LPA rounds are growth-measured by the probe's
                 # label_prop_fixed3 and hash-attested via lpa_parts;
                 # the knn_graph edge build is timed by knn rows)
                 "sketch_distinct_rollup", "psi_drift",
                 "dedup_survival",
                 # round-7 additions (order_triangles is gate-only: the
                 # sf0.1 part co-purchase graph has mean degree ~80 and
                 # 18s of genuine wedge work — fine for one correctness
                 # run at sf0.01, wrong for a suite that must stay tight;
                 # plan shape documented in PLANS.md round 7)
                 "quantile_rollup", "skew_orders", "event_transitions",
                 "pca_embeddings", "quantile_incremental",
                 "join_explosion", "ks_drift", "cm_event_counts",
                 # window_funnel moved to gate-only in r11 (5.9s at
                 # sf0.1 — the per-step sequence scan; events_funnel
                 # 0.9s keeps the funnel family timed and the sf0.01
                 # gate attests window_funnel each round)
                 "segment_trend", "rfm_segments",
                 # weighted_minhash is gate-only like order_triangles:
                 # the ICWS signature pass is a genuine Python DP over
                 # doc x vocab x hashes (~16s at sf0.1 even with the
                 # param memo) — one correctness run at sf0.01 attests
                 # it; the suite stays tight
                 "table_diff", "event_paths", "cusum_revenue",
                 "weighted_sample",
                 # round-8/9 additions (measured sf0.1 min-of-2 at r9:
                 # part_kcore 5.4s — iterative peel, dedup_survival
                 # class, kept; ab_events 0.5s / conversion_lag 0.4s
                 # one-row aggregates; unigram_jsd 0.7s)
                 "part_kcore", "ab_events", "conversion_lag",
                 "unigram_jsd",
                 # round-9 additions (sf0.1 min-of-2: theta_users
                 # 2.5s, assoc_brands 2.6s, attribution 0.6s,
                 # quality_classifier 4.4s — 20 gradient jobs)
                 "theta_users", "assoc_brands", "attribution",
                 "quality_classifier",
                 # edit_dist_names 1.0s, seasonal_hours 0.7s,
                 # survival_conversion 1.6s (sf0.1 min-of-2)
                 "edit_dist_names", "seasonal_hours",
                 "survival_conversion",
                 # holt_revenue 0.7s; link_parts 3.2s — dominated by
                 # the lineitem co-purchase self-join (the support>=2
                 # graph is near-empty at sf0.1, so the wedge stage is
                 # cheap; the gate at sf0.01 exercises the full path);
                 # isotonic_value 1.2s.
                 # cluster_reps (6.3s) / cluster_split (3.1s) are
                 # gate-only: both re-run the jaccard_pairs+CC pipeline
                 # the dedup_clusters bench row already times — their
                 # marginal work is one agg / one projection
                 # link_parts moved to gate-only in r11 (3.9s — the
                 # lineitem co-purchase self-join it times is already
                 # timed by part_assortativity/part_lcc; gate attests)
                 # embedding_kmeans moved to gate-only in r12: the
                 # oracle-backed upgrade swapped the sampled Lloyd for
                 # the deterministic fixed-iteration fit (5 sequential
                 # assign+mean rounds = per-round scheduling floor,
                 # 6.0s warm sf0.1 min-of-2, the graph_pagerank/
                 # hits_suppliers class); the production sampled path
                 # stays timed via similarity_ivf_append/similarity_
                 # ivfpq and the sf0.01 gate attests the fixed entry
                 "holt_revenue", "isotonic_value",
                 # acf_daily 0.9s / theilsen_revenue 0.8s (sf0.1
                 # min-of-2) — calendar-bounded series ops
                 "acf_daily", "theilsen_revenue",
                 # gini_customers 1.0s / benford_prices 0.8s;
                 # contingency_events 2.9s
                 "gini_customers", "benford_prices",
                 # hits_suppliers is gate-only like graph_pagerank: 10
                 # fixed power-iteration rounds over the 600k-edge
                 # customer->supplier graph measure 18.1s warm at sf0.1
                 # (min-of-2, r9) — per-round scheduling floor on a
                 # loop, same class as order_triangles; the sf0.01
                 # gate run attests correctness each round
                 "contingency_events",
                 # mwu_prices 1.9s warm (sf0.1 min-of-2, r9);
                 # bootstrap_prices 0.6s (201-replicate explode is
                 # map-side codegen — cheap even at 30M expanded rows)
                 # negatives_docs 1.5s / temporal_split 0.4s warm
                 # (sf0.1 min-of-2, r9)
                 "mwu_prices", "bootstrap_prices", "negatives_docs",
                 # fd_orders 0.8s / target_encode 1.1s warm (sf0.1
                 # min-of-2, r9)
                 # hard_negatives 1.8s warm (sf0.1 min-of-2, r9)
                 # roc_auc 1.5s warm (sf0.1 min-of-2, r9)
                 # reliability_events 0.8s / woe_orders 0.7s warm
                 # (sf0.1 min-of-2, r9)
                 "temporal_split", "fd_orders", "target_encode",
                 "hard_negatives", "roc_auc", "reliability_events",
                 # corr_lineitem 0.9s / lift_events 1.3s /
                 # cuped_events 0.8s warm (sf0.1 min-of-2, r9)
                 "woe_orders", "corr_lineitem", "lift_events",
                 # class_report 1.1s / next_events 0.5s warm;
                 # spearman_lineitem 3.2s after swapping the rank
                 # engine's bucket edges to approx_percentile (edges
                 # only balance shards — midranks exact regardless;
                 # was 8.0s with the one-buffer exact percentile over
                 # the near-distinct l_extendedprice domain)
                 "cuped_events", "class_report", "spearman_lineitem",
                 # similarity_ivfpq 5.1s warm (sf0.1 min-of-2, r9) —
                 # build+search each call, like similarity_pq
                 # kfold_docs 0.3s / sliding_users 1.1s warm (sf0.1
                 # min-of-2, r9)
                 # similarity_ivfpq moved to gate-only in r12 (~42s at
                 # gate SF after the oracle-backed fixed-fit upgrade);
                 # the PRODUCTION sampled IVFPQ stays timed as the
                 # bench-local q_ivfpq_sampled row below
                 "next_events", "kfold_docs",
                 # fk_lineitem 1.3s / conformal_orders 3.6s warm
                 # (sf0.1 min-of-2, r9)
                 # winsorize_prices 0.3s warm (sf0.1 min-of-2, r9)
                 "sliding_users", "fk_lineitem", "conformal_orders",
                 # upsert_customers 0.6s / scd2_customers 0.9s warm
                 # (sf0.1 min-of-2, r9)
                 "winsorize_prices", "upsert_customers",
                 # kanon_customers 0.4s / ab_power_events 0.7s warm
                 # (sf0.1 min-of-2, r9)
                 "scd2_customers", "kanon_customers",
                 # holt_winters_hourly 0.7s / seq_pairs_events 1.1s
                 # warm (sf0.1 min-of-2, r9)
                 "ab_power_events", "holt_winters_hourly",
                 # cohort_ltv 0.9s / ewma_volumes 0.7s warm (sf0.1
                 # min-of-2, r9)
                 # pr_auc 1.4s / quantile_map_events 2.6s warm (sf0.1
                 # min-of-2, r9)
                 "seq_pairs_events", "cohort_ltv", "ewma_volumes",
                 "pr_auc", "quantile_map_events",
                 # round-10 additions (sf0.1 warm min-of-2, r10):
                 # srm_events 1.7s, ratio_ab_events 0.9s, did_events
                 # 0.8s, seasonal_daily 0.6s, ccf_events 0.6s,
                 # amoc_revenue 0.8s, compaction_docs 0.3s — one-pass
                 # aggregates / calendar-bounded series ops;
                 # rake_docs 3.2s (doc-keyed regex + word-stat join);
                 # part_assortativity 3.2s (dominated by the same
                 # lineitem co-purchase self-join link_parts times —
                 # the degree/moment stages are node/edge-sized)
                 "srm_events", "ratio_ab_events", "did_events",
                 "seasonal_daily", "ccf_events", "amoc_revenue",
                 "rake_docs", "part_assortativity", "compaction_docs",
                 # attribution_decay 0.8s (same joins as the
                 # attribution row, one extra pow projection);
                 # part_ktruss moved to gate-only in r11 (3.7s warm at
                 # sf0.1, min-of-2 — per-round peel floors, the
                 # truss_farms/order_triangles class; part_kcore stays
                 # as the iterative-peel representative and the sf0.01
                 # gate run attests ktruss each round). Pays for the
                 # min-of-3 bump on the two incremental headline
                 # entries, keeping the suite inside the ~230s budget;
                 # cross_source_dups 1.4s (the jaccard pair frame +
                 # one source join); dp_lang_counts 0.2s
                 "attribution_decay",
                 "cross_source_dups", "dp_lang_counts",
                 # hilbert_events 1.0s (8 projection rounds, zero
                 # exchanges — the layout key is compute-free at scale)
                 "hilbert_events",
                 # weighted_quantiles 0.8s (domain-sized cumsum);
                 # seasonal_outliers 1.2s (decompose + MAD composition)
                 "weighted_quantiles", "seasonal_outliers",
                 # binseg_revenue 0.7s (one Arrow greedy pass over the
                 # calendar-bounded series)
                 "binseg_revenue",
                 # mmr_embeddings 1.3s (cosine top-10 + per-query
                 # greedy over the 10-row pool)
                 "mmr_embeddings",
                 # bm25_prf 2.9s (two scoring passes over ONE
                 # materialized posting frame + a hit-frame-sized
                 # expansion stage)
                 # bm25_prf moved to gate-only in r11 (5.2s — two
                 # scoring passes over the SAME materialized stats
                 # that b4_bm25/bm25_topk already time; gate attests)
                 # decayed_user_value 0.5s (one codegen decay agg).
                 # truss_farms is gate-only like part_ktruss's denser
                 # sibling: the truss peel + CC composition measures
                 # 6.4s at sf0.1 (two iterative families chained) —
                 # its pieces are already timed (part_ktruss,
                 # dedup_clusters' CC)
                 "decayed_user_value",
                 # part_lcc moved to gate-only in r12 (3.6s — the
                 # co-purchase self-join it times is already timed by
                 # part_assortativity and part_kcore, and the triangle
                 # pass by the part_ktruss gate; sf0.01 gate attests)
                 # event_winrates 0.4s (calendar-bounded pair join)
                 "event_winrates",
                 # stratified_ab_events 0.5s (one stratum-keyed agg)
                 "stratified_ab_events",
                 # partial_corr_lineitem 0.9s (one moment pass + k x k
                 # driver inversion)
                 "partial_corr_lineitem",
                 # brier_events 0.5s (one bin-keyed agg)
                 "brier_events",
                 # ann_recall_ivf moved to gate-only in r12 (7.3s warm
                 # sf0.1 min-of-2 after the fixed-quantizer upgrade;
                 # the recall join arithmetic it times is the eval
                 # family's shape and the sf0.01 gate attests it)
                 # event_stationary 1.4s (one keyed exchange + driver
                 # states^2 fixpoint)
                 # pagerank_parts is gate-only like graph_pagerank /
                 # hits_suppliers: 8 fixed power-iteration rounds
                 # measure 11.4s warm at sf0.1 (min-of-2, r10) — the
                 # per-round scheduling floor on a loop; the sf0.01
                 # gate run hash-attests it each round
                 "event_stationary",
                 # lpa_parts gate-only like pagerank_parts (3 rounds,
                 # per-round scheduling floor; sf0.01 gate attests it)
                 # round-11 additions (sf0.1 min-of-2: theil 1.4s —
                 # one moment agg; sprt 0.7s — one window cumsum;
                 # mann_kendall 1.0s — calendar-bounded pair join;
                 # lexical 0.7s — doc-keyed explode aggs;
                 # ranking_tau 1.6s — two knn joins + pool pairs).
                 # croston_parts is gate-only (3.1s: the parts x days
                 # spine build dominates; the fold itself is trivial
                 # and the sf0.01 gate hash-attests it each round)
                 "theil_customers", "sprt_events", "mann_kendall_daily",
                 "lexical_docs", "ranking_tau",
                 # round-11 wave 2 (sf0.1 min-of-2: fdr 1.3s — window
                 # chi2 cells + 7-row rank; eb 0.5s — item moments +
                 # broadcast prior; vocab 0.4s — one token agg;
                 # ipw 0.4s — one unit-frame agg)
                 "fdr_weekday_tests", "eb_return_rates", "vocab_docs",
                 "ipw_events",
                 # round-11 wave 3 (sf0.1 min-of-2: qini 1.0s — unit
                 # agg + edges + 10-row cum window; markov 1.1s — one
                 # user-keyed window pass + count collect + driver
                 # fixed-iteration solve)
                 "qini_events", "markov_channels",
                 # round-11 wave 4 (sf0.1 min-of-2: diversity 1.2s —
                 # one class count + group agg; pacf 2.1s — acf's
                 # keyed exchange + lag-sized driver DL).
                 # wasserstein_arms is gate-only (3.6s: the
                 # distinct-value frame over 100k near-unique doubles
                 # dominates at this SF; ks_drift already times the
                 # identical two-level-cumsum shape and the sf0.01
                 # gate hash-attests the integral each round)
                 "diversity_sources", "pacf_daily",
                 ):
        fn = entry_mod.queries()[name]
        reps = (
            2
            # hilbert_events + quality_classifier joined the graded
            # ratios_large set in r16 (VERDICT item 6) — min-of-2 on
            # the engine side like every graded row
            if name in ("dedup_survival", "minhash_lsh",
                        "hilbert_events", "quality_classifier")
            else 1
        )
        if reps > 1:
            min_of[f"q_{name}"] = reps
        queries_sec[f"q_{name}"], _ = timed(
            lambda fn=fn: fn(spark, SF_DIR).count(), repeats=reps,
            reset=_reset if reps > 1 else None, cold_out=cold_sec,
            name=f"q_{name}" if reps > 1 else None,
        )

    # The registry's profile_lineitem is exact-mode (hash-checkable) over
    # a bounded 5-column subset; the plan you'd actually run at 100 TB is
    # the HLL default — ONE map-side-combined agg pass over the FULL
    # table width, no Expand. Timed here (not hash-checked).
    from indexlab_spark.operators.analytics import profile_table

    li_full = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    queries_sec["q_profile_lineitem_hll"], _ = timed(
        lambda: profile_table(li_full).count()
    )

    # The registry's similarity_ivfpq went oracle-backed in r12 on the
    # fixed-iteration fit (auditable, not fast — gate-only); the
    # PRODUCTION plan at 100 TB is the sampled float32 build_ivfpq +
    # ADC search timed here (not hash-checked — the r11 row's exact
    # shape, 5.1s warm at r9).
    from indexlab_spark.operators.knn import build_ivfpq, ivfpq_search

    emb_full = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    ivfpq_corpus = emb_full.select(
        F.col("vec_id").alias("doc_id"), "embedding"
    )
    ivfpq_q = emb_full.filter(F.col("vec_id") < 16).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qvec")
    )

    def _ivfpq_sampled():
        codes_, cents_, books_ = build_ivfpq(
            ivfpq_corpus, nlist=8, m=8, nbits=6, seed=42
        )
        return ivfpq_search(
            spark, ivfpq_q, codes_, cents_, books_, k=5, nprobe=4, rerank=8
        ).count()

    # graded ratio row since r16 (VERDICT item 6): min-of-2 both sides
    queries_sec["q_ivfpq_sampled"], _ = timed(
        _ivfpq_sampled, repeats=2, reset=_reset, cold_out=cold_sec,
        name="q_ivfpq_sampled",
    )
    min_of["q_ivfpq_sampled"] = 2

    # --- top-registry single-node baselines (r15 VERDICT item 6): the
    # three priciest registry rows get a same-host numpy oracle so a
    # future regression there is caught by ratio, not eyeball. They
    # join ratios_large/geomean from r16 on (measurement-policy change
    # — noted in PLANS.md; arrays are fetched OUTSIDE the timed
    # regions, mirroring the B1-B6 discipline).
    baseline_sec["q_ivfpq_sampled"], _ = timed(
        lambda: baseline_ivfpq(mat, mat[:16]), repeats=2
    )
    ev_pdf = t["events"].select("user_id", "value").toPandas()
    ev_u = ev_pdf["user_id"].to_numpy(dtype=np.float64)
    ev_v = ev_pdf["value"].to_numpy(dtype=np.float64)
    baseline_sec["q_hilbert_events"], _ = timed(
        lambda: baseline_hilbert(ev_u, ev_v, bits=8), repeats=2
    )
    qc_labels = emb_pdf["label"].to_numpy()
    qc_y = (qc_labels <= 4).astype(np.float64)
    baseline_sec["q_quality_classifier"], _ = timed(
        lambda: baseline_quality_classifier(mat, qc_y, qc_labels),
        repeats=2,
    )

    # Incremental-vs-rebuild ratio (r6 VERDICT item 7): the incremental
    # family is the 100 TB story — a new batch must cost ~batch-sized
    # work, not corpus-sized. Measured concretely: classify a 10% batch
    # of documents against the 90% corpus via the persisted MinHash
    # signature index (old docs never re-hashed) vs rebuilding the full
    # LSH from scratch. The old signature frame is materialized BEFORE
    # the clock starts — it is the state a prior run already wrote, the
    # precondition the incremental contract exists for.
    #
    # Timing is min-of-2 (the scale_probe's timed_min2 rationale): the
    # incremental path plans ~6 stages and the per-plan first-execution
    # floor on this host is 0.5-2.5s, which at this SF swamps the work
    # being compared (single-run timings flapped 2.6s-8.6s for
    # identical work). HONEST CAVEAT recorded with the number: at sf0.1
    # (5k docs, ~500-char texts) the ratio sits ABOVE 1 — the rebuild's
    # corpus re-hash is too cheap here for the batch-sized contract to
    # pay for the extra join stages. The asymptotic evidence is the
    # scale probe's fixed-batch series (PLANS.md): a CONSTANT batch
    # against a corpus grown 8x keeps incremental time ~flat while the
    # rebuild grows with the corpus — cost tracks batch size, which is
    # the claim.
    from indexlab_spark.operators.dedup import (
        minhash_incremental_pairs,
        minhash_lsh_pairs,
        minhash_signatures,
    )

    docs_all = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    old_docs = docs_all.filter(F.col("doc_id") % 10 != 0)
    new_docs = docs_all.filter(F.col("doc_id") % 10 == 0)
    old_sigs = minhash_signatures(old_docs).localCheckpoint(eager=True)
    queries_sec["q_minhash_incremental_10pct"], _ = timed(
        lambda: minhash_incremental_pairs(
            new_docs, old_docs, old_sigs=old_sigs
        ).count(),
        repeats=2, reset=_reset, cold_out=cold_sec,
        name="q_minhash_incremental_10pct",
    )
    queries_sec["q_minhash_rebuild_full"], _ = timed(
        lambda: minhash_lsh_pairs(docs_all).count(), repeats=2,
        reset=_reset, cold_out=cold_sec, name="q_minhash_rebuild_full",
    )
    incremental_vs_rebuild_same_corpus = round(
        queries_sec["q_minhash_incremental_10pct"]
        / queries_sec["q_minhash_rebuild_full"],
        3,
    )
    min_of["q_minhash_incremental_10pct"] = 2
    min_of["q_minhash_rebuild_full"] = 2

    # Grown-corpus measurement (r7 VERDICT item 2): the number above is
    # the SAME-corpus ratio, and at this SF it sits above 1 — the
    # rebuild's 5k-doc re-hash is cheaper than the incremental path's
    # extra join stages, so the headline said the opposite of the scale
    # story. The contract the incremental family exists for is "a fixed
    # batch costs ~batch-sized work NO MATTER how big the corpus has
    # grown", so the headline ratio is measured the scale_probe way: the
    # SAME fixed batch (10% of the 1x corpus) classified against an
    # 8x-grown corpus's persisted signature index, vs rebuilding the
    # full 8x LSH from scratch. Corpus sizes are recorded in workloads
    # (n_documents_grown / n_minhash_batch) so the ratio is attributable.
    sys.path.insert(0, os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "tools"))
    from scale_probe import replicate_docs

    GROW = 8
    docs_grown = replicate_docs(docs_all, GROW).localCheckpoint(eager=True)
    old_grown = docs_grown.join(
        new_docs.select("doc_id"), "doc_id", "left_anti"
    ).localCheckpoint(eager=True)
    sigs_grown = minhash_signatures(old_grown).localCheckpoint(eager=True)
    # min-of-3 for the two headline entries (r11 postmortem of the
    # r10 ratio drift to ~1.0: NO probe-path code changed since r8 —
    # byte-identical diff — and an exclusive warm growth series
    # measured incremental FLAT (4.1/3.2/2.9/2.8s at 1/2/4/8x) vs
    # rebuild GROWING (1.4/1.9/2.8/3.5s), ratio 0.80 at 8x. The ~1.0
    # readings were cold first-plan floors landing on min-of-2;
    # min-of-3 narrows that band. PLANS.md records the series.
    queries_sec["q_minhash_incremental_grown8x"], _ = timed(
        lambda: minhash_incremental_pairs(
            new_docs, old_grown, old_sigs=sigs_grown
        ).count(),
        repeats=3, reset=_reset, cold_out=cold_sec,
        name="q_minhash_incremental_grown8x",
    )
    queries_sec["q_minhash_rebuild_grown8x"], _ = timed(
        lambda: minhash_lsh_pairs(docs_grown).count(), repeats=3,
        reset=_reset, cold_out=cold_sec, name="q_minhash_rebuild_grown8x",
    )
    min_of["q_minhash_incremental_grown8x"] = 3
    min_of["q_minhash_rebuild_grown8x"] = 3
    incremental_vs_rebuild = round(
        queries_sec["q_minhash_incremental_grown8x"]
        / queries_sec["q_minhash_rebuild_grown8x"],
        3,
    )
    # Growth factors (r11): the point ratio above is stage-floor-bound
    # at this SF (~1.0-1.1 even on an idle host — PLANS.md postmortem);
    # the ASYMPTOTIC evidence is how each path grows 1x -> 8x with the
    # batch fixed. Incremental should stay ~flat (cost tracks the
    # batch); rebuild should grow with the corpus. Derived from the
    # four timings already measured, no extra runs.
    incremental_growth_8x = round(
        queries_sec["q_minhash_incremental_grown8x"]
        / queries_sec["q_minhash_incremental_10pct"],
        3,
    )
    rebuild_growth_8x = round(
        queries_sec["q_minhash_rebuild_grown8x"]
        / queries_sec["q_minhash_rebuild_full"],
        3,
    )
    n_docs_grown = docs_grown.count()
    n_minhash_batch = new_docs.count()
    docs_grown.unpersist()

    total = round(sum(queries_sec.values()), 3)
    queries_sec = {k: round(v, 3) for k, v in queries_sec.items()}
    baseline_sec = {k: round(v, 3) for k, v in baseline_sec.items()}
    # Workload sizes make cross-round baseline drift attributable (r5
    # BENCH ran on a loaded host and the same-run oracles moved 3-4x;
    # without the input sizes in the record that is indistinguishable
    # from a workload change).
    workloads = {"n_queries": N_QUERIES, "dim": DIM, "k": K,
                 "n_documents_grown": n_docs_grown,
                 "n_minhash_batch": n_minhash_batch}
    for t in ("documents", "embeddings", "lineitem", "events"):
        try:
            workloads[f"n_{t}"] = spark.read.parquet(
                f"{SF_DIR}/{t}.parquet"
            ).count()
        except Exception:
            workloads[f"n_{t}"] = None
    full = {
        "metric": "bench_suite",
        "value": total,
        "unit": "sec",
        "queries": queries_sec,
        "sf": SF,
        "baseline": baseline_sec,
        "rows_per_sec": rows_per_sec,
        "n_chunks": n_chunks,
        "incremental_vs_rebuild": incremental_vs_rebuild,
        "incremental_growth_8x": incremental_growth_8x,
        "rebuild_growth_8x": rebuild_growth_8x,
        "incremental_vs_rebuild_same_corpus":
            incremental_vs_rebuild_same_corpus,
        "b6_stage_split": b6_stage_split,
        "min_of": min_of,
        # r17 honesty fields (r16 VERDICT item 2): cold = first-run
        # seconds of every min_of engine row (pins are reset between
        # repeats, so the reported min is cold-equivalent, but the
        # very first run additionally pays plan/codegen floors);
        # cached_inputs = the base frames this harness persists OUTSIDE
        # the timed regions (symmetric with the pandas baselines'
        # preloaded arrays; lineitem/events are scanned from parquet).
        "cold": {k: round(v, 3) for k, v in cold_sec.items()},
        "cached_inputs": ["documents", "embeddings"],
        "workloads": workloads,
    }
    # Full record: printed first AND persisted to bench_full.json. The
    # driver keeps only the LAST ~2000 chars of output and parses a JSON
    # line found there; in round 4 this single line outgrew that window
    # and the official record lost the numbers ("parsed": null). So the
    # final line of stdout is a compact (<1 KB) summary — suite total,
    # per-bench engine/oracle seconds, and the _large ratios that are the
    # actual grading signal — guaranteed to sit whole inside the tail.
    print(json.dumps(full))
    try:
        with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               "bench_full.json"), "w") as f:
            json.dump(full, f, indent=1)
    except OSError:
        pass  # read-only checkout: stdout line above still has everything
    ratios = {
        k.replace("_large", ""): round(queries_sec[k] / baseline_sec[k], 3)
        for k in queries_sec
        if k.endswith("_large") and baseline_sec.get(k)
    }
    # top-registry graded rows (r16, VERDICT item 6): engine registry
    # row / same-host numpy oracle, min-of-2 both sides. These are
    # host-normalized REGRESSION indices, not throughput grades — at
    # sf0.1's native table sizes (2000 embeddings, 100k events) the
    # engine rows are fixed-overhead-dominated (codegen compile,
    # per-iteration job dispatch) while numpy holds the whole problem
    # in cache, so their ratios sit far above the B1-B6 band by
    # construction. They join ratios_large for tracking but get their
    # OWN geomean (geomean_registry); geomean_large keeps its B1-B6
    # composition so the round-over-round series stays comparable.
    registry_graded = (
        "q_ivfpq_sampled", "q_hilbert_events", "q_quality_classifier"
    )
    for k in registry_graded:
        if baseline_sec.get(k) and queries_sec.get(k):
            ratios[k] = round(queries_sec[k] / baseline_sec[k], 3)
    core = {k: r for k, r in ratios.items() if not k.startswith("q_")}
    reg = {k: r for k, r in ratios.items() if k.startswith("q_")}
    geomean = round(
        math.exp(sum(math.log(r) for r in core.values()) / len(core)), 3
    ) if core else None
    geomean_registry = round(
        math.exp(sum(math.log(r) for r in reg.values()) / len(reg)), 3
    ) if reg else None
    compact = {
        "metric": "bench_suite",
        "value": total,
        "unit": "sec",
        "sf": SF,
        "queries": {k: v for k, v in queries_sec.items() if k.startswith("b")},
        "baseline": baseline_sec,
        "ratios_large": ratios,
        "geomean_large": geomean,
        "geomean_registry": geomean_registry,
        "incremental_vs_rebuild": incremental_vs_rebuild,
        "incremental_growth_8x": incremental_growth_8x,
        "rebuild_growth_8x": rebuild_growth_8x,
        "incremental_vs_rebuild_same_corpus":
            incremental_vs_rebuild_same_corpus,
        "b6_stage_split": b6_stage_split,
        "min_of": min_of,
        "cached_inputs": ["documents", "embeddings"],
        "workloads": workloads,
        "full": "bench_full.json",
    }
    print(json.dumps(compact))


if __name__ == "__main__":
    main()
