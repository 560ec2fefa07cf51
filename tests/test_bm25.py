"""L1/L2 BM25 vs an independent pure-Python implementation of the
published BM25Okapi formula (rank_bm25 semantics: k1=1.5 b=0.75,
epsilon=0.25 negative-idf correction; see operators/bm25.py docstring)."""

import math

import pytest
from pyspark.sql import functions as F

from indexlab_spark.operators.bm25 import bm25_search

DOCS = [
    (0, "the quick brown fox jumps over the lazy dog"),
    (1, "the quick brown cat sleeps"),
    (2, "spark shuffles data across the cluster"),
    (3, "bm25 ranks documents by term frequency"),
    (4, "the the the the common words everywhere"),
    (5, "fox fox fox den"),
]

QUERIES = [(0, "quick fox"), (1, "the cluster"), (2, "missing vocabulary entry"), (3, "fox fox")]


def python_bm25(corpus, query, k1=1.5, b=0.75, epsilon=0.25):
    """Independent oracle from the published formula."""
    tokenized = [t.lower().split() for t in corpus]
    n = len(tokenized)
    doc_lens = [len(t) for t in tokenized]
    avgdl = sum(doc_lens) / n
    tf = [dict() for _ in tokenized]
    df = {}
    for i, toks in enumerate(tokenized):
        for t in toks:
            tf[i][t] = tf[i].get(t, 0) + 1
        for t in set(toks):
            df[t] = df.get(t, 0) + 1
    idf = {t: math.log(n - d + 0.5) - math.log(d + 0.5) for t, d in df.items()}
    avg_idf = sum(idf.values()) / len(idf)
    idf = {t: (epsilon * avg_idf if v < 0 else v) for t, v in idf.items()}
    scores = []
    for i in range(n):
        s = 0.0
        for q in query.lower().split():
            if q not in idf or q not in tf[i]:
                continue
            f = tf[i][q]
            s += idf[q] * f * (k1 + 1) / (f + k1 * (1 - b + b * doc_lens[i] / avgdl))
        scores.append(s)
    return scores


@pytest.fixture(scope="module")
def spark_hits(spark):
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    queries = spark.createDataFrame(QUERIES, "query_id long, query string")
    out = bm25_search(docs, queries, k=10, round_digits=None)
    hits = {}
    for r in out.collect():
        hits.setdefault(r["query_id"], {})[r["doc_id"]] = (r["score"], r["rank"])
    return hits


def test_scores_match_python_oracle(spark_hits):
    corpus = [t for _, t in DOCS]
    for qid, qtext in QUERIES:
        expect = python_bm25(corpus, qtext)
        got = spark_hits.get(qid, {})
        for doc_id, s in enumerate(expect):
            if s > 0:
                assert doc_id in got, f"q{qid} missing doc {doc_id}"
                assert abs(got[doc_id][0] - s) < 1e-9, f"q{qid} doc {doc_id}"
            else:
                assert doc_id not in got, f"q{qid} zero-score doc {doc_id} returned"


def test_ranks_descend_with_id_tiebreak(spark_hits):
    for qid, hits in spark_hits.items():
        ranked = sorted(hits.items(), key=lambda kv: kv[1][1])
        for (d1, (s1, _)), (d2, (s2, _)) in zip(ranked, ranked[1:]):
            assert s1 > s2 or (s1 == s2 and d1 < d2)


def test_no_vocab_overlap_returns_nothing(spark_hits):
    assert spark_hits.get(2, {}) == {}


def test_query_term_multiplicity(spark_hits):
    # "fox fox" counts the fox contribution twice (rank_bm25 sums per
    # occurrence) -> exactly 2x the single-term score
    corpus = [t for _, t in DOCS]
    single = python_bm25(corpus, "fox")
    for doc_id, (score, _) in spark_hits.get(3, {}).items():
        assert abs(score - 2 * single[doc_id]) < 1e-9


def test_bm25_refresh_equals_rebuild(spark, tables):
    """Incremental state append + vocabulary-sized re-derivation must
    reproduce the full rebuild over the union corpus — term_stats,
    doc_lens and globals all equal (exact: the additive state is
    integer, the derived floats see identical inputs)."""
    from indexlab_spark.operators.bm25 import bm25_build, bm25_refresh

    docs = tables["documents"]
    old = docs.filter(F.col("doc_id") % 4 != 0)
    new = docs.filter(F.col("doc_id") % 4 == 0)

    # persistable state from the initial build: raw postings + lengths
    ts_old, dl_old, _ = bm25_build(old, materialize=False)
    tf_old = ts_old.select("doc_id", "term", "tf", "dl")
    ts_inc, dl_inc, g_inc, tf_next = bm25_refresh(
        tf_old, dl_old, new, materialize=False
    )
    ts_full, dl_full, g_full = bm25_build(docs, materialize=False)

    def rows(df_, cols):
        return sorted(tuple(r[c] for c in cols) for r in df_.collect())

    assert rows(g_inc, ["n_docs", "avgdl"]) == rows(g_full, ["n_docs", "avgdl"])
    assert rows(dl_inc, ["doc_id", "dl"]) == rows(dl_full, ["doc_id", "dl"])
    inc = {
        (r["doc_id"], r["term"]): (r["tf"], r["dl"], round(r["idf_adj"], 9))
        for r in ts_inc.collect()
    }
    full = {
        (r["doc_id"], r["term"]): (r["tf"], r["dl"], round(r["idf_adj"], 9))
        for r in ts_full.collect()
    }
    assert inc == full
    # next-round state covers the union corpus's postings exactly
    assert tf_next.count() == len(full)
    # deletions: removing the new batch again restores the OLD index
    removed = new.select(F.col("doc_id"))
    ts_back, dl_back, _, _ = bm25_refresh(
        tf_next, dl_inc, spark.createDataFrame([], docs.schema),
        removed_ids=removed, materialize=False,
    )
    old_full = {
        (r["doc_id"], r["term"]): (r["tf"], r["dl"], round(r["idf_adj"], 9))
        for r in ts_old.collect()
    }
    back = {
        (r["doc_id"], r["term"]): (r["tf"], r["dl"], round(r["idf_adj"], 9))
        for r in ts_back.collect()
    }
    assert back == old_full
    assert dl_back.count() == dl_old.count()


def test_bm25_refresh_remove_and_readd_updates(spark):
    """The natural single-call update — removed_ids=[1] plus doc 1's new
    text in the same batch — must yield exactly a rebuild over the
    updated corpus (removal applies to OLD state before the union)."""
    from indexlab_spark.operators.bm25 import bm25_build, bm25_refresh

    v1 = spark.createDataFrame(
        [(1, "alpha beta"), (2, "gamma delta")], "doc_id long, text string"
    )
    updated = spark.createDataFrame(
        [(1, "alpha epsilon zeta")], "doc_id long, text string"
    )
    ts0, dl0, _ = bm25_build(v1, materialize=False)
    ts, dl, g, _tf = bm25_refresh(
        ts0.select("doc_id", "term", "tf", "dl"), dl0, updated,
        removed_ids=updated.select("doc_id"), materialize=False,
    )
    want = spark.createDataFrame(
        [(1, "alpha epsilon zeta"), (2, "gamma delta")],
        "doc_id long, text string",
    )
    ts_full, dl_full, g_full = bm25_build(want, materialize=False)

    def key(df_):
        return sorted(
            (r["doc_id"], r["term"], r["tf"], r["dl"], round(r["idf_adj"], 9))
            for r in df_.collect()
        )

    assert key(ts) == key(ts_full)
    assert sorted(map(tuple, dl.collect())) == sorted(map(tuple, dl_full.collect()))
    # doc 1 has its NEW terms only — no duplicate/stale postings
    d1_terms = {r["term"] for r in ts.filter("doc_id = 1").collect()}
    assert d1_terms == {"alpha", "epsilon", "zeta"}


def test_globals_equal_doc_lens_formulation(spark):
    """r17: globals derive from (corpus count x posting-frame token sum)
    instead of evaluating the doc-keyed doc_lens chain. Pin equality
    against the doc_lens formulation on a corpus with empty-text,
    whitespace-only and NULL-text docs (all count toward n_docs with
    dl=0)."""
    from indexlab_spark.operators.bm25 import bm25_build

    docs = spark.createDataFrame(
        [
            (0, "alpha beta gamma"),
            (1, ""),
            (2, "   \t  "),
            (3, None),
            (4, "alpha alpha beta"),
        ],
        "doc_id long, text string",
    )
    _, doc_lens, globals_df = bm25_build(docs, materialize=False)
    got = globals_df.collect()[0]
    want = doc_lens.agg(
        F.count(F.lit(1)).alias("n_docs"),
        (F.sum("dl").cast("double") / F.count(F.lit(1))).alias("avgdl"),
    ).collect()[0]
    assert got["n_docs"] == want["n_docs"] == 5
    assert got["avgdl"] == want["avgdl"] == 6 / 5
