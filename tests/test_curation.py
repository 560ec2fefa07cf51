"""Curation operator tests — quality flags, repetition, PII redaction,
decontamination, hash sampling. Cross-checked against straightforward
Python implementations on small in-memory fixtures (the DuckDB oracle
covers the sf0.01 tables via driver t2)."""

from __future__ import annotations

import hashlib
import re

import pytest

from indexlab_spark.operators.curation import (
    PII_PATTERNS,
    decontaminate,
    hash_sample,
    quality_flags,
    redact_pii,
    repetition_signals,
)

DOCS = [
    # good english doc: >=10 words, stopwords, letters
    (0, "the quick brown fox jumps over the lazy dog and runs far away home"),
    (1, "short doc"),  # too few words
    (2, "### ### ### the and is with for it that in of to be or not now"),  # symbols
    (3, "12 34 56 78 90 11 22 33 44 55 66 77 88 99 00 12"),  # no alpha words
    (4, ""),  # empty
    (5, "aaaa bb aaaa bb aaaa bb aaaa bb aaaa bb aaaa bb aaaa bb aaaa bb"),
]


@pytest.fixture(scope="module")
def docs_df(spark):
    return spark.createDataFrame(DOCS, ["doc_id", "text"])


def test_quality_flags(docs_df):
    rows = {r["id"]: r.asDict() for r in quality_flags(docs_df).collect()}
    assert rows[0]["keep"] is True
    assert rows[1]["keep"] is False and rows[1]["flag_words"] is False
    assert rows[2]["keep"] is False and rows[2]["flag_symbol"] is False
    assert rows[3]["keep"] is False and rows[3]["flag_alpha"] is False
    assert rows[4]["n_words"] == 0 and rows[4]["keep"] is False
    # python cross-check of one ratio
    toks = DOCS[0][1].split()
    assert rows[0]["mean_word_len"] == round(
        sum(len(t) for t in toks) / len(toks), 6
    )


def test_repetition_signals(docs_df):
    rows = {r["id"]: r.asDict() for r in repetition_signals(docs_df).collect()}
    # doc 5: 16 tokens of 2 distinct -> dup_word_frac = 14/16
    assert rows[5]["dup_word_frac"] == round(14 / 16, 6)
    # doc 5 bigrams: "aaaa bb" x8, "bb aaaa" x7 -> top frac 8/15
    assert rows[5]["n_bigrams"] == 15
    assert rows[5]["top_bigram_n"] == 8
    assert rows[5]["top_bigram_frac"] == round(8 / 15, 6)
    # empty doc: all zeros, present in output
    assert rows[4]["n_bigrams"] == 0 and rows[4]["top_bigram_frac"] == 0.0
    # 1-word-ish doc: no bigrams
    assert rows[1]["n_bigrams"] == 1  # "short doc" has exactly one bigram


def test_redact_pii(spark):
    pii = [
        (0, "mail bob.smith+x@ex-ample.org now"),
        (1, "call +1-555-0142 or 555-0142? ssn 123-45-6789 ip 10.0.0.7"),
        (2, "clean text with no pii at all"),
    ]
    df = spark.createDataFrame(pii, ["doc_id", "text"])
    rows = {r["id"]: r.asDict() for r in redact_pii(df).collect()}
    assert rows[0]["redacted"] == "mail <EMAIL> now"
    assert "<SSN>" in rows[1]["redacted"] and "<IP>" in rows[1]["redacted"]
    assert "<PHONE>" in rows[1]["redacted"]
    assert rows[2]["changed"] is False
    # python re cross-check (same patterns, re module)
    for _id, text in pii:
        expect = text
        for pat, rep in PII_PATTERNS:
            expect = re.sub(pat, rep, expect)
        assert rows[_id]["redacted"] == expect


def test_decontaminate(spark):
    bench = spark.createDataFrame(
        [(100, "the quick brown fox jumps over the lazy dog")], ["doc_id", "text"]
    )
    train = spark.createDataFrame(
        [
            (0, "news: the quick brown fox jumps over a fence"),  # shares 5-grams
            (1, "completely unrelated text about spark query planning engines"),
        ],
        ["doc_id", "text"],
    )
    rows = {r["id"]: r.asDict() for r in decontaminate(train, bench, n=5).collect()}
    # train 0 shares exactly "the quick brown fox jumps" (and "quick brown
    # fox jumps over") with the benchmark
    assert rows[0]["n_overlap"] == 2 and rows[0]["contaminated"] is True
    assert 1 not in rows  # clean docs don't appear


def test_hash_sample_deterministic(docs_df, spark):
    out = {r["doc_id"] for r in hash_sample(docs_df, "80").collect()}
    expect = {
        i
        for i, _ in DOCS
        if hashlib.md5(str(i).encode()).hexdigest()[:2] < "80"
    }
    assert out == expect
    # stable under repartition
    out2 = {r["doc_id"] for r in hash_sample(docs_df.repartition(7), "80").collect()}
    assert out2 == expect


def test_connected_components(spark):
    from indexlab_spark.operators.dedup import connected_components

    # two components {1,2,3,9} (chain 1-2, 2-3, 3-9) and {5,6}; 7 isolated
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 9), (5, 6)], ["id_a", "id_b"]
    )
    nodes = spark.createDataFrame([(i,) for i in [1, 2, 3, 5, 6, 7, 9]], ["id"])
    got = {r["id"]: r["cluster"] for r in connected_components(edges, nodes).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 9: 1, 5: 5, 6: 5, 7: 7}


def test_gapfill_locf(spark):
    import datetime as dt

    from indexlab_spark.operators.analytics import time_gapfill_locf

    t0 = dt.datetime(2024, 1, 1, 0, 30)
    rows = [
        ("a", t0, 1.0),
        ("a", t0 + dt.timedelta(hours=0, minutes=10), 2.0),
        # hour 1 missing entirely -> gap, locf carries 3.0
        ("a", t0 + dt.timedelta(hours=2), 5.0),
    ]
    ev = spark.createDataFrame(rows, ["event_type", "ts", "value"])
    out = {r["bucket_hour"]: r.asDict() for r in time_gapfill_locf(ev).collect()}
    assert len(out) == 3
    assert out["2024-01-01 00:00"]["n"] == 2
    assert out["2024-01-01 00:00"]["locf_value"] == 3.0
    gap = out["2024-01-01 01:00"]
    assert gap["is_gap"] is True and gap["n"] == 0 and gap["locf_value"] == 3.0
    assert out["2024-01-01 02:00"]["locf_value"] == 5.0


def test_temperature_resample(spark):
    import math

    from indexlab_spark.operators.curation import temperature_resample

    rows = [(i, "x" * 5, "en" if i < 90 else "de") for i in range(100)]
    df = spark.createDataFrame(rows, ["doc_id", "text", "lang"])
    out = temperature_resample(df, alpha=0.5, budget_frac=0.5).collect()
    by_lang = {}
    for r in out:
        by_lang.setdefault(r["lang"], []).append(r)
    # rare lang upsampled to rate 1.0 (clamped) -> all 10 kept
    n_total, sum_sqrt = 100, math.sqrt(90) + math.sqrt(10)
    rate_de = min(1.0, 0.5 * n_total * (math.sqrt(10) / sum_sqrt) / 10)
    assert rate_de == 1.0
    assert len(by_lang["de"]) == 10
    rate_en = min(1.0, 0.5 * n_total * (math.sqrt(90) / sum_sqrt) / 90)
    assert all(r["rate"] == round(rate_en, 6) for r in by_lang["en"])
    # keep decision reproducible across partitionings
    out2 = temperature_resample(
        df.repartition(7), alpha=0.5, budget_frac=0.5
    ).collect()
    assert {r["doc_id"] for r in out2} == {r["doc_id"] for r in out}
    # alpha != 0.5 is rejected (pow() is not oracle-portable)
    import pytest as _pytest

    with _pytest.raises(ValueError):
        temperature_resample(df, alpha=0.7)


def test_pack_sequences(spark):
    from indexlab_spark.operators.curation import pack_sequences

    # 1 bucket so packing order is just doc_id order: 3 docs x 300 tokens
    rows = [(i, " ".join(["tok"] * 300)) for i in range(3)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r["id"]: r.asDict() for r in pack_sequences(df, budget=512, n_buckets=1).collect()}
    assert out[0]["seq_id"] == "0-0" and out[0]["offset_in_seq"] == 0
    # doc 1 starts at token 300 -> still window 0, offset 300
    assert out[1]["seq_id"] == "0-0" and out[1]["offset_in_seq"] == 300
    # doc 2 starts at 600 -> window 1, offset 88
    assert out[2]["seq_id"] == "0-1" and out[2]["offset_in_seq"] == 600 - 512
    # deterministic under repartition
    outs = pack_sequences(df.repartition(5), budget=512, n_buckets=1).collect()
    assert {r["id"]: r["seq_id"] for r in outs} == {k: v["seq_id"] for k, v in out.items()}


def test_pack_sequences_properties(spark):
    """Invariants under arbitrary doc sizes: every doc appears exactly
    once, offsets stay below the budget, and within a bucket the
    token-weighted order by id reconstructs contiguous packing."""
    from hypothesis import given, settings, strategies as st

    from indexlab_spark.operators.curation import pack_sequences

    @settings(max_examples=10, deadline=None)
    @given(
        st.lists(st.integers(min_value=0, max_value=40), min_size=1, max_size=25),
        st.integers(min_value=8, max_value=64),
    )
    def check(word_counts, budget):
        rows = [(i, " ".join(["w"] * n)) for i, n in enumerate(word_counts)]
        df = spark.createDataFrame(rows, ["doc_id", "text"])
        out = pack_sequences(df, budget=budget, n_buckets=3).collect()
        assert sorted(r["id"] for r in out) == list(range(len(word_counts)))
        by_bucket = {}
        for r in out:
            assert 0 <= r["offset_in_seq"] < budget
            assert r["n_tokens"] == word_counts[r["id"]]
            by_bucket.setdefault(r["bucket"], []).append(r)
        for rows_b in by_bucket.values():
            rows_b.sort(key=lambda r: r["id"])
            cum = 0
            for r in rows_b:
                assert r["offset_in_seq"] == cum % budget
                assert r["seq_id"] == f"{r['bucket']}-{cum // budget}"
                cum += r["n_tokens"]

    check()


def test_quality_flags_matches_python_reference(spark):
    """Fuzz quality_flags against a straight-line python reimplementation
    of the documented semantics."""
    import re as _re

    from hypothesis import given, settings, strategies as st

    from indexlab_spark.operators.curation import (
        MAX_MEAN_WORD_LEN,
        MAX_SYMBOL_RATIO,
        MAX_WORDS,
        MIN_ALPHA_WORD_FRAC,
        MIN_MEAN_WORD_LEN,
        MIN_STOPWORD_HITS,
        MIN_WORDS,
        quality_flags,
    )
    from indexlab_spark.operators.textstats import STOPWORDS

    alphabet = st.sampled_from(list("ab #.12...the and CD"))
    texts = st.lists(
        st.text(alphabet=alphabet, min_size=0, max_size=60), min_size=1, max_size=8
    )

    def py_ref(text):
        toks = [t for t in _re.split(r"\s+", text.lower()) if t]
        n = len(toks)
        mean_wl = (sum(len(t) for t in toks) / n) if n else 0.0
        symbols = text.count("#") + text.count("...")
        symbol_ratio = symbols / n if n else 0.0
        alpha = sum(1 for t in toks if _re.search("[a-z]", t))
        alpha_frac = alpha / n if n else 0.0
        stop = sum(1 for t in toks if t in STOPWORDS["en"])
        keep = (
            MIN_WORDS <= n <= MAX_WORDS
            and MIN_MEAN_WORD_LEN <= mean_wl <= MAX_MEAN_WORD_LEN
            and symbol_ratio <= MAX_SYMBOL_RATIO
            and alpha_frac >= MIN_ALPHA_WORD_FRAC
            and stop >= MIN_STOPWORD_HITS
        )
        return (n, round(mean_wl, 6), round(symbol_ratio, 6),
                round(alpha_frac, 6), stop, keep)

    @settings(max_examples=10, deadline=None)
    @given(texts)
    def check(batch):
        df = spark.createDataFrame(list(enumerate(batch)), ["doc_id", "text"])
        got = {
            r["id"]: (r["n_words"], r["mean_word_len"], r["symbol_ratio"],
                      r["alpha_word_frac"], r["stop_hits"], r["keep"])
            for r in quality_flags(df).collect()
        }
        for i, text in enumerate(batch):
            assert got[i] == py_ref(text), (text, got[i], py_ref(text))

    check()


def test_token_budget_mix_semantics(spark):
    from indexlab_spark.operators.curation import token_budget_mix

    # srcA: 10 docs x 5 tokens = 50 total; budget 22 -> the kept prefix
    # STARTS inside 22 tokens: docs starting at cum 0,5,10,15,20 = 5 docs
    # (overshoot bounded by one document). srcB: budget 3 < 5 tokens ->
    # exactly the first document is still kept. srcC unlisted -> dropped.
    rows = []
    for si, (s, n) in enumerate((("srcA", 10), ("srcB", 4), ("srcC", 4))):
        for i in range(n):
            rows.append((si * 1000 + i, s, "one two three four five"))
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    out = token_budget_mix(
        df, budgets={"srcA": 22, "srcB": 3}, n_buckets=4
    ).collect()
    by_src = {}
    for r in out:
        by_src.setdefault(r["source"], []).append(r)
    assert set(by_src) == {"srcA", "srcB"}
    assert len(by_src["srcA"]) == 5
    assert len(by_src["srcB"]) == 1  # first doc kept even over budget
    # cum_tokens is the deterministic global running sum per source
    assert sorted(r["cum_tokens"] for r in by_src["srcA"]) == [5, 10, 15, 20, 25]

    # determinism across repartitionings
    out2 = token_budget_mix(
        df.repartition(7), budgets={"srcA": 22, "srcB": 3}, n_buckets=4
    ).collect()
    assert {(r["doc_id"], r["cum_tokens"]) for r in out2} == {
        (r["doc_id"], r["cum_tokens"]) for r in out
    }


def test_bloom_decontaminate_equals_exact(spark):
    """The Bloom scale path must be RESULT-identical to the exact
    broadcast path — false positives are killed by the verify join,
    false negatives are impossible by Bloom construction. Checked at
    fpp=0.5 too (a deliberately bad bitmap floods the verify join with
    false positives; output must not change)."""
    from indexlab_spark.operators.curation import bloom_decontaminate

    bench = spark.createDataFrame(
        [(100, "the quick brown fox jumps over the lazy dog")], ["doc_id", "text"]
    )
    train = spark.createDataFrame(
        [
            (0, "news: the quick brown fox jumps over a fence"),
            (1, "completely unrelated text about spark query planning engines"),
            (2, "the quick brown fox jumps over the lazy dog verbatim copy"),
        ],
        ["doc_id", "text"],
    )
    exact = {
        r["id"]: r.asDict()
        for r in decontaminate(train, bench, n=5, keep_clean=True).collect()
    }
    for fpp in (0.01, 0.5):
        bloom = {
            r["id"]: r.asDict()
            for r in bloom_decontaminate(
                train, bench, n=5, keep_clean=True, fpp=fpp
            ).collect()
        }
        assert bloom == exact, f"fpp={fpp}"
    assert exact[0]["contaminated"] and exact[2]["contaminated"]
    assert not exact[1]["contaminated"]


def test_bloom_build_no_false_negatives(spark):
    """Every inserted hash must test positive (Bloom's hard guarantee);
    a disjoint probe set at fpp=0.01 should be mostly negative."""
    import numpy as np

    from indexlab_spark.operators.curation import _bloom_build

    inserted = spark.range(0, 2000).selectExpr("xxhash64(id) AS h")
    raw, m, k = _bloom_build(inserted, 2000, 0.01)
    bits = np.frombuffer(raw, dtype=np.uint8)

    def contains(hv: np.ndarray) -> np.ndarray:
        hv = hv.view(np.uint64)
        h1 = hv % np.uint64(m)
        h2 = (hv >> np.uint64(33)) | np.uint64(1)
        ok = np.ones(len(hv), dtype=bool)
        for i in range(k):
            idx = (h1 + np.uint64(i) * h2) % np.uint64(m)
            ok &= (
                bits[(idx >> np.uint64(3)).astype(np.int64)]
                >> (idx & np.uint64(7)).astype(np.int64)
            ).astype(np.uint8) & 1 == 1
        return ok

    ins = np.array(
        [r["h"] for r in inserted.collect()], dtype=np.int64
    )
    assert contains(ins).all()
    probe = np.array(
        [r["h"] for r in spark.range(10_000, 12_000)
         .selectExpr("xxhash64(id) AS h").collect()],
        dtype=np.int64,
    )
    fp_rate = contains(probe).mean()
    assert fp_rate < 0.05, fp_rate


def test_dsir_weights_prefer_target_like_docs(spark):
    """A corpus doc sharing the target's vocabulary must out-weigh a doc
    from a disjoint vocabulary (the DSIR selling point), and weights must
    cover every corpus doc."""
    from indexlab_spark.operators.curation import dsir_weights

    target = spark.createDataFrame(
        [(100, "physics energy quantum field theory particle wave"),
         (101, "quantum particle energy field wave function physics")],
        ["doc_id", "text"],
    )
    corpus = spark.createDataFrame(
        [
            (0, "quantum field energy particle physics wave equation"),
            (1, "recipe butter flour sugar oven bake cake frosting"),
            (2, ""),
        ],
        ["doc_id", "text"],
    )
    rows = {r["id"]: r for r in dsir_weights(corpus, target).collect()}
    assert set(rows) == {0, 1, 2}
    assert rows[0]["logw"] > rows[1]["logw"]
    assert rows[2]["n_feats"] == 0 and rows[2]["logw"] == 0.0


def test_dsir_resample_deterministic_and_weighted(spark):
    """Gumbel top-k selection: deterministic across partitionings, takes
    exactly n_keep rows, and (statistically) prefers high-weight docs —
    checked here with weights far apart so preference is near-certain."""
    from indexlab_spark.operators.curation import dsir_resample

    target = spark.createDataFrame(
        [(1000, "alpha beta gamma delta epsilon zeta eta theta " * 4)],
        ["doc_id", "text"],
    )
    rows = [(i, "alpha beta gamma delta epsilon zeta eta theta") for i in range(20)]
    rows += [(i, "one two three four five six seven eight") for i in range(20, 40)]
    corpus = spark.createDataFrame(rows, ["doc_id", "text"])
    sel = dsir_resample(corpus, target, 10, seed="t").collect()
    assert len(sel) == 10
    sel2 = dsir_resample(corpus.repartition(7), target, 10, seed="t").collect()
    assert {r["id"] for r in sel} == {r["id"] for r in sel2}
    # weight gap dominates the Gumbel noise -> mostly target-like picks
    target_like = sum(1 for r in sel if r["id"] < 20)
    assert target_like >= 8, target_like


def test_bloom_decontaminate_empty_benchmark(spark):
    """An empty (or too-short-to-shingle) benchmark must yield zero
    contaminated docs — exercises the n_items=0 Bloom build path and
    the empty treeReduce edge."""
    from indexlab_spark.operators.curation import bloom_decontaminate

    bench = spark.createDataFrame([], "doc_id long, text string")
    train = spark.createDataFrame(
        [(1, "some ordinary training text with enough words here")],
        "doc_id long, text string",
    )
    out = bloom_decontaminate(train, bench, n=5, keep_clean=True).collect()
    assert len(out) == 1 and out[0]["n_overlap"] == 0
    assert not out[0]["contaminated"]


def test_curate_corpus_gate_composition(spark):
    """Each gate kills the doc it should; every input doc gets a row;
    keep == AND of the three verdicts."""
    from indexlab_spark.operators.curation import curate_corpus

    good = ("the quick brown fox jumps over the lazy dog and then walks "
            "into the nearby field with calm steady purpose")
    bench = spark.createDataFrame([(100, good)], ["doc_id", "text"])
    docs = spark.createDataFrame(
        [
            (1, good),                      # contaminated (shares 5-grams)
            (2, "short text"),              # fails quality (n_words < 10)
            (3, "the house stands in a wide green valley where it rains "
                "for most of the winter season every year"),
            (4, "the house stands in a wide green valley where it rains "
                "for most of the winter season every year"),  # dup of 3
        ],
        ["doc_id", "text"],
    )
    out = {r["id"]: r.asDict() for r in curate_corpus(docs, bench).collect()}
    assert set(out) == {1, 2, 3, 4}
    assert out[1]["contaminated"] and not out[1]["keep"]
    assert not out[2]["quality_keep"] and not out[2]["keep"]
    assert out[3]["dedup_keep"] and out[3]["keep"]
    assert not out[4]["dedup_keep"] and not out[4]["keep"]
    for r in out.values():
        assert r["keep"] == (
            r["quality_keep"] and r["dedup_keep"] and not r["contaminated"]
        )


def test_semantic_decontaminate_flags_planted_near_dup(spark):
    """A corpus vector nearly identical to a benchmark vector is
    flagged with the right nearest id; an orthogonal one is clean;
    rounded-tie resolves to the LOWEST benchmark id; zero vectors get
    sim 0. Blocked fallback (benchmark over the collect bound) returns
    the identical frame."""
    from indexlab_spark.operators.curation import semantic_decontaminate

    bench = spark.createDataFrame(
        [
            (10, [1.0, 0.0, 0.0, 0.0]),
            (11, [1.0, 0.0, 0.0, 0.0]),  # duplicate of 10 -> tie
            (12, [0.0, 1.0, 0.0, 0.0]),
        ],
        "vec_id long, embedding array<double>",
    )
    corp = spark.createDataFrame(
        [
            (0, [0.99, 0.01, 0.0, 0.0]),   # near bench 10/11 (tie)
            (1, [0.0, 0.0, 1.0, 0.0]),     # orthogonal to all
            (2, [0.0, 0.0, 0.0, 0.0]),     # zero vector
        ],
        "vec_id long, embedding array<double>",
    )
    out = {
        r["id"]: r
        for r in semantic_decontaminate(
            corp, bench, threshold=0.9, keep_clean=True
        ).collect()
    }
    assert len(out) == 3
    assert out[0]["contaminated"] and out[0]["max_sim"] > 0.99
    assert out[0]["nearest_bench_id"] == 10  # tie -> lowest id
    assert not out[1]["contaminated"] and out[1]["max_sim"] == 0.0
    assert out[2]["max_sim"] == 0.0
    flagged_only = semantic_decontaminate(corp, bench, threshold=0.9)
    assert {r["id"] for r in flagged_only.collect()} == {0}
    # fallback path: force the blocked join by shrinking the bound
    fb = {
        r["id"]: r
        for r in semantic_decontaminate(
            corp, bench, threshold=0.9, keep_clean=True, max_collect_rows=1
        ).collect()
    }
    for i in out:
        assert fb[i]["contaminated"] == out[i]["contaminated"]
        assert abs(fb[i]["max_sim"] - out[i]["max_sim"]) < 1e-6


def test_semantic_decontaminate_empty_benchmark(spark):
    """An empty benchmark flags nothing (keep_clean=False -> empty
    frame; schema intact)."""
    from indexlab_spark.operators.curation import semantic_decontaminate

    corp = spark.createDataFrame(
        [(0, [1.0, 0.0])], "vec_id long, embedding array<double>"
    )
    bench = spark.createDataFrame([], "vec_id long, embedding array<double>")
    out = semantic_decontaminate(corp, bench, threshold=0.5)
    assert out.count() == 0
    assert set(out.columns) == {"id", "max_sim", "nearest_bench_id", "contaminated"}
