"""Text analysis operators for training-data pipelines (SURVEY §7.1 M7).

Language-ID, quality scoring, token counting and document fingerprinting
over a documents table — all pure Catalyst expressions (no Python UDFs in
any per-row path), all expressible 1:1 in the DuckDB oracle. Two
documented exceptions are Arrow-batched (zlib/unicodedata live outside
SQL, deterministic by construction): ``compression_ratio`` and
``normalize_text``.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from indexlab_spark.functions.hashing import md5_long, token_shingles

# Tiny high-frequency stopword sets per language — enough signal for a
# heuristic n-gram/stopword language id. Deliberately small so the same
# lists inline into the DuckDB oracle SQL.
STOPWORDS = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "with", "for", "it"],
    "es": ["el", "la", "de", "que", "y", "en", "los", "del", "se", "las"],
    "de": ["der", "die", "und", "das", "ist", "von", "mit", "den", "nicht", "ein"],
    "fr": ["le", "la", "et", "les", "des", "est", "en", "que", "une", "dans"],
}

_BPE_ISH_TOKEN = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def tokens(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.array_remove(F.split(F.lower(c), r"\s+"), "")


def token_count(col: Column | str) -> Column:
    """Whitespace token count."""
    return F.size(tokens(col))


def bpe_ish_token_count(col: Column | str) -> Column:
    """Sub-word-ish token count: letter runs, digit runs, and individual
    punctuation marks counted separately (a BPE-flavored upper bound)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.size(F.regexp_extract_all(c, F.lit(_BPE_ISH_TOKEN), 0))


def stopword_hits(col: Column | str, lang: str) -> Column:
    """Count of tokens (with multiplicity) that are stopwords of ``lang``."""
    words = STOPWORDS[lang]
    return F.size(
        F.filter(tokens(col), lambda t: t.isin(*[F.lit(w) for w in words]))
    )


def lang_scores(col: Column | str) -> dict[str, Column]:
    return {lang: stopword_hits(col, lang) for lang in STOPWORDS}


def lang_id(col: Column | str) -> Column:
    """Heuristic language id: argmax of stopword hits; 'und' when no
    stopword of any language appears. Ties break by language code order
    (deterministic)."""
    scores = lang_scores(col)
    g = F.greatest(*[scores[lang] for lang in sorted(STOPWORDS)])
    expr = F.lit("und")
    for lang in sorted(STOPWORDS, reverse=True):
        expr = F.when((g > 0) & (scores[lang] == g), F.lit(lang)).otherwise(expr)
    return expr


def quality_features(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Per-doc quality features + a composite score in [0, 1].

    Features mirror what large-corpus quality filters use: length,
    mean word length, punctuation density, stopword ratio, digit ratio,
    uppercase ratio.
    """
    c = F.col(text_col)
    n_chars = F.length(c)
    toks = tokens(text_col)
    n_tokens = F.size(toks)
    n_punct = F.size(F.regexp_extract_all(c, F.lit(r"[^\w\s]"), 0))
    n_digits = F.size(F.regexp_extract_all(c, F.lit(r"[0-9]"), 0))
    n_upper = F.size(F.regexp_extract_all(c, F.lit(r"[A-Z]"), 0))
    sw = stopword_hits(text_col, "en")
    safe_tokens = F.greatest(n_tokens, F.lit(1))
    safe_chars = F.greatest(n_chars, F.lit(1))
    mean_word_len = F.round(n_chars / safe_tokens, 6)
    punct_ratio = F.round(n_punct / safe_chars, 6)
    digit_ratio = F.round(n_digits / safe_chars, 6)
    upper_ratio = F.round(n_upper / safe_chars, 6)
    stop_ratio = F.round(sw / safe_tokens, 6)
    # composite: reward stopword presence & sane word lengths, punish
    # punctuation/digit soup — a simple monotone formula, documented so
    # the oracle reproduces it exactly
    score = F.round(
        F.least(
            F.lit(1.0),
            F.greatest(
                F.lit(0.0),
                F.lit(0.3)
                + F.lit(0.4) * F.least(F.lit(1.0), stop_ratio * 5)
                - F.lit(0.3) * F.least(F.lit(1.0), punct_ratio * 10)
                - F.lit(0.2) * F.least(F.lit(1.0), digit_ratio * 10)
                + F.lit(0.3)
                * F.when((mean_word_len >= 3) & (mean_word_len <= 10), 1.0).otherwise(0.0),
            ),
        ),
        6,
    )
    return df.select(
        F.col(id_col).alias("id"),
        n_chars.alias("n_chars"),
        n_tokens.cast("int").alias("n_tokens"),
        mean_word_len.alias("mean_word_len"),
        punct_ratio.alias("punct_ratio"),
        digit_ratio.alias("digit_ratio"),
        upper_ratio.alias("upper_ratio"),
        stop_ratio.alias("stop_ratio"),
        score.alias("quality_score"),
    )


def stratified_split(
    df: DataFrame,
    id_col: str = "doc_id",
    strata_col: str | None = None,
    weights: dict[str, int] | None = None,
    salt: str = "split",
) -> DataFrame:
    """Deterministic train/val/test assignment — a training-pipeline
    staple the reference lacks.

    Buckets each row by md5(salt|id) mod 100 and maps bucket ranges to
    split names (default 80/10/10). Deterministic across runs, machines
    and engines (md5-portable — DuckDB-oracle-checkable); per-stratum
    proportions hold in expectation because the hash is independent of
    ``strata_col``. No shuffle: the assignment is a pure projection;
    downstream consumers filter on ``split`` (partition by it when
    writing for pruned reads).
    """
    weights = weights or {"train": 80, "val": 10, "test": 10}
    if sum(weights.values()) != 100:
        raise ValueError("weights must sum to 100")
    bucket = F.pmod(md5_long(F.concat(F.lit(f"{salt}|"), F.col(id_col).cast("string"))), F.lit(100))
    expr = None
    lo = 0
    for name, w in weights.items():
        cond = (bucket >= lo) & (bucket < lo + w)
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(cond, F.lit(name))
        lo += w
    cols = [F.col(c) for c in df.columns] + [expr.alias("split")]
    if strata_col:
        cols.append(F.col(strata_col).alias("stratum"))
    return df.select(*cols)


def fingerprint(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text", n: int = 5
) -> DataFrame:
    """Document fingerprint: minimum md5_long over word n-gram shingles
    (a 1-hash MinHash — winnowing-lite). Equal fingerprints are strong
    near-dup candidates; used as a cheap pre-cluster key at scale."""
    sh = token_shingles(F.col(text_col), n)
    fp = F.array_min(F.transform(sh, lambda s: md5_long(s)))
    return df.select(F.col(id_col).alias("id"), fp.alias("fingerprint"))


def heavy_hitters(
    df: DataFrame,
    phi: float = 0.002,
    text_col: str = "text",
) -> DataFrame:
    """Frequent-term mining via distributed Misra-Gries + exact verify —
    the sketch pattern for "which terms exceed phi of all tokens" that
    never shuffles the full (doc, term) posting frame.

    Pass 1 (sketch, zero shuffle): each partition runs a Misra-Gries
    summary of size k = ceil(1/phi) over its local token stream and
    emits only its <= k surviving candidate terms. Pigeonhole guarantee:
    any term with global frequency >= phi * N must exceed phi * n_p on
    at least one partition, so the union of partition candidates is a
    SUPERSET of the true heavy hitters — no false negatives, ever.

    Pass 2 (verify, candidate-bounded): the candidate set (<= k *
    n_partitions rows, broadcast) filters the token stream and only the
    survivors are exactly counted — the groupBy shuffles |candidates|
    distinct keys instead of the full vocabulary. False positives from
    pass 1 die here, so the output is EXACTLY the true heavy hitters
    (which is what makes this sketch oracle-checkable against a plain
    GROUP BY ... HAVING in DuckDB).

    At 100 TB: pass 1 is a map-only scan with O(k) state per task and
    truly ZERO shuffle (no repartition either — on a real deployment the
    source arrives in thousands of splits already, and repartitioning
    the tokenized corpus would itself be the largest shuffle in the
    job); it also emits each partition's token count, so the global
    total needs no separate corpus scan. Pass 2's shuffle carries
    candidate terms only. The full-vocabulary aggregation this replaces
    is the largest shuffle in corpus stats.

    Returns (term, freq, share double) for freq >= floor(phi * N) + 1.
    """
    import math

    import pandas as pd

    k = max(1, math.ceil(1.0 / phi))
    toks_df = df.select(tokens(text_col).alias("toks"))

    def _misra_gries(batches):
        counters: dict = {}
        n_local = 0
        for pdf in batches:
            for arr in pdf["toks"]:
                if arr is None:  # NULL text -> NULL token array
                    continue
                n_local += len(arr)
                for t in arr:
                    if t in counters:
                        counters[t] += 1
                    elif len(counters) < k:
                        counters[t] = 1
                    else:
                        dead = [c for c in counters if counters[c] == 1]
                        for c in dead:
                            del counters[c]
                        for c in counters:
                            counters[c] -= 1
        # one NULL-term row per partition carries the local token count
        yield pd.DataFrame(
            {
                "term": list(counters.keys()) + [None],
                "cnt": [0] * len(counters) + [n_local],
            }
        )

    from indexlab_spark.functions.cache import pin

    sketch = pin(toks_df.mapInPandas(_misra_gries, "term string, cnt long"))
    candidates = (
        sketch.filter(F.col("term").isNotNull()).select("term").distinct()
    )
    total = sketch.filter(F.col("term").isNull()).agg(
        F.sum("cnt").alias("n_tokens")
    )
    exploded = df.select(F.explode(tokens(text_col)).alias("term"))
    exact = (
        exploded.join(F.broadcast(candidates), "term")
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    thresh = (F.floor(F.col("n_tokens") * phi) + 1).cast("bigint")
    return (
        exact.crossJoin(F.broadcast(total))
        .filter(F.col("freq") >= thresh)
        .select(
            "term",
            "freq",
            F.round(
                F.col("freq").cast("double") / F.col("n_tokens").cast("double"),
                6,
            ).alias("share"),
        )
    )


def compression_ratio(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Per-document zlib compression ratio — the classic repetitiveness /
    low-entropy signal (used alongside Gopher-style rules in public
    curation recipes: highly repetitive boilerplate compresses far
    below natural prose). ``ratio = compressed_bytes / raw_bytes``
    (UTF-8), 1.0 for empty docs by convention.

    zlib lives outside SQL, so this is the module's one Arrow-batched
    exception (documented in the header contract) and a rows-only
    registry surface: zlib output is DETERMINISTIC for a fixed level,
    so results are still reproducible across runs and partitionings —
    pinned by tests. Shuffle-free map; cost ~ bytes scanned.
    """
    import zlib

    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def _ratio(texts: pd.Series) -> pd.Series:
        out = []
        for t in texts:
            raw = (t or "").encode("utf-8")
            if not raw:
                out.append(1.0)
                continue
            out.append(len(zlib.compress(raw, 6)) / len(raw))
        return pd.Series(out)

    return df.select(
        F.col(id_col).alias("id"),
        F.length(F.col(text_col)).alias("n_chars"),
        F.round(_ratio(F.col(text_col)), 6).alias("zlib_ratio"),
    )


def normalize_text(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    form: str = "NFKC",
    strip_accents: bool = True,
    lowercase: bool = True,
) -> DataFrame:
    """CCNet-style text normalization for dedup preprocessing (public
    recipe: unicode normalize -> strip accents -> lowercase -> squeeze
    whitespace). Exact dedup after this catches the trivial-variant
    duplicates (curly quotes, accents, case, NBSP) that byte-exact
    hashing misses.

    unicodedata lives outside SQL -> Arrow-batched pandas UDF (the
    per-row work is pure CPython C, no object churn); deterministic by
    construction. Shuffle-free map.
    """
    import unicodedata

    from pyspark.sql.functions import pandas_udf

    @pandas_udf("string")
    def _norm(texts: pd.Series) -> pd.Series:
        out = []
        for t in texts:
            s = unicodedata.normalize(form, t or "")
            if strip_accents:
                s = "".join(
                    ch for ch in unicodedata.normalize("NFD", s)
                    if not unicodedata.combining(ch)
                )
            if lowercase:
                s = s.lower()
            out.append(" ".join(s.split()))
        return pd.Series(out)

    return df.withColumn(text_col, _norm(F.col(text_col)))


def interpolated_lm_logprob(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    lambdas: tuple = (0.6, 0.3, 0.1),
) -> DataFrame:
    """Order-3 interpolated language-model score per document — the
    trigram big sibling of the unigram/bigram logprob entries and the
    closest in-container stand-in for CCNet/KenLM perplexity filtering
    (Jelinek-Mercer interpolation, public):

        P(w3 | w1 w2) = l3*(c123+1)/(c12+V) + l2*(c23+1)/(c2+V)
                        + l1*(c3+1)/(N+V)

    with all counts derived from the SAME corpus trigram stream
    (contexts count continuations, so c12 = sum_w3 c123 etc. — one
    consistent definition both engines can reproduce), add-one
    smoothing inside each component, and ``lambdas = (l3, l2, l1)``
    summing to 1. Output: (id, n_trigrams, avg_logprob 6dp); docs with
    <3 tokens have no trigrams and drop out.

    Plan: the corpus trigram stream shuffles ONCE (on its trigram key).
    The count model is assembled on the count frames — c123 enriched
    with c12/c23/c3 via count-frame-sized joins, N and V as broadcast
    scalars — so the doc stream never touches a second exchange; the
    model join back is keyed by the same (w1,w2,w3) the count agg
    produced, which AQE reuses.
    """
    from indexlab_spark.operators.bm25 import tokenize

    l3, l2, l1 = (float(x) for x in lambdas)
    toks = df.select(F.col(id_col).alias("id"), tokenize(text_col).alias("toks"))
    # the size filter also guards Spark's sequence(): with size < 3 the
    # bounds invert and sequence(2, size-1) would generate DESCENDING
    # indices (out of range), not an empty array
    doc_tri = toks.filter(F.size("toks") >= 3).select(
        "id",
        F.explode(
            F.expr(
                "transform(sequence(2, size(toks) - 1),"
                " i -> struct(toks[i-2] AS w1, toks[i-1] AS w2,"
                " toks[i] AS w3))"
            )
        ).alias("t"),
    ).select("id", "t.w1", "t.w2", "t.w3")
    # r17: ring-bounded pin instead of a raw persist — the returned frame
    # consumes doc_tri lazily so this function can never unpersist, and
    # the raw persist leaked one corpus-sized cache entry per call into
    # the session (functions/cache.py's whole rationale). deser: both
    # consumers (the c123 count chain and the model join back) are
    # JVM-side.
    from indexlab_spark.functions.cache import pin as _pin_

    doc_tri = _pin_(doc_tri, deser=True)
    c123 = doc_tri.groupBy("w1", "w2", "w3").agg(
        F.count(F.lit(1)).alias("c123")
    )
    # every lower-order count folds out of c123 (count-frame-sized
    # shuffles) — the full doc stream is aggregated exactly once
    c12 = c123.groupBy("w1", "w2").agg(F.sum("c123").alias("c12"))
    c23 = c123.groupBy("w2", "w3").agg(F.sum("c123").alias("c23"))
    c2 = c23.groupBy("w2").agg(F.sum("c23").alias("c2"))
    c3 = c123.groupBy("w3").agg(F.sum("c123").alias("c3"))
    n_total = c123.agg(F.sum("c123").alias("n"))
    vocab = toks.select(F.explode("toks").alias("w")).agg(
        F.countDistinct("w").alias("v")
    )
    model = (
        c123.join(c12, ["w1", "w2"])
        .join(c23, ["w2", "w3"])
        .join(F.broadcast(c2), "w2")
        .join(F.broadcast(c3), "w3")
        .crossJoin(F.broadcast(n_total))
        .crossJoin(F.broadcast(vocab))
    )
    p = (
        F.lit(l3) * (F.col("c123") + 1) / (F.col("c12") + F.col("v"))
        + F.lit(l2) * (F.col("c23") + 1) / (F.col("c2") + F.col("v"))
        + F.lit(l1) * (F.col("c3") + 1) / (F.col("n") + F.col("v"))
    )
    model = model.select("w1", "w2", "w3", F.log(p).alias("_lp"))
    return (
        doc_tri.join(model, ["w1", "w2", "w3"])
        .groupBy("id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_trigrams"),
            F.round(F.avg("_lp"), 6).alias("avg_logprob"),
        )
    )


def unigram_jsd(
    a: DataFrame,
    b: DataFrame,
    text_col: str = "text",
    smoothing: float = 0.5,
    top_n: int = 10,
) -> DataFrame:
    """Jensen-Shannon divergence between two corpora's unigram
    distributions — TEXT drift, the vocabulary-level companion to the
    numeric monitors (PSI/KS watch a value column; this watches what
    the corpus is ABOUT). Add-lambda smoothing over the union
    vocabulary keeps every term's contribution finite, natural-log
    JSD, per-term contributions surfaced so the answer is not just "it
    drifted" but WHICH terms moved.

    Output: top_n terms by contribution (term, c_a, c_b, contrib 6dp;
    ties break term-ascending) plus one ``<ALL>`` summary row carrying
    the total token counts and the full JSD.

    Plan: two map-side-combined token-count aggs, ONE vocab-sized
    full-outer join on term, scalar totals broadcast back, codegen
    arithmetic, TakeOrdered top-n — the corpus is scanned once per
    side and nothing row-sized is ever exchanged again.
    """
    lam = float(smoothing)
    if lam <= 0:
        raise ValueError(f"unigram_jsd: smoothing must be > 0, got {lam}")

    def counts(df: DataFrame, out: str) -> DataFrame:
        return (
            df.select(
                F.explode(
                    F.array_remove(
                        F.split(F.lower(F.col(text_col)), r"\s+"), ""
                    )
                ).alias("term")
            )
            .groupBy("term")
            .agg(F.count(F.lit(1)).alias(out))
        )

    j = (
        counts(a, "c_a")
        .join(counts(b, "c_b"), "term", "full_outer")
        .na.fill({"c_a": 0, "c_b": 0})
    )
    totals = j.agg(
        F.sum("c_a").alias("na"),
        F.sum("c_b").alias("nb"),
        F.count(F.lit(1)).alias("v"),
    )
    x = j.crossJoin(F.broadcast(totals))
    p = (F.col("c_a") + lam) / (F.col("na") + lam * F.col("v"))
    q = (F.col("c_b") + lam) / (F.col("nb") + lam * F.col("v"))
    m = (p + q) / 2
    contrib = 0.5 * p * F.log(p / m) + 0.5 * q * F.log(q / m)
    top = (
        x.select(
            "term",
            "c_a",
            "c_b",
            F.round(contrib, 6).alias("contrib"),
            # rank key: contributions quantized FINER than the output
            # (9dp) — the round-before-rank discipline. The raw rank
            # key is ln()-derived, and JVM Math.log vs glibc log differ
            # in final ulps, which flipped the top-n CUT between
            # near-tied terms at sf0.1; 1e-9 quanta sit ~12 orders
            # above that noise while preserving the true ordering.
            # Exact ties (identical count pairs) break term-ascending.
            F.round(contrib, 9).alias("_rk"),
        )
        .orderBy(F.col("_rk").desc(), F.col("term").asc())
        .limit(top_n)
        .drop("_rk")
    )
    total = x.agg(
        F.max("na").alias("c_a"),
        F.max("nb").alias("c_b"),
        F.round(F.sum(contrib), 6).alias("contrib"),
    ).select(F.lit("<ALL>").alias("term"), "c_a", "c_b", "contrib")
    return top.unionByName(total)


# Compact SMART-style stopword list for RAKE phrase boundaries — kept
# small and ASCII so the identical alternation inlines into the DuckDB
# oracle (the STOPWORDS-dict discipline above).
RAKE_STOPWORDS = [
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "are",
    "was", "that", "with", "for", "it", "on", "as", "by", "at",
    "be", "this", "from", "but", "not", "have",
]


def rake_keywords(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    stopwords: list[str] | None = None,
    top_n: int = 5,
) -> DataFrame:
    """RAKE keyword extraction (Rapid Automatic Keyword Extraction,
    Rose, Engel, Cramer & Cowley 2010 — public): multi-word keyphrases
    per document, the PHRASE-level companion to tfidf_topterms' single
    terms. Candidate phrases are the maximal runs of content words
    between stopwords/punctuation; within a document each word scores
    deg(w)/freq(w) (deg = total length of candidate phrases containing
    w — co-occurrence degree; freq = its occurrence count), and a
    phrase scores the sum of its member words' scores, so words that
    keep company in LONG phrases outrank frequent loners.

    Everything is pure Catalyst: phrase segmentation is two
    regexp_replace passes (punctuation -> boundary, then
    space-delimited stopword -> boundary run twice — the second pass
    catches stopwords left adjacent after the first; NO lookarounds,
    so the identical pattern runs under DuckDB's RE2 oracle), then
    split / posexplode. Word stats are ONE map-side-combined
    (doc, word) aggregation; the join back is co-partitioned on the
    same key; phrase assembly and the top-n window are doc-keyed —
    every stage is keyed on the document, so the operator scales
    embarrassingly at corpus size.

    Ties rank deterministically (score desc 6dp, phrase asc). Output:
    id_col, phrase, n_words, score (6dp), rank (1..top_n). Duplicate
    phrases within a doc collapse to one row (identical score by
    construction).
    """
    if top_n < 1:
        raise ValueError(f"rake_keywords: top_n must be >= 1, got {top_n}")
    stops = stopwords if stopwords is not None else RAKE_STOPWORDS
    if not stops:
        raise ValueError("rake_keywords: stopwords must be non-empty")
    alt = "|".join(sorted(stops))
    did = F.col(id_col)
    s = F.concat(F.lit(" "), F.lower(F.col(text_col)), F.lit(" "))
    s = F.regexp_replace(s, "[^a-z0-9 ]", "|")
    stop_pat = f" ({alt}) "
    s = F.regexp_replace(s, stop_pat, " | ")
    s = F.regexp_replace(s, stop_pat, " | ")
    phrases = F.filter(
        F.transform(F.split(s, "\\|"), lambda p: F.trim(p)),
        lambda p: p != "",
    )
    # r16 (guide §2.4): hash-partition the DOCUMENT rows once, before
    # the regex/explode — every downstream stage (word stats, the join
    # back, phrase assembly, the top-n window) is keyed on _id, so with
    # the source partitioned on _id and the exploded frame pinned, the
    # whole operator runs on ONE exchange of the small doc rows instead
    # of ~5 exchanges of exploded word rows; the pin also stops the
    # two-consumer occ frame from running the stopword regexes twice.
    n_parts = int(
        df.sparkSession.conf.get("spark.sql.shuffle.partitions", "200")
        or 200
    )
    cand = (
        df.select(did.alias("_id"), F.col(text_col))
        .repartition(n_parts, "_id")
        .select("_id", phrases.alias("_ps"))
        .select("_id", F.posexplode("_ps").alias("_pos", "_phrase"))
        .withColumn("_words", F.split("_phrase", " +"))
    )
    from indexlab_spark.functions.cache import pin as _pin

    occ = _pin(
        cand.select(
            "_id",
            "_pos",
            "_phrase",
            F.size("_words").alias("_plen"),
            F.explode("_words").alias("_w"),
        )
    )
    wstats = occ.groupBy("_id", "_w").agg(
        F.count(F.lit(1)).alias("_freq"),
        F.sum("_plen").alias("_deg"),
    ).withColumn(
        "_wscore", F.col("_deg").cast("double") / F.col("_freq")
    )
    scored = occ.join(wstats, ["_id", "_w"]).groupBy(
        "_id", "_pos", "_phrase"
    ).agg(
        F.sum("_wscore").alias("_score"),
        F.count(F.lit(1)).alias("_nw"),
    )
    uniq = scored.groupBy("_id", "_phrase").agg(
        F.max(F.round("_score", 6)).alias("score"),
        F.max("_nw").alias("n_words"),
    )
    w = Window.partitionBy("_id").orderBy(
        F.col("score").desc(), F.col("_phrase").asc()
    )
    return uniq.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= top_n
    ).select(
        F.col("_id").alias(id_col),
        F.col("_phrase").alias("phrase"),
        F.col("n_words").cast("long").alias("n_words"),
        "score",
        F.col("rank").cast("long").alias("rank"),
    )


def lexical_richness(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document lexical richness profile — the vocabulary-side
    quality signals the curation stack's length/punct features miss:
    TTR (type-token ratio, Templin 1957 usage), hapax rate (share of
    the doc's vocabulary used exactly once — boilerplate and keyword
    stuffing crater it), and Yule's K (Yule 1944, public) — the
    repeat-rate statistic 10^4 * (sum_m m^2 V_m - N) / N^2 over the
    frequency spectrum V_m (# types occurring m times), which unlike
    TTR is approximately length-invariant and is the standard
    "machine-generated text repeats itself" screen.

    Tokenization: lowercase whitespace split (the BM25/tokens
    contract, so the numbers line up with the rest of the text
    family). Empty docs emit n_tokens = 0 with NULL ratios.

    Distributed shape: ONE corpus pass — explode_outer keeps empty
    docs as a NULL-token row (so no second scan / anti-join to find
    them), then a (doc, token) count agg and a doc-keyed spectrum agg
    (both map-side combined, everything keyed by doc id —
    embarrassingly parallel, no corpus-global state). Output: id_col,
    n_tokens, n_types, ttr (6dp), hapax_rate (6dp, hapax/types),
    yule_k (6dp; 0 for all-distinct docs, NULL only when N = 0).
    """
    toks = df.select(
        F.col(id_col),
        F.explode_outer(
            F.filter(
                F.split(F.lower(F.col(text_col)), r"\s+"),
                lambda t: t != "",
            )
        ).alias("_tok"),
    )
    per_type = toks.groupBy(id_col, "_tok").agg(
        F.count(F.lit(1)).alias("_m")
    )
    real = F.col("_tok").isNotNull()
    agg = per_type.groupBy(id_col).agg(
        F.sum(F.when(real, F.col("_m")).otherwise(0))
        .cast("long")
        .alias("n_tokens"),
        F.sum(real.cast("long")).cast("long").alias("n_types"),
        F.sum((real & (F.col("_m") == 1)).cast("long"))
        .cast("long")
        .alias("_hapax"),
        F.sum(F.when(real, F.col("_m") * F.col("_m")).otherwise(0))
        .cast("double")
        .alias("_sm2"),
    )
    n = F.col("n_tokens").cast("double")
    # try_divide: an empty doc's 0/0 must be NULL, not an ANSI
    # divide-by-zero error
    return agg.select(
        id_col,
        "n_tokens",
        "n_types",
        F.round(F.try_divide(F.col("n_types"), n), 6).alias("ttr"),
        F.round(
            F.try_divide(F.col("_hapax"), F.col("n_types")), 6
        ).alias("hapax_rate"),
        F.round(
            F.try_divide(
                F.lit(10_000.0) * (F.col("_sm2") - n), n * n
            ),
            6,
        ).alias("yule_k"),
    )


def vocab_richness(
    df: DataFrame,
    text_col: str = "text",
) -> DataFrame:
    """CORPUS-level vocabulary richness — the collection-side
    companion to :func:`lexical_richness`'s per-doc profile, built
    from the global frequency spectrum f_m (# types occurring m
    times): Chao1's bias-corrected unseen-vocabulary estimate
    V + f1(f1-1)/(2(f2+1)) (Chao 1984, public), the Good-Turing
    unseen-probability mass f1/N (Good 1953), and Herdan's C
    ln V / ln N — the three numbers that say whether a corpus's
    vocabulary is saturating (dedup/quality work done) or still
    growing (more data genuinely adds words).

    Distributed shape: one explode -> ONE map-side-combined token
    count (the single corpus-sized shuffle, vocab-sized output) ->
    a tiny spectrum aggregation to one row. Tokenization is the
    lowercase-whitespace contract shared with the rest of the text
    family.

    Output (one row): n_tokens, n_types, f1, f2, chao1 (6dp),
    gt_unseen_mass (6dp), herdan_c (6dp; NULL for degenerate N <= 1).
    """
    toks = df.select(
        F.explode(
            F.filter(
                F.split(F.lower(F.col(text_col)), r"\s+"),
                lambda t: t != "",
            )
        ).alias("_tok")
    )
    per_type = toks.groupBy("_tok").agg(F.count(F.lit(1)).alias("_m"))
    agg = per_type.groupBy().agg(
        F.sum("_m").cast("long").alias("n_tokens"),
        F.count(F.lit(1)).cast("long").alias("n_types"),
        F.sum((F.col("_m") == 1).cast("long")).cast("long").alias("f1"),
        F.sum((F.col("_m") == 2).cast("long")).cast("long").alias("f2"),
    )
    n = F.col("n_tokens").cast("double")
    v = F.col("n_types").cast("double")
    f1 = F.col("f1").cast("double")
    f2 = F.col("f2").cast("double")
    return agg.select(
        "n_tokens",
        "n_types",
        "f1",
        "f2",
        F.round(v + f1 * (f1 - 1) / (2 * (f2 + 1)), 6).alias("chao1"),
        F.round(f1 / n, 6).alias("gt_unseen_mass"),
        F.round(
            F.when(n > 1, F.log(v) / F.log(n)), 6
        ).alias("herdan_c"),
    )
