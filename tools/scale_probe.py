"""Empirical scaling probe: run representative operators at 1x and Nx
replicated corpus size and report the runtime growth factor.

A shuffle- or pair-explosion bottleneck shows up as growth >> N; a
fixed-overhead-dominated op shows growth << N. Near-linear growth
(~N, modulo the amortizing job floor) is the behavior that extrapolates
to a multi-executor cluster — the bench's _large variants prove it for
the B1-B6 suites, this probe proves it for the dedup/curation/session
families that have no _large twin.

Usage: python tools/scale_probe.py [N] [sf_dir] [op ...]
(default 8x, sf0.1; extra args restrict the run to those ops)
Prints one JSON line: {"op": {"t1": s, "tN": s, "growth": tN/t1}, ...}

Note on N > 9 for document ops: replicate_docs has 9 distinct letter
rotations, so at 16x replica texts repeat with period 9 — shingle/
vocab DOMAINS grow ~9x while token volume grows 16x. Fine for the
volume-driven ops probed at 16x (trigram_lm joins on trigram types,
line_dedup's 40-word key domain is saturated anyway); do NOT read
pair-based ops (minhash/jaccard/simhash) at N > 9.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from indexlab_spark.session import get_spark, load_tables


def replicate_docs(docs, n: int):
    # Each replica gets a DIFFERENT letter-rotation of its text: shingles
    # (and so jaccard/minhash/simhash matches) across replicas vanish,
    # while within-replica structure (planted near-dups, lengths, token
    # counts) is preserved. This models real growth — more data is more
    # DISTINCT documents — instead of planting n-cliques of near-identical
    # replicas, which made every pair-based op look quadratic for a reason
    # that was an artifact of the probe, not the operator. (A one-token
    # "repN" prefix, the previous scheme, leaves jaccard ~= 1 between
    # replicas.) Distinct rotations exist for n <= 9; beyond that some
    # replica pairs would collide again.
    alpha = "aeiousnrt"

    def rot(r: int) -> str:
        r = r % len(alpha)
        return alpha[r:] + alpha[:r]

    text = F.when(F.col("_rep") == 0, F.col("text"))
    for r in range(1, n):
        text = text.when(
            F.col("_rep") == r,
            F.translate(F.col("text"), alpha, rot(r if r % len(alpha) else 1)),
        )
    return (
        docs.crossJoin(F.broadcast(
            docs.sparkSession.range(n).select(F.col("id").alias("_rep"))
        ))
        .select(
            (F.col("doc_id") + F.col("_rep") * 10_000_000).alias("doc_id"),
            text.alias("text"),
            "lang",
            "source",
            "n_chars",
        )
        .repartition(docs.sparkSession.sparkContext.defaultParallelism)
    )


def replicate_events(ev, n: int):
    return (
        ev.crossJoin(F.broadcast(
            ev.sparkSession.range(n).select(F.col("id").alias("_rep"))
        ))
        .select(
            (F.col("event_id") + F.col("_rep") * 10_000_000).alias("event_id"),
            "ts",
            # distinct user space per replica: state/keys scale with data,
            # skew stays flat — the multi-tenant growth pattern
            (F.col("user_id") + F.col("_rep") * 1_000_000).alias("user_id"),
            "event_type",
            "value",
            "props",
        )
        .repartition(ev.sparkSession.sparkContext.defaultParallelism)
    )


def main() -> None:
    # The usage line says [N] [sf_dir] [op ...] with sf_dir optional, so
    # honor that: argv[2] is an sf_dir only if it names a real directory;
    # otherwise it's the first op filter (ADVICE r14: 'scale_probe.py 16
    # trigram_lm' silently treated the op name as sf_dir).
    rest = sys.argv[1:]
    n = int(rest.pop(0)) if rest else 8
    if rest and os.path.isdir(rest[0]):
        sf_dir = rest.pop(0)
    else:
        sf_dir = "/root/testdata/sf0.1"
    only_ops = set(rest)
    spark = get_spark("scale-probe")
    t = load_tables(spark, sf_dir, ("documents", "events"))
    docs1 = t["documents"].persist()
    ev1 = t["events"].persist()
    docsN = replicate_docs(t["documents"], n).persist()
    evN = replicate_events(t["events"], n).persist()
    docs1.count(), docsN.count(), ev1.count(), evN.count()  # materialize

    emb1 = load_tables(spark, sf_dir, ("embeddings",))["embeddings"].persist()
    embN = (
        emb1.crossJoin(F.broadcast(
            spark.range(n).select(F.col("id").alias("_rep"))
        ))
        .select(
            (F.col("vec_id") + F.col("_rep") * 10_000_000).alias("vec_id"),
            # per-replica SIGN-FLIP mask (flip dims where i % 9 < rep):
            # cosine between any replica and any other replica/original
            # drops far below near-dup thresholds, while within-replica
            # planted structure is preserved (both members get the same
            # mask) — so pair counts grow linearly with replicas, the
            # real-growth pattern, instead of n-clique quadratically
            F.when(F.col("_rep") == 0, F.col("embedding")).otherwise(
                F.transform(
                    F.col("embedding"),
                    lambda x, i: F.when(i % 9 < F.col("_rep"), -x).otherwise(x),
                )
            ).alias("embedding"),
            "label",
        )
        .repartition(spark.sparkContext.defaultParallelism)
        .persist()
    )
    emb1.count(), embN.count()

    from indexlab_spark.operators.bm25 import bm25_build
    from indexlab_spark.operators.curation import (
        bloom_decontaminate,
        quality_flags,
        redact_pii,
        semantic_decontaminate,
        token_budget_mix,
    )
    from indexlab_spark.operators.analytics import (
        quantile_sketch_rollup,
        quantile_union_estimate,
        skew_report,
        transition_matrix,
    )
    from indexlab_spark.operators.bpe import train_bpe
    from indexlab_spark.operators.dedup import exact_dedup_incremental
    from indexlab_spark.operators.decompose import pca_fit
    from indexlab_spark.operators.textstats import interpolated_lm_logprob
    from indexlab_spark.operators.dedup import (
        connected_components,
        embedding_lsh_pairs,
        exact_dedup,
        jaccard_pairs,
        k_truss,
        label_propagation,
        line_dedup,
        minhash_lsh_pairs,
        pagerank,
        remove_duplicated_spans,
        simhash,
    )

    def _needs(*names: str) -> bool:
        """True when any of the named ops is in this run's filter (or no
        filter was given). Gates the expensive prior-run-state builds —
        a probe restricted to e.g. trigram_lm must not spend minutes
        building Nx minhash signatures / IVF centroids / graph edges it
        never reads. Ungated ops pay None-state at call time, which is
        a loud AttributeError, not a silent wrong number."""
        return not only_ops or bool(only_ops & set(names))

    # fixed old index for the incremental-dedup case (docs1-derived at
    # BOTH scales — the production shape: state grows, batches don't)
    old_idx = None
    if _needs("exact_dedup_inc"):
        old_idx = (
            exact_dedup(docs1).select("text_md5", "keep_id").localCheckpoint()
        )

    # fixed-batch incremental MinHash state: one batch (10% of the 1x
    # corpus), per-scale old corpora and their PRE-BUILT signature
    # indexes (prior-run state, excluded from the timed path)
    from indexlab_spark.operators.dedup import (
        minhash_incremental_pairs,
        minhash_signatures,
    )

    _FIXED_BATCH_OPS = (
        "minhash_inc_fixed_batch",
        "exact_dedup_inc_fixed_batch",
        "bm25_refresh_fixed_batch",
    )
    mh_batch = mh_old = mh_sigs = None
    if _needs(*_FIXED_BATCH_OPS):
        mh_batch = docs1.filter(F.col("doc_id") % 10 == 0).localCheckpoint()
        mh_old = {
            s: d.join(mh_batch.select("doc_id"), "doc_id", "left_anti")
                .localCheckpoint()
            for s, d in ((1, docs1), (n, docsN))
        }
    if _needs("minhash_inc_fixed_batch"):
        mh_sigs = {
            s: minhash_signatures(d).localCheckpoint(eager=True)
            for s, d in mh_old.items()
        }

    # r8 VERDICT item 5: extend the fixed-batch-vs-grown-state probe to
    # one representative per remaining incremental family, so the
    # "per-refresh cost is batch-sized, not corpus-sized" claim is
    # MEASURED wherever it is made. All prior-run state is built
    # outside the timer.
    from indexlab_spark.operators.bm25 import _raw_postings, bm25_refresh
    from indexlab_spark.operators.knn import build_ivf, ivf_append

    # exact-dedup family: per-scale persisted (text_md5, keep_id) index
    ed_idx = bm_tf = bm_dl = ivf_batch = ivf_cent = None
    if _needs("exact_dedup_inc_fixed_batch"):
        ed_idx = {
            s: exact_dedup(d).select("text_md5", "keep_id")
            .localCheckpoint(eager=True)
            for s, d in mh_old.items()
        }
    # BM25 family: per-scale raw posting + doc-length state
    if _needs("bm25_refresh_fixed_batch"):
        bm_tf = {
            s: _raw_postings(d, "doc_id", "text").localCheckpoint(eager=True)
            for s, d in mh_old.items()
        }
        bm_dl = {
            s: t.groupBy("doc_id").agg(F.first("dl").alias("dl"))
            .localCheckpoint(eager=True)
            for s, t in bm_tf.items()
        }
    # ANN family: per-scale trained centroids (nlist fixed — the state
    # an append touches is centroid-sized BY CONSTRUCTION; the probe
    # verifies nothing corpus-sized leaks into the append path)
    if _needs("ivf_append_fixed_batch"):
        ivf_batch = emb1.filter(F.col("vec_id") % 10 == 0).localCheckpoint(
            eager=True
        )
        ivf_cent = {
            s: build_ivf(e, nlist=64, seed=42)[1].localCheckpoint(eager=True)
            for s, e in ((1, emb1), (n, embN))
        }

    # r10 VERDICT item 5: growth-measure the graph family's "one keyed
    # join per round" claim (plan-audited until now). The co-purchase
    # edge set from lineitem is replicated with per-replica node-id
    # offsets — N disjoint copies of the SAME graph, so per-round join
    # work grows ~N while round count (fixed-iteration contract) stays
    # constant. State built outside the timer.
    g_edges = g_nodes = None
    if _needs("pagerank_fixed8", "label_prop_fixed3", "ktruss_peel"):
        li_g = load_tables(spark, sf_dir, ("lineitem",))["lineitem"].select(
            "l_orderkey", "l_partkey"
        )
        _ga, _gb = li_g.alias("a"), li_g.alias("b")
        edges_base = (
            _ga.join(
                _gb,
                (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
                & (F.col("a.l_partkey") < F.col("b.l_partkey")),
            )
            .groupBy(
                F.col("a.l_partkey").alias("id_a"),
                F.col("b.l_partkey").alias("id_b"),
            )
            .agg(F.count(F.lit(1)).alias("_n"))
            .filter(F.col("_n") >= 2)
            .select("id_a", "id_b")
        )

        def _replicate_edges(e, reps: int):
            if reps == 1:
                return e
            return e.crossJoin(F.broadcast(
                spark.range(reps).select(F.col("id").alias("_rep"))
            )).select(
                (F.col("id_a") + F.col("_rep") * 10_000_000).alias("id_a"),
                (F.col("id_b") + F.col("_rep") * 10_000_000).alias("id_b"),
            )

        g_edges = {
            s: _replicate_edges(edges_base, s).localCheckpoint(eager=True)
            for s in (1, n)
        }
        g_nodes = {
            s: e.select(F.col("id_a").alias("id"))
            .unionByName(e.select(F.col("id_b").alias("id")))
            .distinct()
            .localCheckpoint(eager=True)
            for s, e in g_edges.items()
        }

    from indexlab_spark.operators.analytics import (
        markov_attribution,
        sequence_pairs,
        wasserstein_1d,
        weighted_quantiles,
    )
    from indexlab_spark.operators.maintenance import hilbert_key
    from indexlab_spark.operators.textstats import rake_keywords

    def _rake(docs):
        return rake_keywords(docs, top_n=3).count()

    def _wq(docs):
        return weighted_quantiles(
            docs.select(
                "lang",
                F.col("n_chars").cast("double").alias("v"),
                ((F.col("doc_id") % 7) + 1).cast("double").alias("w"),
            ),
            ["lang"], "v", "w", [0.5, 0.9],
        ).count()

    def _hilbert(ev):
        return hilbert_key(
            ev.select("event_id", "user_id", "value"),
            ["user_id", "value"], bits=8,
        ).count()

    # r17 (r16 VERDICT item 9): growth-prove the FORCED-DISTRIBUTED
    # fallbacks of the r16 bounded driver fits — cap monkeypatched to 0
    # exactly like the parity tests, so the >cap paths' timing SHAPE is
    # attested at scale, not just their correctness.
    from indexlab_spark.operators import bpe as _bpe_mod
    from indexlab_spark.operators import curation as _cur_mod
    from indexlab_spark.operators.curation import train_quality_classifier

    def _forced(mod, attr, fn):
        old = getattr(mod, attr)
        setattr(mod, attr, 0)
        try:
            return fn()
        finally:
            setattr(mod, attr, old)

    def cases(docs, ev, emb, scale=1):
        def _classifier_dist():
            labeled = emb.select(
                "embedding",
                (F.col("label") <= 4).cast("double").alias("y"),
            )
            return _forced(
                _cur_mod, "_DRIVER_FIT_MAX_ELEMS",
                lambda: train_quality_classifier(
                    labeled, "y", iters=5, quantize_dp=9
                ).n_rows,
            )

        def _bpe_dist():
            return _forced(
                _bpe_mod, "_DRIVER_VOCAB_MAX",
                lambda: len(train_bpe(docs, n_merges=4)),
            )

        def _bloom_dist():
            return _forced(
                _cur_mod, "_BLOOM_DRIVER_MAX",
                lambda: bloom_decontaminate(
                    docs.filter(F.col("doc_id") % 17 != 0),
                    docs.filter(F.col("doc_id") % 17 == 0),
                    n=5,
                ).count(),
            )

        def _bm25():
            ts_, dl_, g_ = bm25_build(docs)
            k = ts_.count() + g_.count()
            ts_.unpersist()
            return k

        def _clusters():
            pairs = jaccard_pairs(docs, threshold=0.3).select("id_a", "id_b")
            return connected_components(
                pairs, docs.select(F.col("doc_id").alias("id"))
            ).count()

        return {
            # forced-distributed fallbacks of the r16 driver fits
            # (cap=0): epochs are per-partition collects (classifier),
            # vocab-frame merge rounds (bpe), treeReduce bitmap (bloom)
            "classifier_dist_forced": _classifier_dist,
            "bpe_dist_forced": _bpe_dist,
            "bloom_dist_forced": _bloom_dist,
            "exact_dedup": lambda: exact_dedup(docs).count(),
            "simhash": lambda: simhash(docs).count(),
            "minhash_lsh": lambda: minhash_lsh_pairs(docs, threshold=0.5).count(),
            "bm25_build": _bm25,
            "dedup_clusters": _clusters,
            # default policy (multiprobe="auto", overfull-bucket guard) —
            # the probe must measure what a caller actually gets
            "embedding_lsh": lambda: embedding_lsh_pairs(
                emb, dim=64, n_planes=128, bands=8, threshold=0.85
            ).count(),
            # candidate-count metric (r4 VERDICT): the UNVERIFIED pair
            # count is the quantity the multiprobe/bucket knobs bound;
            # its growth factor is reported alongside wall-clock
            "embedding_lsh_cand": lambda: embedding_lsh_pairs(
                emb, dim=64, n_planes=128, bands=8, threshold=0.85,
                _return_candidates=True,
            ).count(),
            "quality_pii": lambda: (
                quality_flags(docs).count() + redact_pii(docs).count()
            ),
            # cost ~ total tokens (gram agg + join-back + per-row cut):
            # should be near-linear; a pair-explosion here would mean the
            # gram-frequency join degenerated
            "clean_dup_spans": lambda: remove_duplicated_spans(
                docs, k=8
            ).count(),
            # budgets scaled with the corpus (x n at Nx) so the kept
            # fraction — and thus the work past the cumsum — is constant
            "token_budget_mix": lambda: token_budget_mix(
                docs,
                budgets={f"src{i}": 700 * scale for i in range(20)},
            ).count(),
            # the registry's hot-keyed worst case (40-word vocabulary at
            # token granularity): growth tests the min(struct) agg +
            # skew-joinable keep-mark, the exact path a window would lose
            "line_dedup": lambda: line_dedup(
                docs, delimiter=" ", min_chars=4
            ).count(),
            # both sides scale with the corpus here (replica rotation
            # makes benchmark shingles distinct per replica) — harsher
            # than the fixed-benchmark production case
            "bloom_decon": lambda: bloom_decontaminate(
                docs.filter(F.col("doc_id") % 17 != 0),
                docs.filter(F.col("doc_id") % 17 == 0),
                n=5,
            ).count(),
            "session_native": lambda: (
                ev.groupBy("user_id", F.session_window("ts", "30 minutes"))
                .count()
                .count()
            ),
            # corpus scales, benchmark FIXED (the production shape:
            # eval sets don't grow with the corpus) — map-only matmul,
            # growth should be ~N modulo the job floor
            "semantic_decontam": lambda: semantic_decontaminate(
                emb.filter(F.col("vec_id") % 20 != 7),
                emb1.filter(F.col("vec_id") % 20 == 7),
                threshold=0.4,
                keep_clean=True,
            ).count(),
            # doc stream aggregates once on the trigram key; count-frame
            # joins grow with DISTINCT trigram types (replica rotation
            # makes them distinct per replica — harsher than natural
            # vocabulary growth)
            "trigram_lm": lambda: interpolated_lm_logprob(docs).count(),
            # batch classification vs a FIXED old index (docs1-derived):
            # one hash pass + keyed join, growth ~N
            "exact_dedup_inc": lambda: exact_dedup_incremental(
                docs, old_idx
            ).count(),
            # merge-iteration cost is vocab-frame-sized; the corpus-wide
            # word count is the only stream-sized pass — growth should
            # stay well under N even with per-replica distinct vocab
            "bpe_train": lambda: len(train_bpe(docs, n_merges=4)),
            # round 7: quantile sketch rollup (fine grain + merged
            # estimate), PCA moment pass, transitions, skew report —
            # all expected ~linear (keyed windows / map-combined aggs)
            "quantile_rollup": lambda: quantile_union_estimate(
                quantile_sketch_rollup(
                    ev.withColumn("day", F.to_date("ts")),
                    ["event_type", "day"], "value", "event_id", k=256,
                ),
                ["event_type"], qs=(0.5, 0.95), k=256,
            ).count(),
            "pca_fit": lambda: int(pca_fit(emb, "embedding", k=4).n),
            "event_transitions": lambda: transition_matrix(
                ev, "user_id", "ts", "event_type"
            ).count(),
            "skew_report": lambda: skew_report(ev, ["user_id"]).count(),
            # FIXED-batch incremental MinHash: the batch is always 10%
            # of the 1x corpus while the OLD corpus (with its
            # pre-existing signature index, built outside the timer —
            # it is prior-run state) grows with the probe scale. The
            # incremental contract says this should stay ~FLAT (cost
            # tracks batch size) while a rebuild grows with the corpus.
            # This is the asymptotic evidence bench.py's
            # incremental_vs_rebuild caveat points to: at gate SF the
            # rebuild is too cheap for the ratio to dip below 1; here
            # the growth factor tells the story.
            "minhash_inc_fixed_batch": lambda: minhash_incremental_pairs(
                mh_batch, mh_old[scale], old_sigs=mh_sigs[scale]
            ).count(),
            # fixed batch vs grown persisted hash index: one batch hash
            # pass + a keyed join whose build side is the (deduped)
            # index — growth tracks the index scan, never old text
            "exact_dedup_inc_fixed_batch": lambda: exact_dedup_incremental(
                mh_batch, ed_idx[scale]
            ).count(),
            # fixed batch vs grown posting state: tokenize ~ batch; the
            # df/idf re-agg is the documented one full-state pass (map-
            # side combined, vocab-sized output) — growth should sit
            # well under N and far under a full rebuild
            "bm25_refresh_fixed_batch": lambda: bm25_refresh(
                bm_tf[scale], bm_dl[scale], mh_batch, materialize=False
            )[0].count(),
            # fixed batch vs centroids trained on the grown corpus:
            # the append touches batch + nlist-sized centroids only —
            # growth ~1.0 is the contract
            "ivf_append_fixed_batch": lambda: ivf_append(
                ivf_batch, ivf_cent[scale]
            ).count(),
            # round 10: RAKE is doc-keyed throughout (regex
            # segmentation + (doc, word) aggs + doc-keyed top-n) —
            # growth ~N; a blowup would mean a stage lost its doc key
            "rake_keywords": lambda: _rake(docs),
            # weighted quantiles: the (group, value) collapse is the
            # corpus pass; the cumulative window runs on the value
            # DOMAIN (grows slower than rows) — growth <= N
            "weighted_quantiles": lambda: _wq(docs),
            # hilbert key: stats collect + pure projection — growth ~N
            # with zero exchanges (the layout key must stay free)
            "hilbert_key": lambda: _hilbert(ev),
            # round 11: the graph family's "one keyed join + map-side
            # aggs per round, ONE driver action per round" claim,
            # growth-measured at the gates' fixed iteration counts
            # over N disjoint copies of the co-purchase graph. Rounds
            # are constant, per-round join work grows ~N — so total
            # time should grow ~N (modulo the per-round scheduling
            # floor, which at this SF dominates and pushes the factor
            # BELOW N; a factor >> N would mean a round stopped being
            # key-local).
            "pagerank_fixed8": lambda: pagerank(
                g_edges[scale], g_nodes[scale], max_iter=8, tol=None
            ).count(),
            "label_prop_fixed3": lambda: label_propagation(
                g_edges[scale], g_nodes[scale], max_iter=3
            ).count(),
            # round 12 (r11 VERDICT item 7): the two r11 ops with
            # nontrivial shuffle shapes, at the gate's own shapes.
            # wasserstein_1d: per-arm value-count collapse + per-bucket
            # cumsum windows + the <= n_buckets offset frame — every
            # window is bucket-keyed, so growth should track the
            # distinct-value domain (~N here because event values are
            # near-distinct), never a single-partition sort
            "wasserstein_arms": lambda: int(
                wasserstein_1d(
                    ev.filter(F.col("user_id") % 2 == 0),
                    ev.filter(F.col("user_id") % 2 == 1),
                    "value",
                ).count()
            ),
            # markov_attribution: one user-keyed window pass + one
            # (src, dst) count; the 60 fixed absorption iterations run
            # on the (channels+3)^2 driver matrix, CONSTANT in corpus
            # size (5 event types at every scale) — so growth tracks
            # the keyed window pass only, ~N modulo the job floor
            "markov_channels": lambda: markov_attribution(
                ev, "user_id", "ts", "event_type", "purchase"
            ).count(),
            # round 12 continuation: the k-truss peel (now oracle-
            # attested via the fixed-round replay) at the gate's
            # fixed-depth shape over N disjoint graph copies. Each
            # peel round is one degree-ordered oriented triangle join
            # — wedge work grows with sum(out_deg^2), which is ~N for
            # disjoint copies (degrees unchanged, nodes xN); a factor
            # >> N would mean the triangle join stopped being
            # key-local or the orientation stopped bounding wedges.
            "ktruss_peel": lambda: k_truss(
                g_edges[scale], 3, max_iter=8
            ).count(),
            # round 14 (r13 VERDICT item 5): the r12-rewritten
            # TakeOrderedAndProject cut, growth-measured post-rewrite.
            # Replicated events carry disjoint user spaces, so the
            # per-(sequence, event) min/max pass grows ~N while the
            # pair frame stays (event types)²-bounded per sequence;
            # the top-n cut is a distributed partial sort — growth
            # >> N would mean the cut regressed to a global window.
            "sequence_pairs": lambda: sequence_pairs(
                ev, "user_id", "ts", "event_type",
                min_support=0.05, top_n=30,
            ).count(),
        }

    def timed_min2(fn):
        """min of 2 runs — the per-plan FIRST-execution floor on this
        host is 0.5-2.5s (measured; see bench.py timed() note) and
        dominates sub-10s cases; worse, an ADAPTIVE op that switches
        plan shape between scales (embedding_lsh's auto multiprobe)
        pays that floor only at the switched scale, polluting the
        growth ratio with a constant that has nothing to do with data
        volume. min-of-2 measures the steady-state plan both times."""
        t0 = time.time()
        v = fn()
        t_first = time.time() - t0
        t0 = time.time()
        fn()
        return min(t_first, time.time() - t0), v

    only = only_ops
    out = {}
    for name, fn in cases(docs1, ev1, emb1).items():
        if only and name not in only:
            continue
        t1, v1 = timed_min2(fn)
        tn, vn = timed_min2(cases(docsN, evN, embN, n)[name])
        out[name] = {
            "t1": round(t1, 2),
            f"t{n}": round(tn, 2),
            "growth": round(tn / t1, 2),
        }
        if name.endswith("_cand"):
            # count growth is the metric, not just wall-clock
            out[name]["n1"] = int(v1)
            out[name][f"n{n}"] = int(vn)
            out[name]["count_growth"] = round(vn / max(1, v1), 2)
        print(f"{name}: 1x {t1:.2f}s, {n}x {tn:.2f}s, growth {tn/t1:.2f}",
              file=sys.stderr)
    print(json.dumps({"n": n, "sf_dir": sf_dir, "ops": out}))


if __name__ == "__main__":
    main()
