"""Streaming ingestion with incremental MinHash dedup: the union of
per-batch pair outputs must EQUAL the batch operator over the full
corpus, and replayed micro-batches must not duplicate state (the
exactly-once-by-idempotence contract of streaming/ingest.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    from indexlab_spark.session import load_tables

    return load_tables(spark, sf_dir, ("documents",))["documents"]


def _pair_set(df):
    return {(r["id_a"], r["id_b"], r["jaccard"]) for r in df.collect()}


def test_dedup_ingest_stream_matches_batch(spark, docs, tmp_path):
    from indexlab_spark.operators.dedup import minhash_lsh_pairs
    from indexlab_spark.streaming.ingest import (
        dedup_ingest_stream,
        read_documents_stream,
    )

    src = str(tmp_path / "src")
    # 4 files -> 4 micro-batches at maxFilesPerTrigger=1
    docs.repartition(4).write.parquet(src)
    stream = read_documents_stream(spark, src, max_files_per_trigger=1)
    state = str(tmp_path / "state")
    q = dedup_ingest_stream(stream, state, num_hashes=16, bands=8,
                            threshold=0.5)
    q.awaitTermination()

    out = spark.read.parquet(f"{state}/pairs")
    n_batches = out.select("batch_id").distinct().count()
    assert n_batches == 4, "expected one state partition per file"
    streamed = _pair_set(out.select("id_a", "id_b", "jaccard"))
    batch = _pair_set(
        minhash_lsh_pairs(docs, num_hashes=16, bands=8, threshold=0.5)
    )
    assert streamed == batch
    # no pair emitted twice across batches (disjoint increments)
    assert out.count() == len(streamed)
    # the signature index covers every signable doc exactly once
    sigs = spark.read.parquet(f"{state}/sigs")
    assert sigs.select("id").distinct().count() == sigs.count()


def test_state_write_replay_idempotent(spark, tmp_path):
    """Dynamic partition overwrite by batch_id: re-running a batch
    replaces its own partition instead of appending duplicates."""
    from indexlab_spark.streaming.ingest import _read_state, _write_state

    path = str(tmp_path / "tbl")
    df = spark.createDataFrame([(1, "a"), (2, "b")], "id long, text string")
    _write_state(df, path, 0)
    _write_state(df, path, 1)
    _write_state(df, path, 1)  # replay of batch 1
    assert spark.read.parquet(path).count() == 4
    # prior-state read excludes the current batch's own (half-written)
    # partition
    prior = _read_state(spark, path, df, 1)
    assert prior.count() == 2
    # missing path (first batch ever) -> empty frame, template schema
    empty = _read_state(spark, str(tmp_path / "missing"), df, 0)
    assert empty.count() == 0 and empty.schema == df.schema


def test_trending_keys_stream_equals_batch(spark, sf_dir):
    """availableNow-drained windowed per-key counts + batch rank ==
    pure batch computation of the same rollup."""
    from indexlab_spark.session import load_tables
    from indexlab_spark.streaming.events import (
        read_events_stream,
        top_k_per_window,
        trending_keys_stream,
    )
    from pyspark.sql import functions as FN

    ev = load_tables(spark, sf_dir, ("events",))["events"]
    stream = read_events_stream(spark, f"{sf_dir}/events.parquet")
    q = (
        trending_keys_stream(stream)
        .writeStream.format("memory")
        .queryName("trending_test")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    q.stop()
    streamed = top_k_per_window(spark.table("trending_test"), k=3)
    batch_counts = (
        ev.groupBy(
            FN.window("ts", "1 hour"),
            FN.get_json_object("props", "$.k").cast("bigint").alias("k"),
        )
        .agg(FN.count(FN.lit(1)).alias("n"))
        .select(FN.col("window.start").alias("window_start"), "k", "n")
    )
    batch = top_k_per_window(batch_counts, k=3)
    a = sorted(map(tuple, streamed.collect()))
    b = sorted(map(tuple, batch.collect()))
    assert a == b and len(a) > 0
    spark.catalog.dropTempView("trending_test")


def test_sliding_window_counts_stream_equals_batch(spark, sf_dir):
    """availableNow-drained sliding-window rollup == pure batch
    computation with the same F.window(duration, slide); every event
    appears in duration/slide = 4 windows."""
    from pyspark.sql import functions as FN

    from indexlab_spark.session import load_tables
    from indexlab_spark.streaming.events import (
        read_events_stream,
        sliding_window_counts,
    )

    ev = load_tables(spark, sf_dir, ("events",))["events"]
    stream = read_events_stream(spark, f"{sf_dir}/events.parquet")
    q = (
        sliding_window_counts(stream)
        .writeStream.format("memory")
        .queryName("sliding_test")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    q.stop()
    streamed = spark.table("sliding_test")
    batch = (
        ev.groupBy(
            FN.window("ts", "2 hours", "30 minutes").alias("w"), "event_type"
        )
        .agg(
            FN.count(FN.lit(1)).alias("n"),
            FN.round(FN.sum("value"), 6).alias("sum_value"),
        )
        .select(
            FN.col("w.start").alias("window_start"),
            "event_type",
            "n",
            "sum_value",
        )
    )
    a = sorted(map(tuple, streamed.collect()))
    b = sorted(map(tuple, batch.collect()))
    assert a == b and len(a) > 0
    # sum over windows counts each event duration/slide times
    n_events = ev.count()
    assert sum(r[2] for r in a) == 4 * n_events
    spark.catalog.dropTempView("sliding_test")


def test_quantile_monitor_stream_matches_batch_and_replay(spark, tmp_path):
    """Streaming quantile state: after draining the stream, the state
    table must EXACTLY equal the batch sketch over all data (bottom-k
    associativity across micro-batches), and re-merging an
    already-merged batch must be a no-op (md5-rank dedup
    idempotence)."""
    from indexlab_spark.operators.analytics import (
        quantile_sketch_merge,
        quantile_sketch_rollup,
    )
    from indexlab_spark.streaming.ingest import quantile_monitor_stream

    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet").select(
        "event_id", "event_type", F.col("value").cast("double").alias("value")
    )
    src = str(tmp_path / "qsrc")
    ev.repartition(3).write.parquet(src)

    static = spark.read.parquet(src)
    stream = (
        spark.readStream.schema(static.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    state = str(tmp_path / "qstate")
    q = quantile_monitor_stream(
        stream, state, ["event_type"], "value", "event_id", k=64
    ).start()
    q.awaitTermination()

    def sample_map(df):
        return {
            r["event_type"]: [(s["rank"], s["value"]) for s in r["sample"]]
            for r in df.collect()
        }

    got = sample_map(spark.read.parquet(state))
    want = sample_map(
        quantile_sketch_rollup(ev, ["event_type"], "value", "event_id", k=64)
    )
    assert got == want and len(got) > 0

    # replay idempotence: merge the WHOLE corpus's sketch AGAIN into
    # the final state (the worst-case replay) — nothing may change
    replayed = quantile_sketch_merge(
        spark.read.parquet(state),
        quantile_sketch_rollup(
            static, ["event_type"], "value", "event_id", k=64
        ),
        ["event_type"],
        k=64,
    )
    assert sample_map(replayed) == got


def test_theta_monitor_stream_matches_batch_and_replay(spark, tmp_path):
    """Streaming theta-sketch distinct state: drained state EXACTLY
    equals the one-shot batch sketch over all data (bottom-k set-union
    associativity across micro-batches), a worst-case full replay
    merge is a no-op (hash points are values -> idempotent), and the
    state supports the overlap query the HLL monitor cannot answer."""
    from indexlab_spark.operators.analytics import (
        theta_sketch_build,
        theta_sketch_intersect,
        theta_sketch_merge,
    )
    from indexlab_spark.streaming.ingest import theta_monitor_stream

    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet").select(
        "event_type", F.col("user_id").cast("string").alias("user_id")
    )
    src = str(tmp_path / "tsrc")
    ev.repartition(3).write.parquet(src)

    static = spark.read.parquet(src)
    stream = (
        spark.readStream.schema(static.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    state = str(tmp_path / "tstate")
    q = theta_monitor_stream(
        stream, state, ["event_type"], "user_id", k=64
    ).start()
    q.awaitTermination()

    def sketch_map(df):
        return {
            r["event_type"]: (list(r["sample"]), r["theta"], r["est"])
            for r in df.collect()
        }

    got = sketch_map(spark.read.parquet(state))
    want = sketch_map(theta_sketch_build(ev, ["event_type"], "user_id", k=64))
    assert got == want and len(got) > 0

    # replay idempotence: merge the whole corpus's sketch AGAIN
    replayed = theta_sketch_merge(
        spark.read.parquet(state),
        theta_sketch_build(ev, ["event_type"], "user_id", k=64),
        ["event_type"],
        k=64,
    )
    assert sketch_map(replayed) == got

    # the monitor state answers overlap questions directly
    sk = spark.read.parquet(state)
    a = sk.filter(F.col("event_type") == "view").withColumnRenamed(
        "event_type", "type_a"
    )
    b = sk.filter(F.col("event_type") == "purchase").withColumnRenamed(
        "event_type", "type_b"
    )
    r = theta_sketch_intersect(a, b).collect()[0]
    assert r["est_common"] >= 0


def test_psi_monitor_stream_matches_batch_and_replay(spark, tmp_path):
    """Streaming PSI state: drained per-batch bucket-count partitions,
    collapsed by psi_monitor_totals against the frozen reference, must
    EXACTLY equal one-shot psi_drift(reference, all_data) — linearity
    of counts + the shared PSI tail. Replaying a batch partition
    (at-least-once redelivery) must change nothing, and a stream drawn
    from the reference itself must read as zero drift."""
    from indexlab_spark.operators.analytics import psi_drift, psi_reference
    from indexlab_spark.streaming.ingest import (
        psi_monitor_stream,
        psi_monitor_totals,
    )

    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet").select(
        F.col("value").cast("double").alias("value")
    )
    # frozen baseline: the low half; stream: everything (drifted)
    ref_df = ev.filter(F.col("value") < 50)
    ref = psi_reference(ref_df, "value", n_buckets=8)
    assert len(ref["edges"]) == 7 and sum(ref["counts"]) > 0

    src = str(tmp_path / "psrc")
    ev.repartition(3).write.parquet(src)
    static = spark.read.parquet(src)
    stream = (
        spark.readStream.schema(static.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    state = str(tmp_path / "pstate")
    q = psi_monitor_stream(stream, state, "value", ref).start()
    q.awaitTermination()

    def rows(df):
        return sorted(
            (tuple(r) for r in df.collect()), key=lambda t: t[0]
        )

    got = rows(psi_monitor_totals(spark, state, ref))
    want = rows(psi_drift(ref_df, ev, "value", n_buckets=8))
    assert got == want
    total = [t for t in got if t[0] == -1][0]
    assert total[-1] > 0  # the full corpus HAS drifted off the low half

    # replay: a redelivered batch recomputes the SAME deterministic
    # bucket counts; simulate by rewriting batch 0's partition with its
    # own materialized contents (file->batch order is a source detail
    # the test must not assume) — dynamic overwrite must leave the
    # totals unchanged, never double-count
    from indexlab_spark.streaming.ingest import _write_state

    b0 = spark.createDataFrame(
        spark.read.parquet(state + "/batch_id=0")
        .select("bucket", "_n")
        .collect(),
        "bucket int, _n bigint",
    )
    _write_state(b0, state, 0)
    assert rows(psi_monitor_totals(spark, state, ref)) == got

    # identity: a stream that IS the reference reads as zero drift
    src2 = str(tmp_path / "psrc2")
    ref_df.repartition(2).write.parquet(src2)
    stream2 = (
        spark.readStream.schema(static.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src2)
    )
    state2 = str(tmp_path / "pstate2")
    q2 = psi_monitor_stream(stream2, state2, "value", ref).start()
    q2.awaitTermination()
    ident = psi_monitor_totals(spark, state2, ref)
    assert all(r["contrib"] == 0.0 for r in ident.collect())


def test_mau_monitor_stream_matches_batch_and_replay(spark, tmp_path):
    """Streaming per-day HLL distinct state: drained totals EXACTLY
    equal the one-shot batch sliding_distinct(sketch=True) over the
    same rows (HLL union associativity across micro-batches), and
    rewriting a batch partition with identical content (at-least-once
    redelivery) leaves the totals unchanged."""
    from indexlab_spark.operators.analytics import sliding_distinct
    from indexlab_spark.streaming.ingest import (
        _write_state,
        mau_monitor_stream,
        mau_monitor_totals,
    )

    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet").select(
        "ts", "user_id"
    )
    from indexlab_spark.session import normalize_event_ts

    ev = normalize_event_ts(ev)
    src = str(tmp_path / "msrc")
    ev.repartition(3).write.parquet(src)

    static = spark.read.parquet(src)
    stream = (
        spark.readStream.schema(static.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    state = str(tmp_path / "mstate")
    q = mau_monitor_stream(stream, state, "ts", "user_id").start()
    q.awaitTermination()

    def tbl(df):
        return sorted(
            (r["day"], r["distinct_keys"], r["window_days"])
            for r in df.collect()
        )

    got = tbl(mau_monitor_totals(spark, state, window_days=7))
    want = tbl(sliding_distinct(static, "ts", "user_id", 7, sketch=True))
    assert got == want and len(got) > 0

    # redelivery: rewrite the highest batch partition byte-identically
    import pyspark.sql.functions as SF

    raw = spark.read.option("basePath", state).parquet(state)
    max_b = raw.select(SF.max("batch_id")).first()[0]
    replay = raw.filter(SF.col("batch_id") == max_b).drop("batch_id")
    _write_state(replay, state, int(max_b))
    again = tbl(mau_monitor_totals(spark, state, window_days=7))
    assert again == got


def test_srm_monitor_stream_matches_batch_and_replay(spark, tmp_path):
    """Streaming SRM state: drained per-batch arm-count partitions,
    collapsed by srm_monitor_totals, must EXACTLY equal the one-shot
    srm_check over the same units (count linearity + the shared
    _srm_table tail). Replaying a batch partition (at-least-once
    redelivery) must change nothing."""
    from indexlab_spark.operators.analytics import srm_check
    from indexlab_spark.streaming.ingest import (
        _write_state,
        srm_monitor_stream,
        srm_monitor_totals,
    )

    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet").select(
        F.when(F.col("user_id") % 20 == 0, "b")
        .otherwise("a")
        .alias("variant")
    )
    expected = {"a": 0.5, "b": 0.5}

    src = str(tmp_path / "ssrc")
    ev.repartition(3).write.parquet(src)
    static = spark.read.parquet(src)
    stream = (
        spark.readStream.schema(static.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    state = str(tmp_path / "sstate")
    q = srm_monitor_stream(stream, state, "variant", expected).start()
    q.awaitTermination()

    def rows(df):
        return sorted((tuple(r) for r in df.collect()), key=lambda t: t[0])

    got = rows(srm_monitor_totals(spark, state, expected))
    want = rows(srm_check(ev, "variant", expected))
    assert got == want
    total = [t for t in got if t[0] == "<ALL>"][0]
    assert total[-1] is True  # a deliberate 95/5 split vs 50/50 flags

    # replay: redeliver batch 0's own materialized counts via dynamic
    # overwrite — totals must be unchanged, never double-counted
    b0 = spark.createDataFrame(
        spark.read.parquet(state + "/batch_id=0")
        .select("variant", "_n")
        .collect(),
        "variant string, _n bigint",
    )
    _write_state(b0, state, 0)
    assert rows(srm_monitor_totals(spark, state, expected)) == got

    # a balanced split reads as no mismatch (event_id parity is an
    # exact 500/500 at this SF; user_id parity is 562/438 and would
    # correctly flag)
    ev2 = spark.read.parquet(
        "/root/testdata/sf0.001/events.parquet"
    ).select(
        F.when(F.col("event_id") % 2 == 0, "a").otherwise("b").alias(
            "variant"
        )
    )
    src2 = str(tmp_path / "ssrc2")
    ev2.repartition(2).write.parquet(src2)
    stream2 = (
        spark.readStream.schema(static.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src2)
    )
    state2 = str(tmp_path / "sstate2")
    q2 = srm_monitor_stream(stream2, state2, "variant", expected).start()
    q2.awaitTermination()
    tot2 = [
        r
        for r in srm_monitor_totals(spark, state2, expected).collect()
        if r["variant"] == "<ALL>"
    ][0]
    assert tot2["srm"] is False


def test_ewma_monitor_stream_matches_batch_and_replay(spark, tmp_path):
    """Streaming EWMA chart: time-ordered micro-batches folded with
    carried (t, z) state must EXACTLY equal the one-shot batch
    ewma_control over the same series when the frozen ref carries
    that series' Phase-I mean/sd; batch-partition replay (dynamic
    overwrite of a recomputed partition) changes nothing; quiet keys
    carry state forward instead of resetting."""
    import os
    import time

    from indexlab_spark.streaming.ingest import (
        ewma_monitor_points,
        ewma_monitor_stream,
    )

    rows = []
    for t in range(30):
        val = 10.0 + (t * 7 % 5) * 0.3 + (4.0 if t >= 22 else 0.0)
        rows.append(("m", t, val))
    df = spark.createDataFrame(rows, "k string, t int, v double")

    # frozen Phase-I from the full series (so batch == stream)
    import statistics

    vals = [v for _, _, v in rows]
    ref = {
        "m": {
            "mean": statistics.mean(vals),
            "sd": statistics.stdev(vals),
        }
    }
    # one-shot reference fold in python (identical recurrence — the
    # same fold ewma_control runs, pinned there against its own
    # reference; the frozen ref carries the full series' Phase-I
    # stats so the stream chart must reproduce it exactly)
    import math

    mu, sd = ref["m"]["mean"], ref["m"]["sd"]
    z = mu
    want = []
    for t, (_, o, x) in enumerate(rows, start=1):
        z = 0.2 * x + 0.8 * z
        half = 3.0 * sd * math.sqrt(0.2 / 1.8 * (1 - 0.8 ** (2 * t)))
        want.append(
            (o, round(x, 6), round(z, 6), round(mu + half, 6),
             round(mu - half, 6), z > mu + half or z < mu - half)
        )

    # three time-ordered files -> three micro-batches
    src = str(tmp_path / "esrc")
    os.makedirs(src)
    for i, sl in enumerate((rows[:10], rows[10:20], rows[20:])):
        spark.createDataFrame(sl, "k string, t int, v double").coalesce(
            1
        ).write.parquet(f"{src}/part{i}", mode="overwrite")
        time.sleep(0.05)
    import glob
    import shutil

    flat = str(tmp_path / "eflat")
    os.makedirs(flat)
    for i in range(3):
        f = glob.glob(f"{src}/part{i}/*.parquet")[0]
        shutil.copy(f, f"{flat}/{i:03d}.parquet")
        os.utime(f"{flat}/{i:03d}.parquet", (1000 + i, 1000 + i))

    stream = (
        spark.readStream.schema(df.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(flat)
    )
    state = str(tmp_path / "estate")
    q = ewma_monitor_stream(
        stream, state, "k", "t", "v", ref, lam=0.2, L=3.0
    ).start()
    q.awaitTermination()

    got = sorted(
        (r["_ord"], r["value"], r["z"], r["ucl"], r["lcl"], r["breach"])
        for r in ewma_monitor_points(spark, state).collect()
    )
    assert got == sorted(want)
    assert any(b for *_, b in got)  # the planted level shift breaches

    # replay idempotence: rewrite batch 0's points/state partitions
    # with their own materialized contents
    from indexlab_spark.streaming.ingest import _write_state

    for sub, schema in (
        ("points", "_key string, _ord int, value double, z double,"
                   " ucl double, lcl double, breach boolean"),
        ("state", "_key string, _t long, _z double"),
    ):
        part = spark.read.parquet(f"{state}/{sub}/batch_id=0")
        b0 = spark.createDataFrame(part.collect(), schema)
        _write_state(b0, f"{state}/{sub}", 0)
    got2 = sorted(
        (r["_ord"], r["value"], r["z"], r["ucl"], r["lcl"], r["breach"])
        for r in ewma_monitor_points(spark, state).collect()
    )
    assert got2 == got


def test_decay_mass_monitor_matches_batch_and_replay(spark, tmp_path):
    """Linearized decay kernel: drained anchor-free mass state,
    multiplied by one anchor factor, matches the one-shot batch
    decayed_sum at the same fixed anchor (6dp); replaying a batch
    partition changes nothing; a later anchor from the SAME state
    decays every key monotonically."""
    from indexlab_spark.operators.analytics import decayed_sum
    from indexlab_spark.streaming.ingest import (
        _write_state,
        decay_mass_monitor_stream,
        decay_mass_totals,
    )

    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet").select(
        "event_type", "ts", F.col("value").cast("double").alias("value")
    )
    hl = 7 * 86400.0
    anchor = "2024-01-31 00:00:00"

    src = str(tmp_path / "dsrc")
    ev.repartition(3).write.parquet(src)
    static = spark.read.parquet(src)
    stream = (
        spark.readStream.schema(static.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    state = str(tmp_path / "dstate")
    q = decay_mass_monitor_stream(
        stream, state, "event_type", "ts", "value", hl
    ).start()
    q.awaitTermination()

    got = {
        r["key"]: r
        for r in decay_mass_totals(spark, state, hl, anchor).collect()
    }
    want = {
        r["event_type"]: r
        for r in decayed_sum(
            ev, ["event_type"], "ts", "value", hl, as_of=anchor
        ).collect()
    }
    assert set(got) == set(want)
    for k in want:
        assert got[k]["n"] == want[k]["n"]
        assert got[k]["raw_sum"] == pytest.approx(
            want[k]["raw_sum"], abs=1e-4
        )
        assert got[k]["decayed"] == pytest.approx(
            want[k]["decayed"], abs=1e-4
        )

    # replay: rewrite batch 0's partition with its own contents
    part = spark.read.parquet(f"{state}/batch_id=0")
    b0 = spark.createDataFrame(
        part.collect(),
        "_key string, _mass double, _n bigint, _raw double,"
        " _max_ts timestamp",
    )
    _write_state(b0, state, 0)
    got2 = {
        r["key"]: r["decayed"]
        for r in decay_mass_totals(spark, state, hl, anchor).collect()
    }
    assert got2 == {k: r["decayed"] for k, r in got.items()}

    # a later anchor decays every key, same state, one multiply
    later = {
        r["key"]: r["decayed"]
        for r in decay_mass_totals(
            spark, state, hl, "2024-02-14 00:00:00"
        ).collect()
    }
    for k in got2:
        assert later[k] < got2[k]


def test_diversity_monitor_stream_matches_batch_and_replay(spark, tmp_path):
    """Streaming diversity state: drained per-batch class-count
    partitions, collapsed by diversity_monitor_totals, must EXACTLY
    equal the one-shot diversity_index over the same rows (count
    linearity + the shared _diversity_table tail). Replaying a batch
    partition (at-least-once redelivery) must change nothing."""
    from indexlab_spark.operators.analytics import diversity_index
    from indexlab_spark.streaming.ingest import (
        _write_state,
        diversity_monitor_stream,
        diversity_monitor_totals,
    )

    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet"
    ).select("source", "lang")

    src = str(tmp_path / "dsrc")
    docs.repartition(3).write.parquet(src)
    static = spark.read.parquet(src)
    stream = (
        spark.readStream.schema(static.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    state = str(tmp_path / "dstate")
    q = diversity_monitor_stream(stream, state, ["source"], "lang").start()
    q.awaitTermination()

    def rows(df):
        return sorted((tuple(r) for r in df.collect()), key=lambda t: t[0])

    got = rows(diversity_monitor_totals(spark, state, ["source"]))
    want = rows(diversity_index(docs, ["source"], "lang"))
    assert got == want

    # replay: redeliver batch 0's own materialized counts via dynamic
    # overwrite — totals must be unchanged, never double-counted
    b0 = spark.createDataFrame(
        spark.read.parquet(state + "/batch_id=0")
        .select("source", "_c", "_m")
        .collect()
    )
    _write_state(b0, state, 0)
    assert rows(diversity_monitor_totals(spark, state, ["source"])) == got
