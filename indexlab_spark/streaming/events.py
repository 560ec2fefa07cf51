"""Structured Streaming operators over the events stream.

The reference has NO streaming data plane (SURVEY §2.10 — its SSE is
progress reporting only), so this module is part of the mandated scale
extensions: the live variants of the batch event operators in
__spark_entry__ (events_daily / events_sessions), built on watermarks +
windowed aggregation so state stays bounded on an unbounded stream.

Scale notes:
- watermark bounds state: late events beyond 1 hour are dropped rather
  than growing the state store forever.
- windowed counts are a streaming shuffle on (window, event_type) — the
  same partitioning as the batch rollup, incremental instead of re-scan.
- dedup_stream is the streaming twin of operators/dedup.exact_dedup:
  dropDuplicates over a watermarked id column is Spark's bounded-state
  exact dedup.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def stage_stream_dir(parquet_path: str) -> str:
    """Spark's file stream source requires a DIRECTORY. Directories pass
    through; a single parquet FILE (the driver testdata layout) gets a
    once-per-path symlink directory staged under the repo warehouse so
    the stream source sees exactly that one file — the previous approach
    of stripping to the parent directory would glob EVERY table's
    parquet in a shared data directory under the events schema."""
    import hashlib
    import os

    if os.path.isdir(parquet_path):
        return parquet_path
    root = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    key = hashlib.md5(os.path.abspath(parquet_path).encode()).hexdigest()[:12]
    d = os.path.join(root, "spark-warehouse", "_stream_src", key)
    os.makedirs(d, exist_ok=True)
    link = os.path.join(d, os.path.basename(parquet_path))
    # lexists, not exists: a DANGLING link (source regenerated/deleted)
    # reports False under exists and os.symlink would then raise
    # FileExistsError instead of surfacing the missing source cleanly
    if os.path.lexists(link):
        if os.path.realpath(link) != os.path.abspath(parquet_path) or not os.path.exists(link):
            os.unlink(link)
            os.symlink(os.path.abspath(parquet_path), link)
    else:
        os.symlink(os.path.abspath(parquet_path), link)
    return d


def read_events_stream(
    spark: SparkSession, events_parquet: str, max_files_per_trigger: int = 1
) -> DataFrame:
    """File-source stream with the events schema, ts normalized to
    TIMESTAMP via the SAME helper as the batch loader
    (session.normalize_event_ts): on readers that honor the legacy
    nanosAsLong conf the raw schema surfaces ts as LongType (nanos) and
    a watermark on it would fail analysis; on Spark 4 with
    inferTimestampNTZ disabled it is already TIMESTAMP. The reader
    confs are pinned here too, so this path does not depend on the
    caller having called load_tables first."""
    from indexlab_spark.session import normalize_event_ts, pin_reader_confs

    pin_reader_confs(spark)
    batch = spark.read.parquet(events_parquet)
    stream = (
        spark.readStream.schema(batch.schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(stage_stream_dir(events_parquet))
    )
    return normalize_event_ts(stream)


def windowed_event_counts(
    events: DataFrame,
    window_duration: str = "1 day",
    watermark: str = "1 hour",
    ts_col: str = "ts",
) -> DataFrame:
    """Tumbling-window per-type rollup with late-data watermark — the
    streaming form of the events_daily batch query."""
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.window(ts_col, window_duration), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("value").alias("sum_value"),
        )
        .select(
            F.col("window.start").alias("window_start"),
            "event_type",
            "n",
            "sum_value",
        )
    )


def dedup_stream(
    events: DataFrame, id_cols: list[str], watermark: str = "1 hour",
    ts_col: str = "ts",
) -> DataFrame:
    """Bounded-state exact dedup on a stream (dropDuplicates + watermark).

    NOTE the key includes the event-time column (the classic-API
    requirement for state expiry): a replayed event whose ts drifted —
    clock skew, re-serialization — is NOT caught. Use
    :func:`dedup_stream_within_watermark` for key-only dedup."""
    return events.withWatermark(ts_col, watermark).dropDuplicates(
        id_cols + [ts_col]
    )


def dedup_stream_within_watermark(
    events: DataFrame, id_cols: list[str], watermark: str = "1 hour",
    ts_col: str = "ts",
) -> DataFrame:
    """Key-only streaming dedup via ``dropDuplicatesWithinWatermark``
    (Spark 3.5+): duplicates are matched on the TRUE business keys —
    the event-time column is NOT part of the key — so replays whose
    timestamp drifted inside the watermark horizon still dedup, while
    state stays bounded (keys expire once the watermark passes their
    first-seen time + delay). The variant the classic API cannot
    express, and the right default for at-least-once upstream sources
    with imperfect clocks."""
    return events.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        id_cols
    )


def sessionize_with_state(
    events: DataFrame, gap_seconds: int = 1800
) -> DataFrame:
    """Custom stateful operator: gap-based sessionization via
    applyInPandasWithState (the streaming twin of the events_sessions
    batch query).

    Per user, state = (session_start_us, last_ts_us, n_events). A new
    event later than ``gap_seconds`` after the last one CLOSES the
    running session (emitted) and starts a new one; the final open
    session stays in state until more data or timeout. State is O(1)
    per user — bounded regardless of stream length.

    ASSUMES event-time-ordered arrival per key across micro-batches
    (the log-shipper pattern; events WITHIN a batch are sorted here).
    Out-of-order sources need the watermark-buffering variant: hold
    events in state and close sessions only when the watermark passes
    session_end + gap — same state shape plus an event buffer.
    """
    import pandas as pd

    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    gap_us = gap_seconds * 1_000_000
    out_schema = (
        "user_id long, session_start timestamp, session_end timestamp, "
        "n_events int"
    )
    state_schema = "start_us long, last_us long, n int"

    def fn(key, pdfs, state: GroupState):
        user_id = key[0]
        ts_us: list[int] = []
        for pdf in pdfs:
            ts_us.extend(
                (pd.to_datetime(pdf["ts"]).astype("int64") // 1000).tolist()
            )
        ts_us.sort()
        if state.exists:
            start_us, last_us, n = state.get
        else:
            start_us = last_us = None
            n = 0
        closed: list[tuple] = []
        for t in ts_us:
            if last_us is not None and t - last_us > gap_us:
                closed.append((user_id, start_us, last_us, n))
                start_us, n = None, 0
            if start_us is None:
                start_us = t
            last_us = t
            n += 1
        if last_us is not None:
            state.update((int(start_us), int(last_us), int(n)))
        if closed:
            yield pd.DataFrame(
                {
                    "user_id": [c[0] for c in closed],
                    "session_start": pd.to_datetime(
                        [c[1] * 1000 for c in closed]
                    ),
                    "session_end": pd.to_datetime([c[2] * 1000 for c in closed]),
                    "n_events": [c[3] for c in closed],
                }
            )

    return events.groupBy("user_id").applyInPandasWithState(
        fn, out_schema, state_schema, "append", GroupStateTimeout.NoTimeout
    )


def run_stream_to_memory(
    stream_df: DataFrame, query_name: str, output_mode: str = "complete"
):
    """Drive a streaming query to completion over the available files
    (availableNow trigger) into an in-memory sink; returns the query."""
    q = (
        stream_df.writeStream.format("memory")
        .queryName(query_name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return q


def view_click_join_stream(
    events: DataFrame, within_seconds: int = 600, watermark: str = "30 minutes"
) -> DataFrame:
    """Stream-stream interval join — the streaming twin of the batch
    event_pairs_range query: each view pairs with the SAME user's clicks
    landing strictly after it and within ``within_seconds``.

    Both sides carry a watermark and the join condition bounds click_ts
    relative to view_ts, so Spark can expire buffered rows once the
    watermark passes view_ts + within_seconds — state stays bounded on
    an unbounded stream (the unbuffered alternative is unbounded
    buffering of the view side forever).
    """
    views = (
        events.filter(F.col("event_type") == "view")
        .select(
            F.col("user_id").alias("v_user"),
            F.col("event_id").alias("view_id"),
            F.col("ts").alias("view_ts"),
        )
        .withWatermark("view_ts", watermark)
    )
    clicks = (
        events.filter(F.col("event_type") == "click")
        .select(
            F.col("user_id").alias("c_user"),
            F.col("event_id").alias("click_id"),
            F.col("ts").alias("click_ts"),
        )
        .withWatermark("click_ts", watermark)
    )
    return views.join(
        clicks,
        F.expr(
            f"""v_user = c_user
            AND click_ts > view_ts
            AND click_ts <= view_ts + interval {within_seconds} seconds"""
        ),
    ).select(
        F.col("v_user").alias("user_id"), "view_id", "click_id",
        "view_ts", "click_ts",
    )


def session_window_stream(
    events: DataFrame, gap: str = "30 minutes", watermark: str = "1 hour",
    ts_col: str = "ts",
) -> DataFrame:
    """Native session windows on a stream — F.session_window + watermark,
    Spark's built-in merging-session-state operator (vs the custom
    applyInPandasWithState twin in sessionize_with_state, which exists
    for the arbitrary-state pattern). Sessions close — and emit, in
    append mode — once the watermark passes session end + gap; state per
    open session is O(1)."""
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy("user_id", F.session_window(ts_col, gap).alias("sw"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 6).alias("sum_value"),
        )
        .select(
            "user_id",
            F.col("sw.start").alias("session_start"),
            F.col("sw.end").alias("session_end"),
            "n_events",
            "sum_value",
        )
    )


def trending_keys_stream(
    events: DataFrame,
    window_duration: str = "1 hour",
    watermark: str = "1 hour",
    ts_col: str = "ts",
) -> DataFrame:
    """Streaming half of trending-key detection: tumbling-window counts
    of the JSON ``props.k`` key with a late-data watermark. Emits
    ``(window_start, k, n)`` in append mode as windows close; feed the
    drained sink to :func:`top_k_per_window` for the rank step —
    ranking cannot run inside append mode (a window's counts are not
    final until the watermark passes, so per-window top-k is a
    batch-over-sink operation by construction, the standard pattern).

    State: one count per (window, k) inside the watermark horizon —
    bounded by |distinct k| per window.
    """
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(
            F.window(ts_col, window_duration),
            F.get_json_object("props", "$.k").cast("bigint").alias("k"),
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("window.start").alias("window_start"), "k", "n")
    )


def top_k_per_window(
    counts: DataFrame, k: int = 3
) -> DataFrame:
    """Batch rank over the drained trending sink: top-``k`` keys per
    window (count desc, key asc tie-break — deterministic). One keyed
    window per partition column; compiles to WindowGroupLimit."""
    w = Window.partitionBy("window_start").orderBy(
        F.col("n").desc(), F.col("k").asc()
    )
    return (
        counts.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def sliding_window_counts(
    events: DataFrame,
    window_duration: str = "2 hours",
    slide: str = "30 minutes",
    watermark: str = "1 hour",
    ts_col: str = "ts",
) -> DataFrame:
    """Overlapping (sliding) window rollup — the streaming op tumbling
    windows cannot express: every event lands in duration/slide windows
    (4 here), so a spike is visible in each 30-minute re-read of the
    trailing 2 hours. ``F.window(ts, duration, slide)`` is Spark's
    native sliding window (epoch-aligned starts at multiples of the
    slide), the watermark bounds state to the horizon's open windows x
    group keys, and each event is assigned its covering windows at the
    map side — the fan-out is part of the shuffle write, never a
    separate join.

    Emits ``(window_start, event_type, n, sum_value)``. In append mode
    a window emits once closed by the watermark; complete mode (the
    gate's drain pattern) re-emits all windows per trigger — same
    frame, so stream == batch == SQL is checkable end-to-end.
    """
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(
            F.window(ts_col, window_duration, slide).alias("w"),
            "event_type",
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 6).alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n",
            "sum_value",
        )
    )


def enrich_stream(
    stream_df: DataFrame,
    dim_df: DataFrame,
    on: list[str] | str,
    how: str = "left",
) -> DataFrame:
    """Stream-static enrichment — the most common production streaming
    shape: attach dimension attributes to a live stream. The static
    side is explicitly broadcast, so each micro-batch plans a
    BroadcastHashJoin (map-only per batch, no stream-side shuffle, no
    state store) — the stream-static join never needs watermarks
    because the static side is bounded by definition. Spark re-resolves
    the static relation per micro-batch, so a dim table updated between
    triggers is picked up (snapshot-per-batch semantics, the documented
    stream-static contract).

    Inner/left only: right/outer would make unmatched DIM rows emit
    once per micro-batch, which is never the intended semantics.
    """
    if how not in ("left", "inner"):
        raise ValueError(
            f"enrich_stream: how must be 'left' or 'inner', got {how!r}"
        )
    keys = [on] if isinstance(on, str) else list(on)
    return stream_df.join(F.broadcast(dim_df), keys, how)


def view_click_left_join_stream(
    events: DataFrame, within_seconds: int = 600, watermark: str = "30 minutes"
) -> DataFrame:
    """LEFT OUTER stream-stream interval join — the conversion-tracking
    shape the inner variant cannot express: EVERY view emits, matched
    views with their click, unmatched views with NULL click columns —
    but an unmatched view can only be declared unmatched once the
    watermark has passed ``view_ts + within_seconds`` (until then a
    matching click could still arrive), so NULL rows emit with
    watermark latency, not immediately. That deferral is the defining
    semantics of outer stream-stream joins: correctness requires the
    event-time bound, and state stays exactly as bounded as the inner
    join's.

    Note for drain-style tests/backfills: rows whose expiry the final
    watermark never passes stay in state unemitted — a run over a
    finite file set needs a watermark-advancing sentinel beyond
    ``max(ts) + within + watermark`` (see the parity test).
    """
    views = (
        events.filter(F.col("event_type") == "view")
        .select(
            F.col("user_id").alias("v_user"),
            F.col("event_id").alias("view_id"),
            F.col("ts").alias("view_ts"),
        )
        .withWatermark("view_ts", watermark)
    )
    clicks = (
        events.filter(F.col("event_type") == "click")
        .select(
            F.col("user_id").alias("c_user"),
            F.col("event_id").alias("click_id"),
            F.col("ts").alias("click_ts"),
        )
        .withWatermark("click_ts", watermark)
    )
    return views.join(
        clicks,
        F.expr(
            f"""v_user = c_user
            AND click_ts > view_ts
            AND click_ts <= view_ts + interval {within_seconds} seconds"""
        ),
        "left_outer",
    ).select(
        F.col("v_user").alias("user_id"), "view_id", "click_id",
        "view_ts", "click_ts",
    )
