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

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_events_stream(
    spark: SparkSession, events_parquet: str, max_files_per_trigger: int = 1
) -> DataFrame:
    """File-source stream with the events schema (ts already micros)."""
    batch = spark.read.parquet(events_parquet)
    schema = batch.schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(events_parquet.rsplit("/", 1)[0] if events_parquet.endswith(".parquet") else events_parquet)
    )
    return stream


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
    """Bounded-state exact dedup on a stream (dropDuplicates + watermark)."""
    return events.withWatermark(ts_col, watermark).dropDuplicates(
        id_cols + [ts_col]
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
