"""Streaming twins of the batch event rollups (operators/events.py).

The same tumbling-window aggregation expressed as a watermarked
Structured-Streaming query over a file source. The test suite runs the
stream with ``availableNow`` over a finished directory and asserts the
result EQUALS the batch operator on the same files — the streaming-vs-
batch equivalence check that pins windowing, watermark and state
semantics at once.

At production scale the same query runs unbounded in ``update`` or
``append`` output mode: there the watermark bounds state (windows older
than watermark are finalized and dropped), and the aggregation state is
per (window, event_type) — cardinality-bounded, never per-event. The
``complete``-mode memory sink used by run_stream_to_memory is test-only:
complete mode never evicts window state, so an unbounded run must not
use it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

EVENT_SCHEMA = T.StructType([
    T.StructField("event_id", T.LongType()),
    T.StructField("ts", T.TimestampType()),
    T.StructField("user_id", T.LongType()),
    T.StructField("event_type", T.StringType()),
    T.StructField("value", T.DoubleType()),
    T.StructField("props", T.StringType()),
])


def stream_events(spark: SparkSession, events_dir: str,
                  max_files: int = 4) -> DataFrame:
    return (
        spark.readStream.schema(EVENT_SCHEMA)
        .option("maxFilesPerTrigger", max_files)
        .parquet(events_dir)
    )


def streaming_windowed_counts(
    events: DataFrame, width_sec: int = 600, watermark: str = "30 minutes"
) -> DataFrame:
    """Watermarked tumbling-window rollup; schema matches the batch
    operator (window_start epoch-seconds long, per event_type).

    Uses approx_count_distinct for users: exact distinct needs
    per-user state inside every window (unbounded at web scale);
    the batch twin's exact mode is the oracle for the counting
    columns, the approx column is compared with its own tolerance."""
    windowed = (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", f"{width_sec} seconds"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("value").alias("total_value"),
            F.approx_count_distinct("user_id").alias("n_users_approx"),
        )
    )
    return windowed.select(
        F.col("window.start").cast("timestamp").cast("double")
        .cast("long").alias("window_start"),
        "event_type", "n_events", "total_value", "n_users_approx",
    )


def run_stream_to_memory(
    spark: SparkSession, events_dir: str, table: str = "stream_windows",
    width_sec: int = 600, output_mode: str = "complete",
) -> DataFrame:
    """Drain the directory with availableNow into a memory sink and
    return the result as a batch DataFrame (test harness helper).

    TEST-ONLY: ``complete`` output mode never evicts window state, so
    the watermark does NOT bound state under this query shape — fine
    for a finite availableNow drain, wrong for an unbounded run. A
    production deployment must use ``update``/``append`` mode (see
    ``output_mode``) for the watermark to actually expire windows."""
    q = (
        streaming_windowed_counts(stream_events(spark, events_dir), width_sec)
        .writeStream.format("memory")
        .queryName(table)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(table)
