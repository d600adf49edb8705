"""Event-stream analytics over the ``events`` table
(event_id, ts, user_id, event_type, value, props-json).

Batch forms here; streaming twins in streaming/windows.py run the same
tumbling-window plan via readStream + watermark, and the test suite
asserts streaming == batch on identical input (the strongest cheap
evidence a streaming aggregation is correct).

Scale notes per operator are in the docstrings — the common thread:
every aggregation keys on (bucket, type) or (user, session), so the
shuffles are bounded by key cardinality, never all-pairs, and the
sessionize window partitions by user (no global sort).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _epoch(col) -> Column:
    """Epoch seconds (double, microsecond precision) from a timestamp
    OR timestamp_ntz column — NTZ has no direct double cast; the
    session timezone is pinned to UTC (session.py) so the TS hop is
    value-preserving."""
    return F.col(col).cast("timestamp").cast("double")


def windowed_counts(events: DataFrame, width_sec: int = 600,
                    exact_distinct: bool = True) -> DataFrame:
    """Tumbling-window per-type rollup: (window_start, event_type,
    n_events, total_value, n_users).

    ``exact_distinct=True`` uses COUNT(DISTINCT user) — needed for the
    DuckDB oracle and fine at per-window cardinalities; at 100 TB flip
    to approx_count_distinct (HLL, one pass, no per-key explode).
    window_start is epoch seconds (long): timezone-proof and
    hash-comparable across engines."""
    bucket = (
        F.floor(_epoch("ts") / width_sec).cast("long")
        * width_sec
    )
    distinct_users = (
        F.countDistinct("user_id") if exact_distinct
        else F.approx_count_distinct("user_id")
    )
    return (
        events.groupBy(bucket.alias("window_start"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("value").alias("total_value"),
            distinct_users.alias("n_users"),
        )
    )


def sessionize(events: DataFrame, gap_sec: int = 1800) -> DataFrame:
    """Gap-based sessions per user: a new session starts when the gap
    to the previous event exceeds ``gap_sec``. Returns (user_id,
    session_idx, start_ts, end_ts, duration, n_events, total_value);
    timestamps as epoch-second doubles (microsecond precision).

    The lag/cumsum windows partition by user_id — each user's events
    sort locally within their hash partition; no unpartitioned window,
    no global sort, so the plan survives arbitrarily many users (skew
    only if ONE user has ~memory-sized history)."""
    order = Window.partitionBy("user_id").orderBy("tse", "event_id")
    cum = order.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    # two projection steps: the lag flag must be materialized before it
    # feeds the cumulative sum (nesting one window expression inside
    # another aggregate is not defined)
    flagged = events.select(
        "user_id", "event_id", "value", _epoch("ts").alias("tse")
    ).select(
        "*",
        F.when(F.lag("tse").over(order).isNull(), 1)
        .when(F.col("tse") - F.lag("tse").over(order) > gap_sec, 1)
        .otherwise(0)
        .alias("_new"),
    )
    with_sess = flagged.select(
        "user_id", "event_id", "value", "tse",
        F.sum("_new").over(cum).alias("session_idx"),
    )
    return (
        with_sess.groupBy("user_id", "session_idx")
        .agg(
            F.min("tse").alias("start_ts"),
            F.max("tse").alias("end_ts"),
            (F.max("tse") - F.min("tse")).alias("duration"),
            F.count(F.lit(1)).alias("n_events"),
            F.sum("value").alias("total_value"),
        )
    )


def props_stats(events: DataFrame, key: str = "k") -> DataFrame:
    """Per-type stats of a JSON property: (event_type, n, avg_k, max_k).
    Exercises the JSON path the web-page input format implies
    (get_json_object is JVM-side; no UDF)."""
    k = F.get_json_object("props", f"$.{key}").cast("long")
    return (
        events.select("event_type", k.alias("_k"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.avg("_k").alias("avg_k"),
            F.max("_k").alias("max_k"),
        )
    )
