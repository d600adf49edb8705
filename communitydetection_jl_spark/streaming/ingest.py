"""Structured-Streaming ingestion: pages arriving as files → edge table.

The reference is batch-only (iterate-to-convergence); streaming is the
engine's scale-path addition for continuously crawled corpora: new page
captures land as parquet files, each micro-batch extracts hrefs
(the same vectorized UDF as batch) and appends to a partitioned edge
store; latest-capture semantics are restored at read time with a
max_by per url (cheaper at 10^12 scale than stateful dedup in the
stream, and replayable).

Also provides a watermarked link-rate aggregation as the windowed-agg
exemplar (late data bounded by the watermark).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.pages import PAGE_SCHEMA, extract_hrefs_expr, url_ids


def stream_pages(spark: SparkSession, pages_dir: str) -> DataFrame:
    """File-source stream of page captures (schema = input contract)."""
    return (
        spark.readStream.schema(PAGE_SCHEMA)
        .option("maxFilesPerTrigger", 8)
        .parquet(pages_dir)
    )


def incremental_edge_ingest(
    spark: SparkSession, pages_dir: str, edges_dir: str, checkpoint_dir: str
):
    """Start a stream appending (src, dst, warc_ts) link records.

    Each micro-batch is the batch href-extraction plan; exactly-once via
    the streaming checkpoint. Returns the StreamingQuery."""
    pages = stream_pages(spark, pages_dir)
    links = pages.select(
        url_ids("url").alias("src"),
        F.col("warc_ts"),
        F.explode(extract_hrefs_expr("text")).alias("dst_url"),
    ).select("src", url_ids("dst_url").alias("dst"), "warc_ts")
    links = links.filter(F.col("src") != F.col("dst"))
    return (
        links.writeStream.format("parquet")
        .option("path", edges_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )


def edges_snapshot(spark: SparkSession, edges_dir: str) -> DataFrame:
    """Batch view over the streamed store: latest capture per (src,dst)
    wins, weight = link multiplicity within that capture set."""
    raw = spark.read.parquet(edges_dir)
    latest = raw.groupBy("src", "dst").agg(F.max("warc_ts").alias("warc_ts"))
    return (
        raw.join(latest, ["src", "dst", "warc_ts"], "left_semi")
        .groupBy("src", "dst")
        .agg(F.count("*").cast("double").alias("weight"))
    )


def link_rate(pages_stream: DataFrame, window: str = "1 hour", slide: str = "15 minutes") -> DataFrame:
    """Watermarked per-host outlink-rate aggregation (windowed agg +
    late-data bound) — the streaming-exemplar query."""
    links = pages_stream.withWatermark("warc_ts", "2 hours").select(
        F.regexp_extract("url", r"https?://([^/]+)/", 1).alias("host"),
        "warc_ts",
        F.size(extract_hrefs_expr("text")).alias("n_links"),
    )
    return links.groupBy(F.window("warc_ts", window, slide), "host").agg(
        F.sum("n_links").alias("outlinks"), F.count("*").alias("pages")
    )


def streaming_degrees(links: DataFrame) -> DataFrame:
    """Stateful per-vertex out-degree maintained across micro-batches
    (applyInPandasWithState keyed by src) — the streaming complement of
    the batch degree precomputation (operators/degrees.py): a crawl
    stream keeps per-vertex degree state current so iterative jobs
    (PageRank shares = p/outdeg) can restart from fresh statistics
    without rescanning the corpus.

    Input: a streaming (src, dst, warc_ts) link DataFrame. Output per
    update: (id, outdeg, last_ts). State is one (long, timestamp) pair
    per vertex — Arrow-batched pandas, no per-row Python."""
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
    from pyspark.sql.types import (
        LongType, StructField, StructType, TimestampType,
    )

    out_schema = StructType([
        StructField("id", LongType()),
        StructField("outdeg", LongType()),
        StructField("last_ts", TimestampType()),
    ])
    state_schema = StructType([
        StructField("outdeg", LongType()),
        StructField("last_ts", TimestampType()),
    ])

    def update(key, pdfs, state: GroupState):
        import pandas as pd

        new = 0
        last = None
        for pdf in pdfs:
            new += len(pdf)
            ts = pdf["warc_ts"].max()
            last = ts if last is None else max(last, ts)
        if state.exists:
            (old_deg, old_ts) = state.get
            deg = int(old_deg) + new
            if last is None or (old_ts is not None and old_ts > last):
                last = old_ts
        else:
            deg = new
        state.update((deg, last))
        yield pd.DataFrame({"id": [key[0]], "outdeg": [deg], "last_ts": [last]})

    return (
        links.groupBy("src")
        .applyInPandasWithState(
            update, out_schema, state_schema, "Update",
            GroupStateTimeout.NoTimeout,
        )
    )
