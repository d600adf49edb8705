"""Dense vertex-id assignment (dictionary encoding) and distributed
rank permutations.

The reference assumes dense ``1..n`` vertex ids (Graphs.jl
``vertex_index``); the engine's url-derived ids are sparse 64-bit
hashes. Dense ids shrink every downstream shuffle/state row (int32 vs
int64 keys, SURVEY.md §4.3) and raise the single-box memory-bandwidth
ceiling on gather supersteps, so the bench path densifies once at
graph build.

Scalable construction (no global window): range-partition on the order
column, materialize to parquet WITH the partition id baked in as a
column, count per partition, broadcast the per-partition offsets, then
row_number within each partition. The parquet round-trip is what makes
this correct under recomputation: repartitionByRange re-samples its
boundaries on every execution, so offsets collected from one execution
would not match row_numbers computed by another (e.g. after an executor
loses cached blocks). Materialized _pid values make the ranking a pure
function of the data."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window as W

from .scratch import scratch_dir


def ranked_by(df: DataFrame, order_col, parts: int | None = None) -> DataFrame:
    """Rank all rows of ``df`` by ``order_col`` (dense 1..n, ties broken
    arbitrarily-but-deterministically by the column's sort), without a
    global window: range partitions + per-partition offsets.

    Returns ``df``'s columns plus ``rank``. One parquet round-trip +
    one tiny collect; every downstream read sees the same files."""
    spark = df.sparkSession
    P = parts or spark.sparkContext.defaultParallelism
    d = (
        df.withColumn("_ord", order_col)
        .repartitionByRange(P, "_ord")
        .withColumn("_pid", F.spark_partition_id())
    )
    path = scratch_dir("ranked_")
    d.write.mode("overwrite").parquet(path)
    d = spark.read.parquet(path)
    counts = d.groupBy("_pid").count().collect()
    offs: dict[int, int] = {}
    acc = 0
    for r in sorted(counts, key=lambda r: r["_pid"]):
        offs[r["_pid"]] = acc
        acc += r["count"]
    omap = F.create_map(*[F.lit(x) for kv in offs.items() for x in kv])
    w = W.partitionBy("_pid").orderBy("_ord")
    rank = F.row_number().over(w) + omap[F.col("_pid")]
    out_cols = [c for c in df.columns]
    return d.select(*out_cols, rank.cast("long").alias("rank"))


def rank_window_max() -> int:
    import os

    return int(os.environ.get("SPARK_GRAFT_RANK_WINDOW_MAX", str(1_000_000)))


def rank_small_or_large(
    df: DataFrame,
    order_col,
    n: int | None = None,
    window_max: int | None = None,
    parts: int | None = None,
) -> DataFrame:
    """``df``'s columns plus dense ``rank`` 1..n by ``order_col`` —
    without ever planning an unpartitioned global-sort window.

    Inputs at or below ``window_max`` rows (default
    ``$SPARK_GRAFT_RANK_WINDOW_MAX`` or 1M — comfortably one task) rank
    via repartition(1) + in-partition sort + monotonically_increasing_id
    (partition 0 → consecutive ids from 0): the same physical cost as a
    single-partition window — one exchange plus one bounded sort — but
    WITHOUT planning a WindowExec at all. A constant-partitioned window
    (``partitionBy(lit(0))``) is NOT equivalent: when the plan lands
    under a broadcast-exchange subtree the re-optimization
    constant-folds the literal out of the partition spec, leaving an
    unpartitioned WindowExec (the "No Partition Defined" scale warning
    this helper exists to avoid). Deterministic because ``order_col``
    is required to be a total order (callers append a unique tiebreak
    column). Larger inputs take :func:`ranked_by` (range partitions
    + per-partition offsets + parquet pin). The count that gates the
    dispatch is one columnar action on a table the callers have already
    reduced (per-community / per-label, not per-vertex); pass ``n`` if
    the caller already knows it."""
    if window_max is None:
        window_max = rank_window_max()
    if n is None:
        n = df.count()
    if n <= window_max:
        d = (
            df.withColumn("_ord", order_col)
            .repartition(1)
            .sortWithinPartitions("_ord")
        )
        return d.select(
            *df.columns,
            (F.monotonically_increasing_id() + 1).cast("long").alias("rank"),
        )
    return ranked_by(df, order_col, parts)


def dense_ids(verts: DataFrame, id_col: str = "id", parts: int | None = None) -> DataFrame:
    """Map distinct ``id_col`` values to dense ids ``0..n-1``.

    Returns ``(id, nid)`` with ``nid`` int when n < 2^31 else long.
    Deterministic given the input *set* (nid = rank of id ascending)."""
    ranked = ranked_by(verts.select(id_col).distinct(), F.col(id_col), parts)
    n = ranked.count()
    out_type = "int" if n < (1 << 31) else "long"
    return ranked.select(
        id_col, (F.col("rank") - 1).cast(out_type).alias("nid")
    )


def densify_edges(edges: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Re-key an edge table to dense ids. Returns (dense_edges, dim).

    ``dim`` is (id, nid); dense_edges has the same columns with
    src/dst replaced. Use ``dim`` to map results back to original ids.
    """
    verts = (
        edges.select(F.col("src").alias("id"))
        .unionByName(edges.select(F.col("dst").alias("id")))
        .distinct()
    )
    dim = dense_ids(verts).persist()
    dim.count()
    rest = [c for c in edges.columns if c not in ("src", "dst")]
    # shuffle_hash hint: the edges side often sits on a checkpointed /
    # unioned plan whose inherited size estimate is tiny, which would
    # make Catalyst broadcast the (huge) edge table and abort at the
    # 8 GiB broadcast cap; hash-joining on the dim side is always right
    out = (
        edges.join(
            dim.select(F.col("id").alias("src"), F.col("nid").alias("_s"))
            .hint("shuffle_hash"),
            "src",
        )
        .join(
            dim.select(F.col("id").alias("dst"), F.col("nid").alias("_d"))
            .hint("shuffle_hash"),
            "dst",
        )
        .select(F.col("_s").alias("src"), F.col("_d").alias("dst"), *rest)
    )
    return out, dim
