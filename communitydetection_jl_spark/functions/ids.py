"""Dense vertex-id assignment (dictionary encoding).

The reference assumes dense ``1..n`` vertex ids (Graphs.jl
``vertex_index``); the engine's url-derived ids are sparse 64-bit
hashes. Dense ids shrink every downstream shuffle/state row (int32 vs
int64 keys, SURVEY.md §4.3) and raise the single-box memory-bandwidth
ceiling on gather supersteps, so the bench path densifies once at
graph build.

Scalable construction (no global window): range-partition the ids,
count per partition, broadcast the per-partition offsets, then
row_number within each partition. One pass + one tiny collect.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window as W


def dense_ids(verts: DataFrame, id_col: str = "id", parts: int | None = None) -> DataFrame:
    """Map distinct ``id_col`` values to dense ids ``0..n-1``.

    Returns ``(id, nid)`` with ``nid`` int when n < 2^31 else long.
    Deterministic given the input *set* (ordered by id within range
    partitions).
    """
    spark = verts.sparkSession
    P = parts or spark.sparkContext.defaultParallelism
    # materialize ONCE: repartitionByRange re-samples boundaries on
    # every execution, so the offset counts and the row_numbers must
    # read the same physical instance (persist, not localCheckpoint:
    # checkpointing stores deserialized row objects and its job ships
    # per-task result metadata that can trip driver.maxResultSize)
    d = (
        verts.select(id_col).distinct()
        .repartitionByRange(P, id_col)
        .withColumn("_pid", F.spark_partition_id())
        .persist()
    )
    d.count()
    counts = d.groupBy("_pid").count().collect()
    offs: dict[int, int] = {}
    acc = 0
    for r in sorted(counts, key=lambda r: r["_pid"]):
        offs[r["_pid"]] = acc
        acc += r["count"]
    omap = F.create_map(*[F.lit(x) for kv in offs.items() for x in kv])
    w = W.partitionBy("_pid").orderBy(id_col)
    nid = F.row_number().over(w) - 1 + omap[F.col("_pid")]
    out_type = "int" if acc < (1 << 31) else "long"
    return d.select(id_col, nid.cast(out_type).alias("nid"))


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
