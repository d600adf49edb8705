"""A/B bed for the CSR adjacency BUILD (the dominant non-loop cost of
web_pagerank and web_lpa: run-c showed ~93s and ~99s of per-query time
outside the superstep loops, mostly this build).

Variants over the same /dev/shm profile corpus (PROF_REPLICAS copies of
the 200k-page synth graph, same as profile_pagerank.py):

  current  — csr_adjacency as shipped (degree agg + SMJ join +
             collect_list groupBy) + caller-side repartition(P, key)
             + bucketed write: the edge source is scanned twice and the
             full array data crosses TWO exchanges (pairs, then CSR
             rows).
  window   — repartition(P, key) FIRST, degree via
             count().over(Window.partitionBy(key)) on the exchanged
             rows, then the identical pmod(xxhash64(nbr), ceil(deg/cap))
             chunk groupBy: one scan, one exchange, one sort; the
             groupBy and the bucketed write ride the same partitioning
             with zero further exchange. Chunk assignment is formula-
             identical, so outputs match modulo array order (verified
             here with a per-key sorted-multiset hash when CHECK=1).

Both variants write a bucketed table exactly like pagerank/lpa do in
mode="tables", so the timed work includes the real sink.

Usage: python scripts/profile_csr.py <cores> <variant> [pr|lpa]
  pr  — out-adjacency keyed on src over m arcs (pagerank shape)
  lpa — in-adjacency keyed on dst over the 2m symmetrized view
Env: PROF_REPLICAS (default 16), CHECK=1 to verify variant equality.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from communitydetection_jl_spark.session import get_spark
from communitydetection_jl_spark.functions.graph import csr_adjacency, symmetrize
from communitydetection_jl_spark.plans.iterstate import state_codec

from profile_pagerank import EDGES_PATH, build_edges  # noqa: E402


def csr_adjacency_window(
    pairs: DataFrame, key: str, nbr: str, out_col: str,
    cap: int | None = None, payload=None, parts: int | None = None,
) -> DataFrame:
    if cap is None:
        cap = int(os.environ.get("SPARK_GRAFT_CSR_CAP", "65536"))
    src = pairs.repartition(parts, key) if parts else pairs
    deg = F.count(F.lit(1)).over(Window.partitionBy(key))
    nchunks = F.greatest(F.lit(1), F.ceil(deg / F.lit(cap))).cast("int")
    return (
        src.withColumn("_chunk", F.pmod(F.xxhash64(nbr), nchunks.cast("long")))
        .groupBy(key, "_chunk")
        .agg(F.collect_list(payload if payload is not None else F.col(nbr)).alias(out_col))
        .drop("_chunk")
    )


def csr_adjacency_shj(
    pairs: DataFrame, key: str, nbr: str, out_col: str,
    cap: int | None = None, payload=None, parts: int | None = None,
) -> DataFrame:
    """Like the window variant but degree via a zero-exchange
    shuffled-hash join on the co-partitioned count agg — no sort at
    all; the exchange output is read twice (ReusedExchange)."""
    if cap is None:
        cap = int(os.environ.get("SPARK_GRAFT_CSR_CAP", "65536"))
    src = pairs.repartition(parts, key) if parts else pairs
    degs = src.groupBy(key).agg(F.count(F.lit(1)).alias("_deg")).hint("SHUFFLE_HASH")
    nchunks = F.greatest(F.lit(1), F.ceil(F.col("_deg") / F.lit(cap))).cast("int")
    return (
        src.join(degs, key)
        .groupBy(key, F.pmod(F.xxhash64(nbr), nchunks.cast("long")).alias("_chunk"))
        .agg(F.collect_list(payload if payload is not None else F.col(nbr)).alias(out_col))
        .drop("_chunk")
    )


def csr_adjacency_hublist(
    pairs: DataFrame, key: str, nbr: str, out_col: str,
    cap: int | None = None, payload=None, parts: int | None = None,
) -> DataFrame:
    """Degree only matters ABOVE cap (non-hub keys always get
    nchunks=1, chunk 0 — pmod(h,1)=0), so compute the per-key count
    once on the already-exchanged rows (co-partitioned agg, zero extra
    exchange via ReusedExchange), keep only hub keys (a handful even at
    web scale) and broadcast THAT back. The full 327M-row sort the
    window form pays to learn every key's degree disappears; the output
    is multiset-identical (same chunk formula on both paths)."""
    if cap is None:
        cap = int(os.environ.get("SPARK_GRAFT_CSR_CAP", "65536"))
    src = pairs.repartition(parts, key) if parts else pairs
    hubs = (
        src.groupBy(key)
        .agg(F.count(F.lit(1)).alias("_deg"))
        .filter(F.col("_deg") > cap)
    )
    nchunks = F.greatest(F.lit(1), F.ceil(F.col("_deg") / F.lit(cap))).cast("int")
    chunk = F.when(
        F.col("_deg").isNotNull(),
        F.pmod(F.xxhash64(nbr), nchunks.cast("long")),
    ).otherwise(F.lit(0))
    return (
        src.join(F.broadcast(hubs), key, "left")
        .groupBy(key, chunk.alias("_chunk"))
        .agg(F.collect_list(payload if payload is not None else F.col(nbr)).alias(out_col))
        .drop("_chunk")
    )


def _write_table(spark, plan: DataFrame, key: str, P: int, name: str) -> float:
    spark.sql(f"DROP TABLE IF EXISTS {name}")
    # a fresh derby metastore doesn't know a previous process's table,
    # so the DROP can't clear its orphaned warehouse location
    import shutil
    wh = os.environ.get("SPARK_GRAFT_WAREHOUSE", "")
    if wh:
        shutil.rmtree(os.path.join(wh, name), ignore_errors=True)
    t0 = time.time()
    w = plan.write
    if state_codec():
        w = w.option("compression", state_codec())
    w.bucketBy(P, key).mode("overwrite").saveAsTable(name)
    return time.time() - t0


def _multiset_hash(spark, table: str, key: str, out_col: str):
    t = spark.table(table)
    per_key = (
        t.select(key, F.explode(out_col).alias("v"))
        .groupBy(key)
        .agg(
            F.sum(F.pmod(F.xxhash64("v"), F.lit(1 << 31))).alias("h"),
            F.count(F.lit(1)).alias("c"),
        )
    )
    row = per_key.agg(
        F.sum(F.pmod(F.xxhash64(key, "h", "c"), F.lit(1 << 31))).alias("H"),
        F.count(F.lit(1)).alias("keys"),
        F.sum("c").alias("arcs"),
    ).collect()[0]
    return (int(row["H"]), int(row["keys"]), int(row["arcs"]))


def main():
    cores = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    variant = sys.argv[2] if len(sys.argv) > 2 else "both"
    shape = sys.argv[3] if len(sys.argv) > 3 else "pr"
    os.environ.setdefault("SPARK_GRAFT_LOCAL_DIR", "/dev/shm/spark-local")
    os.environ.setdefault("SPARK_GRAFT_WAREHOUSE", "/dev/shm/spark-warehouse")
    spark = get_spark("csr-prof", cores=cores, shuffle_partitions=cores)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    if not os.path.exists(EDGES_PATH):
        build_edges(spark, cores)
    edges = spark.read.parquet(EDGES_PATH)
    P = cores

    if shape == "pr":
        pairs, key, nbr, out_col = edges.select("src", "dst"), "src", "dst", "dsts"
    else:
        pairs = symmetrize(edges.select("src", "dst", "weight")).select("src", "dst")
        key, nbr, out_col = "dst", "src", "srcs"
    m = pairs.count()
    print(f"[csr-prof] shape={shape} arcs={m} cores={cores}", flush=True)

    results = {}
    if variant in ("current", "both"):
        plan = csr_adjacency(pairs, key, nbr, out_col).repartition(P, key)
        dt = _write_table(spark, plan, key, P, "csrprof_current")
        results["current"] = dt
        print(f"[csr-prof] current: {dt:.1f}s", flush=True)
    if variant in ("window", "both"):
        plan = csr_adjacency_window(pairs, key, nbr, out_col, parts=P)
        dt = _write_table(spark, plan, key, P, "csrprof_window")
        results["window"] = dt
        print(f"[csr-prof] window: {dt:.1f}s", flush=True)
    if variant in ("shj", "all"):
        plan = csr_adjacency_shj(pairs, key, nbr, out_col, parts=P)
        dt = _write_table(spark, plan, key, P, "csrprof_window")
        results["shj"] = dt
        print(f"[csr-prof] shj: {dt:.1f}s", flush=True)
    if variant in ("hublist",):
        plan = csr_adjacency_hublist(pairs, key, nbr, out_col, parts=P)
        dt = _write_table(spark, plan, key, P, "csrprof_window")
        results["hublist"] = dt
        print(f"[csr-prof] hublist: {dt:.1f}s", flush=True)

    if os.environ.get("CHECK") == "1" and len(results) == 2:
        ha = _multiset_hash(spark, "csrprof_current", key, out_col)
        hb = _multiset_hash(spark, "csrprof_window", key, out_col)
        print(f"[csr-prof] equal={ha == hb} current={ha} window={hb}", flush=True)

    for t in ("csrprof_current", "csrprof_window"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")


if __name__ == "__main__":
    main()
