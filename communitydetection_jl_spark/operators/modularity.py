"""Modularity scoring and per-community aggregate maintenance.

Reference parity:
 - modularity(graph, membership[, weights]) — src/modularity.jl:1-54:
   Q = Σ_c [ e_c/2m − (a_c/2m)² ] with e_c = 2·Σ intra-edge w,
   a_c = Σ incident w (self-loops contribute 2w to a_c);
 - directed quality (MPartition) — src/MPartition.jl:304-330:
   Q = Σ_c [ w_inner_c/m − K_out_c·K_in_c/m² ];
 - comm_stats = the DataFrame analogue of update_partition!
   (src/MPartition.jl:41-106).

Spark shape: membership joined onto both edge endpoints (two equi-joins
on id), then one groupBy(comm) — all JVM-side column expressions.
North rule: modularity allclose 1e-6.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.graph import with_weight


def edges_with_comms(edges: DataFrame, membership: DataFrame) -> DataFrame:
    """Attach community of both endpoints: (src, dst, weight, cs, cd)."""
    lbl = membership.columns[1]
    m = membership.select("id", F.col(lbl).alias("_c"))
    return (
        with_weight(edges)
        .join(m.withColumnRenamed("id", "src").withColumnRenamed("_c", "cs"), "src")
        .join(m.withColumnRenamed("id", "dst").withColumnRenamed("_c", "cd"), "dst")
    )


def modularity(edges: DataFrame, membership: DataFrame, directed: bool = False) -> float:
    """Scalar modularity Q of a membership (north rule: allclose 1e-6)."""
    ec = edges_with_comms(edges, membership)
    if not directed:
        per_comm_e = (
            ec.filter(F.col("cs") == F.col("cd"))
            .groupBy(F.col("cs").alias("c"))
            .agg(F.sum(2 * F.col("weight")).alias("e"))
        )
        a_src = ec.groupBy(F.col("cs").alias("c")).agg(F.sum("weight").alias("a"))
        a_dst = ec.groupBy(F.col("cd").alias("c")).agg(F.sum("weight").alias("a"))
        per_comm_a = a_src.unionByName(a_dst).groupBy("c").agg(F.sum("a").alias("a"))
        m = float(ec.agg(F.sum("weight")).collect()[0][0] or 0.0)
        if m <= 0:
            return 0.0
        stats = per_comm_a.join(per_comm_e, "c", "left").select(
            (F.coalesce("e", F.lit(0.0)) / (2 * m)
             - (F.col("a") / (2 * m)) ** 2).alias("q")
        )
        return float(stats.agg(F.sum("q")).collect()[0][0] or 0.0)
    # directed: Q = Σ_c w_inner/m − K_out·K_in/m²  (src/MPartition.jl:304-330)
    m = float(ec.agg(F.sum("weight")).collect()[0][0] or 0.0)
    if m <= 0:
        return 0.0
    inner = (
        ec.filter(F.col("cs") == F.col("cd"))
        .groupBy(F.col("cs").alias("c"))
        .agg(F.sum("weight").alias("w_inner"))
    )
    kout = ec.groupBy(F.col("cs").alias("c")).agg(F.sum("weight").alias("k_out"))
    kin = ec.groupBy(F.col("cd").alias("c")).agg(F.sum("weight").alias("k_in"))
    stats = (
        kout.join(kin, "c", "outer")
        .join(inner, "c", "left")
        .select(
            (
                F.coalesce("w_inner", F.lit(0.0)) / m
                - F.coalesce("k_out", F.lit(0.0)) * F.coalesce("k_in", F.lit(0.0)) / (m * m)
            ).alias("q")
        )
    )
    return float(stats.agg(F.sum("q")).collect()[0][0] or 0.0)


def comm_stats(edges: DataFrame, membership: DataFrame, directed: bool = False) -> DataFrame:
    """Per-community aggregates (comm, csize, w_inner, k_out, k_in).

    For undirected graphs the edge table is canonical (each edge once);
    w_inner sums intra edges once, k_* sum incident weights per
    endpoint (== weighted strengths). The Spark analogue of
    update_partition! (src/MPartition.jl:41-106)."""
    lbl = membership.columns[1]
    ec = edges_with_comms(edges, membership)
    if not directed:
        # reverse ALL edges (self-loops included, so they count twice in
        # strengths, matching a[c] += w twice in src/modularity.jl:28-30)
        ec = ec.unionByName(
            ec.select(
                F.col("dst").alias("src"), F.col("src").alias("dst"),
                "weight", F.col("cd").alias("cs"), F.col("cs").alias("cd"),
            )
        )
        inner = (
            ec.filter(F.col("cs") == F.col("cd"))
            .groupBy(F.col("cs").alias("comm"))
            # the doubled view counts each intra edge exactly twice
            .agg((F.sum("weight") / 2).alias("w_inner"))
        )
    else:
        inner = (
            ec.filter(F.col("cs") == F.col("cd"))
            .groupBy(F.col("cs").alias("comm"))
            .agg(F.sum("weight").alias("w_inner"))
        )
    kout = ec.groupBy(F.col("cs").alias("comm")).agg(F.sum("weight").alias("k_out"))
    kin = ec.groupBy(F.col("cd").alias("comm")).agg(F.sum("weight").alias("k_in"))
    sizes = membership.groupBy(F.col(lbl).alias("comm")).agg(F.count("*").alias("csize"))
    return (
        sizes.join(kout, "comm", "left")
        .join(kin, "comm", "left")
        .join(inner, "comm", "left")
        .select(
            "comm", "csize",
            F.coalesce("w_inner", F.lit(0.0)).alias("w_inner"),
            F.coalesce("k_out", F.lit(0.0)).alias("k_out"),
            F.coalesce("k_in", F.lit(0.0)).alias("k_in"),
        )
    )
