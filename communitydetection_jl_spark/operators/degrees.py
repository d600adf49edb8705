"""Degree / strength / transition-probability precomputation.

Reference parity: MGraph strengths (src/MGraph.jl:15-78),
visit_prob_undirected (src/FlowGraph.jl:14-27), trans_prob_undirected
(src/FlowGraph.jl:30-35), trans_prob_directed (src/DiFlowGraph.jl:22-44).

Spark shape: one groupBy-sum per direction (map-side partial aggregation
makes hub skew a non-issue here), outer-joined onto the vertex set.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.graph import symmetrize, total_weight, vertices_of, with_weight


def degrees(edges: DataFrame, directed: bool = False) -> DataFrame:
    """Per-vertex degree/strength table.

    Returns (id, out_deg, in_deg, deg, out_strength, in_strength,
    strength). For undirected input (canonical src<=dst) the symmetric
    view is used, so deg == classic undirected degree (self-loops
    counted once, matching the reference's out_neighbors iteration).
    """
    e = with_weight(edges)
    view = e if directed else symmetrize(e)
    out = view.groupBy(F.col("src").alias("id")).agg(
        F.count("*").alias("out_deg"), F.sum("weight").alias("out_strength")
    )
    inn = view.groupBy(F.col("dst").alias("id")).agg(
        F.count("*").alias("in_deg"), F.sum("weight").alias("in_strength")
    )
    return (
        vertices_of(e)
        .join(out, "id", "left")
        .join(inn, "id", "left")
        .select(
            "id",
            F.coalesce("out_deg", F.lit(0)).alias("out_deg"),
            F.coalesce("in_deg", F.lit(0)).alias("in_deg"),
            (F.coalesce("out_deg", F.lit(0)) + F.coalesce("in_deg", F.lit(0))).alias("total_deg"),
            F.coalesce("out_strength", F.lit(0.0)).alias("out_strength"),
            F.coalesce("in_strength", F.lit(0.0)).alias("in_strength"),
        )
        .withColumn(
            "deg", F.col("out_deg") if directed else F.col("out_deg")
        )
        .withColumn("strength", F.col("out_strength"))
    )


def trans_prob_directed(edges: DataFrame) -> DataFrame:
    """Row-normalized transition probability per arc: w / Σ out-w(src).

    Reference: src/DiFlowGraph.jl:22-44. Implemented as groupBy-sum +
    equi-join on src (AQE may broadcast the strength side; skew-join
    splitting handles hub sources).
    """
    e = with_weight(edges)
    outw = e.groupBy(F.col("src").alias("_s")).agg(F.sum("weight").alias("_outw"))
    return (
        e.join(outw, e.src == F.col("_s"))
        .select("src", "dst", "weight", (F.col("weight") / F.col("_outw")).alias("trans_prob"))
    )


def trans_prob_undirected(edges: DataFrame) -> DataFrame:
    """Per-edge transition probability w/2m (src/FlowGraph.jl:30-35)."""
    e = with_weight(edges)
    m = total_weight(e)
    return e.withColumn("trans_prob", F.col("weight") / F.lit(2.0 * m))


def visit_prob_undirected(edges: DataFrame) -> DataFrame:
    """Stationary visit probability ∝ weighted degree / 2m
    (src/FlowGraph.jl:14-27). Self-loop weight counts twice in the
    reference's out_edges-of-both-endpoints sum."""
    e = with_weight(edges)
    m = total_weight(e)
    sym = symmetrize(e)
    # symmetrize keeps self-loops once; reference counts them at both
    # "endpoints" of the loop, i.e. weight doubled.
    loops = e.filter(F.col("src") == F.col("dst")).select("src", "dst", "weight")
    both = sym.unionByName(loops)
    return (
        both.groupBy(F.col("src").alias("id"))
        .agg((F.sum("weight") / F.lit(2.0 * m)).alias("visit_prob"))
    )
