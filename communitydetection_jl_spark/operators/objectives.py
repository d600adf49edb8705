"""Partition quality objectives beyond plain modularity.

All are single aggregations over comm_stats (operators/modularity.py) +
whole-graph scalars — the Spark analogue of the reference's quality()
family:

  CPM             Σ_c [w_inner − γ·C(n_c,2)]          src/MPartition.jl:424-438
  RBConfiguration modularity with resolution γ         src/MPartition.jl:469-480
  RBER            Σ_c [w_inner − γ·p·C(n_c,2)]        src/MPartition.jl:519-533
  Significance    Σ_c C(n_c,2)·KL(p_c ‖ p)            src/MPartition.jl:589-604
  Surprise        m·KL(q ‖ ⟨q⟩)                        src/MPartition.jl:372-385
  Map equation    L(M) undirected codelength           src/FlowPartition.jl:191-198
  Modularity density (Qds)                             src/modularity_density.jl:1-43

KL here is the binary Kullback-Leibler divergence (src/utils.jl:2-12).
Unweighted-count semantics where the reference requires it
(Significance rejects weighted graphs, src/Optimiser.jl:266-268).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.graph import canonicalize_undirected, plogp, with_weight
from .modularity import comm_stats, edges_with_comms


def _kl_expr(q, p):
    """Binary KL divergence as a column expression with 0/1 guards."""
    term1 = F.when((q > 0) & (p > 0), q * F.log(q / p)).otherwise(F.lit(0.0))
    term2 = F.when(
        (q < 1) & (p < 1), (1 - q) * F.log((1 - q) / (1 - p))
    ).otherwise(F.lit(0.0))
    return term1 + term2


def _possible(n):
    return n * (n - 1) / 2.0


def cpm_quality(edges: DataFrame, membership: DataFrame, gamma: float = 1.0) -> float:
    """Constant Potts model: Σ_c w_inner − γ·possible_edges(c)."""
    cs = comm_stats(edges, membership)
    row = cs.agg(
        F.sum(F.col("w_inner") - F.lit(gamma) * _possible(F.col("csize")))
    ).collect()[0]
    return float(row[0] or 0.0)


def rb_configuration_quality(edges: DataFrame, membership: DataFrame, gamma: float = 1.0) -> float:
    """Reichardt-Bornholdt configuration null model: modularity-shaped
    with resolution γ (undirected)."""
    cs = comm_stats(edges, membership)
    m = float(with_weight(edges).agg(F.sum("weight")).collect()[0][0] or 0.0)
    if m <= 0:
        return 0.0
    row = cs.agg(
        F.sum(
            F.col("w_inner") / m
            - F.lit(gamma) * (F.col("k_out") / (2 * m)) * (F.col("k_in") / (2 * m))
        )
    ).collect()[0]
    return float(row[0] or 0.0)


def rber_quality(edges: DataFrame, membership: DataFrame, gamma: float = 1.0) -> float:
    """RB with Erdős–Rényi null: Σ_c w_inner − γ·p·possible_edges(c),
    p = graph density."""
    e = canonicalize_undirected(edges).filter(F.col("src") != F.col("dst"))
    m = e.count()
    n = membership.count()
    poss = _possible(n)
    p = m / poss if poss else 0.0
    cs = comm_stats(edges, membership)
    row = cs.agg(
        F.sum(F.col("w_inner") - F.lit(gamma * p) * _possible(F.col("csize")))
    ).collect()[0]
    return float(row[0] or 0.0)


def significance_quality(edges: DataFrame, membership: DataFrame) -> float:
    """Σ_c possible_edges(c)·KL(p_c ‖ p) with p_c = community density
    (unweighted edge counts — the reference rejects weighted graphs)."""
    e = canonicalize_undirected(edges).filter(F.col("src") != F.col("dst"))
    ec = edges_with_comms(e.withColumn("weight", F.lit(1.0)), membership)
    inner = (
        ec.filter(F.col("cs") == F.col("cd"))
        .groupBy(F.col("cs").alias("comm"))
        .agg(F.count("*").alias("ms"))
    )
    lbl = membership.columns[1]
    sizes = membership.groupBy(F.col(lbl).alias("comm")).agg(F.count("*").alias("ns"))
    m = e.count()
    n = membership.count()
    density = m / _possible(n) if n > 1 else 0.0
    stats = sizes.join(inner, "comm", "left").select(
        "ns", F.coalesce("ms", F.lit(0)).alias("ms")
    )
    pc = F.when(_possible(F.col("ns")) > 0, F.col("ms") / _possible(F.col("ns"))).otherwise(F.lit(0.0))
    row = stats.agg(
        F.sum(_possible(F.col("ns")) * _kl_expr(pc, F.lit(density)))
    ).collect()[0]
    return float(row[0] or 0.0)


def surprise_quality(edges: DataFrame, membership: DataFrame) -> float:
    """m·KL(q ‖ ⟨q⟩): q = fraction of edges inside communities, ⟨q⟩ =
    fraction of vertex pairs inside communities."""
    e = canonicalize_undirected(edges).filter(F.col("src") != F.col("dst"))
    ec = edges_with_comms(e.withColumn("weight", F.lit(1.0)), membership)
    m = e.count()
    m_in = ec.filter(F.col("cs") == F.col("cd")).count()
    lbl = membership.columns[1]
    sizes = membership.groupBy(F.col(lbl)).agg(F.count("*").alias("ns"))
    poss_in = float(
        sizes.agg(F.sum(_possible(F.col("ns")))).collect()[0][0] or 0.0
    )
    n = membership.count()
    poss = _possible(n)
    if m == 0 or poss == 0:
        return 0.0
    q = m_in / m
    q_exp = poss_in / poss
    kl = 0.0
    if q > 0 and q_exp > 0:
        kl += q * math.log(q / q_exp)
    if q < 1 and q_exp < 1:
        kl += (1 - q) * math.log((1 - q) / (1 - q_exp))
    return m * kl


def map_equation(edges: DataFrame, membership: DataFrame) -> float:
    """Undirected map-equation codelength of a membership
    (codelen/quality, src/FlowPartition.jl:191-198, src/metrics.jl:3-29):

        L = plogp(Σ_c q_c) − 2Σ_c plogp(q_c) − Σ_v plogp(p_v)
            + Σ_c plogp(q_c + p_c)

    with p_v = deg_w(v)/2m, q_c = exit prob = Σ inter-community edge
    trans prob (w/2m per direction), p_c = Σ_{v∈c} p_v. Lower is better."""
    e = canonicalize_undirected(edges)
    m = float(e.agg(F.sum("weight")).collect()[0][0] or 0.0)
    if m <= 0:
        return 0.0
    lbl = membership.columns[1]
    memb = membership.select("id", F.col(lbl).alias("comm"))
    ec = edges_with_comms(e, memb)
    # per-vertex visit prob term: Σ plogp(deg_w/2m)
    sym_w = ec.select(F.col("src").alias("id"), "weight").unionByName(
        ec.select(F.col("dst").alias("id"), "weight")
    )
    pv = sym_w.groupBy("id").agg((F.sum("weight") / (2 * m)).alias("p"))
    s_pv = float(pv.agg(F.sum(plogp(F.col("p")))).collect()[0][0] or 0.0)
    # community visit prob and exit prob
    pcomm = (
        pv.join(memb, "id")
        .groupBy("comm")
        .agg(F.sum("p").alias("p_c"))
    )
    boundary = ec.filter(F.col("cs") != F.col("cd"))
    qexit = (
        boundary.select(F.col("cs").alias("comm"), "weight")
        .unionByName(boundary.select(F.col("cd").alias("comm"), "weight"))
        .groupBy("comm")
        .agg((F.sum("weight") / (2 * m)).alias("q_c"))
    )
    cstats = pcomm.join(qexit, "comm", "left").select(
        "p_c", F.coalesce("q_c", F.lit(0.0)).alias("q_c")
    )
    row = cstats.agg(
        F.sum("q_c").alias("sum_q"),
        F.sum(plogp(F.col("q_c"))).alias("s_q"),
        F.sum(plogp(F.col("q_c") + F.col("p_c"))).alias("s_qp"),
    ).collect()[0]
    sum_q = float(row["sum_q"] or 0.0)
    s_q = float(row["s_q"] or 0.0)
    s_qp = float(row["s_qp"] or 0.0)
    plogp_sum_q = sum_q * math.log(sum_q) if sum_q > 0 else 0.0
    return plogp_sum_q - 2 * s_q - s_pv + s_qp


def map_equation_directed(
    edges: DataFrame,
    membership: DataFrame,
    tau: float = 0.15,
    pr_tol: float = 1e-10,
) -> float:
    """Directed map-equation codelength with teleportation
    (DiFlowPartition quality, src/DiFlowPartition.jl:37-104,305-312).

    Visit probs = reference-semantics PageRank (src/DiFlowGraph.jl:50-85);
    per-community exit probability:

        q_c = τ·(n−n_c)/n·p_c
              + (1−τ)·[ Σ_{u∈c, v∉c} p_u·trans(u→v) + (n−n_c)/n·iso_c ]

    where iso_c is the visit prob of c's dangling members (their jump is
    uniform, so both the τ and 1−τ shares leave with weight (n−n_c)/n).
    L = plogp(Σq) − 2Σplogp(q_c) − Σplogp(p_v) + Σplogp(q_c + p_c)."""
    from .degrees import trans_prob_directed
    from .pagerank import pagerank

    lbl = membership.columns[1]
    memb = membership.select("id", F.col(lbl).alias("comm"))
    n = memb.count()
    pr = pagerank(edges, damping=1.0 - tau, tol=pr_tol).ranks.withColumnRenamed(
        "pagerank", "p"
    )
    pv = pr.join(memb, "id")
    s_pv = float(pv.agg(F.sum(plogp(F.col("p")))).collect()[0][0] or 0.0)
    sizes = memb.groupBy("comm").agg(F.count("*").alias("n_c"))
    pcomm = pv.groupBy("comm").agg(F.sum("p").alias("p_c"))
    dangling = pv.join(
        edges.select(F.col("src").alias("id")).distinct(), "id", "left_anti"
    )
    iso = dangling.groupBy("comm").agg(F.sum("p").alias("iso_c"))
    # outgoing boundary flow per community
    tp = trans_prob_directed(edges).select("src", "dst", "trans_prob")
    flows = (
        tp.join(pv.select(F.col("id").alias("src"), F.col("p").alias("p_u"),
                          F.col("comm").alias("cu")), "src")
        .join(memb.select(F.col("id").alias("dst"), F.col("comm").alias("cv")), "dst")
        .filter(F.col("cu") != F.col("cv"))
        .groupBy(F.col("cu").alias("comm"))
        .agg(F.sum(F.col("p_u") * F.col("trans_prob")).alias("out_flow"))
    )
    stats = (
        sizes.join(pcomm, "comm")
        .join(iso, "comm", "left")
        .join(flows, "comm", "left")
        .select(
            "p_c",
            (
                F.lit(tau) * (F.lit(n) - F.col("n_c")) / F.lit(float(n)) * F.col("p_c")
                + F.lit(1 - tau)
                * (
                    F.coalesce("out_flow", F.lit(0.0))
                    + (F.lit(n) - F.col("n_c")) / F.lit(float(n))
                    * F.coalesce("iso_c", F.lit(0.0))
                )
            ).alias("q_c"),
        )
    )
    row = stats.agg(
        F.sum("q_c").alias("sum_q"),
        F.sum(plogp(F.col("q_c"))).alias("s_q"),
        F.sum(plogp(F.col("q_c") + F.col("p_c"))).alias("s_qp"),
    ).collect()[0]
    sum_q = float(row["sum_q"] or 0.0)
    plogp_sum_q = sum_q * math.log(sum_q) if sum_q > 0 else 0.0
    return plogp_sum_q - 2 * float(row["s_q"] or 0.0) - s_pv + float(row["s_qp"] or 0.0)


def modularity_density(edges: DataFrame, membership: DataFrame) -> float:
    """Qds — density-weighted modularity with split penalty
    (src/modularity_density.jl:1-43): per community,
    d_c = 2ms/(ns(ns-1)); Qds = Σ_c [ (ms/m)·d_c − ((2ms + cs)/(2m))²·d_c²
    − Σ_{c'≠c} (m_cc'/(2m))·d_cc' ] with d_cc' = m_cc'/(ns_c·ns_c')."""
    from .community_metrics import ns_ms_cs

    e = canonicalize_undirected(edges).filter(F.col("src") != F.col("dst"))
    m = e.count()
    if m == 0:
        return 0.0
    k = ns_ms_cs(e, membership)
    dc = F.when(
        F.col("ns") > 1, 2.0 * F.col("ms") / (F.col("ns") * (F.col("ns") - 1))
    ).otherwise(F.lit(0.0))
    base = k.agg(
        F.sum(
            (F.col("ms") / F.lit(float(m))) * dc
            - ((2 * F.col("ms") + F.col("cs")) / F.lit(2.0 * m)) ** 2 * dc * dc
        )
    ).collect()[0]
    # pairwise inter-community penalty
    lbl = membership.columns[1]
    memb = membership.select("id", F.col(lbl).alias("comm"))
    ecc = edges_with_comms(e, memb).filter(F.col("cs") != F.col("cd"))
    pair = ecc.select(
        F.least("cs", "cd").alias("ca"), F.greatest("cs", "cd").alias("cb")
    ).groupBy("ca", "cb").agg(F.count("*").alias("mcc"))
    sizes = memb.groupBy(F.col("comm")).agg(F.count("*").alias("ns"))
    pair = (
        pair.join(sizes.withColumnRenamed("comm", "ca").withColumnRenamed("ns", "na"), "ca")
        .join(sizes.withColumnRenamed("comm", "cb").withColumnRenamed("ns", "nb"), "cb")
    )
    # each unordered pair contributes to both communities' penalties
    pen = pair.agg(
        F.sum(
            2.0 * (F.col("mcc") / F.lit(2.0 * m))
            * (F.col("mcc") / (F.col("na") * F.col("nb")))
        )
    ).collect()[0]
    return float(base[0] or 0.0) - float(pen[0] or 0.0)
