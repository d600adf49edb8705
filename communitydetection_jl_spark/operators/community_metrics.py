"""Per-community structural metrics (the §2.8 scan+groupBy family).

All built on one kernel, ``ns_ms_cs`` (src/metrics.jl:97-121): per
community, internal node count ns, internal edge count ms, boundary
edge count cs — exactly one edges ⋈ memb(src) ⋈ memb(dst) plus two
groupBy aggregates. Every metric is then a column expression over that
table:

  conductance      cs/(2ms+cs)      src/metrics.jl:261-264 (the later,
                                    surviving definition; the shadowed
                                    one at :31-51 is NOT replicated)
  coverage         Σms/m            src/metrics.jl:123-126
  internal_density 2ms/(ns(ns-1))   src/metrics.jl:128-131
  edges_inside     ms               src/metrics.jl:133-136
  average_degree   2ms/ns           src/metrics.jl:138-141
  expansion        cs/ns            src/metrics.jl:242-245
  cut_ratio        cs/(ns(n-ns))    src/metrics.jl:251-255
  normalized_cut   cs/(2ms+cs)+cs/(2(m-ms)+cs)   src/metrics.jl:266-270
  separability     ms/cs            src/metrics.jl:339-342
  fomd             frac nodes w/ internal degree > graph median degree
                                    src/metrics.jl:146-168
  odf family       max/avg/flake out-degree fraction  src/metrics.jl:273-336
  clustering_coefficient (per comm) closed/open triads src/metrics.jl:170-199
  triangle_participation_ratio      src/metrics.jl:221-240
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.graph import canonicalize_undirected, with_weight
from .modularity import edges_with_comms
from .triangles import triangle_participation, vertex_triangle_counts


def ns_ms_cs(edges: DataFrame, membership: DataFrame) -> DataFrame:
    """(comm, ns, ms, cs): internal nodes, internal edges, boundary
    edges per community (unweighted counts like the reference)."""
    lbl = membership.columns[1]
    ec = edges_with_comms(
        canonicalize_undirected(edges).filter(F.col("src") != F.col("dst")),
        membership,
    )
    ms = (
        ec.filter(F.col("cs") == F.col("cd"))
        .groupBy(F.col("cs").alias("comm"))
        .agg(F.count("*").alias("ms"))
    )
    boundary = ec.filter(F.col("cs") != F.col("cd"))
    cs = (
        boundary.select(F.col("cs").alias("comm"))
        .unionByName(boundary.select(F.col("cd").alias("comm")))
        .groupBy("comm")
        .agg(F.count("*").alias("cs"))
    )
    ns = membership.groupBy(F.col(lbl).alias("comm")).agg(F.count("*").alias("ns"))
    return (
        ns.join(ms, "comm", "left")
        .join(cs, "comm", "left")
        .select(
            "comm", "ns",
            F.coalesce("ms", F.lit(0)).alias("ms"),
            F.coalesce("cs", F.lit(0)).alias("cs"),
        )
    )


def community_metrics(edges: DataFrame, membership: DataFrame) -> DataFrame:
    """All §2.8 expression metrics in one DataFrame keyed by comm."""
    k = ns_ms_cs(edges, membership)
    row = (
        canonicalize_undirected(edges)
        .filter(F.col("src") != F.col("dst"))
        .agg(F.count("*").alias("m"), F.lit(0).alias("_z"))
        .collect()[0]
    )
    m = int(row["m"])
    n = int(membership.count())
    safe = lambda num, den: F.when(den != 0, num / den).otherwise(F.lit(None))
    return k.select(
        "comm", "ns", "ms", "cs",
        safe(F.col("cs"), 2 * F.col("ms") + F.col("cs")).alias("conductance"),
        (F.col("ms") / F.lit(m)).alias("coverage_share"),
        safe(2 * F.col("ms"), F.col("ns") * (F.col("ns") - 1)).alias("internal_density"),
        F.col("ms").alias("edges_inside"),
        safe(2 * F.col("ms"), F.col("ns")).alias("average_degree"),
        safe(F.col("cs"), F.col("ns")).alias("expansion"),
        safe(F.col("cs"), F.col("ns") * (F.lit(n) - F.col("ns"))).alias("cut_ratio"),
        (
            safe(F.col("cs"), 2 * F.col("ms") + F.col("cs"))
            + safe(F.col("cs"), 2 * (F.lit(m) - F.col("ms")) + F.col("cs"))
        ).alias("normalized_cut"),
        safe(F.col("ms"), F.col("cs")).alias("separability"),
    )


def min_conductance(edges: DataFrame, membership: DataFrame) -> DataFrame:
    """Minimum conductance per community-size bucket
    (src/metrics.jl:53-90): (ns, min_cond) for each distinct community
    size."""
    k = ns_ms_cs(edges, membership)
    cond = k.select(
        "ns",
        F.when(
            2 * F.col("ms") + F.col("cs") != 0,
            F.col("cs") / (2 * F.col("ms") + F.col("cs")),
        ).alias("c"),
    )
    return cond.groupBy("ns").agg(F.min("c").alias("min_conductance"))


def graph_triangle_participation_ratio(edges: DataFrame) -> float:
    """Graph-level fraction of vertices in ≥1 triangle
    (src/metrics.jl:221-229)."""
    tp = triangle_participation(edges)
    row = tp.agg(F.avg(F.col("in_triangle").cast("double"))).collect()[0]
    return float(row[0] or 0.0)


def coverage(edges: DataFrame, membership: DataFrame) -> float:
    """Σ ms / m (src/metrics.jl:123-126)."""
    k = ns_ms_cs(edges, membership)
    m = canonicalize_undirected(edges).filter(F.col("src") != F.col("dst")).count()
    tot = k.agg(F.sum("ms")).collect()[0][0] or 0
    return tot / m if m else 0.0


def _internal_boundary_degrees(edges: DataFrame, membership: DataFrame) -> DataFrame:
    """(id, comm, int_deg, out_deg_frac helpers) per vertex."""
    ec = edges_with_comms(
        canonicalize_undirected(edges).filter(F.col("src") != F.col("dst")),
        membership,
    )
    sym = ec.select(
        F.col("src").alias("id"), F.col("cs").alias("c"), F.col("cd").alias("nc")
    ).unionByName(
        ec.select(F.col("dst").alias("id"), F.col("cd").alias("c"), F.col("cs").alias("nc"))
    )
    return sym.groupBy("id", "c").agg(
        F.count("*").alias("deg"),
        F.sum((F.col("nc") == F.col("c")).cast("int")).alias("int_deg"),
    )


def fomd(edges: DataFrame, membership: DataFrame) -> DataFrame:
    """Fraction of nodes whose internal degree exceeds the graph median
    degree, per community (src/metrics.jl:146-168)."""
    per_v = _internal_boundary_degrees(edges, membership).persist()
    med = per_v.agg(F.expr("percentile(deg, 0.5)")).collect()[0][0] or 0.0
    out = per_v.groupBy(F.col("c").alias("comm")).agg(
        F.avg((F.col("int_deg") > F.lit(med)).cast("double")).alias("fomd")
    )
    out = out.localCheckpoint(eager=True)
    per_v.unpersist()
    return out


def odf(edges: DataFrame, membership: DataFrame, flake_threshold: float = 0.5) -> DataFrame:
    """Out-degree-fraction family per community: max_odf, average_odf,
    flake_odf (src/metrics.jl:273-336)."""
    per_v = _internal_boundary_degrees(edges, membership)
    frac = per_v.select(
        "id", F.col("c").alias("comm"),
        ((F.col("deg") - F.col("int_deg")) / F.col("deg")).alias("odf"),
        (F.col("int_deg") < F.col("deg") * F.lit(flake_threshold)).cast("double").alias("is_flake"),
    )
    return frac.groupBy("comm").agg(
        F.max("odf").alias("max_odf"),
        F.avg("odf").alias("average_odf"),
        F.avg("is_flake").alias("flake_odf"),
    )


def clustering_coefficient(edges: DataFrame, membership: DataFrame) -> DataFrame:
    """Per-community clustering coefficient: 3·triangles/wedges over the
    community-internal graph... computed on vertices of the community
    using whole-graph triangle counts restricted to intra edges
    (src/metrics.jl:170-199 counts triads within communities)."""
    lbl = membership.columns[1]
    m = membership.select("id", F.col(lbl).alias("comm"))
    intra = (
        edges_with_comms(canonicalize_undirected(edges), m)
        .filter((F.col("cs") == F.col("cd")) & (F.col("src") != F.col("dst")))
        .select("src", "dst", "weight")
    )
    tri = vertex_triangle_counts(intra).join(m, "id")
    from .degrees import degrees

    deg = degrees(intra, directed=False).select("id", "deg")
    per_v = tri.join(deg, "id", "left").select(
        "comm",
        F.col("triangles").alias("t"),
        F.coalesce("deg", F.lit(0)).alias("d"),
    )
    return per_v.groupBy("comm").agg(
        (
            F.sum(F.col("t"))
            / F.greatest(F.sum(F.col("d") * (F.col("d") - 1) / 2), F.lit(1.0))
        ).alias("clustering_coefficient")
    )


def triangle_participation_ratio(edges: DataFrame, membership: DataFrame) -> DataFrame:
    """Per-community fraction of vertices in ≥1 triangle
    (src/metrics.jl:221-240)."""
    lbl = membership.columns[1]
    tp = triangle_participation(edges)
    return (
        tp.join(membership.select("id", F.col(lbl).alias("comm")), "id")
        .groupBy("comm")
        .agg(F.avg(F.col("in_triangle").cast("double")).alias("tpr"))
    )


def prob_metric_graph(
    edges: DataFrame,
    membership: DataFrame,
    steps: int | None = None,
    max_steps: int = 64,
) -> DataFrame:
    """Random-walk retention metric per community (prob_metric_graph /
    prob_metric_cluster, ref src/metrics.jl:357-415): the probability
    that a walker started at v ∈ C, taking uniform steps over ALL
    neighbors, has stayed inside C at every step, after n steps.
    Returns (comm, n_members, mean_p, std_p, var_p) — std/var are the
    reference's Julia std/var (sample, n−1 denominator; NULL for
    singleton communities where Julia yields NaN).

    Semantics note: this implements the reference's DOCUMENTED
    semantics (its docstring + the n==1 base case). The reference's
    recursive accumulation loop returns after the FIRST neighbor
    (src/metrics.jl:374-381 — `return totalP` inside the for body), so
    its n>1 values are a bug, per SURVEY.md §7.7; here the recursion is
    the full community-restricted transition iteration
    p_k(v) = (1/deg v)·Σ_{w∈N(v)∩C} p_{k−1}(w), p_0 ≡ 1, which reduces
    to iterated sparse mat-vec over the community-restricted transition
    matrix — each iteration ONE co-partitioned join + groupBy, never a
    dense matrix.

    ``steps``: walk length for every community; None = the reference's
    normalization (n = community size), capped at ``max_steps`` — at
    web scale a 1e6-member community would otherwise demand 1e6
    supersteps for a value that is astronomically small; the cap is the
    documented "some other, better value" escape hatch of the
    reference's own docstring.
    """
    from ..functions.graph import materialize_iter

    lbl = membership.columns[1]
    memb = membership.select("id", F.col(lbl).alias("comm"))
    e = edges.select("src", "dst").filter(F.col("src") != F.col("dst"))
    sym = e.unionByName(
        e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    deg = sym.groupBy(F.col("src").alias("id")).agg(
        F.count(F.lit(1)).alias("deg"))
    # community-restricted arcs, listener-keyed: (dst=v, src=w) both in C
    intra = (
        sym.join(memb.withColumnRenamed("id", "src")
                 .withColumnRenamed("comm", "c_s"), "src")
        .join(memb.withColumnRenamed("id", "dst")
              .withColumnRenamed("comm", "c_d"), "dst")
        .filter(F.col("c_s") == F.col("c_d"))
        .select(F.col("dst").alias("v"), F.col("src").alias("w"))
    )
    intra = materialize_iter(intra)
    sizes = memb.groupBy("comm").agg(F.count(F.lit(1)).alias("n_members"))
    if steps is not None:
        ksteps = F.lit(int(steps))
    else:
        ksteps = F.least(F.col("n_members"), F.lit(int(max_steps)))
    # state: (id, comm, p, k_target); p_0 = 1 for every member
    state = materialize_iter(
        memb.join(sizes, "comm")
        .join(deg, "id", "left")
        .select(
            "id", "comm", F.lit(1.0).alias("p"),
            ksteps.alias("k_target"),
            F.coalesce("deg", F.lit(0)).cast("double").alias("deg"),
        )
    )
    k = 0
    while True:
        remaining = state.filter(F.col("k_target") > k)
        if remaining.isEmpty():
            break
        k += 1
        gathered = (
            remaining.withColumnRenamed("id", "w")
            .join(intra, "w")
            .groupBy(F.col("v").alias("id"))
            .agg(F.sum("p").alias("msg"))
        )
        stepped = (
            remaining.select("id", "comm", "k_target", "deg")
            .join(gathered, "id", "left")
            .select(
                "id", "comm",
                F.when(F.col("deg") > 0,
                       F.coalesce("msg", F.lit(0.0)) / F.col("deg"))
                .otherwise(F.lit(0.0)).alias("p"),
                "k_target", "deg",
            )
        )
        state = materialize_iter(
            stepped.unionByName(state.filter(F.col("k_target") <= k - 1))
        )
    return state.groupBy("comm").agg(
        F.count(F.lit(1)).alias("n_members"),
        F.avg("p").alias("mean_p"),
        F.stddev_samp("p").alias("std_p"),
        F.var_samp("p").alias("var_p"),
    )


def prob_metric_cluster(edges: DataFrame, members: DataFrame,
                        steps: int | None = None) -> tuple:
    """Single-community form (ref src/metrics.jl:384-391): (mean, std,
    var) of the retention probabilities of ``members`` (a one-column
    id frame). Delegates to prob_metric_graph with a constant label."""
    memb = members.select(F.col(members.columns[0]).alias("id"),
                          F.lit(0).alias("comm"))
    row = prob_metric_graph(edges, memb, steps=steps).collect()[0]
    return row["mean_p"], row["std_p"], row["var_p"]
