"""Modularity optimization (Louvain-equivalent), Spark-first.

The reference's optimizer is a sequential greedy sweep
(move_nodes!, src/Optimiser.jl:3-254) — inherently serial. The
reference itself ships a bulk-parallel variant, multi_greedy_merge!
(src/MultiGreedy.jl:1-34): score ALL candidate moves at once, then
apply non-conflicting ones. This engine adopts that discipline:

 1. **Distributed move phase** (per level): one shuffle computes
    w(u→community) for every vertex/neighbor-community pair
    (edges ⋈ memb ⋈ comm totals); the modularity gain
    Δ(u→c) = [w_to(c) − w_to(cur∖u)] − k_u·[Σtot(c) − (Σtot(cur)−k_u)]/(2m)
    is a column expression (the undirected specialization of
    modularity_diff_move, src/MPartition.jl:277-302); the best positive
    move per vertex is a max_by; conflicts (A→B while B→A swaps) are
    broken by hash-parity gating — only vertices with
    xxhash64(id)%2 == sweep%2 move each sweep, the bulk analogue of the
    merged_nodes set in multi_greedy_merge!.
 2. **Collapse** the graph by the level membership (coarsen.py) and
    recurse — coarse graphs shrink geometrically.
 3. **Driver-local exact phase**: below ``local_threshold`` edges the
    graph is collected and optimized with a faithful sequential greedy
    (deterministic order) re-deriving move_nodes! semantics — at that
    size the reference itself is a single-machine program, and this is
    what makes fixture memberships exact (NMI == 1.0,
    test/runtests.jl:16).

Scale: each sweep is one join + two groupBys; comm totals are a
broadcast-sized table after the first collapse; lineage truncated by
localCheckpoint per sweep.
"""

from __future__ import annotations

from collections import defaultdict
from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.graph import (
    canonicalize_undirected,
    materialize_iter,
    vertices_of,
    with_weight,
)
from .coarsen import collapse_graph, from_coarser_partition, renumber_communities
from .modularity import modularity


# ----------------------------------------------------------------------
# driver-local exact greedy (reference move_nodes!/optimize_partition!
# semantics with deterministic order), used below local_threshold
# ----------------------------------------------------------------------

def _local_louvain(pairs, node_sizes=None, eps=1e-10, max_sweeps=100,
                   objective="modularity", gamma=1.0):
    """Sequential greedy optimization on (u, v, w) canonical undirected
    pairs. ``objective``: 'modularity'/'rbconfig' (γ-scaled null model,
    src/MPartition.jl:250-302,441-467) or 'cpm' (src/MPartition.jl:388-422,
    needs node sizes).

    The gain for u→c reduces to w_to(c) − penalty·k2_u·tot2(c∖u) with
    (k2, tot2, penalty) = (strength, Σstrength, γ/2m) for modularity and
    (node size, Σsize, γ) for CPM.

    Deterministic: vertices swept in sorted id order, ties broken by
    smallest community id. Returns dict id -> community id.
    """
    adj = defaultdict(dict)
    selfw = defaultdict(float)
    nodes = set()
    m = 0.0
    for u, v, w in pairs:
        nodes.add(u)
        nodes.add(v)
        m += w
        if u == v:
            selfw[u] += w
        else:
            adj[u][v] = adj[u].get(v, 0.0) + w
            adj[v][u] = adj[v].get(u, 0.0) + w
    if m <= 0:
        return {u: u for u in nodes}
    k = {u: sum(adj[u].values()) + 2.0 * selfw[u] for u in nodes}
    if objective == "cpm":
        k2 = {u: float((node_sizes or {}).get(u, 1.0)) for u in nodes}
        penalty = gamma
    else:
        k2 = k
        penalty = gamma / (2.0 * m)
    comm = {u: u for u in nodes}
    tot2 = defaultdict(float)
    for u in nodes:
        tot2[comm[u]] += k2[u]

    order = sorted(nodes)
    improved_any = True
    sweeps = 0
    while improved_any and sweeps < max_sweeps:
        improved_any = False
        sweeps += 1
        for u in order:
            cu = comm[u]
            w_to = defaultdict(float)
            for v, w in adj[u].items():
                w_to[comm[v]] += w
            tot2[cu] -= k2[u]
            base = w_to.get(cu, 0.0) - penalty * k2[u] * tot2[cu]
            best_c, best_gain = cu, 0.0
            for c in sorted(w_to):
                if c == cu:
                    continue
                gain = (w_to[c] - penalty * k2[u] * tot2[c]) - base
                if gain > best_gain + eps or (
                    abs(gain - best_gain) <= eps and best_c != cu and c < best_c
                ):
                    if gain > eps:
                        best_c, best_gain = c, gain
            comm[u] = best_c
            tot2[best_c] += k2[u]
            if best_c != cu:
                improved_any = True

    # collapse and recurse while the community count shrinks
    n_comms = len(set(comm.values()))
    if n_comms < len(nodes):
        agg = defaultdict(float)
        csize = defaultdict(float)
        for u in nodes:
            csize[comm[u]] += (node_sizes or {}).get(u, 1.0)
        for u, v, w in pairs:
            a, b = comm[u], comm[v]
            lo, hi = (a, b) if a <= b else (b, a)
            agg[(lo, hi)] += w
        coarse_pairs = [(a, b, w) for (a, b), w in agg.items()]
        coarse_comm = _local_louvain(
            coarse_pairs, node_sizes=dict(csize), eps=eps,
            max_sweeps=max_sweeps, objective=objective, gamma=gamma,
        )
        if len(set(coarse_comm.values())) < n_comms:
            comm = {u: coarse_comm[comm[u]] for u in comm}
    return comm


# ----------------------------------------------------------------------
# distributed bulk move phase
# ----------------------------------------------------------------------

def _strengths(edges: DataFrame) -> DataFrame:
    """(id, k) weighted strength; self-loops count 2w (MGraph semantics)."""
    e = with_weight(edges)
    per_end = e.select(F.col("src").alias("id"), "weight").unionByName(
        e.select(F.col("dst").alias("id"), "weight")
    )
    return per_end.groupBy("id").agg(F.sum("weight").alias("k"))


def _move_sweep(edges: DataFrame, memb: DataFrame, aux: DataFrame,
                penalty: float, parity: int, eps: float) -> DataFrame:
    """One bulk gain-scoring sweep; returns updated (id, comm).

    ``aux`` is (id, k2): per-vertex null-model mass (strength for
    modularity/RB-configuration, node size for CPM); the gain for u→c is
    w_to(c) − penalty·k2_u·tot2(c∖u)."""
    mm = memb.select("id", F.col("comm").alias("c"))
    e = with_weight(edges).filter(F.col("src") != F.col("dst"))
    sym = e.select("src", "dst", "weight").unionByName(
        e.select(F.col("dst").alias("src"), F.col("src").alias("dst"), "weight")
    )
    # w(u → community of neighbor)
    w_to = (
        sym.join(mm.withColumnRenamed("id", "dst").withColumnRenamed("c", "nc"), "dst")
        .groupBy(F.col("src").alias("id"), F.col("nc").alias("cand"))
        .agg(F.sum("weight").alias("w_uc"))
    )
    tot = (
        mm.join(aux, "id")
        .groupBy(F.col("c").alias("cand"))
        .agg(F.sum("k2").alias("tot"))
    )
    cur = mm.join(aux, "id")
    cand = (
        w_to.join(cur, "id")
        .join(tot, "cand")
        .withColumn("tot_excl", F.col("tot") - F.when(F.col("cand") == F.col("c"), F.col("k2")).otherwise(F.lit(0.0)))
        .withColumn("score", F.col("w_uc") - F.lit(penalty) * F.col("k2") * F.col("tot_excl"))
    )
    # baseline = score of staying (w to own community minus self)
    base = cand.filter(F.col("cand") == F.col("c")).select(
        "id", F.col("score").alias("base")
    )
    best = (
        cand.filter(F.col("cand") != F.col("c"))
        .groupBy("id")
        .agg(
            F.max_by("cand", F.struct(F.col("score"), (-F.col("cand")).alias("nb"))).alias("best_c"),
            F.max(F.col("score")).alias("best_score"),
        )
    )
    new_c = (
        F.when(
            (F.col("best_score") - F.coalesce("base", F.lit(0.0)) > eps)
            & (F.pmod(F.xxhash64("id"), F.lit(2)) == F.lit(parity)),
            F.col("best_c"),
        )
        .otherwise(F.col("c"))
    )
    upd = (
        mm.join(best, "id", "left")
        .join(base, "id", "left")
        .select("id", new_c.alias("comm"), (new_c != F.col("c")).alias("moved"))
    )
    return upd


def _distributed_level(edges: DataFrame, eps: float, max_sweeps: int,
                       move_floor: float = 0.01, ledger=None,
                       level: int = 0, objective: str = "modularity",
                       gamma: float = 1.0,
                       node_sizes: DataFrame | None = None) -> DataFrame:
    """Run bulk move sweeps on one level until (nearly) no vertex moves.

    ``move_floor`` is the reference's δ move floor (src/Optimiser.jl:148):
    stop once fewer than δ·n vertices move in a full parity pair —
    residual moves are polished by later levels / the local phase.

    Per sweep ONE action (plans/iterstate.py): the membership write
    carries the moved-count as an observe() metric."""
    from ..plans.iterstate import StateLoop, no_aqe

    spark = edges.sparkSession
    verts = vertices_of(edges)
    row = (
        with_weight(edges)
        .agg(F.sum("weight").alias("m"))
        .collect()[0]
    )
    m = float(row["m"] or 0.0)
    loop = StateLoop(spark, f"louvain_l{level}", bucket_key="id", ledger=None)
    memb = loop.init(verts.select("id", F.col("id").alias("comm")))
    n = memb.count()
    if m <= 0:
        loop.cleanup(keep_final=True)
        return memb
    if objective == "cpm":
        aux = (node_sizes or verts.select("id", F.lit(1.0).alias("k2"))).select(
            "id", F.col(node_sizes.columns[1] if node_sizes is not None else "k2").cast("double").alias("k2")
        )
        penalty = gamma
    else:
        aux = _strengths(edges).select("id", F.col("k").alias("k2"))
        penalty = gamma / (2.0 * m)
    aux = aux.persist()
    aux.count()
    low_streak = 0
    with no_aqe(spark):
        for sweep in range(max_sweeps):
            memb, got = loop.step(
                _move_sweep(edges, memb.select("id", "comm"), aux, penalty,
                            sweep % 2, eps),
                {"moved": F.sum(F.col("moved").cast("long"))},
                write_cols=["id", "comm"],
            )
            moved = int(got.get("moved") or 0)
            if ledger is not None:
                ledger.record(sweep, {"level": level, "moved": moved})
            if moved <= move_floor * n:
                low_streak += 1
                if low_streak >= 2:  # both parities quiet
                    break
            else:
                low_streak = 0
    aux.unpersist()
    loop.cleanup(keep_final=True)
    return memb.select("id", "comm")


@dataclass
class LouvainResult:
    membership: DataFrame  # (id, comm) dense 1..q by decreasing size
    quality: float
    levels: int
    history: list = field(default_factory=list)


def louvain(
    edges: DataFrame,
    eps: float = 1e-7,
    local_threshold: int = 300_000,
    max_levels: int = 20,
    max_sweeps: int = 30,
    move_floor: float = 0.01,
    objective: str = "modularity",
    gamma: float = 1.0,
    ledger=None,
) -> LouvainResult:
    """Quality-optimizing community detection over an undirected edge
    table. ``objective``: 'modularity' (default), 'rbconfig' (modularity
    with resolution gamma, src/MPartition.jl:441-467) or 'cpm'
    (src/MPartition.jl:388-422). Distributed multi-greedy sweeps +
    collapse per level; exact sequential greedy below
    ``local_threshold`` edges (see module doc)."""
    spark = edges.sparkSession
    base_edges = materialize_iter(canonicalize_undirected(edges))
    cur_edges = base_edges
    memb: DataFrame | None = None  # composed fine membership
    # per-level node sizes (CPM null model needs them through collapses)
    sizes = vertices_of(base_edges).select("id", F.lit(1.0).alias("nsize"))
    history = []
    levels = 0
    for level in range(max_levels):
        m_edges = cur_edges.count()
        if m_edges == 0:
            break
        if m_edges <= local_threshold:
            pairs = [(r.src, r.dst, r.weight) for r in cur_edges.collect()]
            ns = (
                {r.id: r.nsize for r in sizes.collect()}
                if objective == "cpm" else None
            )
            comm = _local_louvain(pairs, node_sizes=ns, eps=eps,
                                  objective=objective, gamma=gamma)
            lvl = spark.createDataFrame(
                [(int(u), int(c)) for u, c in comm.items()], "id long, comm long"
            )
            memb = lvl if memb is None else from_coarser_partition(memb, lvl)
            levels += 1
            history.append({"level": level, "edges": m_edges, "mode": "local"})
            break
        lvl = _distributed_level(cur_edges, eps, max_sweeps,
                                 move_floor=move_floor, ledger=ledger,
                                 level=level, objective=objective, gamma=gamma,
                                 node_sizes=sizes.withColumnRenamed("nsize", "k2"))
        n_before = lvl.count()
        n_after = lvl.select("comm").distinct().count()
        memb = lvl if memb is None else from_coarser_partition(memb, lvl)
        memb = materialize_iter(memb)  # truncate the level-join chain
        levels += 1
        history.append(
            {"level": level, "edges": m_edges, "mode": "distributed",
             "n": n_before, "q": n_after}
        )
        if n_after == n_before:
            break
        cur_edges = materialize_iter(
            collapse_graph(cur_edges, lvl, check_conservation=True)
        )
        sizes = (
            sizes.join(lvl, "id")
            .groupBy(F.col("comm").alias("id"))
            .agg(F.sum("nsize").alias("nsize"))
        )

    if memb is None:
        memb = vertices_of(base_edges).select("id", F.col("id").alias("comm"))
    memb = renumber_communities(memb)
    if objective == "cpm":
        from .objectives import cpm_quality

        q = cpm_quality(base_edges, memb, gamma=gamma)
    else:
        q = modularity(base_edges, memb)
    return LouvainResult(memb, q, levels, history)
