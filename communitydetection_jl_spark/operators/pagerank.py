"""PageRank as iterative DataFrame joins with dangling-mass handling.

Reference semantics: visit_prob_directed (src/DiFlowGraph.jl:50-85) —
power iteration

    p'[u] = dp + τ/n + (1-τ) * Σ_{v→u} trans(v,u) * p[v]
    dp    = Σ_{dangling v} (1-τ) * p[v] / n

with τ the *teleport* mass (τ=0.15 ⇒ follow mass 0.85). This is
algebraically identical to classic PageRank with damping d = 1-τ and
dangling mass redistributed uniformly; ``damping`` below is d.

Convergence: L1 norm Σ|p'-p| ≤ tol (reference default sqrt(eps) ≈
1.49e-8, max 1000 iterations).

Scale notes:
 - the per-iteration shuffle is one join (ranks ⋈ arcs on src) + one
   groupBy(dst) sum; the sum does map-side partial aggregation, so hub
   in-degree skew collapses before the shuffle;
 - dangling ids are precomputed once (left_anti join) and cached;
 - lineage is truncated every iteration via localCheckpoint, and the
   optional ``ledger`` writes (iter, delta) + a rank snapshot every
   ``checkpoint_every`` iterations for mid-run resume (plans/runner.py).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.graph import materialize_iter, vertices_of
from .degrees import trans_prob_directed


@dataclass
class PageRankResult:
    ranks: DataFrame  # (id, pagerank)
    iterations: int
    delta: float
    deltas: list = field(default_factory=list)


def pagerank(
    edges: DataFrame,
    damping: float = 0.85,
    tol: float = 1e-9,
    max_iter: int = 1000,
    ledger=None,
) -> PageRankResult:
    """Power-iteration PageRank over a directed arc table.

    ``damping`` = follow probability d (reference τ = 1-d = 0.15).
    Returns per-vertex probabilities summing to 1 (reference parity:
    allclose 1e-6 against the NumPy oracle of src/DiFlowGraph.jl:50-85).
    """
    spark = edges.sparkSession
    tau = 1.0 - damping

    verts = vertices_of(edges).persist()
    n = verts.count()
    if n == 0:
        empty = spark.createDataFrame([], "id long, pagerank double")
        return PageRankResult(empty, 0, 0.0)

    # arcs with row-normalized transition prob; repartition by src so the
    # per-iteration join is co-partitioned with ranks.
    arcs = (
        trans_prob_directed(edges)
        .select("src", "dst", "trans_prob")
        .repartition("src")
        .persist()
    )
    arcs.count()  # materialize once

    dangling = verts.join(
        edges.select(F.col("src").alias("id")).distinct(), "id", "left_anti"
    ).persist()
    has_dangling = dangling.count() > 0

    start_iter = 0
    ranks = None
    if ledger is not None:
        resumed = ledger.load_latest("ranks")
        if resumed is not None:
            start_iter, ranks = resumed
    if ranks is None:
        ranks = verts.select("id", F.lit(1.0 / n).alias("p"))
    state = materialize_iter(ranks.repartition("id"))
    ranks = state

    delta = float("inf")
    deltas: list[float] = []
    it = start_iter
    while delta > tol and it < max_iter:
        it += 1
        # one materializing job per iteration: the dangling-mass scalar is a
        # broadcast 1-row aggregate fused into the same plan (no separate
        # collect), and the L1-delta aggregation runs over the checkpointed
        # result (cheap second action, no recompute).
        if has_dangling:
            dang_sum = (
                ranks.join(dangling, "id", "left_semi")
                .agg(F.coalesce(F.sum("p"), F.lit(0.0)).alias("_ds"))
            )
        else:
            dang_sum = spark.createDataFrame([(0.0,)], "_ds double")
        msgs = (
            arcs.join(ranks.withColumnRenamed("id", "src"), "src")
            .groupBy(F.col("dst").alias("id"))
            .agg(F.sum(F.col("trans_prob") * F.col("p")).alias("msg"))
        )
        # carry p_old through the update so the L1-delta is a scan over
        # the cached result (no second shuffle join per iteration)
        new_state = (
            ranks.withColumnRenamed("p", "p_old")
            .join(msgs, "id", "left")
            .crossJoin(F.broadcast(dang_sum))
            .select(
                "id",
                (
                    F.lit(tau / n)
                    + F.lit(damping) * F.col("_ds") / F.lit(float(n))
                    + F.lit(damping) * F.coalesce("msg", F.lit(0.0))
                ).alias("p"),
                "p_old",
            )
        )
        new_state = materialize_iter(new_state, prev=state)
        state = new_state
        delta = float(
            new_state.agg(F.sum(F.abs(F.col("p") - F.col("p_old")))).collect()[0][0]
            or 0.0
        )
        ranks = new_state.select("id", "p")
        deltas.append(delta)
        if ledger is not None:
            ledger.record(it, {"delta": delta})
            ledger.maybe_snapshot("ranks", it, ranks)

    out = ranks.withColumnRenamed("p", "pagerank")
    verts.unpersist()
    arcs.unpersist()
    dangling.unpersist()
    return PageRankResult(out, it, delta, deltas)
