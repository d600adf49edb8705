"""Label propagation family: lpa / nsdlpa / weighted (hlpa) votes.

Reference parity (semantics, not execution): the reference's LPA is
*asynchronous* — shuffled vertex order, in-place moves, random
tie-breaks (src/label_propagation.jl:98-116). Bit-exact replication
under bulk-synchronous execution is impossible in general (SURVEY.md
§7.7); this engine implements the documented Spark-native semantics:

 - gather = one join (symmetrized edges ⋈ labels on dst) + one
   groupBy(id, label) weighted count — the whole frontier in one
   superstep (src/label_propagation.jl:17-29 for all vertices at once);
 - argmax with deterministic tie-breaking
   (count desc, sticky-to-current, smallest label) — the deterministic
   counterpart of the reference's shuffled strictly-greater scan
   (src/label_propagation.jl:31-52) and the multilevel variant's
   sticky-current rule (src/multilevel_label_propagation.jl:239-266);
 - *semi-synchronous* update schedule: each superstep only vertices
   whose xxhash64(id) parity matches the iteration parity may move.
   Pure BSP LPA oscillates on symmetric structures (a single edge
   flips labels forever); hash-parity alternation is the standard
   deterministic fix and converges like async LPA.

Convergence: zero label changes across one even+odd superstep pair.
Labels are canonicalized with first-seen renumbering (permute_labels!,
src/utils.jl:14-35) so fixpoints compare exactly (north rule).

Scale: per superstep one shuffle join + one partial-aggregated groupBy;
lineage truncated per iteration via localCheckpoint; optional ledger
snapshots for resume.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.graph import materialize_iter, symmetrize, vertices_of, with_weight
from .triangles import edge_common_neighbors


@dataclass
class LPAResult:
    labels: DataFrame  # (id, comm)
    iterations: int
    changed_history: list = field(default_factory=list)


def lpa_superstep(
    sym_edges: DataFrame,
    labels: DataFrame,
    weighted: bool = False,
    sticky: bool = True,
    active_parity: int | None = None,
) -> DataFrame:
    """One gather/argmax superstep. ``sym_edges`` must carry (src, dst,
    vote); ``labels`` is (id, lbl). Returns new (id, lbl)."""
    votes = (
        sym_edges.join(labels.withColumnRenamed("id", "dst"), "dst")
        .select(F.col("src").alias("id"), "lbl", "vote")
        .groupBy("id", "lbl")
        .agg(F.sum("vote").alias("cnt"))
    )
    cur = labels.withColumnRenamed("lbl", "cur_lbl")
    scored = votes.join(cur, "id").select(
        "id",
        "lbl",
        "cnt",
        (F.col("lbl") == F.col("cur_lbl")).cast("int").alias("is_cur"),
    )
    best = scored.groupBy("id").agg(
        F.max_by(
            "lbl",
            F.struct(
                F.col("cnt"),
                (F.col("is_cur") if sticky else F.lit(0)).alias("tie1"),
                (-F.col("lbl")).alias("tie2"),
            ),
        ).alias("new_lbl")
    )
    upd = cur.join(best, "id", "left")
    want_lbl = F.coalesce("new_lbl", "cur_lbl")
    new_lbl = want_lbl
    if active_parity is not None:
        new_lbl = F.when(
            F.pmod(F.xxhash64("id"), F.lit(2)) == F.lit(active_parity), want_lbl
        ).otherwise(F.col("cur_lbl"))
    # carry change flags so the driver loop can count convergence and
    # maintain the frontier from the checkpointed output without a
    # second join; ``wants`` marks parity-gated would-be movers that
    # must stay active
    return upd.select(
        "id",
        new_lbl.alias("lbl"),
        (new_lbl != F.col("cur_lbl")).alias("changed"),
        (want_lbl != F.col("cur_lbl")).alias("wants"),
    )


def _vote_edges(edges: DataFrame, weighted: bool, cn_bonus: bool) -> DataFrame:
    """Symmetrized edge view with a ``vote`` column."""
    if cn_bonus:
        e = edge_common_neighbors(edges)  # (src, dst, weight, cn)
        e = e.select("src", "dst", (F.lit(1.0) + F.col("cn")).alias("vote"))
    else:
        e = with_weight(edges).select(
            "src", "dst", (F.col("weight") if weighted else F.lit(1.0)).alias("vote")
        )
    rev = e.filter(F.col("src") != F.col("dst")).select(
        F.col("dst").alias("src"), F.col("src").alias("dst"), "vote"
    )
    return e.unionByName(rev)


def label_propagation(
    edges: DataFrame,
    weighted: bool = False,
    cn_bonus: bool = False,
    sticky: bool = True,
    semi_sync: bool = True,
    max_iter: int = 200,
    renumber: bool = True,
    init_labels: DataFrame | None = None,
    frontier: bool = True,
    ledger=None,
) -> LPAResult:
    """Run LPA to fixpoint. ``cn_bonus=True`` gives nsdlpa
    (src/label_propagation.jl:77-96); ``weighted=True`` uses edge
    weights as votes (the hlpa/mlpa gather, src/hlpa.jl:3-28).

    ``frontier=True`` restricts each gather to vertices adjacent to a
    vertex that changed in the previous superstep — exact under sticky
    tie-breaking (a vertex's vote multiset is unchanged otherwise), and
    the DataFrame analogue of the reference's active-node set
    (src/label_propagation.jl:100-113)."""
    sym = _vote_edges(edges, weighted, cn_bonus).repartition("dst").persist()
    sym.count()
    verts = vertices_of(edges)
    labels = (
        init_labels.select("id", F.col(init_labels.columns[1]).alias("lbl"))
        if init_labels is not None
        else verts.select("id", F.col("id").alias("lbl"))
    )
    state = materialize_iter(labels.repartition("id"))
    labels = state
    active: DataFrame | None = None  # None = all vertices active

    changed_history: list[int] = []
    it = 0
    zero_streak = 0
    while it < max_iter:
        parity = it % 2 if semi_sync else None
        it += 1
        gather_sym = sym
        if frontier and active is not None:
            # re-evaluate only active listeners — but with ALL their
            # incident edges (the vote multiset must be complete)
            gather_sym = sym.join(
                active.withColumnRenamed("id", "src"), "src", "left_semi"
            )
        stepped = materialize_iter(
            lpa_superstep(
                gather_sym, labels, weighted=weighted, sticky=sticky,
                active_parity=parity,
            ),
            prev=state,
        )
        state = stepped
        changed = stepped.filter(F.col("changed")).count()
        labels = stepped.select("id", "lbl")
        if frontier:
            moved = stepped.filter(F.col("changed")).select("id")
            # next active set: neighbors of movers + gated would-be movers
            neigh = (
                sym.join(moved.withColumnRenamed("id", "dst"), "dst", "left_semi")
                .select(F.col("src").alias("id"))
                .distinct()
            )
            gated = stepped.filter(F.col("wants") & ~F.col("changed")).select("id")
            active = neigh.unionByName(moved).unionByName(gated).distinct()
        changed_history.append(changed)
        if ledger is not None:
            ledger.record(it, {"changed": changed})
            ledger.maybe_snapshot("labels", it, labels)
        if changed == 0:
            zero_streak += 1
            if (not semi_sync) or zero_streak >= 2:
                break
        else:
            zero_streak = 0

    sym.unpersist()
    out = labels.withColumnRenamed("lbl", "comm")
    if renumber:
        out = permute_labels(out)
    return LPAResult(out, it, changed_history)


def permute_labels(membership: DataFrame) -> DataFrame:
    """Canonical first-seen renumbering: community containing the
    smallest vertex id gets label 1, etc. (permute_labels!,
    src/utils.jl:14-35, with vertex order = id order).

    The window runs over the (small) per-community table, not over all
    vertices."""
    from pyspark.sql import Window as W

    lbl_col = membership.columns[1]
    m = membership.select("id", F.col(lbl_col).alias("_lbl"))
    firsts = m.groupBy("_lbl").agg(F.min("id").alias("first_id"))
    w = W.orderBy("first_id")
    mapping = firsts.select("_lbl", F.row_number().over(w).alias("_new"))
    return (
        m.join(F.broadcast(mapping), "_lbl")
        .select("id", F.col("_new").cast("long").alias(lbl_col))
    )


def lpa(edges: DataFrame, **kw) -> LPAResult:
    """Unweighted async-equivalent LPA (src/label_propagation.jl:98-116)."""
    return label_propagation(edges, weighted=False, cn_bonus=False, **kw)


def nsdlpa(edges: DataFrame, **kw) -> LPAResult:
    """Neighbor-strength-driven LPA: votes weighted 1+cn
    (src/label_propagation.jl:77-96)."""
    return label_propagation(edges, cn_bonus=True, **kw)
