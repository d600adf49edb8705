"""Graph coarsening / multilevel plumbing (the Louvain skeleton).

Reference parity:
 - collapse_graph: contract by membership, edge weight = Σ original,
   undirected canonicalized via minmax (src/hlpa.jl:299-382,
   src/MPartition.jl:177-248);
 - from_coarser_partition!: membership composition
   (src/AbstractPartition.jl:23-36);
 - renumber_communities!: dense 1..q ids in decreasing size order
   (src/AbstractPartition.jl:5-21);
 - weight-conservation sanity check to 1e-6 (src/MPartition.jl:232-238).

Spark shape: two membership equi-joins + one groupBy(src,dst) sum for
collapse; one relabel join for projection. The renumber window runs
over the per-community table (q rows, small after coarsening), never
over all vertices.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.graph import with_weight
from ..functions.ids import rank_small_or_large, rank_window_max


def collapse_graph(
    edges: DataFrame,
    membership: DataFrame,
    directed: bool = False,
    check_conservation: bool = False,
    expected_weight: float | None = None,
) -> DataFrame:
    """Contract the graph by community: one node per community, edge
    weight = sum of original weights; intra-community edges become
    self-loops. Undirected output is canonical (src<=dst)."""
    lbl = membership.columns[1]
    m = membership.select("id", F.col(lbl).alias("_c"))
    e = (
        with_weight(edges)
        .join(m.withColumnRenamed("id", "src").withColumnRenamed("_c", "cu"), "src")
        .join(m.withColumnRenamed("id", "dst").withColumnRenamed("_c", "cv"), "dst")
    )
    if directed:
        out = e.groupBy(
            F.col("cu").alias("src"), F.col("cv").alias("dst")
        ).agg(F.sum("weight").alias("weight"))
    else:
        out = (
            e.select(
                F.least("cu", "cv").alias("src"),
                F.greatest("cu", "cv").alias("dst"),
                "weight",
            )
            .groupBy("src", "dst")
            .agg(F.sum("weight").alias("weight"))
        )
    if check_conservation:
        # callers that already hold the level's total weight (louvain
        # computes it for the null model) pass it in so the check costs
        # one small agg over the collapsed output instead of an extra
        # full scan of the fine edge table
        before = (
            expected_weight
            if expected_weight is not None
            else float(with_weight(edges).agg(F.sum("weight")).collect()[0][0] or 0.0)
        )
        after = float(out.agg(F.sum("weight")).collect()[0][0] or 0.0)
        assert abs(before - after) < 1e-6, f"weight not conserved: {before} vs {after}"
    return out


def from_coarser_partition(membership: DataFrame, coarser: DataFrame) -> DataFrame:
    """Compose memberships: fine id → fine comm → coarse comm.

    ``membership`` is (id, comm) on the fine graph; ``coarser`` is
    (id, comm) on the collapsed graph whose ids are fine communities."""
    fine_lbl = membership.columns[1]
    coarse_lbl = coarser.columns[1]
    c = coarser.select(
        F.col("id").alias("_fine_comm"), F.col(coarse_lbl).alias("_new")
    )
    return (
        membership.select("id", F.col(fine_lbl).alias("_fine_comm"))
        .join(F.broadcast(c), "_fine_comm")
        .select("id", F.col("_new").alias(fine_lbl))
    )


def renumber_communities(membership: DataFrame) -> DataFrame:
    """Dense 1..q community ids in decreasing size order (ties by old
    id) — src/AbstractPartition.jl:5-21.

    Ranking is global-window-free (rank_small_or_large): a fragmented
    web graph can leave O(1e8) communities, which an unpartitioned
    row_number window would sort on a single executor."""
    lbl = membership.columns[1]
    sizes = membership.groupBy(F.col(lbl).alias("_old")).agg(F.count("*").alias("n"))
    q = sizes.count()
    order = F.struct((-F.col("n")).alias("nn"), F.col("_old").alias("o"))
    mapping = rank_small_or_large(sizes, order, n=q).select(
        "_old", F.col("rank").alias("_new")
    )
    # broadcast only a genuinely small mapping; a fragmented partition
    # (q ~ n) must shuffle-join instead
    if q <= rank_window_max():
        mapping = F.broadcast(mapping)
    return (
        membership.select("id", F.col(lbl).alias("_old"))
        .join(mapping, "_old")
        .select("id", F.col("_new").alias(lbl))
    )
