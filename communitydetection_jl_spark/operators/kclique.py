"""k-clique percolation (CPM) communities, Spark-first.

Reference surface: ``kclique_percolation`` (src/kclique_percolation.jl:
1-24) — communities are the connected components of the clique-overlap
graph. The reference builds it from Graphs.jl ``maximal_cliques``
(worst-case exponential, single machine); this engine implements the
standard Palla et al. clique-percolation definition directly on
*k-cliques* (Nature 435, 814 (2005) — public algorithm), which is the
definition the overlap graph is meant to approximate and is
polynomial for fixed k:

 1. **Enumerate k-cliques** by iterated joins on the degree-oriented
    adjacency (operators/triangles.py orientation bounds fan-out by
    O(sqrt(m)) per pivot): a (j+1)-clique = j-clique + one vertex
    adjacent to ALL members, extended past the last member only
    (each clique enumerated exactly once, members sorted by
    (degree, id) orientation order).
 2. **Percolation edges**: two k-cliques are adjacent iff they share
    k−1 vertices. Every clique explodes into its k (k−1)-subsets;
    within a subset group all cliques are mutually adjacent, so a
    star to the group minimum is enough for connectivity — no
    quadratic pairwise blowup inside hub groups.
 3. **Components** of the clique graph via the engine's
    large-star/small-star CC (operators/components.py), then project
    back to vertices: community = union of member vertices.

Returns an overlapping cover (a vertex can sit in several k-clique
communities; vertices in no k-clique are unassigned) — matching the
reference's groups-style output (src/utils.jl:38-50 semantics).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .components import connected_components
from .triangles import _oriented


def k_cliques(edges: DataFrame, k: int) -> DataFrame:
    """All k-cliques as sorted member arrays: (members: array<long>).

    Members are sorted in the degree-orientation order used to
    enumerate them (ascending (deg, id)); each clique appears once."""
    if k < 2:
        raise ValueError("k must be >= 2")
    arcs = _oriented(edges).select("a", "b")
    # 2-cliques: oriented edges; invariant: members ordered, arcs exist
    # from every member to every later member
    cliques = arcs.select(F.array("a", "b").alias("members"))
    for size in range(2, k):
        ext = cliques.join(
            arcs.select(F.col("a").alias("_last"), F.col("b").alias("w")),
            F.element_at("members", size) == F.col("_last"),
        ).select("members", "w")
        # w must be adjacent to every *earlier* member too
        for i in range(1, size):
            mi = F.element_at("members", i)
            ext = ext.join(
                arcs.select(F.col("a").alias("_ai"), F.col("b").alias("_bi")),
                (mi == F.col("_ai")) & (F.col("w") == F.col("_bi")),
                "left_semi",
            )
        cliques = ext.select(F.concat("members", F.array("w")).alias("members"))
    return cliques


def kclique_percolation(edges: DataFrame, k: int = 3) -> DataFrame:
    """CPM communities: (id, comm) overlapping cover, comm ids dense
    1..q in decreasing community size order (ties by min member)."""
    spark = edges.sparkSession
    cliques = k_cliques(edges, k)
    # stable clique id: sort members numerically for a canonical key
    cl = cliques.select(
        F.array_sort("members").alias("members")
    ).distinct().withColumn("cid", F.xxhash64(F.col("members").cast("string")))
    cl = cl.persist()
    n_cl = cl.count()
    if n_cl == 0:
        cl.unpersist()
        return spark.createDataFrame([], "id long, comm long")

    # (k-1)-subsets: drop member i; star-connect cliques sharing one
    subs = cl.select(
        "cid",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(k - 1)),
                lambda i: F.filter("members", lambda x, j: j != i),
            )
        ).alias("sub"),
    )
    stars = (
        subs.groupBy(F.col("sub").cast("string").alias("key"))
        .agg(F.collect_set("cid").alias("cids"))
        .select(F.explode("cids").alias("src"), F.array_min("cids").alias("dst"))
        .filter(F.col("src") != F.col("dst"))
    )
    # isolated cliques still form singleton communities: CC over the
    # clique-node set with star edges
    comp = connected_components(
        stars.unionByName(cl.select(F.col("cid").alias("src"),
                                    F.col("cid").alias("dst")))
    )
    out = (
        cl.select("cid", F.explode("members").alias("id"))
        .join(comp.withColumnRenamed("id", "cid"), "cid")
        .select("id", F.col("comp").alias("comm"))
        .distinct()
    )
    # dense 1..q by decreasing size (src/AbstractPartition.jl:5-21
    # convention), ties by smallest then largest member id — all
    # data-derived keys, so the driver's SQL oracle ranks identically
    # (the internal comp hash never orders the output); ranking is
    # global-window-free via rank_small_or_large
    from ..functions.ids import rank_small_or_large

    sizes = out.groupBy("comm").agg(
        F.countDistinct("id").alias("n"),
        F.min("id").alias("mn"),
        F.max("id").alias("mx"),
    )
    order = F.struct(
        (-F.col("n")).alias("nn"), F.col("mn").alias("a"), F.col("mx").alias("b")
    )
    mapping = rank_small_or_large(sizes, order).select(
        "comm", F.col("rank").alias("dense")
    )
    res = out.join(mapping, "comm").select("id", F.col("dense").alias("comm"))
    cl.unpersist()
    return res
