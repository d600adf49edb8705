"""Triangle / common-neighbor / similarity operators.

Reference parity:
  - num_common_neighbors per edge = per-edge triangle count
    (src/utils.jl:286-294);
  - per-vertex triangle participation (src/metrics.jl:201-219);
  - edge similarity (cn+2)/(deg_u+deg_v-cn) (src/utils.jl:254-283) — the
    default hlpa edge weights (src/hlpa.jl:74).

Spark shape — the standard degree-oriented triangle enumeration:
orient every undirected edge from its lower-(degree, id) endpoint to the
higher one (the DataFrame analogue of the reference's
smaller-endpoint-first scan, src/utils.jl:258-261), self-join oriented
edges on the pivot to form wedges, close wedges with a join back onto
the oriented edge set. Orientation bounds wedge fan-out by
O(m^{1/2}) per pivot, which is what makes this survive hub skew.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.graph import canonicalize_undirected, vertices_of
from .degrees import degrees


def _oriented(edges: DataFrame) -> DataFrame:
    """Orient canonical undirected edges low→high by (degree, id).

    Returns (a, b, bd) where (deg(a),a) < (deg(b),b); bd = deg(b) kept
    for wedge-endpoint ordering.
    """
    e = canonicalize_undirected(edges).filter(F.col("src") != F.col("dst"))
    deg = degrees(e, directed=False).select("id", F.col("deg").alias("d"))
    e = (
        e.join(deg.withColumnRenamed("id", "src").withColumnRenamed("d", "sd"), "src")
        .join(deg.withColumnRenamed("id", "dst").withColumnRenamed("d", "dd"), "dst")
    )
    fwd = F.struct("sd", "src") < F.struct("dd", "dst")
    return e.select(
        F.when(fwd, F.col("src")).otherwise(F.col("dst")).alias("a"),
        F.when(fwd, F.col("dst")).otherwise(F.col("src")).alias("b"),
        F.when(fwd, F.col("dd")).otherwise(F.col("sd")).alias("bd"),
    )


def triangles(edges: DataFrame) -> DataFrame:
    """Enumerate triangles once each: (x, y, z) vertex ids (unordered).

    The oriented edge set is checkpoint-truncated: it closes over the
    input's whole join tree twice more below (wedge self-join + closing
    semi-join), and Catalyst's size-estimation visitor multiplies
    sizeInBytes over every join — an untruncated deep tree makes that
    estimate a 10^5-digit BigInteger and planning itself becomes the
    bottleneck (observed at sf0.1)."""
    o = _oriented(edges).localCheckpoint(eager=True)
    e1 = o.select(F.col("a").alias("p"), F.col("b").alias("x"), F.col("bd").alias("xd"))
    e2 = o.select(F.col("a").alias("p"), F.col("b").alias("y"), F.col("bd").alias("yd"))
    wedges = e1.join(e2, "p").filter(
        F.struct("xd", "x") < F.struct("yd", "y")
    )
    closing = o.select(F.col("a").alias("x"), F.col("b").alias("y"))
    tri = wedges.join(closing, ["x", "y"], "left_semi").select(
        F.col("p").alias("x1"), F.col("x").alias("x2"), F.col("y").alias("x3")
    )
    return tri


def edge_common_neighbors(edges: DataFrame) -> DataFrame:
    """Per canonical edge (src<dst): common-neighbor count ``cn``
    (= per-edge triangle count; src/utils.jl:286-294). Edges in no
    triangle get cn=0."""
    tri = triangles(edges)
    tri_edges = (
        tri.select(F.least("x1", "x2").alias("src"), F.greatest("x1", "x2").alias("dst"))
        .unionByName(tri.select(F.least("x1", "x3").alias("src"), F.greatest("x1", "x3").alias("dst")))
        .unionByName(tri.select(F.least("x2", "x3").alias("src"), F.greatest("x2", "x3").alias("dst")))
    )
    cn = tri_edges.groupBy("src", "dst").agg(F.count("*").alias("cn"))
    base = canonicalize_undirected(edges).filter(F.col("src") != F.col("dst"))
    return base.join(cn, ["src", "dst"], "left").select(
        "src", "dst", "weight", F.coalesce("cn", F.lit(0)).alias("cn")
    )


def vertex_triangle_counts(edges: DataFrame) -> DataFrame:
    """Per-vertex triangle count (id, triangles) — the north-rule
    per-vertex triangle counting operator. Vertices in no triangle get 0."""
    tri = triangles(edges)
    ids = (
        tri.select(F.col("x1").alias("id"))
        .unionByName(tri.select(F.col("x2").alias("id")))
        .unionByName(tri.select(F.col("x3").alias("id")))
    )
    t = ids.groupBy("id").agg(F.count("*").alias("triangles"))
    return (
        vertices_of(edges)
        .join(t, "id", "left")
        .select("id", F.coalesce("triangles", F.lit(0)).alias("triangles"))
    )


def triangle_participation(edges: DataFrame) -> DataFrame:
    """(id, in_triangle: boolean) — src/metrics.jl:201-219."""
    return vertex_triangle_counts(edges).select(
        "id", (F.col("triangles") > 0).alias("in_triangle")
    )


def similarity(edges: DataFrame) -> DataFrame:
    """Per-edge similarity (cn+2)/(deg_u+deg_v-cn)
    (src/utils.jl:254-283). Returns (src, dst, weight, cn, similarity)."""
    cn = edge_common_neighbors(edges)
    deg = degrees(edges, directed=False).select("id", "deg")
    return (
        cn.join(deg.withColumnRenamed("id", "src").withColumnRenamed("deg", "sd"), "src")
        .join(deg.withColumnRenamed("id", "dst").withColumnRenamed("deg", "dd"), "dst")
        .select(
            "src", "dst", "weight", "cn",
            (
                (F.col("cn") + F.lit(2.0))
                / (F.col("sd") + F.col("dd") - F.col("cn"))
            ).alias("similarity"),
        )
    )
