"""Column-level helpers shared by the graph operators.

The engine's core contract is one DataFrame::

    edges(src: long, dst: long, weight: double)

Directed graphs store each arc once. Undirected graphs store each edge
once in canonical (src<=dst) form; algorithms that gather over
neighborhoods consume the symmetrized view from :func:`symmetrize`.

Reference parity notes: the reference canonicalizes undirected edges
with ``minmax`` (CommunityDetection.jl src/hlpa.jl:316-319,
src/MPartition.jl:199-202) and iterates ``out_edges`` of both endpoints
of each undirected edge, which is exactly the symmetrized view.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

EDGE_COLS = ("src", "dst", "weight")


def with_weight(edges: DataFrame) -> DataFrame:
    """Ensure a double ``weight`` column (default 1.0)."""
    if "weight" in edges.columns:
        return edges.withColumn("weight", F.col("weight").cast("double"))
    return edges.withColumn("weight", F.lit(1.0))


def canonicalize_undirected(edges: DataFrame, combine: str = "sum") -> DataFrame:
    """Canonical undirected form: src<=dst, parallel edges combined.

    Reference analogue: minmax canonicalization + weight accumulation in
    collapse_graph (src/hlpa.jl:316-339).
    """
    e = with_weight(edges)
    e = e.select(
        F.least("src", "dst").alias("src"),
        F.greatest("src", "dst").alias("dst"),
        "weight",
    )
    agg = F.sum("weight") if combine == "sum" else F.max("weight")
    return e.groupBy("src", "dst").agg(agg.alias("weight"))


def symmetrize(edges: DataFrame) -> DataFrame:
    """Both directions of each undirected edge; self-loops kept once.

    Input must be canonical (each undirected edge exactly once).
    """
    e = with_weight(edges).select(*EDGE_COLS)
    rev = e.filter(F.col("src") != F.col("dst")).select(
        F.col("dst").alias("src"), F.col("src").alias("dst"), "weight"
    )
    return e.unionByName(rev)


def vertices_of(edges: DataFrame) -> DataFrame:
    """Distinct vertex ids appearing as either endpoint: (id: long)."""
    return (
        edges.select(F.col("src").alias("id"))
        .unionByName(edges.select(F.col("dst").alias("id")))
        .distinct()
    )


def plogp(col):
    """x*log(x) with plogp(0)=0 — the map-equation/entropy kernel.

    Reference analogue: src/FlowPartition.jl:143-144, src/metrics.jl:2.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.when(c > 0, c * F.log(c)).otherwise(F.lit(0.0))


def materialize_iter(df: DataFrame, prev: DataFrame | None = None) -> DataFrame:
    """Materialize per-iteration state: truncate lineage AND reset
    Catalyst's size statistics.

    ``localCheckpoint`` alone inherits the pre-checkpoint plan's
    sizeInBytes estimate; join-size estimates multiply child sizes, so
    across iterations the inherited estimate compounds geometrically
    until BigInteger arithmetic inside stats estimation dominates the
    driver (observed: Catalyst burning minutes in ToomCook3 multiplies
    at sf0.1). Caching the checkpointed RDD makes downstream plans read
    the *real* materialized size instead. ``prev`` (the previous
    iteration's state) is unpersisted once the new state is live."""
    new = df.localCheckpoint(eager=True).persist()
    new.count()
    if prev is not None:
        prev.unpersist()
    return new


def csr_adjacency(
    pairs: DataFrame,
    key: str,
    nbr: str,
    out_col: str,
    cap: int | None = None,
    payload=None,
    parts: int | None = None,
) -> DataFrame:
    """Grouped adjacency arrays ``(key, array<nbr>)`` with a hard
    per-row size cap.

    ``payload`` (optional column expression, default ``col(nbr)``)
    is what gets collected per neighbor — e.g.
    ``F.struct("dst", "tp")`` for a weighted CSR whose rows carry
    (dst, trans_prob) pairs. Chunking always keys on the plain ``nbr``
    column so the row-size bound is independent of payload shape.

    A bare ``groupBy(key).collect_list(nbr)`` puts a vertex's entire
    neighbor list in ONE row; web-scale hubs (in-degree 1e7+) would
    yield 100+ MB rows — unsplittable tasks and executor OOM. Keys
    whose degree exceeds ``cap`` are instead split into
    ``ceil(deg/cap)`` chunk rows via ``pmod(xxhash64(nbr), nchunks)``,
    so every array row holds ~cap neighbors in expectation and at most
    a small constant factor more. Consumers explode the array, so
    multiple rows per key are semantically identical to one; keys at or
    below the cap still produce exactly one row (``groupBy`` emits only
    non-empty chunks, and nchunks=1 for them). Duplicates of the same
    ``nbr`` value always land in the SAME chunk row (the chunk id is a
    pure function of ``nbr`` and degree) — LPA's duplicate-arc
    certification depends on this.

    Build plan: ONE exchange of ``pairs``. The degree enters as
    ``count().over(Window.partitionBy(key))`` computed on the already
    exchanged rows, and the chunk groupBy plus a downstream
    bucket-by-``key`` write all ride the same hash(key) partitioning
    with zero further exchange. The previous degree-agg + join form
    scanned the source twice and moved the full data through a second
    exchange (the caller-side repartition before the bucketed write);
    A/B at the 163M-arc bench corpus: 73.5s → 39.5s end-to-end build
    (multiset-identical output, scripts/profile_csr.py). Pass
    ``parts`` to pin the exchange at the caller's bucket count so the
    bucketed write gets one file per bucket without a repartition.

    ``cap`` defaults to ``$SPARK_GRAFT_CSR_CAP`` (65536): a 1e7-degree
    hub becomes ~153 rows of ~0.5 MB each. A hub's rows still colocate
    in one partition while being grouped (true of any per-key grouping,
    including the old join form); the window buffers that one group via
    UnsafeExternalSorter, which spills, so a 1e9-degree key degrades to
    disk instead of OOM.
    """
    import os

    from pyspark.sql import Window

    if cap is None:
        cap = int(os.environ.get("SPARK_GRAFT_CSR_CAP", "65536"))
    src = pairs.repartition(parts, key) if parts else pairs
    deg = F.count(F.lit(1)).over(Window.partitionBy(key))
    nchunks = F.greatest(F.lit(1), F.ceil(deg / F.lit(cap))).cast("int")
    return (
        src.withColumn("_chunk", F.pmod(F.xxhash64(nbr), nchunks.cast("long")))
        .groupBy(key, "_chunk")
        .agg(F.collect_list(payload if payload is not None else F.col(nbr)).alias(out_col))
        .drop("_chunk")
    )


def num_edges(edges: DataFrame) -> int:
    return edges.count()


def total_weight(edges: DataFrame) -> float:
    row = with_weight(edges).agg(F.sum("weight").alias("m")).collect()[0]
    return float(row["m"] or 0.0)
