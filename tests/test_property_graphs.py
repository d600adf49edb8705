"""Property-based tests (hypothesis): distributed operators vs the
NumPy reference oracles on randomly drawn graphs.

The fixed fixtures (karate, GN, LFR-style) pin known-good values; these
tests instead let hypothesis search the small-graph space for structural
edge cases the fixtures miss — self-contained stars, multi-component
graphs, parallel-free dense cliques, danglings-only digraphs. Example
counts are kept low (Spark round-trips dominate), but hypothesis
shrinks any failure to a minimal graph, which fixture tests never do.
"""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from communitydetection_jl_spark.operators.coarsen import (
    collapse_graph,
    renumber_communities,
)
from communitydetection_jl_spark.operators.compare import nmi
from communitydetection_jl_spark.operators.components import connected_components
from communitydetection_jl_spark.operators.modularity import modularity
from communitydetection_jl_spark.operators.pagerank import pagerank

from .oracles import np_components, np_modularity, np_nmi, np_pagerank

# a digraph as a set of (src, dst) arcs over ≤10 vertices; self-loops
# excluded (the operators canonicalize/ignore them on their own paths)
_arcs = st.sets(
    st.tuples(st.integers(0, 9), st.integers(0, 9)).filter(lambda p: p[0] != p[1]),
    min_size=1,
    max_size=25,
)

_slow = settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


def _edges_df(spark, arcs, weight=1.0):
    return spark.createDataFrame(
        [(int(a), int(b), float(weight)) for a, b in sorted(arcs)],
        "src long, dst long, weight double",
    )


@_slow
@given(arcs=_arcs)
def test_pagerank_matches_numpy_and_sums_to_one(spark, arcs):
    got = {
        r.id: r.pagerank
        for r in pagerank(_edges_df(spark, arcs), tol=1e-12, max_iter=200)
        .ranks.collect()
    }
    exp = np_pagerank([(a, b) for a, b in arcs])
    assert set(got) == set(exp)
    assert abs(sum(got.values()) - 1.0) < 1e-9
    assert all(abs(got[v] - exp[v]) < 1e-8 for v in exp)


@_slow
@given(arcs=_arcs)
def test_components_match_union_find(spark, arcs):
    got = {
        r.id: r.comp
        for r in connected_components(_edges_df(spark, arcs)).collect()
    }
    assert got == np_components([(a, b) for a, b in arcs])


@_slow
@given(arcs=_arcs, labels=st.lists(st.integers(0, 3), min_size=10, max_size=10))
def test_modularity_matches_numpy_and_bounded(spark, arcs, labels):
    edges = _edges_df(spark, arcs)
    memb = spark.createDataFrame(
        [(i, int(l)) for i, l in enumerate(labels)], "id long, comm long"
    )
    q = modularity(edges, memb)
    exp = np_modularity([(a, b, 1.0) for a, b in arcs],
                        {i: l for i, l in enumerate(labels)})
    assert abs(q - exp) < 1e-9
    assert -1.0 <= q <= 1.0


@_slow
@given(arcs=_arcs, labels=st.lists(st.integers(0, 3), min_size=10, max_size=10))
def test_collapse_conserves_total_weight(spark, arcs, labels):
    edges = _edges_df(spark, arcs)
    memb = spark.createDataFrame(
        [(i, int(l)) for i, l in enumerate(labels)], "id long, comm long"
    )
    coarse = collapse_graph(edges, memb)
    total0 = edges.agg(F.sum("weight")).collect()[0][0]
    total1 = coarse.agg(F.sum("weight")).collect()[0][0]
    assert abs(float(total0) - float(total1)) < 1e-6  # ref MPartition.jl:232-238


@_slow
@given(
    labels=st.lists(st.integers(0, 4), min_size=4, max_size=12),
    perm_seed=st.integers(0, 5),
)
def test_nmi_permutation_invariance(spark, labels, perm_seed):
    """NMI(a, π(a)) == 1 for any relabeling π, and matches the NumPy
    contingency oracle against an arbitrary second partition.

    Degenerate single-cluster partitions are excluded: both entropies
    are 0 there, NMI is 0/0, and the engine follows the reference
    formula's limit (0.0) rather than sklearn's identical-partition
    convention (1.0) — hypothesis found exactly this edge."""
    from hypothesis import assume

    assume(len(set(labels)) > 1)
    ids = list(range(len(labels)))
    a = spark.createDataFrame(
        [(i, int(l)) for i, l in zip(ids, labels)], "id long, comm long"
    )
    relabeled = [(l * 7 + perm_seed) % 11 for l in labels]
    b = spark.createDataFrame(
        [(i, int(l)) for i, l in zip(ids, relabeled)], "id long, comm long"
    )
    assert abs(nmi(a, b) - 1.0) < 1e-9
    other = [(i % 2) for i in ids]
    c = spark.createDataFrame(
        [(i, int(l)) for i, l in zip(ids, other)], "id long, comm long"
    )
    assert abs(nmi(a, c) - np_nmi(labels, other)) < 1e-9


@_slow
@given(labels=st.lists(st.integers(0, 6), min_size=3, max_size=12))
def test_renumber_idempotent_and_size_ordered(spark, labels):
    memb = spark.createDataFrame(
        [(i, int(l)) for i, l in enumerate(labels)], "id long, comm long"
    )
    once = renumber_communities(memb)
    twice = renumber_communities(once)
    r1 = sorted((r.id, r.comm) for r in once.collect())
    r2 = sorted((r.id, r.comm) for r in twice.collect())
    assert r1 == r2  # idempotent
    sizes = {}
    for _, c in r1:
        sizes[c] = sizes.get(c, 0) + 1
    ordered = sorted(sizes)
    # decreasing-size renumber (ties broken deterministically):
    # community ids are contiguous from the smallest id and sizes
    # non-increasing along it (ref AbstractPartition.jl:5-21)
    assert [sizes[c] for c in ordered] == sorted(sizes.values(), reverse=True)
