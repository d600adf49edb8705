"""Core graph operators vs NumPy oracles on the reference fixtures."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from communitydetection_jl_spark.operators.components import connected_components
from communitydetection_jl_spark.operators.degrees import degrees, trans_prob_directed
from communitydetection_jl_spark.operators.modularity import comm_stats, modularity
from communitydetection_jl_spark.operators.pagerank import pagerank
from communitydetection_jl_spark.operators.triangles import (
    edge_common_neighbors,
    similarity,
    vertex_triangle_counts,
)
from communitydetection_jl_spark.sources import fixtures as fx

from .oracles import np_components, np_modularity, np_pagerank, np_triangles


def _pairs(edges_df):
    return [(r.src, r.dst, r.weight) for r in edges_df.collect()]


def test_degrees_karate(spark):
    edges, _ = fx.karate(spark)
    deg = {r.id: r.deg for r in degrees(edges).collect()}
    assert sum(deg.values()) == 2 * 78
    assert deg[1] == 16 and deg[34] == 17 and deg[12] == 1


def test_trans_prob_directed(spark):
    edges, _ = fx.directed_toy(spark)
    tp = trans_prob_directed(edges)
    sums = tp.groupBy("src").agg(F.sum("trans_prob").alias("s")).collect()
    for r in sums:
        assert abs(r.s - 1.0) < 1e-12


@pytest.mark.parametrize("fixture", ["directed_toy"])
def test_pagerank_matches_reference_oracle(spark, fixture):
    edges, _ = fx.FIXTURES[fixture](spark)
    arcs = [(r.src, r.dst, r.weight) for r in edges.collect()]
    oracle = np_pagerank(arcs, tau=0.15)
    res = pagerank(edges, damping=0.85, tol=1e-10)
    got = {r.id: r.pagerank for r in res.ranks.collect()}
    assert abs(sum(got.values()) - 1.0) < 1e-9
    for v, p in oracle.items():
        assert got[v] == pytest.approx(p, abs=1e-6)


def test_pagerank_undirected_karate_as_directed(spark):
    edges, _ = fx.karate(spark)
    from communitydetection_jl_spark.functions.graph import symmetrize

    arcs_df = symmetrize(edges)
    oracle = np_pagerank([(r.src, r.dst, r.weight) for r in arcs_df.collect()])
    res = pagerank(arcs_df, tol=1e-10)
    got = {r.id: r.pagerank for r in res.ranks.collect()}
    for v, p in oracle.items():
        assert got[v] == pytest.approx(p, abs=1e-6)


def test_connected_components_exact(spark):
    # two triangles + isolated-ish extra component: union two fixtures
    edges, _ = fx.two_triangles(spark)
    extra = spark.createDataFrame(
        [(10, 11, 1.0), (11, 12, 1.0), (20, 20, 1.0)], "src long, dst long, weight double"
    )
    all_edges = edges.unionByName(extra)
    got = {r.id: r.comp for r in connected_components(all_edges).collect()}
    oracle = np_components([(r.src, r.dst) for r in all_edges.collect() if r.src != r.dst])
    for v, c in oracle.items():
        assert got[v] == c
    assert got[20] == 20  # self-loop-only vertex is its own component


def test_connected_components_path_and_karate(spark):
    # long path exercises multiple L/S rounds
    n = 200
    path = spark.createDataFrame(
        [(i, i + 1, 1.0) for i in range(1, n)], "src long, dst long, weight double"
    )
    got = connected_components(path)
    assert got.select("comp").distinct().count() == 1
    assert got.filter(F.col("comp") != 1).count() == 0

    karate, _ = fx.karate(spark)
    gk = connected_components(karate)
    assert gk.select("comp").distinct().count() == 1


@pytest.mark.parametrize("fixture", ["two_triangles", "karate"])
def test_triangles_and_cn(spark, fixture):
    edges, _ = fx.FIXTURES[fixture](spark)
    pairs = [(r.src, r.dst) for r in edges.collect()]
    tri_oracle, cn_oracle = np_triangles(pairs)
    got_tri = {r.id: r.triangles for r in vertex_triangle_counts(edges).collect()}
    for v, t in tri_oracle.items():
        assert got_tri[v] == t, (v, t, got_tri[v])
    got_cn = {(r.src, r.dst): r.cn for r in edge_common_neighbors(edges).collect()}
    assert got_cn == cn_oracle


def test_similarity_formula(spark):
    edges, _ = fx.two_triangles(spark)
    sim = {(r.src, r.dst): r.similarity for r in similarity(edges).collect()}
    # edge (1,2): cn=1 (node 3), deg1=3, deg2=2 → (1+2)/(3+2-1)=0.75
    assert sim[(1, 2)] == pytest.approx(0.75)
    # bridge (1,4): cn=0, deg1=3, deg4=3 → 2/6
    assert sim[(1, 4)] == pytest.approx(2.0 / 6.0)


def test_modularity_matches_oracle(spark):
    edges, truth = fx.two_triangles(spark)
    memb = {r.id: r.comm for r in truth.collect()}
    q_oracle = np_modularity(_pairs(edges), memb)
    q = modularity(edges, truth)
    assert q == pytest.approx(q_oracle, abs=1e-12)
    # ground-truth split: e_c = 6 per triangle, a_c = 7 → Q = 12/14 - 2*(7/14)^2
    assert q == pytest.approx(12 / 14 - 2 * (7 / 14) ** 2, abs=1e-12)


def test_modularity_karate_truth(spark):
    edges, truth = fx.karate(spark)
    memb = {r.id: r.comm for r in truth.collect()}
    assert modularity(edges, truth) == pytest.approx(
        np_modularity(_pairs(edges), memb), abs=1e-10
    )


def test_comm_stats_invariants(spark):
    edges, truth = fx.karate(spark)
    cs = comm_stats(edges, truth).collect()
    total_inner = sum(r.w_inner for r in cs)
    total_k = sum(r.k_out for r in cs)
    # Σ strengths = 2m; Σ inner ≤ m
    assert total_k == pytest.approx(2 * 78.0)
    assert total_inner <= 78.0
    assert sum(r.csize for r in cs) == 34


def test_csr_chunk_cap_shape(spark):
    """csr_adjacency splits hub rows at the cap but loses no arcs."""
    from communitydetection_jl_spark.functions.graph import csr_adjacency, symmetrize

    edges, _ = fx.karate(spark)
    sym = symmetrize(edges).select("src", "dst")
    csr = csr_adjacency(sym, "src", "dst", "dsts", cap=3)
    rows = csr.collect()
    # hub 34 (deg 17) is hashed over ceil(17/3)=6 buckets: multiple
    # rows (only non-empty buckets materialize), none holding the
    # whole neighbor list
    per_key: dict[int, list] = {}
    for r in rows:
        per_key.setdefault(r.src, []).append(list(r.dsts))
    assert 2 <= len(per_key[34]) <= 6
    assert max(len(c) for c in per_key[34]) < 17
    # low-degree keys stay single-row (nchunks=1)
    assert len(per_key[12]) == 1
    # exploded union == original adjacency, per key
    adj = {}
    for r in sym.collect():
        adj.setdefault(r.src, set()).add(r.dst)
    for k, chunks in per_key.items():
        got = sorted(x for c in chunks for x in c)
        assert got == sorted(adj[k]), k
        assert len(got) == len(set(got))  # no duplicates across chunks


def test_csr_chunk_cap_parity(spark, monkeypatch):
    """PageRank and LPA results are invariant under hub-row chunking
    (cap=3 forces every karate vertex with deg>3 into multiple rows)."""
    from communitydetection_jl_spark.functions.graph import symmetrize
    from communitydetection_jl_spark.operators.lpa import lpa

    edges, _ = fx.karate(spark)
    arcs_df = symmetrize(edges)
    base_pr = {r.id: r.pagerank for r in pagerank(arcs_df, tol=1e-10).ranks.collect()}
    base_lpa = {
        r.id: r.comm
        for r in lpa(edges, mode="tables", state_name="csr_base").labels.collect()
    }
    monkeypatch.setenv("SPARK_GRAFT_CSR_CAP", "3")
    got_pr = {r.id: r.pagerank for r in pagerank(arcs_df, tol=1e-10).ranks.collect()}
    got_lpa = {
        r.id: r.comm
        for r in lpa(edges, mode="tables", state_name="csr_cap3").labels.collect()
    }
    assert set(got_pr) == set(base_pr)
    for v, p in base_pr.items():
        assert got_pr[v] == pytest.approx(p, abs=1e-12)
    assert got_lpa == base_lpa


def test_rank_dispatch_parity(spark, monkeypatch):
    """renumber_communities / permute_labels give identical output on
    the single-group-window path and the distributed ranked_by path
    (forced via SPARK_GRAFT_RANK_WINDOW_MAX=0)."""
    from communitydetection_jl_spark.operators.coarsen import renumber_communities
    from communitydetection_jl_spark.operators.lpa import permute_labels

    edges, truth = fx.karate(spark)
    base_rn = {r.id: r.comm for r in renumber_communities(truth).collect()}
    base_pm = {r.id: r.comm for r in permute_labels(truth).collect()}
    monkeypatch.setenv("SPARK_GRAFT_RANK_WINDOW_MAX", "0")
    assert {r.id: r.comm for r in renumber_communities(truth).collect()} == base_rn
    assert {r.id: r.comm for r in permute_labels(truth).collect()} == base_pm


def test_pagerank_weighted_vs_oracle(spark):
    """Non-uniform weights exercise the per-arc trans-prob path (the
    CSR fast path only serves uniform weights); NumPy oracle parity."""
    import numpy as np

    arcs = [(1, 2, 3.0), (1, 3, 1.0), (2, 3, 2.0), (3, 1, 1.0), (4, 1, 5.0),
            (2, 4, 0.5)]
    edges = spark.createDataFrame(arcs, "src long, dst long, weight double")
    res = pagerank(edges, damping=0.85, tol=1e-12, max_iter=500)
    got = {r.id: r.pagerank for r in res.ranks.collect()}
    want = np_pagerank(arcs)
    for k, v in want.items():
        assert got[k] == pytest.approx(v, abs=1e-9)
