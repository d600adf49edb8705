"""k-clique percolation — operators/kclique.py vs a brute-force CPM
oracle (enumerate all k-cliques with itertools, union-find the ones
sharing k−1 vertices)."""

import itertools

from communitydetection_jl_spark.operators.kclique import k_cliques, kclique_percolation
from communitydetection_jl_spark.sources import fixtures as fx


def _brute_cpm(pairs, k):
    adj = {}
    nodes = set()
    es = set()
    for u, v in pairs:
        if u == v:
            continue
        nodes |= {u, v}
        es.add(frozenset((u, v)))
    cliques = [
        c for c in itertools.combinations(sorted(nodes), k)
        if all(frozenset(p) in es for p in itertools.combinations(c, 2))
    ]
    parent = list(range(len(cliques)))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for i, j in itertools.combinations(range(len(cliques)), 2):
        if len(set(cliques[i]) & set(cliques[j])) >= k - 1:
            parent[find(i)] = find(j)
    comms = {}
    for i, c in enumerate(cliques):
        comms.setdefault(find(i), set()).update(c)
    return {frozenset(s) for s in comms.values()}


def _spark_cover(df):
    rows = df.collect()
    comms = {}
    for r in rows:
        comms.setdefault(r.comm, set()).add(r.id)
    return {frozenset(s) for s in comms.values()}


def _edge_pairs(edges):
    return [(r.src, r.dst) for r in edges.select("src", "dst").collect()]


def test_kcliques_count_karate(spark):
    edges, _ = fx.karate(spark)
    pairs = _edge_pairs(edges)
    for k in (3, 4, 5):
        want = _brute_cpm(pairs, k)  # also enumerates cliques
        got_cliques = k_cliques(edges, k).count()
        nodes = sorted({u for e in pairs for u in e})
        es = {frozenset(p) for p in pairs}
        brute = sum(
            1 for c in itertools.combinations(nodes, k)
            if all(frozenset(p) in es for p in itertools.combinations(c, 2))
        )
        assert got_cliques == brute


def test_cpm_two_triangles(spark):
    edges, _ = fx.two_triangles(spark)
    got = _spark_cover(kclique_percolation(edges, k=3))
    assert got == {frozenset({1, 2, 3}), frozenset({4, 5, 6})}


def test_cpm_ring_of_cliques(spark):
    edges, _ = fx.ring_of_cliques(spark)
    pairs = _edge_pairs(edges)
    for k in (3, 4):
        got = _spark_cover(kclique_percolation(edges, k=k))
        assert got == _brute_cpm(pairs, k)


def test_cpm_karate_matches_bruteforce(spark):
    edges, _ = fx.karate(spark)
    pairs = _edge_pairs(edges)
    for k in (3, 4):
        got = _spark_cover(kclique_percolation(edges, k=k))
        assert got == _brute_cpm(pairs, k)


def test_cpm_no_cliques(spark):
    path = spark.createDataFrame([(1, 2), (2, 3), (3, 4)], "src long, dst long")
    assert kclique_percolation(path, k=3).count() == 0
