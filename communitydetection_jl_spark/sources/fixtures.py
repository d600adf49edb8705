"""Deterministic graph fixtures mirroring the reference's test material.

Every fixture is generated from a fixed seed (42) with NumPy only — no
external data. Shapes follow FIXTURES.md:

    edges(src: long, dst: long, weight: double)   undirected = canonical src<dst
    truth(id: long, comm: long)                   where ground truth exists

Provenance (reference = CommunityDetection.jl at /root/reference):
  - two_triangles: the reference's only real test graph, test/runtests.jl:5-16.
  - karate: Zachary's karate club, used in README.md:119-128.
  - gn: Girvan-Newman benchmark, src/girwan_newman_benchmark.jl:4-26.
  - lfr: LFR-style seeded sampler per deps/binary_networks defaults.
  - ring_of_cliques: synthetic coarsening fixture.
  - directed_toy: exercises dangling-vertex PageRank, src/DiFlowGraph.jl:65-69.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, SparkSession

EDGE_SCHEMA = "src long, dst long, weight double"
TRUTH_SCHEMA = "id long, comm long"


def _edges_df(spark: SparkSession, pairs, weights=None) -> DataFrame:
    rows = [
        (int(a), int(b), float(weights[i]) if weights is not None else 1.0)
        for i, (a, b) in enumerate(pairs)
    ]
    return spark.createDataFrame(rows, EDGE_SCHEMA)


def _truth_df(spark: SparkSession, comms) -> DataFrame:
    rows = [(i + 1, int(c)) for i, c in enumerate(comms)]
    return spark.createDataFrame(rows, TRUTH_SCHEMA)


def two_triangles(spark: SparkSession):
    """6 nodes, two triangles bridged by edge 1-4 (test/runtests.jl:5-13)."""
    pairs = [(1, 2), (2, 3), (1, 3), (1, 4), (4, 5), (5, 6), (4, 6)]
    return _edges_df(spark, pairs), _truth_df(spark, [1, 1, 1, 2, 2, 2])


# Zachary's karate club, canonical 78-edge list, 1-indexed.
KARATE_EDGES = [
    (1, 2), (1, 3), (1, 4), (1, 5), (1, 6), (1, 7), (1, 8), (1, 9), (1, 11),
    (1, 12), (1, 13), (1, 14), (1, 18), (1, 20), (1, 22), (1, 32),
    (2, 3), (2, 4), (2, 8), (2, 14), (2, 18), (2, 20), (2, 22), (2, 31),
    (3, 4), (3, 8), (3, 9), (3, 10), (3, 14), (3, 28), (3, 29), (3, 33),
    (4, 8), (4, 13), (4, 14), (5, 7), (5, 11), (6, 7), (6, 11), (6, 17),
    (7, 17), (9, 31), (9, 33), (9, 34), (10, 34), (14, 34), (15, 33),
    (15, 34), (16, 33), (16, 34), (19, 33), (19, 34), (20, 34), (21, 33),
    (21, 34), (23, 33), (23, 34), (24, 26), (24, 28), (24, 30), (24, 33),
    (24, 34), (25, 26), (25, 28), (25, 32), (26, 32), (27, 30), (27, 34),
    (28, 34), (29, 32), (29, 34), (30, 33), (30, 34), (31, 33), (31, 34),
    (32, 33), (32, 34), (33, 34),
]

# Zachary's observed 2-faction split (node 1 = instructor faction).
KARATE_FACTIONS = [
    1, 1, 1, 1, 1, 1, 1, 1, 2, 2, 1, 1, 1, 1, 2, 2, 1, 1, 2, 1, 2, 1, 2, 2,
    2, 2, 2, 2, 2, 2, 2, 2, 2, 2,
]


def karate(spark: SparkSession):
    return _edges_df(spark, KARATE_EDGES), _truth_df(spark, KARATE_FACTIONS)


def gn(spark: SparkSession, k_in: int = 14, seed: int = 42):
    """Girvan-Newman benchmark: 128 nodes, 4 communities of 32.

    Intra-pair probability k_in/31, inter k_out/96 with k_out = 16-k_in
    (src/girwan_newman_benchmark.jl:4-26), seeded for determinism.
    """
    rng = np.random.default_rng(seed)
    n = 128
    comm = np.repeat(np.arange(1, 5), 32)
    p_in = k_in / 31.0
    p_out = (16 - k_in) / 96.0
    iu, ju = np.triu_indices(n, k=1)
    same = comm[iu] == comm[ju]
    p = np.where(same, p_in, p_out)
    keep = rng.random(len(p)) < p
    pairs = list(zip((iu[keep] + 1).tolist(), (ju[keep] + 1).tolist()))
    return _edges_df(spark, pairs), _truth_df(spark, comm)


def ring_of_cliques(spark: SparkSession, n_cliques: int = 4, clique_size: int = 10):
    """k cliques joined in a ring by single edges — coarsening fixture."""
    pairs = []
    comms = []
    for c in range(n_cliques):
        base = c * clique_size
        members = list(range(base + 1, base + clique_size + 1))
        comms.extend([c + 1] * clique_size)
        for i in range(clique_size):
            for j in range(i + 1, clique_size):
                pairs.append((members[i], members[j]))
    for c in range(n_cliques):
        a = c * clique_size + 1
        b = ((c + 1) % n_cliques) * clique_size + 2
        pairs.append((min(a, b), max(a, b)))
    return _edges_df(spark, pairs), _truth_df(spark, comms)


DIRECTED_TOY_ARCS = [
    (1, 2), (1, 3), (2, 3), (3, 1), (3, 4), (2, 4),
    (4, 5), (5, 6), (6, 4), (5, 7), (6, 8), (7, 8),
]  # node 8 is dangling (no out-arcs)


def directed_toy(spark: SparkSession):
    return _edges_df(spark, DIRECTED_TOY_ARCS), None


def lfr(spark: SparkSession, n: int = 1000, avg_deg: int = 15, max_deg: int = 50,
        mu: float = 0.3, min_c: int = 20, max_c: int = 50, seed: int = 42):
    """LFR-style community benchmark, seeded NumPy re-derivation of the
    bundled generator's defaults (deps/binary_networks flags.dat:
    N=1000 k=15 maxk=50 mu=0.3 t1=2 t2=1 minc=20 maxc=50).

    Power-law degrees (exponent 2) and community sizes (exponent 1),
    configuration-model wiring with (1-mu) intra / mu inter stubs.
    """
    rng = np.random.default_rng(seed)
    # community sizes ~ power law t2=1 in [min_c, max_c]
    sizes = []
    while sum(sizes) < n:
        u = rng.random()
        s = int(min_c * (max_c / min_c) ** u)  # log-uniform == t2=1
        sizes.append(min(s, n - sum(sizes)))
    if sizes[-1] < min_c and len(sizes) > 1:
        sizes[-2] += sizes[-1]
        sizes.pop()
    comm = np.concatenate([np.full(s, i + 1) for i, s in enumerate(sizes)])
    # degrees ~ power law t1=2, truncated, rescaled to avg_deg
    raw = (rng.pareto(1.0, n) + 1.0) * (avg_deg / 2.0)
    deg = np.clip(raw, 3, max_deg).astype(int)
    deg = np.maximum(3, (deg * (avg_deg / max(deg.mean(), 1e-9))).astype(int))
    deg = np.minimum(deg, max_deg)

    intra = np.maximum(1, np.round(deg * (1.0 - mu)).astype(int))
    inter = deg - intra
    pairs = set()
    nodes = np.arange(1, n + 1)
    # intra wiring: per community, random stub pairing
    for c in range(1, len(sizes) + 1):
        members = nodes[comm == c]
        stubs = np.repeat(members, intra[members - 1])
        rng.shuffle(stubs)
        for a, b in zip(stubs[0::2], stubs[1::2]):
            if a != b:
                pairs.add((int(min(a, b)), int(max(a, b))))
    # inter wiring: global stub pairing across communities
    stubs = np.repeat(nodes, inter)
    rng.shuffle(stubs)
    for a, b in zip(stubs[0::2], stubs[1::2]):
        if a != b and comm[a - 1] != comm[b - 1]:
            pairs.add((int(min(a, b)), int(max(a, b))))
    return _edges_df(spark, sorted(pairs)), _truth_df(spark, comm)




def football_like(spark: SparkSession, seed: int = 42):
    """NCAA-football-scale planted partition: 115 nodes, 12 conferences.

    The reference exercises ``graphfamous("football")`` (GraphPlot.jl
    data; README.md usage, test/louvain.jl:497). The actual 2000-season
    edge list ships with an external package and is not available
    offline (this sandbox has no network, and embedding a from-memory
    reconstruction of the 613 edges would risk silently corrupting the
    canonical graph), so this fixture reproduces its *statistics* (115 teams,
    conference sizes 8-12, ~613 edges, avg degree ~10.7, strong
    intra-conference density) as a seeded planted partition — the same
    role in tests: a mid-size graph with 12 ground-truth communities.
    """
    rng = np.random.default_rng(seed)
    sizes = [8, 8, 9, 10, 10, 10, 10, 10, 10, 10, 10, 10]
    comm = np.concatenate([np.full(s, i + 1) for i, s in enumerate(sizes)])
    n = comm.size
    iu, ju = np.triu_indices(n, k=1)
    same = comm[iu] == comm[ju]
    p = np.where(same, 0.64, 0.047)
    keep = rng.random(len(p)) < p
    pairs = list(zip((iu[keep] + 1).tolist(), (ju[keep] + 1).tolist()))
    return _edges_df(spark, pairs), _truth_df(spark, comm)


def load_gml(spark: SparkSession, path: str):
    """Load a Newman-format GML graph (the distribution format of the
    canonical famous networks: football, dolphins, polbooks, ...) into
    (edges, truth) DataFrames. ``value`` node attributes become the
    truth labels (conference index for football); ids are shifted to
    1-based to match the other fixtures.

    The reference reaches the real football network through
    ``graphfamous("football")`` (test/louvain.jl:497) — data that ships
    with an external Julia package, not with the reference repo itself.
    This loader gives a user with the canonical ``football.gml`` exact
    parity; offline test runs use the statistics-matched
    ``football_like`` stand-in above."""
    import re

    text = open(path).read()
    nodes = {}
    for m in re.finditer(
        r"node\s*\[\s*id\s+(\d+)(?:\s+label\s+\"[^\"]*\")?"
        r"(?:\s+value\s+(\d+))?\s*\]", text
    ):
        nodes[int(m.group(1))] = int(m.group(2) or 0)
    pairs = [
        (int(m.group(1)), int(m.group(2)))
        for m in re.finditer(
            r"edge\s*\[\s*source\s+(\d+)\s+target\s+(\d+)", text)
    ]
    base = 0 if min(nodes) >= 1 else 1  # shift 0-based GML to 1-based
    edges = _edges_df(
        spark, sorted((a + base, b + base) for a, b in pairs))
    truth = spark.createDataFrame(
        [(i + base, c + 1) for i, c in sorted(nodes.items())],
        "id long, comm long",
    )
    return edges, truth


FIXTURES = {
    "two_triangles": two_triangles,
    "karate": karate,
    "gn": gn,
    "ring_of_cliques": ring_of_cliques,
    "football_like": football_like,
    "directed_toy": directed_toy,
    "lfr": lfr,
}
