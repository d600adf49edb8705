"""min_conductance, graph TPR, overlap NMI, community metric sanity."""

from __future__ import annotations

import pytest

from communitydetection_jl_spark.operators.community_metrics import (
    community_metrics,
    coverage,
    fomd,
    graph_triangle_participation_ratio,
    min_conductance,
    odf,
    triangle_participation_ratio,
)
from communitydetection_jl_spark.operators.compare import overlap_nmi
from communitydetection_jl_spark.sources import fixtures as fx


def test_community_metrics_ring(spark):
    edges, truth = fx.ring_of_cliques(spark)
    m = {r.comm: r for r in community_metrics(edges, truth).collect()}
    for c in (1, 2, 3, 4):
        assert m[c].ns == 10 and m[c].ms == 45 and m[c].cs == 2
        assert m[c].conductance == pytest.approx(2 / 92)
        assert m[c].expansion == pytest.approx(0.2)
        assert m[c].separability == pytest.approx(22.5)
        assert m[c].internal_density == pytest.approx(1.0)
    assert coverage(edges, truth) == pytest.approx(180 / 184)


def test_min_conductance_buckets(spark):
    edges, truth = fx.ring_of_cliques(spark)
    rows = min_conductance(edges, truth).collect()
    assert len(rows) == 1  # all communities size 10
    assert rows[0].ns == 10 and rows[0].min_conductance == pytest.approx(2 / 92)


def test_graph_tpr(spark):
    edges, _ = fx.two_triangles(spark)
    assert graph_triangle_participation_ratio(edges) == pytest.approx(1.0)
    path = spark.createDataFrame(
        [(1, 2, 1.0), (2, 3, 1.0)], "src long, dst long, weight double"
    )
    assert graph_triangle_participation_ratio(path) == 0.0


def test_tpr_per_community(spark):
    edges, truth = fx.ring_of_cliques(spark)
    rows = {r.comm: r.tpr for r in triangle_participation_ratio(edges, truth).collect()}
    assert all(v == pytest.approx(1.0) for v in rows.values())


def test_fomd_and_odf(spark):
    edges, truth = fx.ring_of_cliques(spark)
    f = {r.comm: r.fomd for r in fomd(edges, truth).collect()}
    # every clique member has internal degree 9 > median degree (9) is
    # false for most; just check range and determinism
    assert all(0.0 <= v <= 1.0 for v in f.values())
    o = {r.comm: r for r in odf(edges, truth).collect()}
    for c in o.values():
        assert c.max_odf == pytest.approx(1 / 10)  # bridge endpoints
        assert 0 < c.average_odf < 0.05
        assert c.flake_odf == 0.0


def test_overlap_nmi():
    a = [[1, 2, 3], [4, 5, 6]]
    assert overlap_nmi(a, a) == pytest.approx(1.0)
    b = [[1, 2, 3, 4], [4, 5, 6]]  # node 4 overlaps
    v = overlap_nmi(a, b)
    assert 0.5 < v < 1.0
    disjoint = [[1, 4], [2, 5], [3, 6]]
    assert overlap_nmi(a, disjoint) < v


def test_ranked_by_is_permutation(spark):
    """ranked_by (functions/ids.py) must produce a dense 1..n rank with
    no global window — the building block of dense_ids and rnmi."""
    from pyspark.sql import functions as F

    from communitydetection_jl_spark.functions.ids import ranked_by

    df = spark.range(500).select("id")
    r = ranked_by(df, F.xxhash64("id"))
    ranks = sorted(row.rank for row in r.collect())
    assert ranks == list(range(1, 501))
    # ranking by id itself is the identity order
    r2 = ranked_by(df, F.col("id"))
    got = {row.id: row.rank for row in r2.collect()}
    assert all(got[i] == i + 1 for i in range(500))


def test_rnmi_distributed(spark):
    """rnmi (src/nmi.jl:194-213 semantics): deterministic, strictly
    below plain NMI (positive shuffle correction), and high for
    near-identical partitions. No driver-side label vector, no
    global-sort window."""
    import pytest as _pt

    from communitydetection_jl_spark.operators.compare import nmi, rnmi

    la = [i // 10 for i in range(100)]
    lb = list(la)
    lb[0], lb[11] = 5, 7
    ma = spark.createDataFrame(list(enumerate(la)), "id long, comm long")
    mb = spark.createDataFrame(list(enumerate(lb)), "id long, comm long")
    r1 = rnmi(ma, mb, n_shuffles=4)
    r2 = rnmi(ma, mb, n_shuffles=4)
    assert r1 == _pt.approx(r2, abs=1e-12)
    assert r1 < nmi(ma, mb)
    assert r1 > 0.5


def test_overlap_nmi_df_matches_driver(spark):
    """The distributed cover-NMI must equal the driver-list version on
    overlapping covers, and be 1.0 for identical covers."""
    from communitydetection_jl_spark.operators.compare import (
        overlap_nmi,
        overlap_nmi_df,
    )

    cover_a = [[1, 2, 3, 4], [4, 5, 6], [7, 8]]
    cover_b = [[1, 2, 3], [4, 5, 6, 7], [7, 8]]

    def to_df(cover):
        rows = [(i, lbl) for lbl, grp in enumerate(cover) for i in grp]
        return spark.createDataFrame(rows, "id long, comm long")

    import pytest as _pt

    got = overlap_nmi_df(to_df(cover_a), to_df(cover_b))
    want = overlap_nmi(cover_a, cover_b)
    assert got == _pt.approx(want, abs=1e-12)
    same = overlap_nmi_df(to_df(cover_a), to_df(cover_a))
    assert same == _pt.approx(1.0, abs=1e-12)


def test_rnmi_md5_mode_agrees_with_default(spark):
    """The md5 shuffle-key mode (oracle path) is a different uniform
    permutation family, so values differ slightly — but both are
    deterministic and the shuffle correction has the same magnitude."""
    import pytest as _pt

    from communitydetection_jl_spark.operators.compare import rnmi

    la = [i // 10 for i in range(100)]
    lb = list(la)
    lb[3] = 9
    ma = spark.createDataFrame(list(enumerate(la)), "id long, comm long")
    mb = spark.createDataFrame(list(enumerate(lb)), "id long, comm long")
    m1 = rnmi(ma, mb, n_shuffles=4, hash_mode="md5")
    m2 = rnmi(ma, mb, n_shuffles=4, hash_mode="md5")
    assert m1 == _pt.approx(m2, abs=1e-12)
    x1 = rnmi(ma, mb, n_shuffles=4)
    assert abs(m1 - x1) < 0.1  # same correction scale, different draws


def _np_prob_metric(pairs, memb, steps):
    """NumPy oracle for the documented prob_metric semantics:
    p_k(v) = (1/deg v)·Σ_{w∈N(v)∩C(v)} p_{k−1}(w), p_0 ≡ 1."""
    import numpy as np

    nodes = sorted({u for u, v in pairs} | {v for u, v in pairs} | set(memb))
    idx = {u: i for i, u in enumerate(nodes)}
    n = len(nodes)
    adj = [[] for _ in range(n)]
    for u, v in pairs:
        adj[idx[u]].append(idx[v])
        adj[idx[v]].append(idx[u])
    comm = {idx[u]: c for u, c in memb.items()}
    p = np.ones(n)
    for _ in range(steps):
        nxt = np.zeros(n)
        for i in range(n):
            nbrs = adj[i]
            if not nbrs:
                continue
            s = sum(p[j] for j in nbrs if comm.get(j) == comm.get(i))
            nxt[i] = s / len(nbrs)
        p = nxt
    out = {}
    for c in sorted(set(comm.values())):
        vals = np.array([p[i] for i in range(n) if comm[i] == c])
        mean = vals.mean()
        std = vals.std(ddof=1) if len(vals) > 1 else None
        var = vals.var(ddof=1) if len(vals) > 1 else None
        out[c] = (len(vals), mean, std, var)
    return out


def test_prob_metric_vs_numpy(spark):
    import random

    from communitydetection_jl_spark.operators.community_metrics import (
        prob_metric_graph,
    )

    rng = random.Random(7)
    n = 40
    pairs = sorted({tuple(sorted(rng.sample(range(n), 2))) for _ in range(160)})
    memb = {u: u % 4 for u in range(n)}
    edges = spark.createDataFrame(
        [(a, b, 1.0) for a, b in pairs], "src long, dst long, weight double")
    md = spark.createDataFrame(list(memb.items()), "id long, comm long")
    got = {r.comm: r for r in prob_metric_graph(edges, md, steps=3).collect()}
    want = _np_prob_metric(pairs, memb, 3)
    assert set(got) == set(want)
    for c, (cnt, mean, std, var) in want.items():
        assert got[c].n_members == cnt
        assert got[c].mean_p == pytest.approx(mean, abs=1e-12)
        assert got[c].std_p == pytest.approx(std, abs=1e-12)
        assert got[c].var_p == pytest.approx(var, abs=1e-12)


def test_prob_metric_ref_sizes_and_singletons(spark):
    """steps=None uses the reference normalization (community size);
    singleton communities get NULL std/var (Julia NaN)."""
    from communitydetection_jl_spark.operators.community_metrics import (
        prob_metric_graph,
    )

    # triangle community {0,1,2} + singleton {9}; 9 links to 0
    edges = spark.createDataFrame(
        [(0, 1, 1.0), (1, 2, 1.0), (0, 2, 1.0), (0, 9, 1.0)],
        "src long, dst long, weight double")
    md = spark.createDataFrame(
        [(0, 1), (1, 1), (2, 1), (9, 2)], "id long, comm long")
    got = {r.comm: r for r in prob_metric_graph(edges, md).collect()}
    # community 1 (size 3): 3 steps; vertices 1,2 have p=1 throughout
    # (all nbrs internal); vertex 0 has deg 3 with 2 internal:
    # p1=2/3, p2=(1+1)/3=2/3... exact: p_k(0)=2/3 each step? p_k(0) =
    # (p(1)+p(2))/3; p(1)=p(2)=(p(0)+p(2 or 1))/2
    import numpy as np

    want = _np_prob_metric([(0, 1), (1, 2), (0, 2), (0, 9)],
                           {0: 1, 1: 1, 2: 1, 9: 2}, 3)
    assert got[1].mean_p == pytest.approx(want[1][1], abs=1e-12)
    # singleton: walk of length 1; its only nbr (0) is another comm
    assert got[2].n_members == 1
    assert got[2].mean_p == pytest.approx(0.0)
    assert got[2].std_p is None and got[2].var_p is None


def test_louvain_det_parity_expr_deterministic(spark):
    """The parity-gated distributed sweep is run-to-run deterministic
    and respects the explicit parity expression (the louvain_det
    driver row's engine side)."""
    from pyspark.sql import functions as F

    from communitydetection_jl_spark.operators.louvain import _distributed_level
    from communitydetection_jl_spark.sources import fixtures as fx

    edges, _ = fx.ring_of_cliques(spark)
    kw = dict(eps=1e-7, max_sweeps=6, move_floor=0.0,
              parity_expr=F.pmod(F.col("id"), F.lit(2)))
    a = {r.id: r.comm for r in _distributed_level(edges, **kw)[0].collect()}
    b = {r.id: r.comm for r in _distributed_level(edges, **kw)[0].collect()}
    assert a == b
    # cliques must collapse: far fewer communities than vertices
    assert len(set(a.values())) < len(a) / 2


def test_overlap_nmi_df_many_clusters_fast(spark):
    """The de-quadraticized candidate table: a 1e4-cluster cover pair
    (old |C_a|·|C_b| cross ≈ 1e8 rows) finishes in seconds and matches
    a shifted-copy expectation (near-but-below 1; exact self = 1)."""
    import time

    from pyspark.sql import functions as F

    from communitydetection_jl_spark.operators.compare import overlap_nmi_df

    n = 40_000
    ids = spark.range(n).select(F.col("id"))
    a = ids.select("id", (F.col("id") / 4).cast("long").alias("comm"))
    b = ids.select("id", ((F.col("id") + 1) / 4).cast("long").alias("comm"))
    t0 = time.time()
    same = overlap_nmi_df(a, a)
    cross = overlap_nmi_df(a, b)
    dt = time.time() - t0
    assert same == pytest.approx(1.0, abs=1e-9)
    assert 0.3 < cross < 1.0
    assert dt < 60, f"two 1e4-cluster ONMI runs took {dt:.1f}s"
