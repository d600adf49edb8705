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
