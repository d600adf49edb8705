"""Classification metrics + directed map equation."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from communitydetection_jl_spark.operators.classification import (
    accuracy,
    adjusted_rand_index,
    confusion_matrix,
    f1_score,
    hamming_loss,
    mutual_info_score,
    per_class_prf,
)
from communitydetection_jl_spark.operators.objectives import map_equation_directed
from communitydetection_jl_spark.sources import fixtures as fx


@pytest.fixture(scope="module")
def labels(spark):
    truth = spark.createDataFrame(
        [(1, "a"), (2, "a"), (3, "a"), (4, "b"), (5, "b"), (6, "c")],
        "id long, comm string",
    )
    pred = spark.createDataFrame(
        [(1, "a"), (2, "a"), (3, "b"), (4, "b"), (5, "b"), (6, "a")],
        "id long, comm string",
    )
    return truth, pred


def test_accuracy_and_prf(spark, labels):
    truth, pred = labels
    assert accuracy(truth, pred) == pytest.approx(4 / 6)
    assert hamming_loss(truth, pred) == pytest.approx(2 / 6)
    prf = {r.label: r for r in per_class_prf(truth, pred).collect()}
    # class a: tp=2, fp=1 (id6), fn=1 (id3)
    assert (prf["a"].tp, prf["a"].fp, prf["a"].fn) == (2, 1, 1)
    assert prf["a"].precision == pytest.approx(2 / 3)
    assert prf["a"].recall == pytest.approx(2 / 3)
    # class c: never predicted → recall 0
    assert prf["c"].recall == 0.0
    # sklearn cross-check values: macro F1 of this table
    f1a = 2 / 3
    f1b = 2 * (2 / 3) * 1.0 / (2 / 3 + 1.0)
    assert f1_score(truth, pred, "macro") == pytest.approx((f1a + f1b + 0.0) / 3)
    micro = f1_score(truth, pred, "micro")
    assert micro == pytest.approx(accuracy(truth, pred))  # single-label case


def test_confusion_and_ari(spark, labels):
    truth, pred = labels
    cm = {(r.true_label, r.pred_label): r.n for r in confusion_matrix(truth, pred).collect()}
    assert cm[("a", "a")] == 2 and cm[("a", "b")] == 1 and cm[("c", "a")] == 1
    assert adjusted_rand_index(truth, truth) == pytest.approx(1.0)
    assert -0.5 <= adjusted_rand_index(truth, pred) < 1.0
    assert mutual_info_score(truth, truth) > 0


def test_map_equation_directed(spark):
    edges, _ = fx.directed_toy(spark)
    verts = (
        edges.select(F.col("src").alias("id"))
        .unionByName(edges.select(F.col("dst").alias("id")))
        .distinct()
    )
    singles = verts.select("id", F.col("id").alias("comm"))
    two = verts.select("id", (F.col("id") <= 4).cast("long").alias("comm"))
    l_single = map_equation_directed(edges, singles)
    l_two = map_equation_directed(edges, two)
    # grouping the two cycles should compress vs singletons
    assert l_two < l_single
    assert l_two > 0


def test_adjusted_mutual_info(spark):
    """AMI (reference delegate set, src/metrics.jl:452-515): E[MI] is
    checked against a TRUE permutation average (all 4! relabelings of a
    4-point partition), then AMI properties: 1 on identical partitions,
    ~0 against near-random ones."""
    import itertools
    import math

    from communitydetection_jl_spark.operators.classification import (
        adjusted_mutual_info_score,
        expected_mutual_info,
        mutual_info_score,
    )

    # brute-force E[MI]: average MI over every permutation of b's labels
    la = [0, 0, 1, 1]
    lb = [0, 1, 0, 1]

    def mi_of(a, b):
        n = len(a)
        from collections import Counter

        nij = Counter(zip(a, b))
        na, nb = Counter(a), Counter(b)
        return sum(
            (c / n) * math.log(n * c / (na[i] * nb[j]))
            for (i, j), c in nij.items() if c > 0
        )

    perm_avg = sum(mi_of(la, list(p)) for p in itertools.permutations(lb)) / math.factorial(len(lb))
    emi = expected_mutual_info([2, 2], [2, 2])
    assert emi == pytest.approx(perm_avg, abs=1e-12)

    ma = spark.createDataFrame(list(enumerate(la)), "id long, comm long")
    mb = spark.createDataFrame(list(enumerate(lb)), "id long, comm long")
    assert adjusted_mutual_info_score(ma, ma) == pytest.approx(1.0, abs=1e-9)
    # orthogonal balanced partitions: MI = 0 exactly, so the chance
    # correction drives AMI ≤ 0 (here (0−EMI)/(H−EMI) = −0.5 at n=4)
    ami0 = adjusted_mutual_info_score(ma, mb)
    assert -0.6 < ami0 <= 0.0
    # larger correlated case: AMI < NMI but still high
    lc = [i // 20 for i in range(100)]
    ld = list(lc)
    ld[0], ld[25] = 3, 4
    mc = spark.createDataFrame(list(enumerate(lc)), "id long, comm long")
    md = spark.createDataFrame(list(enumerate(ld)), "id long, comm long")
    ami = adjusted_mutual_info_score(mc, md)
    assert 0.7 < ami < 1.0


def test_football_like_fixture(spark):
    """football-scale planted partition (12 conferences, ~613 edges):
    Louvain and LPA must recover the conferences almost exactly."""
    from communitydetection_jl_spark.operators.compare import nmi
    from communitydetection_jl_spark.operators.louvain import louvain
    from communitydetection_jl_spark.operators.lpa import lpa
    from communitydetection_jl_spark.sources import fixtures as fx

    edges, truth = fx.football_like(spark)
    m = edges.count()
    assert 550 <= m <= 680  # ~613 edges like the real network
    res = louvain(edges)
    assert nmi(res.membership, truth) > 0.85
    lres = lpa(edges)
    assert nmi(lres.labels, truth) > 0.75


def test_log_fact_expr_matches_lgamma(spark):
    """The Stirling-series log-factorial column expression agrees with
    math.lgamma across the table/series boundary and at large k."""
    import math

    from communitydetection_jl_spark.operators.classification import _log_fact_expr

    ks = list(range(0, 30)) + [100, 1000, 10**6, 10**9, 10**12]
    df = spark.createDataFrame([(k,) for k in ks], "k long")
    got = {r.k: r.lf for r in df.select("k", _log_fact_expr(F.col("k")).alias("lf")).collect()}
    for k in ks:
        want = math.lgamma(k + 1.0)
        assert got[k] == pytest.approx(want, rel=1e-13, abs=1e-12), k


def test_emi_distributed_matches_driver(spark):
    """The distributed hypergeometric EMI kernel reproduces the
    driver-side loop on irregular marginals (including a cell whose
    nij range spans several explode chunks via chunk=7)."""
    import random

    from communitydetection_jl_spark.operators.classification import (
        expected_mutual_info,
        expected_mutual_info_distributed,
    )

    rng = random.Random(7)
    marg_a = [rng.randint(1, 40) for _ in range(12)]
    need = sum(marg_a)
    marg_b = []
    left = need
    while left > 0:
        c = min(left, rng.randint(1, 60))
        marg_b.append(c)
        left -= c
    want = expected_mutual_info(marg_a, marg_b)
    da = spark.createDataFrame([(x,) for x in marg_a], "na long")
    db = spark.createDataFrame([(x,) for x in marg_b], "nb long")
    got = expected_mutual_info_distributed(da, db, need, chunk=7)
    assert got == pytest.approx(want, rel=1e-10, abs=1e-12)


def test_ami_distributed_path(spark, monkeypatch):
    """adjusted_mutual_info_score gives the same value when the
    marginal-cell guard forces the distributed EMI kernel."""
    from communitydetection_jl_spark.operators import classification as cls
    from communitydetection_jl_spark.sources import fixtures as fx

    edges, truth = fx.ring_of_cliques(spark)
    pred = truth.select("id", (F.col("comm") * 2 % 5).alias("comm"))
    base = cls.adjusted_mutual_info_score(truth, pred)
    monkeypatch.setattr(cls, "_EMI_DRIVER_CELLS", 0)
    forced = cls.adjusted_mutual_info_score(truth, pred)
    assert forced == pytest.approx(base, rel=1e-10, abs=1e-12)


def test_emi_cell_budget_guard(spark, monkeypatch):
    """Above the cell budget the distributed EMI kernel refuses with a
    clear message instead of launching an open-ended Ω(|A|·|B|) job —
    the documented boundary for planetary-scale covers."""
    import pytest as _pt

    from communitydetection_jl_spark.operators.classification import (
        expected_mutual_info_distributed,
    )

    da = spark.createDataFrame([(3,), (4,), (5,)], "na long")
    db = spark.createDataFrame([(6,), (6,)], "nb long")
    monkeypatch.setenv("SPARK_GRAFT_EMI_MAX_CELLS", "5")
    with _pt.raises(ValueError, match="cell budget"):
        expected_mutual_info_distributed(da, db, 12)
    # within budget the same call still runs
    monkeypatch.setenv("SPARK_GRAFT_EMI_MAX_CELLS", "1e10")
    assert expected_mutual_info_distributed(da, db, 12) > 0.0


def test_load_gml_roundtrip(spark, tmp_path):
    """load_gml parses Newman-format GML (the famous-network
    distribution format) into the fixture (edges, truth) shape."""
    gml = """graph [
  node [ id 0 label "TeamA" value 7 ]
  node [ id 1 label "TeamB" value 7 ]
  node [ id 2 label "TeamC" value 2 ]
  edge [ source 0 target 1 ]
  edge [ source 1 target 2 ]
]"""
    p = tmp_path / "toy.gml"
    p.write_text(gml)
    from communitydetection_jl_spark.sources.fixtures import load_gml

    edges, truth = load_gml(spark, str(p))
    e = {(r.src, r.dst) for r in edges.collect()}
    t = {r.id: r.comm for r in truth.collect()}
    assert e == {(1, 2), (2, 3)}
    assert t == {1: 8, 2: 8, 3: 3}
