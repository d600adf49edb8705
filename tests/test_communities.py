"""LPA / Louvain / coarsening / comparison metrics on reference fixtures."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from communitydetection_jl_spark.operators.coarsen import (
    collapse_graph,
    from_coarser_partition,
    renumber_communities,
)
from communitydetection_jl_spark.operators.compare import (
    jaccard_index,
    nmi,
    nvoi,
    rand_index,
)
from communitydetection_jl_spark.operators.louvain import _local_louvain, louvain
from communitydetection_jl_spark.operators.lpa import lpa, nsdlpa, permute_labels
from communitydetection_jl_spark.operators.modularity import modularity
from communitydetection_jl_spark.operators.multilevel import hlpa
from communitydetection_jl_spark.sources import fixtures as fx

from .oracles import np_nmi


def _nmi_vs_truth(labels_df, truth_df):
    return nmi(labels_df, truth_df)


def test_lpa_two_triangles_exact(spark):
    edges, truth = fx.two_triangles(spark)
    res = lpa(edges)
    # the reference's own oracle: NMI == 1.0 vs [1,1,1,2,2,2] (test/runtests.jl:16)
    assert _nmi_vs_truth(res.labels, truth) == pytest.approx(1.0)
    # canonical renumbering: labels are exactly 1,1,1,2,2,2 in id order
    got = [r.comm for r in res.labels.orderBy("id").collect()]
    assert got == [1, 1, 1, 2, 2, 2]


def test_lpa_unit_vote_path_matches_explicit(spark):
    """The bare (src,dst) count-based gather must produce exactly the
    labels of the explicit vote=1.0 sum-based gather."""
    from pyspark.sql import functions as F

    from communitydetection_jl_spark.functions.graph import symmetrize, vertices_of
    from communitydetection_jl_spark.operators.lpa import lpa_superstep

    edges, _ = fx.karate(spark)
    labels = vertices_of(edges).select("id", F.col("id").alias("lbl"))
    bare = symmetrize(edges).select("src", "dst")
    voted = symmetrize(edges).select("src", "dst", F.lit(1.0).alias("vote"))
    a = lpa_superstep(bare, labels).orderBy("id").collect()
    b = lpa_superstep(voted, labels).orderBy("id").collect()
    assert [(r.id, r.lbl, r.changed) for r in a] == [
        (r.id, r.lbl, r.changed) for r in b
    ]


def test_lpa_ring_of_cliques(spark):
    edges, truth = fx.ring_of_cliques(spark)
    res = lpa(edges)
    assert _nmi_vs_truth(res.labels, truth) == pytest.approx(1.0)


def test_nsdlpa_two_triangles(spark):
    edges, truth = fx.two_triangles(spark)
    res = nsdlpa(edges)
    assert _nmi_vs_truth(res.labels, truth) == pytest.approx(1.0)


def test_lpa_deterministic_across_parallelism(spark):
    """Same labels regardless of partitioning (the determinism bar)."""
    edges, _ = fx.gn(spark, k_in=14)
    r1 = lpa(edges.repartition(2))
    r2 = lpa(edges.repartition(7))
    a = {r.id: r.comm for r in r1.labels.collect()}
    b = {r.id: r.comm for r in r2.labels.collect()}
    assert a == b


def test_permute_labels_first_seen(spark):
    m = spark.createDataFrame([(1, 7), (2, 7), (3, 3), (4, 9)], "id long, comm long")
    got = {r.id: r.comm for r in permute_labels(m).collect()}
    assert got == {1: 1, 2: 1, 3: 2, 4: 3}


def test_collapse_conserves_weight_and_projects(spark):
    edges, truth = fx.ring_of_cliques(spark)
    coarse = collapse_graph(edges, truth, check_conservation=True)
    # 4 cliques → 4 supernodes, 4 ring edges + 4 self loops
    assert coarse.filter(F.col("src") == F.col("dst")).count() == 4
    assert coarse.filter(F.col("src") != F.col("dst")).count() == 4
    loops = {r.src: r.weight for r in coarse.filter(F.col("src") == F.col("dst")).collect()}
    assert all(w == 45.0 for w in loops.values())  # C(10,2) intra edges

    coarse_memb = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 2), (4, 2)], "id long, comm long"
    )
    fine = from_coarser_partition(truth, coarse_memb)
    assert fine.select("comm").distinct().count() == 2


def test_renumber_by_size(spark):
    m = spark.createDataFrame(
        [(1, 5), (2, 5), (3, 5), (4, 8), (5, 8), (6, 2)], "id long, comm long"
    )
    got = {r.id: r.comm for r in renumber_communities(m).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 2, 5: 2, 6: 3}


def test_local_louvain_two_triangles():
    pairs = [(1, 2, 1.0), (2, 3, 1.0), (1, 3, 1.0), (1, 4, 1.0),
             (4, 5, 1.0), (5, 6, 1.0), (4, 6, 1.0)]
    comm = _local_louvain(pairs)
    assert comm[1] == comm[2] == comm[3]
    assert comm[4] == comm[5] == comm[6]
    assert comm[1] != comm[4]


def test_louvain_two_triangles(spark):
    edges, truth = fx.two_triangles(spark)
    res = louvain(edges)
    assert nmi(res.membership, truth) == pytest.approx(1.0)
    assert res.quality == pytest.approx(12 / 14 - 2 * (7 / 14) ** 2, abs=1e-9)


def test_louvain_karate_quality(spark):
    edges, _ = fx.karate(spark)
    res = louvain(edges)
    # canonical Louvain on karate reaches Q ≈ 0.41-0.42
    assert res.quality > 0.40
    q = res.membership.select("comm").distinct().count()
    assert 2 <= q <= 6


def test_louvain_distributed_path(spark):
    """Force the distributed bulk phase (local_threshold=0 keeps it from
    collecting) and check it still finds the clique structure."""
    edges, truth = fx.ring_of_cliques(spark)
    res = louvain(edges, local_threshold=0, max_sweeps=40)
    assert nmi(res.membership, truth) == pytest.approx(1.0)


def test_hlpa_ring_of_cliques(spark):
    edges, truth = fx.ring_of_cliques(spark)
    res = hlpa(edges)
    assert nmi(res.membership, truth) == pytest.approx(1.0)


def test_nmi_matches_numpy_oracle(spark):
    la = [1, 1, 2, 2, 3, 3, 3]
    lb = [2, 2, 2, 1, 1, 1, 3]
    ma = spark.createDataFrame(list(enumerate(la)), "id long, comm long")
    mb = spark.createDataFrame(list(enumerate(lb)), "id long, comm long")
    assert nmi(ma, mb) == pytest.approx(np_nmi(la, lb), abs=1e-12)
    assert nmi(ma, ma) == pytest.approx(1.0)
    assert 0.0 <= nvoi(ma, mb) <= 1.0
    assert nvoi(ma, ma) == pytest.approx(0.0, abs=1e-12)
    from communitydetection_jl_spark.operators.compare import nminvoi

    both = nminvoi(ma, mb)
    assert both[0] == pytest.approx(nmi(ma, mb), abs=1e-12)
    assert both[1] == pytest.approx(nvoi(ma, mb), abs=1e-12)


def test_pair_counting_metrics(spark):
    la = [1, 1, 1, 2, 2]
    lb = [1, 1, 2, 2, 2]
    ma = spark.createDataFrame(list(enumerate(la)), "id long, comm long")
    mb = spark.createDataFrame(list(enumerate(lb)), "id long, comm long")
    # pairs: same-same a11 = pairs (0,1) and (3,4) = 2
    assert rand_index(ma, mb) == pytest.approx((2 + 4) / 10)
    assert jaccard_index(ma, mb) == pytest.approx(2 / (2 + 2 + 2))
    assert rand_index(ma, ma) == pytest.approx(1.0)


def test_gn_benchmark_lpa_quality(spark):
    """On an easy GN graph (k_in=14) LPA should recover communities well."""
    edges, truth = fx.gn(spark, k_in=14)
    res = lpa(edges)
    score = nmi(res.labels, truth)
    assert score > 0.9
    q = modularity(edges, res.labels)
    assert q > 0.5


def test_louvain_cpm_ring_of_cliques(spark):
    edges, truth = fx.ring_of_cliques(spark)
    res = louvain(edges, objective="cpm", gamma=0.5)
    assert nmi(res.membership, truth) == pytest.approx(1.0)
    assert res.quality > 0


def test_louvain_rbconfig_resolution(spark):
    """Higher resolution gamma must yield at least as many communities."""
    edges, _ = fx.karate(spark)
    low = louvain(edges, objective="rbconfig", gamma=0.5)
    high = louvain(edges, objective="rbconfig", gamma=2.0)
    q_low = low.membership.select("comm").distinct().count()
    q_high = high.membership.select("comm").distinct().count()
    assert q_high >= q_low


def test_louvain_significance_two_triangles(spark):
    """Significance dispatch (src/Optimiser.jl:257-304 method table;
    quality src/MPartition.jl:589-604): the planted two-triangle split
    maximizes significance and the result's quality must equal the
    quality function evaluated on the found membership."""
    from communitydetection_jl_spark.operators.objectives import significance_quality

    edges, truth = fx.two_triangles(spark)
    res = louvain(edges, objective="significance")
    assert nmi(res.membership, truth) == pytest.approx(1.0)
    assert res.quality == pytest.approx(
        significance_quality(edges, res.membership), abs=1e-9
    )
    # the planted split must not be beatable by the trivial partitions
    n = res.membership.count()
    singletons = res.membership.select("id", F.col("id").alias("comm"))
    assert res.quality > significance_quality(edges, singletons)


def test_louvain_surprise_ring_of_cliques(spark):
    from communitydetection_jl_spark.operators.objectives import surprise_quality

    edges, truth = fx.ring_of_cliques(spark)
    res = louvain(edges, objective="surprise")
    assert nmi(res.membership, truth) == pytest.approx(1.0)
    assert res.quality == pytest.approx(
        surprise_quality(edges, res.membership), abs=1e-9
    )
    assert res.quality > 0


def test_louvain_rber_ring_of_cliques(spark):
    from communitydetection_jl_spark.operators.objectives import rber_quality

    edges, truth = fx.ring_of_cliques(spark)
    res = louvain(edges, objective="rber", gamma=1.0)
    assert nmi(res.membership, truth) == pytest.approx(1.0)
    assert res.quality == pytest.approx(
        rber_quality(edges, res.membership, gamma=1.0), abs=1e-9
    )


def test_louvain_setbased_distributed_path(spark):
    """Force the distributed set-based sweep (_move_sweep_set) with
    local_threshold=0; it must still recover the planted cliques."""
    edges, truth = fx.ring_of_cliques(spark)
    res = louvain(edges, objective="significance", local_threshold=0,
                  max_sweeps=40)
    assert nmi(res.membership, truth) == pytest.approx(1.0)

    res2 = louvain(edges, objective="surprise", local_threshold=0,
                   max_sweeps=40)
    assert nmi(res2.membership, truth) == pytest.approx(1.0)


def test_find_partition_outer_loop(spark):
    """find_partition (src/Optimiser.jl:135-144): repeated re-
    optimization of the collapsed graph must never lose quality vs a
    single louvain pass, and must terminate."""
    from communitydetection_jl_spark.operators.louvain import find_partition

    edges, _ = fx.karate(spark)
    single = louvain(edges)
    rep = find_partition(edges, max_rounds=4)
    assert rep.quality >= single.quality - 1e-12
    assert rep.quality > 0.40
    rq = rep.history[-1]["round_quality"]
    assert all(b >= a - 1e-12 for a, b in zip(rq, rq[1:]))


def test_find_partition_setbased_base_scalars(spark):
    """find_partition rounds >=2 on a density-null objective must keep
    optimizing the BASE graph's null model: collapsed re-optimization
    carries base density/n/m and count-carrying collapsed weights
    (threaded via louvain(base_scalars=...)), so round quality — always
    rescored on the original graph — never decreases and never loses to
    a single pass."""
    from communitydetection_jl_spark.operators.louvain import find_partition

    edges, truth = fx.ring_of_cliques(spark)
    for objective in ("surprise", "significance"):
        single = louvain(edges, objective=objective, max_sweeps=40)
        rep = find_partition(edges, objective=objective, max_rounds=3,
                             max_sweeps=40)
        assert rep.quality >= single.quality - 1e-9, objective
        rq = rep.history[-1]["round_quality"]
        assert all(b >= a - 1e-9 for a, b in zip(rq, rq[1:])), objective


def test_louvain_record_quality(spark):
    """record_quality=True stamps each distributed level with the
    objective value of the composed membership (hlpa_record_Q ledger
    analogue)."""
    edges, truth = fx.ring_of_cliques(spark)
    res = louvain(edges, local_threshold=0, record_quality=True, max_sweeps=40)
    qs = [h["Q"] for h in res.history if "Q" in h]
    assert qs, "expected per-level Q entries"
    assert qs[-1] == pytest.approx(res.quality, abs=1e-9)


def test_lpa_tables_csr_matches_dir(spark):
    """tables mode (CSR speaker arrays + bucketed state) must produce
    exactly the labels of the plain dir mode."""
    edges, _ = fx.ring_of_cliques(spark)
    a = {(r.id, r.comm) for r in lpa(edges, max_iter=15, mode="dir").labels.collect()}
    b = {(r.id, r.comm) for r in lpa(edges, max_iter=15, mode="tables").labels.collect()}
    assert a == b


def test_hlpa_record_quality(spark):
    """hlpa(record_quality=True): per-level modularity of the composed
    membership rides in the history (hlpa_record_Q ledger analogue)."""
    edges, truth = fx.ring_of_cliques(spark)
    res = hlpa(edges, record_quality=True)
    qs = [h["Q"] for h in res.history if "Q" in h]
    assert qs
    assert qs[-1] == pytest.approx(modularity(edges, res.membership), abs=1e-9)
    assert nmi(res.membership, truth) == pytest.approx(1.0)


def test_lpa_delta_counts_exact(spark):
    """The incremental (delta-counts) superstep is EXACTLY equivalent
    to full re-aggregation: identical per-superstep mover counts and
    identical final labels, with the counts path forced to engage from
    superstep 2 (delta_msgs_frac > 1 covers the Σ(deg+1)+wants bound
    even when every vertex moves)."""
    for fixture, name in ((fx.ring_of_cliques, "rc"), (fx.gn, "gn")):
        edges, _ = fixture(spark)
        full = lpa(edges, max_iter=30, mode="tables", delta=False,
                   state_name=f"lpa_nd_{name}")
        dl = lpa(edges, max_iter=30, mode="tables", delta=True,
                 delta_msgs_frac=3.0, state_name=f"lpa_dl_{name}")
        assert dl.delta_from is not None and dl.delta_from <= 3, name
        assert full.changed_history == dl.changed_history, name
        a = {(r.id, r.comm) for r in full.labels.collect()}
        b = {(r.id, r.comm) for r in dl.labels.collect()}
        assert a == b, name


def test_lpa_delta_shuffle_join_exact(spark):
    """The above-broadcast-cap delta path (movers shipped through a
    bucketed hash(dst, P) shuffle join instead of a driver broadcast)
    is the SAME counts-table semantics: with delta_bcast_max=0 every
    incremental superstep is forced through the shuffle join, and the
    run must still match the full re-aggregation mover-for-mover and
    label-for-label. This is the 100×-scale regime (sustained
    multi-million-mover supersteps) exercised at test scale."""
    for fixture, name in ((fx.ring_of_cliques, "rc"), (fx.gn, "gn")):
        edges, _ = fixture(spark)
        full = lpa(edges, max_iter=30, mode="tables", delta=False,
                   state_name=f"lpa_nds_{name}")
        dl = lpa(edges, max_iter=30, mode="tables", delta=True,
                 delta_msgs_frac=3.0, delta_bcast_max=0,
                 state_name=f"lpa_dls_{name}")
        assert dl.delta_from is not None and dl.delta_from <= 3, name
        assert full.changed_history == dl.changed_history, name
        a = {(r.id, r.comm) for r in full.labels.collect()}
        b = {(r.id, r.comm) for r in dl.labels.collect()}
        assert a == b, name


def test_lpa_id_shift_invariance(spark):
    """LPA must be invariant to the absolute magnitude of vertex ids
    (64-bit ids are first-class; tie-breaks depend only on relative
    order): the SAME graph with every id shifted past 2^31 must yield
    the identical labeling under the shift, with identical
    per-superstep mover counts."""
    off = (1 << 31) + 2  # even: keeps pmod(id, 2) parity shift-invariant
    par = F.pmod(F.col("id"), F.lit(2))
    for mode in ("dir", "tables"):
        edges, _ = fx.ring_of_cliques(spark)
        packed = lpa(edges, max_iter=30, mode=mode, renumber=False,
                     parity_expr=par, state_name=f"lpa_pk_{mode}")
        shifted = edges.selectExpr(
            f"cast(src + {off} as bigint) as src",
            f"cast(dst + {off} as bigint) as dst")
        unpacked = lpa(shifted, max_iter=30, mode=mode, renumber=False,
                       parity_expr=par, state_name=f"lpa_upk_{mode}")
        assert packed.changed_history == unpacked.changed_history, mode
        a = {(r.id, r.comm) for r in packed.labels.collect()}
        b = {(r.id - off, r.comm - off) for r in unpacked.labels.collect()}
        assert a == b, mode


def test_lpa_strategy_invariance(spark):
    """Execution strategy must never change the answer: the semi-sync
    active-parity listener filter, the two-superstep (changed|prevch)
    broadcast frontier, and the delta-counts path are all pure
    execution choices over the same semantics. Four configurations —
    plain dir mode, tables with frontier+delta disabled, tables with a
    force-engaged frontier, tables with force-engaged delta — must
    produce identical per-superstep mover counts and identical final
    labels."""
    for fixture, name in ((fx.ring_of_cliques, "rc"), (fx.gn, "gn")):
        edges, _ = fixture(spark)
        runs = {
            "dir": lpa(edges, max_iter=30, mode="dir",
                       state_name=f"lpa_si_dir_{name}"),
            "bare": lpa(edges, max_iter=30, mode="tables", frontier=False,
                        delta=False, state_name=f"lpa_si_bare_{name}"),
            "frontier": lpa(edges, max_iter=30, mode="tables", delta=False,
                            frontier_max=10**9,
                            state_name=f"lpa_si_fr_{name}"),
            "delta": lpa(edges, max_iter=30, mode="tables",
                         delta_msgs_frac=3.0,
                         state_name=f"lpa_si_dl_{name}"),
        }
        hist = {k: r.changed_history for k, r in runs.items()}
        assert hist["dir"] == hist["bare"] == hist["frontier"] == hist["delta"], (
            name, hist)
        labels = {
            k: {(r.id, r.comm) for r in v.labels.collect()}
            for k, v in runs.items()
        }
        assert labels["dir"] == labels["bare"] == labels["frontier"] == labels["delta"], name


def test_louvain_gain_floor_stop(spark):
    """gain_floor — the distributed analogue of the reference's
    per-pass improvement threshold (src/Optimiser.jl:135-148): a sweep
    whose summed accepted gain is <= gain_floor*m counts as quiet, and
    two consecutive quiet sweeps (both parities) end the level.

    (a) a prohibitively high floor makes EVERY sweep quiet, so every
        distributed level must stop after exactly two sweeps;
    (b) the default floor (1e-4) only trims oscillation tails — on a
        structured graph it must converge to the same quality and the
        planted partition as gain_floor=None."""
    edges, truth = fx.ring_of_cliques(spark)

    hi = louvain(edges, local_threshold=0, gain_floor=1e9, max_sweeps=40)
    dist = [h for h in hi.history if h.get("mode") == "distributed"]
    assert dist, "expected distributed levels"
    assert all(h["sweeps"] == 2 for h in dist)

    on = louvain(edges, local_threshold=0, max_sweeps=40)
    off = louvain(edges, local_threshold=0, gain_floor=None, max_sweeps=40)
    assert on.quality == pytest.approx(off.quality, abs=1e-6)
    assert nmi(on.membership, truth) == pytest.approx(1.0)


def test_lpa_first_superstep_fastpath(spark):
    """The identity-init first superstep reduces to one min-neighbor
    aggregation when the symmetrized (listener, speaker) pairs are
    duplicate-free — gated by the exact dup metric observed on the CSR
    build. Three shapes pin the gate and the semantics:

    (a) clean canonical graph: fast path engages (first_superstep_fast)
        and the full run matches dir mode exactly (covered broadly by
        test_lpa_tables_csr_matches_dir; re-asserted here with the flag);
    (b) mutual directed pair (both (u,v) and (v,u) in the input): the
        symmetrized view holds the pair twice -> dup mass 20% of
        messages, far above the 2% engage bound -> fast path must NOT
        engage, and labels still match dir mode;
    (c) self-loops: a self-loop is a real vote for the vertex's own
        label (cnt 1, sticky cur=true) and must win against a cnt-1
        neighbor vote under the (cnt, cur, -lbl) tie-break;
    (d) a large clean graph plus ONE duplicated pair (dup mass under
        the bound): the fast path engages WITH the dup-correction
        branch, whose cnt-2 candidate must beat smaller-id cnt-1
        neighbors — exactly where a bare min-neighbor plan would
        diverge from the general gather."""
    # (a) clean graph
    edges, _ = fx.ring_of_cliques(spark)
    fast = lpa(edges, max_iter=15, mode="tables", state_name="lpa_fp_a")
    assert fast.first_superstep_fast is True
    ref = lpa(edges, max_iter=15, mode="dir", state_name="lpa_fp_a_d")
    assert {(r.id, r.comm) for r in fast.labels.collect()} == {
        (r.id, r.comm) for r in ref.labels.collect()
    }

    # (b) mutual pair -> duplicate sym rows -> fallback, same answer
    rows = [(1, 2), (2, 1), (2, 3), (3, 4), (4, 1)]
    dup_edges = spark.createDataFrame(rows, "src long, dst long")
    dup = lpa(dup_edges, max_iter=10, mode="tables", state_name="lpa_fp_b")
    assert dup.first_superstep_fast is False
    dref = lpa(dup_edges, max_iter=10, mode="dir", state_name="lpa_fp_b_d")
    assert {(r.id, r.comm) for r in dup.labels.collect()} == {
        (r.id, r.comm) for r in dref.labels.collect()
    }

    # (c) self-loops: fast path engages (a self-loop is one sym row),
    # answers match dir mode; isolated-from-others vertex keeps itself
    rows = [(1, 1), (1, 2), (3, 4), (5, 5)]
    sl_edges = spark.createDataFrame(rows, "src long, dst long")
    sl = lpa(sl_edges, max_iter=10, mode="tables", state_name="lpa_fp_c")
    assert sl.first_superstep_fast is True
    sref = lpa(sl_edges, max_iter=10, mode="dir", state_name="lpa_fp_c_d")
    assert {(r.id, r.comm) for r in sl.labels.collect()} == {
        (r.id, r.comm) for r in sref.labels.collect()
    }

    # (d) sparse duplicates: clique ring + one reversed existing edge
    # (the canonical fixture stores each undirected edge once, so the
    # reverse row duplicates its sym pair); dup mass 2 of ~370 msgs
    # engages the fast path with the dup-correction candidates live
    base_edges, _ = fx.ring_of_cliques(spark)
    one = base_edges.limit(1).select(
        F.col("dst").alias("src"), F.col("src").alias("dst"), "weight")
    mix = base_edges.unionByName(one)
    dd = lpa(mix, max_iter=15, mode="tables", state_name="lpa_fp_d")
    assert dd.first_superstep_fast is True
    ddref = lpa(mix, max_iter=15, mode="dir", state_name="lpa_fp_d_d")
    # per-superstep mover counts pin superstep-1 equality itself, not
    # just the (convergence-forgiving) final labels
    assert dd.changed_history == ddref.changed_history
    assert {(r.id, r.comm) for r in dd.labels.collect()} == {
        (r.id, r.comm) for r in ddref.labels.collect()
    }
