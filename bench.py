"""Benchmark harness — prints ONE JSON line with per-query seconds.

Headline workload (the north-rule metric): PageRank to 1e-6 and LPA to
convergence over a link graph derived from the synthetic web-page
corpus (hub-skewed, seed=42), reported as edges/sec per superstep.
Plus the operator suite over the driver testdata at $SPARK_GRAFT_SF_DIR.

Env:
  SPARK_GRAFT_SF_DIR   default /root/testdata/sf0.1
  SPARK_GRAFT_CPUS     default 32
  BENCH_PAGES          default 200000 (pages in the synthetic corpus —
                       the BENCH/BASELINE.md corpus, so per-round
                       numbers are comparable to the baseline; with
                       BENCH_REPLICAS=128 supersteps run far above the
                       fixed per-iteration overhead floor)

Scaling-efficiency measurement (N vs 4N cores on the same input)
lives in scripts/scaling_bench.py which shells out to this file.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F

from communitydetection_jl_spark.session import get_spark


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    if os.path.isdir("/dev/shm"):
        # RAM-backed shuffle/state on a RAM-rich box — the same config
        # scaling_bench pins; atexit purge (functions/scratch.py +
        # bench epath registration) keeps tmpfs clean afterwards
        os.environ.setdefault("SPARK_GRAFT_LOCAL_DIR", "/dev/shm/spark-local")
        os.environ.setdefault("SPARK_GRAFT_WAREHOUSE", "/dev/shm/spark-warehouse")
        os.environ.setdefault("SPARK_GRAFT_STATE_DIR", "/dev/shm")
    n_pages = int(os.environ.get("BENCH_PAGES", "200000"))
    outlinks = float(os.environ.get("BENCH_OUTLINKS", "16"))
    sf = sf_dir.rstrip("/").split("sf")[-1]

    t_start = time.time()
    spark = get_spark("linkgraph-bench", cores=cpus, shuffle_partitions=cpus)
    # graph-build plans sit on checkpointed/unioned leaves whose size
    # estimates are unreliable; never let Catalyst auto-broadcast a
    # mis-estimated big side (explicit F.broadcast hints still apply)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")

    from __spark_entry__ import _orders_edges, _part_edges
    from communitydetection_jl_spark.operators.components import connected_components
    from communitydetection_jl_spark.operators.dedup import minhash_lsh_pairs
    from communitydetection_jl_spark.operators.louvain import louvain
    from communitydetection_jl_spark.operators.lpa import lpa
    from communitydetection_jl_spark.operators.pagerank import pagerank
    from communitydetection_jl_spark.operators.triangles import edge_common_neighbors
    from communitydetection_jl_spark.sources.pages import (
        extract_edges,
        latest_captures,
        restrict_to_corpus,
        synth_pages,
        url_dim,
    )

    queries: dict[str, float] = {}
    extras: dict[str, float] = {}
    # Self-certifying record: every suite query runs BENCH_REPEATS times
    # (default 2 — min-of-2 with the first run as warm-up). The headline
    # per-query number is the MIN across runs (the achievable time absent
    # box-level noise — the round-4 record attributed ±30% deltas to host
    # jitter that a single-run JSON could not distinguish from real
    # regressions); all raw runs + the median ride in extras so a delta
    # is readable from this file alone. BENCH_REPEATS=1 restores
    # single-run mode (scaling legs use it: their metric is the
    # superstep-level median, already a within-run repeat).
    repeats = max(1, int(os.environ.get("BENCH_REPEATS", "2")))
    extras["bench_repeats"] = repeats
    run_log: dict[str, list] = {}
    extras["query_runs"] = run_log

    def timed(name, fn):
        best = None
        best_dt = None
        for r in range(repeats):
            print(f"[bench] {name} (run {r + 1}/{repeats}) ...",
                  file=sys.stderr, flush=True)
            t0 = time.time()
            out = fn()
            dt = time.time() - t0
            run_log.setdefault(name, []).append(round(dt, 3))
            print(f"[bench] {name}: {dt:.1f}s", file=sys.stderr, flush=True)
            if best_dt is None or dt < best_dt:
                best, best_dt = out, dt
        queries[name] = round(best_dt, 3)
        return best

    # ---- headline: web link graph -------------------------------------
    replicas = int(os.environ.get("BENCH_REPLICAS", "128"))
    # "tables" = bucketed arc/state tables, zero-exchange superstep joins
    bench_mode = os.environ.get("BENCH_MODE", "tables")

    # BENCH_FUSED=1 (default): densify the ~m/replicas BASE (cheap),
    # replicate with DENSE id offsets (nid + k·n_base, pure int
    # arithmetic over a cached 1.3M-row frame) — the old path
    # (BENCH_FUSED=0) instead densified AFTER replication, two
    # shuffle-hash joins of the full 163M-row table (measured: fused
    # extract 21-31s vs 65-120s). The replicated union is still
    # written through parquet ONCE: an A/B that handed the lazy
    # 128-way union straight to the operators measured extract 21s
    # but moved 40-120s INTO every op's CSR build (csr_adjacency
    # evaluates its input twice — broadcast hub-list subquery + main
    # grouping — and three ops consume the same graph, so the union
    # was re-evaluated ~6×, uncached to keep the block manager clean
    # for the superstep loop). One columnar write + three cheap leaf
    # scans beats six union evaluations; at a real deployment the
    # extraction output would be a bucketed Iceberg/parquet table for
    # exactly this reason. Graph identical up to the dense-id
    # bijection (same arc count/degree distribution; oracle rows
    # unchanged — LPA tie-breaks see different ids, so mover
    # trajectories differ from the pre-fused records in r1-r4).
    fused = os.environ.get("BENCH_FUSED", "1") != "0"

    def build_web_graph():
        from communitydetection_jl_spark.functions.ids import densify_edges

        pages = synth_pages(spark, n_pages=n_pages, n_hosts=max(64, n_pages // 100),
                            avg_outlinks=outlinks)
        dim = url_dim(latest_captures(pages))
        e = restrict_to_corpus(extract_edges(pages), dim)
        if fused:
            # dense int32 ids on the BASE, then offset-replicate
            e, edim = densify_edges(e)
            e = e.localCheckpoint(eager=True)
            base_m = e.count()
            n_base = int(edim.count())
            edim.unpersist()
            if replicas > 1:
                copies = [
                    e.select(
                        (F.col("src") + F.lit(k * n_base)).alias("src"),
                        (F.col("dst") + F.lit(k * n_base)).alias("dst"),
                        "weight",
                    )
                    for k in range(replicas)
                ]
                out = copies[0]
                for c in copies[1:]:
                    out = out.unionByName(c)
                e = out
            # ONE materialization of the replicated graph (see the
            # BENCH_FUSED note above), then drop the cached base so
            # the superstep loops start with a clean block manager
            import tempfile

            from communitydetection_jl_spark.functions.scratch import register
            sdir = os.environ.get("SPARK_GRAFT_STATE_DIR") or tempfile.gettempdir()
            epath = os.path.join(sdir, f"bench_edges_{os.getpid()}")
            register(epath)
            e.repartition(cpus, "src").write.mode("overwrite").parquet(epath)
            spark.catalog.clearCache()
            e = spark.read.parquet(epath)
            return e, base_m * max(replicas, 1)
        if replicas > 1:
            # disjoint structural copies (vertex-id offset) — scales the
            # superstep workload without scaling python-side corpus
            # generation; identical across parallelism levels
            e = e.localCheckpoint(eager=True)  # materialize extraction once
            # fold ids into 2^40 space first so the offset can't overflow
            # an ANSI-mode long
            base = e.select(
                F.pmod(F.col("src"), F.lit(1 << 40)).alias("src"),
                F.pmod(F.col("dst"), F.lit(1 << 40)).alias("dst"),
                "weight",
            )
            copies = [
                base.select(
                    (F.col("src") + F.lit(k << 44)).alias("src"),
                    (F.col("dst") + F.lit(k << 44)).alias("dst"),
                    "weight",
                )
                for k in range(replicas)
            ]
            out = copies[0]
            for c in copies[1:]:
                out = out.unionByName(c)
            e = out
        # dense int32 ids: halves state/shuffle row width (SURVEY.md §4.3)
        e, _ = densify_edges(e)
        # parquet round-trip: materialize AND truncate the extraction
        # plan (a leaf relation with real file stats); localCheckpoint
        # at this width holds ~m deserialized rows in the block manager
        import tempfile

        from communitydetection_jl_spark.functions.scratch import register
        base = os.environ.get("SPARK_GRAFT_STATE_DIR") or tempfile.gettempdir()
        epath = os.path.join(base, f"bench_edges_{os.getpid()}")
        register(epath)  # purge at exit — RAM-backed when STATE_DIR=/dev/shm
        e.repartition(cpus, "src").write.mode("overwrite").parquet(epath)
        # drop ALL construction residue (densify's persisted dim, cached
        # frames) before the measured supersteps: a few GB of tenured
        # block-manager data taxes every GC of the superstep loop
        # (measured: +50% on the 16-core PageRank superstep median)
        spark.catalog.clearCache()
        e = spark.read.parquet(epath)
        return e, e.count()

    def _median(xs):
        xs = sorted(xs)
        if not xs:
            return float("nan")
        mid = len(xs) // 2
        return xs[mid] if len(xs) % 2 else (xs[mid - 1] + xs[mid]) / 2.0

    web_edges, web_m = timed("web_extract_edges", build_web_graph)
    extras["web_edges"] = web_m

    # BENCH_SKIP (comma list): scaling legs / focused probes drop
    # queries that feed no metric they read
    skip = {
        s.strip() for s in os.environ.get("BENCH_SKIP", "").split(",") if s.strip()
    }

    pr_max = int(os.environ.get("BENCH_PR_MAX_ITER", "100"))
    # 15 supersteps give a stable steady-state median at baseline-corpus
    # scale without doubling the suite wall time (LPA converges slowly
    # on the replicated corpus; throughput is the metric, not the tail)
    lpa_max = int(os.environ.get("BENCH_LPA_MAX_ITER", "15"))
    if "web_pagerank" not in skip:
        pr_res = timed("web_pagerank", lambda: pagerank(
            web_edges, tol=1e-6, max_iter=pr_max, mode=bench_mode))
        extras["web_pagerank_iters"] = pr_res.iterations
        extras["pagerank_edges_per_sec_per_superstep"] = round(
            web_m * pr_res.iterations / max(queries["web_pagerank"], 1e-9), 1
        )
        # steady-state throughput: median superstep wall time (robust to
        # the first-iteration JIT warmup and box-level noise)
        extras["pagerank_superstep_median_sec"] = round(
            _median(pr_res.iter_seconds), 3)
        extras["pagerank_edges_per_sec_steady"] = round(
            web_m / max(_median(pr_res.iter_seconds), 1e-9), 1
        )
        # full distribution + min ("steady-state floor": the achievable
        # superstep absent box-level noise spikes) as scaling evidence
        extras["pagerank_iter_seconds"] = [
            round(s, 2) for s in pr_res.iter_seconds]
        extras["pagerank_superstep_min_sec"] = round(
            min(pr_res.iter_seconds), 3)

    if "web_lpa" not in skip:
        lpa_res = timed("web_lpa", lambda: lpa(
            web_edges, max_iter=lpa_max, mode=bench_mode))
        extras["web_lpa_iters"] = lpa_res.iterations
        # LPA gathers over the symmetrized view: 2m edge-messages per
        # superstep
        extras["lpa_edges_per_sec_per_superstep"] = round(
            2 * web_m * lpa_res.iterations / max(queries["web_lpa"], 1e-9), 1
        )
        # steady-state throughput MUST read full-gather supersteps only:
        # once the incremental (delta-counts) path engages, a superstep
        # processes O(changed_edges + counts) — not 2m — so dividing 2m
        # by a delta superstep's seconds overstates throughput, and the
        # late tiny delta supersteps are fixed-overhead-bound (their min
        # says nothing about how the gather kernel scales with cores)
        full_iters = (
            lpa_res.iter_seconds[: lpa_res.delta_from - 1]
            if lpa_res.delta_from
            else lpa_res.iter_seconds
        ) or lpa_res.iter_seconds
        extras["lpa_superstep_median_sec"] = round(_median(full_iters), 3)
        extras["lpa_edges_per_sec_steady"] = round(
            2 * web_m / max(_median(full_iters), 1e-9), 1
        )
        extras["lpa_iter_seconds"] = [round(s, 2) for s in lpa_res.iter_seconds]
        extras["lpa_superstep_min_sec"] = round(min(full_iters), 3)
        extras["lpa_changed_history"] = lpa_res.changed_history
        extras["lpa_delta_from"] = lpa_res.delta_from

    # (web_components costs ~15 min on a pinned 2-core scaling leg
    # while feeding no scaling metric — legs skip it via BENCH_SKIP)
    if "web_components" not in skip:
        timed("web_components", lambda: connected_components(
            web_edges, mode=bench_mode).count())

    def _emit():
        extras["queries_median"] = {
            k: round(_median(v), 3) for k, v in run_log.items()
        }
        extras["wall_seconds"] = round(time.time() - t_start, 3)
        total = round(sum(queries.values()), 3)
        print(json.dumps({
            "metric": "bench_suite_seconds", "value": total, "unit": "sec",
            "queries": queries, "sf": sf, "cpus": cpus, "extras": extras,
        }))
        _register_warehouse_residue()

    if os.environ.get("BENCH_ONLY") == "web":
        _emit()
        return

    # ---- operator suite over driver testdata ---------------------------
    part_edges = _part_edges(spark, sf_dir).localCheckpoint(eager=True)
    pm = part_edges.count()
    extras["part_edges"] = pm

    timed("part_triangle_cn", lambda: edge_common_neighbors(part_edges)
          .agg(F.sum("cn")).collect())
    timed("part_lpa", lambda: lpa(part_edges, max_iter=20).labels.count())
    def _run_louvain():
        res = louvain(part_edges, mode=bench_mode)
        res.membership.count()
        return res

    lv_res = timed("part_louvain", _run_louvain)
    # per-level diagnostics (sweeps, per-sweep seconds/moved, parts) —
    # the round-3 +35% regression was invisible without them
    extras["part_louvain_levels"] = lv_res.history
    timed("orders_pagerank", lambda: pagerank(
        _orders_edges(spark, sf_dir), tol=1e-6, max_iter=50).ranks.count())
    timed("orders_components", lambda: connected_components(
        _orders_edges(spark, sf_dir)).count())

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    timed("docs_minhash_lsh", lambda: minhash_lsh_pairs(docs, threshold=0.7).count())

    _emit()


def _register_warehouse_residue() -> None:
    """Kept-final state tables of THIS bench process (pid-suffixed)
    purge at exit; other processes' tables are untouched."""
    import glob

    from communitydetection_jl_spark.functions.scratch import register
    wh = os.environ.get("SPARK_GRAFT_WAREHOUSE", "")
    if wh and os.path.isdir(wh):
        for p in glob.glob(os.path.join(wh, f"*_{os.getpid()}_*")):
            register(p)


if __name__ == "__main__":
    main()
