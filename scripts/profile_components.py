"""Targeted A/B bed for connected_components at bench-corpus scale.

Builds the SAME web graph as bench.py (synthetic corpus, seed 42,
BENCH_REPLICAS disjoint copies, dense int32 ids, parquet round-trip)
and times only connected_components, printing per-round wall seconds
from the StateLoop timings — so a star-plan change is measurable in
~2 min instead of a full 12-min suite run.

Env (defaults match bench.py): BENCH_PAGES, BENCH_OUTLINKS,
BENCH_REPLICAS, SPARK_GRAFT_CPUS, BENCH_MODE, SPARK_GRAFT_STATE_PARTS.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from communitydetection_jl_spark.session import get_spark


def build_edges(spark, cpus: int, n_pages: int, outlinks: float, replicas: int):
    from communitydetection_jl_spark.functions.ids import densify_edges
    from communitydetection_jl_spark.sources.pages import (
        extract_edges,
        latest_captures,
        restrict_to_corpus,
        synth_pages,
        url_dim,
    )

    pages = synth_pages(
        spark, n_pages=n_pages, n_hosts=max(64, n_pages // 100),
        avg_outlinks=outlinks,
    )
    dim = url_dim(latest_captures(pages))
    e = restrict_to_corpus(extract_edges(pages), dim)
    if replicas > 1:
        e = e.localCheckpoint(eager=True)
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
    e, _ = densify_edges(e)
    import tempfile

    from communitydetection_jl_spark.functions.scratch import register

    base_dir = os.environ.get("SPARK_GRAFT_STATE_DIR") or tempfile.gettempdir()
    epath = os.path.join(base_dir, f"cc_prof_edges_{os.getpid()}")
    register(epath)
    e.repartition(cpus, "src").write.mode("overwrite").parquet(epath)
    spark.catalog.clearCache()
    return spark.read.parquet(epath)


def main() -> None:
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    n_pages = int(os.environ.get("BENCH_PAGES", "200000"))
    outlinks = float(os.environ.get("BENCH_OUTLINKS", "16"))
    replicas = int(os.environ.get("BENCH_REPLICAS", "128"))
    mode = os.environ.get("BENCH_MODE", "tables")
    if os.path.isdir("/dev/shm"):
        os.environ.setdefault("SPARK_GRAFT_LOCAL_DIR", "/dev/shm/spark-local")
        os.environ.setdefault("SPARK_GRAFT_WAREHOUSE", "/dev/shm/spark-warehouse")
        os.environ.setdefault("SPARK_GRAFT_STATE_DIR", "/dev/shm")

    spark = get_spark("cc-profile", cores=cpus, shuffle_partitions=cpus)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")

    t0 = time.time()
    edges = build_edges(spark, cpus, n_pages, outlinks, replicas)
    m = edges.count()
    t_build = time.time() - t0

    # instrument per-round seconds via the StateLoop's own timings
    import communitydetection_jl_spark.operators.components as C

    loops = []
    orig = C.StateLoop

    class SpyLoop(orig):
        def __init__(self, *a, **k):
            super().__init__(*a, **k)
            loops.append(self)

    C.StateLoop = SpyLoop
    try:
        t0 = time.time()
        n_out = C.connected_components(edges, mode=mode).count()
        t_cc = time.time() - t0
    finally:
        C.StateLoop = orig

    rounds = [round(s, 2) for s in (loops[0].timings if loops else [])]
    print(json.dumps({
        "edges": m,
        "vertices": n_out,
        "build_sec": round(t_build, 1),
        "cc_sec": round(t_cc, 1),
        "rounds": len(rounds),
        "round_seconds": rounds,
        "mode": mode,
        "cpus": cpus,
    }))


if __name__ == "__main__":
    main()
