"""A/B bed for the distributed Louvain sweep loop.

Round-4 question: part_louvain's level-0 sweeps cost ~2.2s each on a
1.2M-edge / 20k-vertex graph at local[32] — pure per-sweep plan
overhead, since the data is tiny.  Each sweep currently rebuilds the
symmetrized weighted view from the level's edge parquet and shuffles it
into the membership join; materializing sym ONCE per level as a
bucketed side table (the LPA trick, operators/lpa.py:336) should remove
the per-sweep 2m-row exchange and the recompute.

Usage:  python scripts/profile_louvain.py [sweeps] [sf_dir]
Prints one JSON line with per-sweep seconds for the current engine.
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if os.path.isdir("/dev/shm"):
    os.environ.setdefault("SPARK_GRAFT_LOCAL_DIR", "/dev/shm/spark-local")
    os.environ.setdefault("SPARK_GRAFT_WAREHOUSE", "/dev/shm/spark-warehouse")
    os.environ.setdefault("SPARK_GRAFT_STATE_DIR", "/dev/shm")

from communitydetection_jl_spark.session import get_spark


def main() -> None:
    sweeps = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark("louvain-profile", cores=cpus, shuffle_partitions=cpus)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")

    from __spark_entry__ import _part_edges
    from communitydetection_jl_spark.operators.louvain import _distributed_level

    edges = _part_edges(spark, sf_dir).localCheckpoint(eager=True)
    m = edges.count()

    mode = os.environ.get("BENCH_MODE", "tables")
    t0 = time.time()
    memb, info = _distributed_level(edges, eps=1e-7, max_sweeps=sweeps,
                                    mode=mode)
    total = time.time() - t0
    q = memb.select("comm").distinct().count()
    print(json.dumps({
        "edges": m, "sweeps": info["sweeps"], "q": q,
        "level_seconds": round(total, 2),
        "sweep_seconds": info["sweep_seconds"],
        "sweep_moved": info["sweep_moved"],
        "parts": info["parts"],
    }))


if __name__ == "__main__":
    main()
