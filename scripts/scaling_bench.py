"""Two-parallelism scaling measurement (the sandbox proxy for the north
rule's N vs 4N executor efficiency bar).

Runs bench.py at local[8] and local[32] on the same input, computes
per-core-normalized throughput efficiency of the headline superstep
workloads (PageRank + LPA edges/sec/superstep), and rewrites the
measured section of BENCH/BASELINE.md.

Efficiency definition: eff = (T_small / T_big) / (cores_big/cores_small)
per workload, where T is wall time of the same job — equivalently
(throughput_big / throughput_small) / 4. ≥ 0.8 is the bar.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
from datetime import datetime, timezone

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_bench(cpus: int, sf_dir: str, n_pages: int) -> dict:
    env = dict(os.environ)
    env["SPARK_GRAFT_CPUS"] = str(cpus)
    env["SPARK_GRAFT_SF_DIR"] = sf_dir
    env["BENCH_PAGES"] = str(n_pages)
    env["BENCH_ONLY"] = "web"  # scaling metric = the web-graph superstep workloads
    env.setdefault("SPARK_GRAFT_DRIVER_MEM", "48g")  # local mode: driver = whole JVM
    env.setdefault("SPARK_GRAFT_LOCAL_DIR", "/dev/shm/spark-local")  # RAM shuffle
    env.setdefault("BENCH_PR_MAX_ITER", "10")   # throughput/superstep is the
    env.setdefault("BENCH_LPA_MAX_ITER", "10")  # metric; 10 supersteps suffice
    env.setdefault("BENCH_OUTLINKS", "32")  # densify: supersteps must dominate job overhead
    env.setdefault("BENCH_REPLICAS", "16")  # ~34M-edge workload via disjoint copies
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        capture_output=True, text=True, env=env,
    )
    if out.returncode != 0:
        sys.stderr.write(out.stderr[-8000:])
        raise RuntimeError(f"bench at {cpus} cores failed (rc={out.returncode})")
    line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
    return json.loads(line)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    # big enough that per-superstep work dominates fixed job overhead —
    # otherwise both parallelism levels are overhead-bound and the
    # efficiency ratio measures nothing
    n_pages = int(os.environ.get("BENCH_PAGES", "200000"))
    small_c, big_c = 8, 32
    small = run_bench(small_c, sf_dir, n_pages)
    big = run_bench(big_c, sf_dir, n_pages)

    rows = []
    for key in ("pagerank_edges_per_sec_per_superstep",
                "lpa_edges_per_sec_per_superstep"):
        ts, tb = small["extras"][key], big["extras"][key]
        eff = (tb / ts) / (big_c / small_c)
        rows.append((key, ts, tb, eff))

    report = {
        "sf_dir": sf_dir,
        "n_pages": n_pages,
        "cores": {"small": small_c, "big": big_c},
        "small": small,
        "big": big,
        "scaling_efficiency": {k: round(e, 3) for k, _, _, e in rows},
        "timestamp": datetime.now(timezone.utc).isoformat(),
    }
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "scaling.json"), "w") as f:
        json.dump(report, f, indent=2)

    lines = [
        "# BENCH/BASELINE.md — measured engine numbers",
        "",
        f"Input: synthetic web corpus ({n_pages} pages, seed 42) + driver "
        f"testdata at `{sf_dir}`. Measured {report['timestamp']}.",
        "",
        "## Scaling (sandbox proxy for N → 4N executors)",
        "",
        "| workload | local[8] edges/s/superstep | local[32] edges/s/superstep | efficiency |",
        "|---|---|---|---|",
    ]
    for k, ts, tb, eff in rows:
        lines.append(f"| {k.replace('_edges_per_sec_per_superstep','')} | {ts:,.0f} | {tb:,.0f} | {eff:.3f} |")
    lines += [
        "",
        "Efficiency = (throughput_32 / throughput_8) / 4 — per-core-normalized;",
        "the north-rule bar is ≥ 0.8.",
        "",
        "## Per-query seconds (local[32])",
        "",
        "| query | sec |",
        "|---|---|",
    ]
    for q, s in big["queries"].items():
        lines.append(f"| {q} | {s} |")
    lines += [
        "",
        "Full JSON: `BENCH/scaling.json`.",
        "",
    ]
    with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "w") as f:
        f.write("\n".join(lines))
    print(json.dumps(report["scaling_efficiency"]))


if __name__ == "__main__":
    main()
