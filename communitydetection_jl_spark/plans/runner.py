"""Iterative-run ledger: per-iteration checkpoints + metrics + resume.

The north rule requires every iterative algorithm to checkpoint
per-partition lineage + convergence metrics so runs resume
mid-algorithm. The reference's analogue is the level/record stack of
hlpa_record (src/hlpa.jl:144-200).

Layout under ``root``::

    runs/<run_id>/
        manifest.json            run metadata (algorithm, params, seed)
        metrics.jsonl            one line per iteration: {"iter": k, ...}
        <name>/iter=K/           parquet snapshot of the state DataFrame

Snapshots are plain parquet (partition-preserving, readable by any
executor count); ``load_latest`` returns the newest snapshot so a new
driver process continues from iteration K+1. Algorithms accept a
``ledger=`` parameter and call ``record`` / ``maybe_snapshot`` — see
operators/pagerank.py, operators/lpa.py.
"""

from __future__ import annotations

import json
import os
import re
from datetime import datetime, timezone

from pyspark.sql import DataFrame, SparkSession


class RunLedger:
    def __init__(
        self,
        root: str,
        run_id: str | None = None,
        snapshot_every: int = 5,
        manifest: dict | None = None,
    ):
        self.run_id = run_id or datetime.now(timezone.utc).strftime("%Y%m%dT%H%M%S%f")
        self.dir = os.path.join(root, self.run_id)
        os.makedirs(self.dir, exist_ok=True)
        self.snapshot_every = snapshot_every
        self._metrics_path = os.path.join(self.dir, "metrics.jsonl")
        manifest_path = os.path.join(self.dir, "manifest.json")
        if manifest is not None and not os.path.exists(manifest_path):
            with open(manifest_path, "w") as f:
                json.dump(manifest, f, indent=2, default=str)

    # -- metrics -------------------------------------------------------
    def record(self, iteration: int, metrics: dict) -> None:
        with open(self._metrics_path, "a") as f:
            f.write(json.dumps({"iter": iteration, **metrics}) + "\n")

    def metrics(self) -> list[dict]:
        if not os.path.exists(self._metrics_path):
            return []
        with open(self._metrics_path) as f:
            return [json.loads(line) for line in f if line.strip()]

    # -- snapshots -----------------------------------------------------
    def _snap_dir(self, name: str, iteration: int) -> str:
        return os.path.join(self.dir, name, f"iter={iteration}")

    def maybe_snapshot(self, name: str, iteration: int, df: DataFrame) -> bool:
        if self.snapshot_every <= 0 or iteration % self.snapshot_every != 0:
            return False
        self.snapshot(name, iteration, df)
        return True

    def snapshot(self, name: str, iteration: int, df: DataFrame) -> None:
        df.write.mode("overwrite").parquet(self._snap_dir(name, iteration))

    def load_latest(self, name: str, spark: SparkSession | None = None):
        """Return (iteration, DataFrame) of the newest snapshot, or None."""
        base = os.path.join(self.dir, name)
        if not os.path.isdir(base):
            return None
        iters = []
        for d in os.listdir(base):
            m = re.fullmatch(r"iter=(\d+)", d)
            if m and os.path.exists(os.path.join(base, d, "_SUCCESS")):
                iters.append(int(m.group(1)))
        if not iters:
            return None
        it = max(iters)
        spark = spark or SparkSession.getActiveSession()
        return it, spark.read.parquet(self._snap_dir(name, it))
