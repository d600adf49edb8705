"""Shard-local asynchronous LPA — the applyInPandas fidelity mode.

The reference's LPA is asynchronous: a shuffled sequential sweep where
later vertices see earlier moves (src/label_propagation.jl:98-116).
The BSP engine (operators/lpa.py) replaces that with semi-synchronous
supersteps; this module provides the async-equivalent mode promised in
SURVEY.md §7.3: hash-partition the adjacency into shards, run the
reference's sequential sweep *inside each shard* with a derived seed
(grouped-map pandas UDF over Arrow batches), then exchange boundary
labels and repeat. Within a shard the semantics are exactly the
reference's; across shards it is bulk-synchronous — the documented
semantic difference.

Each global round:
  1. adjacency edges grouped by shard(listener) — applyInPandas runs a
     seeded async sweep over the shard's internal vertices, votes from
     both internal and boundary neighbors;
  2. updated labels are unioned and fed to the next round;
  3. converged when no label changes in a round.
"""

from __future__ import annotations

from collections import Counter, defaultdict
from dataclasses import dataclass, field

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.graph import materialize_iter, symmetrize, vertices_of, with_weight
from .lpa import permute_labels


@dataclass
class AsyncLPAResult:
    labels: DataFrame
    rounds: int
    changed_history: list = field(default_factory=list)


def _sweep_shard(
    pdf: pd.DataFrame, seed: int, rnd: int, deterministic: bool = False
) -> pd.DataFrame:
    """Reference-semantics async sweep over one shard.

    pdf columns: shard, src, dst, vote, src_lbl, dst_lbl. Vertices owned
    by the shard are the src side; dst labels are frozen snapshots for
    boundary neighbors but live for internal ones.

    ``deterministic=True`` replaces the reference's shuffled order /
    random tie-break with ascending-id order and smallest-label ties —
    semantically still an async sweep, but replayable micro-step by
    micro-step in the driver's recursive-CTE oracle."""
    shard = int(pdf["shard"].iloc[0])
    rng = np.random.default_rng((seed * 1_000_003 + shard) * 31 + rnd)
    labels: dict = {}
    adj = defaultdict(list)
    for s, d, v, sl, dl in zip(pdf["src"], pdf["dst"], pdf["vote"],
                               pdf["src_lbl"], pdf["dst_lbl"]):
        labels.setdefault(s, sl)
        if d not in labels:
            labels[d] = dl  # boundary snapshot (may be overwritten if internal)
        adj[s].append((d, v))
    internal = sorted(set(pdf["src"]))
    order = list(internal)
    if not deterministic:
        rng.shuffle(order)
    changed = []
    for u in order:
        cnt = Counter()
        for v, w in adj[u]:
            cnt[labels[v]] += w
        if not cnt:
            continue
        max_cnt = max(cnt.values())
        # reference: random scan over labels, strictly-greater wins →
        # uniform choice among maxima (src/label_propagation.jl:31-52)
        maxima = sorted(l for l, c in cnt.items() if c == max_cnt)
        if deterministic or len(maxima) == 1:
            new = maxima[0]
        else:
            new = maxima[rng.integers(len(maxima))]
        if new != labels[u]:
            labels[u] = new
            changed.append(u)
    return pd.DataFrame(
        {
            "id": internal,
            "lbl": [int(labels[u]) for u in internal],
            "changed": [u in set(changed) for u in internal],
        }
    )


def lpa_async(
    edges: DataFrame,
    n_shards: int = 32,
    max_rounds: int = 50,
    seed: int = 42,
    renumber: bool = True,
    weighted: bool = False,
    ledger=None,
    deterministic: bool = False,
    shard_expr=None,
) -> AsyncLPAResult:
    """Asynchronous-within-shard LPA to fixpoint.

    ``deterministic=True`` + ``shard_expr`` (e.g. ``pmod(id, n)`` —
    portable, unlike the default xxhash64) makes every micro-step of
    every round a pure function of the data, so the driver's SQL
    oracle replays the run exactly (shards advance in lockstep: within
    a round they never interact — boundary labels are frozen at round
    start — so 'the t-th vertex of each shard' is a well-defined
    global micro-step)."""
    e = with_weight(edges)
    sym = symmetrize(e).select(
        "src", "dst", (F.col("weight") if weighted else F.lit(1.0)).alias("vote")
    ).persist()
    sym.count()
    verts = vertices_of(e)
    state = materialize_iter(verts.select("id", F.col("id").alias("lbl")))
    labels = state

    schema = "id long, lbl long, changed boolean"
    changed_history: list[int] = []
    rnd = 0
    while rnd < max_rounds:
        rnd += 1
        cur_round = rnd
        shard_col = (
            shard_expr(F.col("src")) if shard_expr is not None
            else F.pmod(F.xxhash64("src"), F.lit(n_shards))
        )
        shard_edges = (
            sym.withColumn("shard", shard_col)
            .join(labels.select(F.col("id").alias("src"), F.col("lbl").alias("src_lbl")), "src")
            .join(labels.select(F.col("id").alias("dst"), F.col("lbl").alias("dst_lbl")), "dst")
        )
        def sweep(pdf: pd.DataFrame, _s=seed, _r=cur_round, _d=deterministic):
            return _sweep_shard(pdf, _s, _r, _d)

        # applyInPandas requires a 1-arg (data) signature; bind seed/round
        # via a wrapper
        def sweep1(pdf: pd.DataFrame) -> pd.DataFrame:
            return sweep(pdf)

        new_labels = shard_edges.groupBy("shard").applyInPandas(sweep1, schema)
        # vertices with no edges keep their label
        isolated = labels.join(new_labels.select("id"), "id", "left_anti").select(
            "id", "lbl", F.lit(False).alias("changed")
        )
        new_state = materialize_iter(new_labels.unionByName(isolated), prev=state)
        state = new_state
        n_changed = new_state.filter(F.col("changed")).count()
        labels = new_state.select("id", "lbl")
        changed_history.append(n_changed)
        if ledger is not None:
            ledger.record(rnd, {"changed": n_changed})
            ledger.maybe_snapshot("labels_async", rnd, labels)
        if n_changed == 0:
            break

    sym.unpersist()
    out = labels.withColumnRenamed("lbl", "comm")
    if renumber:
        out = permute_labels(out)
    return AsyncLPAResult(out, rnd, changed_history)
