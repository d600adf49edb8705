"""Connected components via alternating large-star / small-star.

The reference only uses connected components indirectly
(src/kclique_percolation.jl:12, via Graphs.jl); the north rule requires
it as a first-class operator using the large-star/small-star scheme
(Kiveris et al., "Connected Components in MapReduce and Beyond",
SoCC'14 — public algorithm), which converges in O(log n) rounds and is
the standard shuffle-friendly formulation.

State is a pair set P(a, b) with a > b ("node → smaller neighbor").

  large-star: for every node u over the symmetric neighbor view,
      m = min(N(u) ∪ {u}); emit (v, m) for v ∈ N(u), v > u.
  small-star: group P by a: m = min(b); emit (a, m) and (b_i, m) for
      b_i ≠ m.

Both steps are a groupBy-min plus an equi-join — map-side combine
absorbs hub skew on the min aggregation; AQE skew-join handles the join
side. Convergence = (count, hash-sum) checksum of P stable across a
full L+S round. At the fixpoint P is a star forest; component id =
root = component minimum (exact ids, per the north rule).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.graph import vertices_of
from ..plans.iterstate import StateLoop, no_aqe

def _checksum_metrics() -> dict:
    # decimal sum: hash values are full-range longs and would overflow
    # an ANSI-mode long sum
    return {
        "c": F.count(F.lit(1)),
        "h": F.coalesce(
            F.sum(F.xxhash64("a", "b").cast("decimal(38,0)")), F.lit(0)
        ).cast("string"),
    }


def _large_star(pairs: DataFrame) -> DataFrame:
    sym = pairs.select(F.col("a").alias("u"), F.col("b").alias("v")).unionByName(
        pairs.select(F.col("b").alias("u"), F.col("a").alias("v"))
    )
    mins = sym.groupBy("u").agg(F.min("v").alias("mn"))
    mins = mins.select("u", F.least("mn", "u").alias("m"))
    out = (
        sym.join(mins, "u")
        .filter(F.col("v") > F.col("u"))
        .select(F.col("v").alias("a"), F.col("m").alias("b"))
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )
    return out


def _small_star(pairs: DataFrame) -> DataFrame:
    mins = pairs.groupBy("a").agg(F.min("b").alias("m"))
    to_root = mins.select(F.col("a"), F.col("m").alias("b"))  # (a, m)
    siblings = (
        pairs.join(mins, "a")
        .filter(F.col("b") != F.col("m"))
        .select(F.col("b").alias("a"), F.col("m").alias("b"))
    )
    return to_root.unionByName(siblings).distinct()


def connected_components(
    edges: DataFrame, max_rounds: int = 50, ledger=None, mode: str = "dir"
) -> DataFrame:
    """Exact component ids: returns (id, comp) with comp = min id in
    the component. Isolated vertices (self-loop-only or none) map to
    themselves.

    One action per L+S round: the pair-set write carries its own
    (count, hash-sum) convergence checksum as observe() metrics
    (plans/iterstate.py discipline)."""
    spark = edges.sparkSession
    verts = vertices_of(edges)
    loop = StateLoop(spark, "cc_pairs", mode=mode, bucket_key="a", ledger=ledger)

    state = None
    if ledger is not None:
        state = loop.resume()
    if state is None:
        pairs0 = (
            edges.filter(F.col("src") != F.col("dst"))
            .select(
                F.greatest("src", "dst").alias("a"),
                F.least("src", "dst").alias("b"),
            )
            .distinct()
        )
        state = loop.init(pairs0)
    prev = None
    rounds = 0
    with no_aqe(spark):
        while rounds < max_rounds:
            rounds += 1
            state, got = loop.step(
                _small_star(_large_star(state)), _checksum_metrics()
            )
            cur = (int(got["c"] or 0), str(got["h"]))
            if cur == prev:
                break
            prev = cur
    membership = state.select(F.col("a").alias("id"), F.col("b").alias("comp"))
    out = verts.join(membership, "id", "left").select(
        "id", F.coalesce("comp", F.col("id")).alias("comp")
    )
    loop.cleanup(keep_final=True)
    return out
