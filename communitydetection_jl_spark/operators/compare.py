"""Partition-comparison metrics over two membership DataFrames.

Reference parity: nmi / nvoi (src/nmi.jl:2-127); pair-counting metrics
rand_index / mirkin_metric / jaccard_index (src/metrics.jl:417-450) —
re-expressed via contingency-table identities (no O(n²) pair loops):
  a11 = Σ_ij C(n_ij,2), row/col sums give a10/a01/a00.

Spark shape: one join on id + one groupBy(ca,cb) count builds the
contingency table; entropies/MI are aggregates over it. Entropy uses
natural log, matching the reference.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.graph import plogp


def contingency(ma: DataFrame, mb: DataFrame) -> DataFrame:
    """(ca, cb, nij) joint label counts of two memberships on id."""
    la, lb = ma.columns[1], mb.columns[1]
    a = ma.select("id", F.col(la).alias("ca"))
    b = mb.select("id", F.col(lb).alias("cb"))
    return a.join(b, "id").groupBy("ca", "cb").agg(F.count("*").alias("nij"))


def _entropies(ct: DataFrame, n: int) -> tuple[float, float, float]:
    """Returns (Ha, Hb, Iab) with natural logs; H* are Σ p log p (≤0)."""
    ha = float(
        ct.groupBy("ca").agg(F.sum("nij").alias("na"))
        .agg(F.sum(plogp(F.col("na") / n))).collect()[0][0] or 0.0
    )
    hb = float(
        ct.groupBy("cb").agg(F.sum("nij").alias("nb"))
        .agg(F.sum(plogp(F.col("nb") / n))).collect()[0][0] or 0.0
    )
    row = (
        ct.join(ct.groupBy("ca").agg(F.sum("nij").alias("na")), "ca")
        .join(ct.groupBy("cb").agg(F.sum("nij").alias("nb")), "cb")
        .agg(
            F.sum(
                (F.col("nij") / n)
                * F.log((F.col("nij") / n) / ((F.col("na") / n) * (F.col("nb") / n)))
            )
        )
        .collect()[0]
    )
    iab = float(row[0] or 0.0)
    return ha, hb, iab


def nmi(ma: DataFrame, mb: DataFrame) -> float:
    """Normalized mutual information, -2I/(Ha+Hb) (src/nmi.jl:2-62).
    Returns 0.0 when both partitions are single-community."""
    joined = contingency(ma, mb).persist()
    n = int(joined.agg(F.sum("nij")).collect()[0][0] or 0)
    if n == 0:
        joined.unpersist()
        return 0.0
    qa = joined.select("ca").distinct().count()
    qb = joined.select("cb").distinct().count()
    if qa == 1 and qb == 1:
        joined.unpersist()
        return 0.0
    ha, hb, iab = _entropies(joined, n)
    joined.unpersist()
    denom = ha + hb
    return -2.0 * iab / denom if denom != 0 else 0.0


def nvoi(ma: DataFrame, mb: DataFrame) -> float:
    """Normalized variation of information (src/nmi.jl:65-127):
    VI = Ha + Hb - 2I (entropies positive), normalized by log(n)."""
    joined = contingency(ma, mb).persist()
    n = int(joined.agg(F.sum("nij")).collect()[0][0] or 0)
    if n == 0:
        joined.unpersist()
        return 0.0
    ha, hb, iab = _entropies(joined, n)
    joined.unpersist()
    vi = (-ha) + (-hb) - 2.0 * iab
    return vi / math.log(n) if n > 1 else 0.0


def nminvoi(ma: DataFrame, mb: DataFrame) -> tuple[float, float]:
    """Both comparators from ONE contingency pass (src/nmi.jl:130-192):
    returns (nmi, nvoi)."""
    joined = contingency(ma, mb).persist()
    n = int(joined.agg(F.sum("nij")).collect()[0][0] or 0)
    if n == 0:
        joined.unpersist()
        return 0.0, 0.0
    qa = joined.select("ca").distinct().count()
    qb = joined.select("cb").distinct().count()
    ha, hb, iab = _entropies(joined, n)
    joined.unpersist()
    denom = ha + hb
    nmi_v = 0.0 if (qa == 1 and qb == 1) or denom == 0 else -2.0 * iab / denom
    vi = (-ha) + (-hb) - 2.0 * iab
    nvoi_v = vi / math.log(n) if n > 1 else 0.0
    return nmi_v, nvoi_v


def _pair_counts(ma: DataFrame, mb: DataFrame) -> tuple[int, int, int, int, int]:
    """Contingency-table pair counts (n, a11, a10, a01, a00)."""
    ct = contingency(ma, mb).persist()
    n = int(ct.agg(F.sum("nij")).collect()[0][0] or 0)
    s_ij = int(ct.agg(F.sum(F.col("nij") * (F.col("nij") - 1) / 2)).collect()[0][0] or 0)
    s_a = int(
        ct.groupBy("ca").agg(F.sum("nij").alias("na"))
        .agg(F.sum(F.col("na") * (F.col("na") - 1) / 2)).collect()[0][0] or 0
    )
    s_b = int(
        ct.groupBy("cb").agg(F.sum("nij").alias("nb"))
        .agg(F.sum(F.col("nb") * (F.col("nb") - 1) / 2)).collect()[0][0] or 0
    )
    ct.unpersist()
    total = n * (n - 1) // 2
    a11 = s_ij
    a10 = s_a - s_ij
    a01 = s_b - s_ij
    a00 = total - a11 - a10 - a01
    return n, a11, a10, a01, a00


def rand_index(ma: DataFrame, mb: DataFrame) -> float:
    """(a11+a00)/C(n,2) (src/metrics.jl:417-430 semantics)."""
    n, a11, a10, a01, a00 = _pair_counts(ma, mb)
    total = n * (n - 1) // 2
    return (a11 + a00) / total if total else 0.0


def jaccard_index(ma: DataFrame, mb: DataFrame) -> float:
    """a11/(a11+a10+a01)."""
    _, a11, a10, a01, _ = _pair_counts(ma, mb)
    denom = a11 + a10 + a01
    return a11 / denom if denom else 0.0


def mirkin_metric(ma: DataFrame, mb: DataFrame) -> float:
    """2(a10+a01) — the Mirkin pair-disagreement metric."""
    _, _, a10, a01, _ = _pair_counts(ma, mb)
    return 2.0 * (a10 + a01)


def partition_entropy(membership: DataFrame) -> float:
    """Entropy (natural log, positive) of the community-size
    distribution (src/utils.jl:55-91)."""
    lbl = membership.columns[1]
    sizes = membership.groupBy(F.col(lbl)).agg(F.count("*").alias("c"))
    n = int(sizes.agg(F.sum("c")).collect()[0][0] or 0)
    if n == 0:
        return 0.0
    s = float(sizes.agg(F.sum(plogp(F.col("c") / n))).collect()[0][0] or 0.0)
    return -s


def fvcc(membership: DataFrame, truth: DataFrame) -> float:
    """Newman's fraction of vertices correctly classified (GN benchmark
    scorer, src/girwan_newman_benchmark.jl:41-93): map each found
    community to its plurality ground-truth community; a vertex is
    correct if its truth label equals its community's plurality label;
    communities that are not the plurality owner of any truth group
    still score by their members' match."""
    la, lb = membership.columns[1], truth.columns[1]
    a = membership.select("id", F.col(la).alias("found"))
    b = truth.select("id", F.col(lb).alias("truth"))
    joined = a.join(b, "id")
    plur = (
        joined.groupBy("found", "truth").agg(F.count("*").alias("c"))
        .groupBy("found")
        .agg(F.max_by("truth", F.struct(F.col("c"), (-F.col("truth")).alias("nt"))).alias("plurality"))
    )
    n = joined.count()
    correct = (
        joined.join(plur, "found")
        .filter(F.col("truth") == F.col("plurality"))
        .count()
    )
    return correct / n if n else 0.0


def overlap_nmi(cover_a: list[list[int]], cover_b: list[list[int]], n: int | None = None) -> float:
    """LFK cover-NMI for overlapping communities (src/overlapnmi.jl:7-43
    semantics, re-derived from Lancichinetti-Fortunato-Kertész 2009).

    Driver-local (NumPy) on collected covers — covers are final,
    small artifacts; the reference likewise computes comparison metrics
    out-of-band. Returns 1 - 0.5*(H(A|B)/H(A) + H(B|A)/H(B))."""
    import math as _m

    if not cover_a or not cover_b:
        return 0.0
    universe = set()
    for g in cover_a:
        universe.update(g)
    for g in cover_b:
        universe.update(g)
    n = n or len(universe)

    def h(p):
        return -p * _m.log(p) if p > 0 else 0.0

    def h_x_given_y(ca, cb):
        total = 0.0
        denom = 0.0
        for ga in ca:
            sa = set(ga)
            pa = len(sa) / n
            hx = h(pa) + h(1 - pa)
            denom += hx
            best = None
            for gb in cb:
                sb = set(gb)
                pb = len(sb) / n
                p11 = len(sa & sb) / n
                p10 = len(sa - sb) / n
                p01 = len(sb - sa) / n
                p00 = 1 - p11 - p10 - p01
                # LFK constraint: only accept if informative
                if h(p11) + h(p00) >= h(p01) + h(p10):
                    hxy = (h(p11) + h(p10) + h(p01) + h(p00)) - (h(pb) + h(1 - pb))
                    if best is None or hxy < best:
                        best = hxy
            total += hx if best is None else min(best, hx)
        return (total / denom) if denom > 0 else 0.0

    return 1.0 - 0.5 * (h_x_given_y(cover_a, cover_b) + h_x_given_y(cover_b, cover_a))


def rnmi(
    ma: DataFrame,
    mb: DataFrame,
    n_shuffles: int = 10,
    seed: int = 42,
    hash_mode: str = "xxhash64",
) -> float:
    """NMI corrected by the mean NMI of label-shuffled partitions
    (src/nmi.jl:194-213): rnmi = nmi(a,b) − mean_k nmi(shuffle_k(a), b).

    Fully distributed: the label multiset is ranked once by vertex id
    (a fixed reference sequence), each shuffle ranks vertices by
    a keyed hash of (id, k, seed), and rank⋈rank pairs labels with
    vertices — a uniform random permutation with no driver-side label
    vector and no global-sort window (functions/ids.ranked_by: range
    partitions + per-partition offsets, parquet-backed).

    ``hash_mode="md5"`` ranks by the md5-derived 60-bit key of
    ``id_k_seed`` — bit-reproducible in ANSI SQL, so the whole shuffle
    ensemble is oracle-checkable; xxhash64 is the faster default."""
    from ..functions.ids import ranked_by

    def shuffle_key(k: int):
        if hash_mode == "md5":
            s = F.concat_ws("_", F.col("id"), F.lit(k), F.lit(seed))
            return F.conv(F.substring(F.md5(s), 1, 15), 16, 10).cast("long")
        return F.xxhash64("id", F.lit(k), F.lit(seed))

    base = nmi(ma, mb)
    la = ma.columns[1]
    # fixed label sequence: label of the i-th smallest vertex id
    lbl_seq = ranked_by(
        ma.select("id", F.col(la).alias("comm")), F.col("id")
    ).select("rank", "comm").persist()
    lbl_seq.count()
    mean_rand = 0.0
    for k in range(n_shuffles):
        perm = ranked_by(ma.select("id"), shuffle_key(k)).select("id", "rank")
        shuf = perm.join(lbl_seq, "rank").select("id", "comm")
        mean_rand += nmi(shuf, mb)
    lbl_seq.unpersist()
    return base - mean_rand / n_shuffles


def overlap_nmi_df(ma: DataFrame, mb: DataFrame, n: int | None = None) -> float:
    """LFK cover-NMI over *membership-pair DataFrames* (id, label) —
    the distributed counterpart of overlap_nmi (src/overlapnmi.jl:7-43
    semantics), usable on covers far too large to collect.

    One id⋈id join builds all cluster intersections. The LFK candidate
    space is every (X_i, Y_j) pair, but h(X_i|Y_j) for a NON-
    intersecting pair depends only on |Y_j| — so instead of a
    |C_a|·|C_b| cross join (quadratic in cluster count: an LPA cover
    of a fragmented web graph has 1e7+ clusters), the search runs over

      (a) the intersecting pairs (nij > 0) from the id⋈id join — at
          most Σ_id (memberships_a · memberships_b) rows, linear in
          cover size; plus
      (b) ONE candidate per (X_i, distinct |Y_j| size): exact because
          all nij=0 candidates of equal size have equal h(X_i|Y_j),
          with an availability check (a size s only qualifies for X_i
          if some size-s cluster does NOT intersect X_i — counted from
          the intersect table, never enumerated).

    Worst case (all |C_b| sizes distinct) degrades to the old cross;
    typical covers have O(100s) distinct sizes, making the candidate
    table linear in |C_a| + |inter|."""
    la, lb = ma.columns[1], mb.columns[1]
    a = ma.select("id", F.col(la).alias("ca"))
    b = mb.select("id", F.col(lb).alias("cb"))
    if n is None:
        n = (
            a.select("id").unionByName(b.select("id")).distinct().count()
        )
    if n == 0:
        return 0.0
    nd = float(n)
    sa = a.groupBy("ca").agg(F.count(F.lit(1)).alias("na"))
    sb = b.groupBy("cb").agg(F.count(F.lit(1)).alias("nb"))
    inter = a.join(b, "id").groupBy("ca", "cb").agg(F.count(F.lit(1)).alias("nij"))

    def h(p):
        return F.when((p > 0) & (p < 1), -p * F.log(p)).otherwise(F.lit(0.0))

    def _cond_entropy(sx, sy, xcol, ycol, nx, ny):
        """Σ_i min over j of h(X_i|Y_j) (guarded), normalized by Σ h(X_i)."""
        # (a) intersecting candidates, straight off the inter table
        cand_int = (
            inter.join(sx, xcol).join(sy, ycol)
            .select(xcol, nx, F.col(ny).alias("_s"), "nij")
        )
        # (b) nij=0 candidates: one per (X_i, distinct Y size s),
        # available iff #clusters of size s  >  #size-s clusters
        # intersecting X_i
        szs = sy.groupBy(F.col(ny).alias("_s")).agg(
            F.count(F.lit(1)).alias("_ycnt"))
        isz = (
            inter.join(sy, ycol)
            .groupBy(xcol, F.col(ny).alias("_s"))
            .agg(F.count(F.lit(1)).alias("_icnt"))
        )
        cand_non = (
            sx.join(F.broadcast(szs), how="cross")
            .join(isz, [xcol, "_s"], "left")
            .filter(F.col("_ycnt") > F.coalesce("_icnt", F.lit(0)))
            .select(xcol, nx, "_s", F.lit(0).cast("long").alias("nij"))
        )
        cands = cand_int.unionByName(cand_non)
        p11 = F.col("nij") / nd
        p10 = (F.col(nx) - F.col("nij")) / nd
        p01 = (F.col("_s") - F.col("nij")) / nd
        p00 = 1.0 - p11 - p10 - p01
        pb = F.col("_s") / nd
        informative = (h(p11) + h(p00)) >= (h(p01) + h(p10))
        hxy = (h(p11) + h(p10) + h(p01) + h(p00)) - (h(pb) + h(1 - pb))
        best = (
            cands.groupBy(xcol, nx)
            .agg(F.min(F.when(informative, hxy)).alias("best"))
        )
        hx = h(F.col(nx) / nd) + h(1 - F.col(nx) / nd)
        per = best.select(
            hx.alias("hx"),
            F.least(F.coalesce("best", hx), hx).alias("val"),
        )
        row = per.agg(F.sum("val").alias("tot"), F.sum("hx").alias("den")).collect()[0]
        tot, den = float(row["tot"] or 0.0), float(row["den"] or 0.0)
        return (tot / den) if den > 0 else 0.0

    h_a_b = _cond_entropy(sa, sb, "ca", "cb", "na", "nb")
    h_b_a = _cond_entropy(sb, sa, "cb", "ca", "nb", "na")
    return 1.0 - 0.5 * (h_a_b + h_b_a)
