"""Classification metrics over (truth, predicted) label DataFrames.

The reference delegates these to sklearn via PyCall
(src/metrics.jl:452-515); here they are contingency-table aggregates —
fully distributed, no Python in the hot path. All operate on two
memberships joined on id.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .compare import contingency, nmi, _pair_counts


def accuracy(truth: DataFrame, pred: DataFrame) -> float:
    """Fraction of ids with identical labels."""
    lt, lp = truth.columns[1], pred.columns[1]
    j = truth.select("id", F.col(lt).alias("t")).join(
        pred.select("id", F.col(lp).alias("p")), "id"
    )
    n = j.count()
    return j.filter(F.col("t") == F.col("p")).count() / n if n else 0.0


def hamming_loss(truth: DataFrame, pred: DataFrame) -> float:
    return 1.0 - accuracy(truth, pred)


def per_class_prf(truth: DataFrame, pred: DataFrame, beta: float = 1.0) -> DataFrame:
    """(label, tp, fp, fn, precision, recall, f_beta) per class — the
    classification_report surface."""
    ct = contingency(truth, pred)  # (ca=true, cb=pred, nij)
    tp = ct.filter(F.col("ca") == F.col("cb")).select(
        F.col("ca").alias("label"), F.col("nij").alias("tp")
    )
    truth_tot = ct.groupBy(F.col("ca").alias("label")).agg(F.sum("nij").alias("support"))
    pred_tot = ct.groupBy(F.col("cb").alias("label")).agg(F.sum("nij").alias("predicted"))
    b2 = beta * beta
    out = (
        truth_tot.join(pred_tot, "label", "outer")
        .join(tp, "label", "left")
        .select(
            "label",
            F.coalesce("tp", F.lit(0)).alias("tp"),
            (F.coalesce("predicted", F.lit(0)) - F.coalesce("tp", F.lit(0))).alias("fp"),
            (F.coalesce("support", F.lit(0)) - F.coalesce("tp", F.lit(0))).alias("fn"),
            F.coalesce("support", F.lit(0)).alias("support"),
        )
    )
    prec = F.when(F.col("tp") + F.col("fp") > 0, F.col("tp") / (F.col("tp") + F.col("fp"))).otherwise(F.lit(0.0))
    rec = F.when(F.col("tp") + F.col("fn") > 0, F.col("tp") / (F.col("tp") + F.col("fn"))).otherwise(F.lit(0.0))
    return out.select(
        "label", "tp", "fp", "fn", "support",
        prec.alias("precision"),
        rec.alias("recall"),
        F.when(
            (b2 * prec + rec) > 0, (1 + b2) * prec * rec / (b2 * prec + rec)
        ).otherwise(F.lit(0.0)).alias("f_beta"),
    )


def f1_score(truth: DataFrame, pred: DataFrame, average: str = "macro") -> float:
    prf = per_class_prf(truth, pred)
    if average == "macro":
        return float(prf.agg(F.avg("f_beta")).collect()[0][0] or 0.0)
    if average == "weighted":
        row = prf.agg(
            (F.sum(F.col("f_beta") * F.col("support")) / F.sum("support"))
        ).collect()[0]
        return float(row[0] or 0.0)
    if average == "micro":
        row = prf.agg(F.sum("tp").alias("tp"), F.sum("fp").alias("fp"), F.sum("fn").alias("fn")).collect()[0]
        denom = 2 * row.tp + row.fp + row.fn
        return 2 * row.tp / denom if denom else 0.0
    raise ValueError(average)


def confusion_matrix(truth: DataFrame, pred: DataFrame) -> DataFrame:
    """(true_label, pred_label, n) — sparse confusion matrix."""
    return contingency(truth, pred).select(
        F.col("ca").alias("true_label"), F.col("cb").alias("pred_label"),
        F.col("nij").alias("n"),
    )


def adjusted_rand_index(truth: DataFrame, pred: DataFrame) -> float:
    """ARI from pair counts (the sklearn-delegate's formula,
    permutation-model expectation correction)."""
    n, a11, a10, a01, a00 = _pair_counts(truth, pred)
    total = n * (n - 1) / 2
    if total == 0:
        return 0.0
    sum_a = a11 + a10  # Σ C(n_a,2)
    sum_b = a11 + a01
    expected = sum_a * sum_b / total
    max_index = (sum_a + sum_b) / 2
    if max_index == expected:
        return 0.0
    return (a11 - expected) / (max_index - expected)


def mutual_info_score(truth: DataFrame, pred: DataFrame) -> float:
    """Raw mutual information in nats."""
    from .compare import _entropies

    ct = contingency(truth, pred).persist()
    n = int(ct.agg(F.sum("nij")).collect()[0][0] or 0)
    if n == 0:
        ct.unpersist()
        return 0.0
    _, _, iab = _entropies(ct, n)
    ct.unpersist()
    return iab


def normalized_mutual_info_score(truth: DataFrame, pred: DataFrame) -> float:
    return nmi(truth, pred)


def expected_mutual_info(marg_a: list[int], marg_b: list[int]) -> float:
    """E[MI] under the hypergeometric permutation model (the correction
    inside sklearn's adjusted_mutual_info_score, which the reference
    delegates to via PyCall, src/metrics.jl:452-515). Driver-side over
    the two marginal vectors — label counts, not rows.

    Float log-gamma throughout (the same formulation as sklearn's
    expected_mutual_information): the hypergeometric pmf at the lowest
    admissible ``nij`` comes from one ``lgamma`` expression and every
    further term reuses the ratio recurrence

        p(nij+1) = p(nij) · (ai−nij)(bj−nij) / ((nij+1)(n−ai−bj+nij+1)),

    so each (ai, bj) cell costs O(min(ai,bj)−lo) float mults — exact
    ``math.comb`` on 1e5+ rows would grind through million-bit integers
    and effectively hang."""
    import math

    n = sum(marg_a)
    if n == 0 or n != sum(marg_b):
        return 0.0
    lg = math.lgamma
    log_n = math.log(n)
    emi = 0.0
    for ai in marg_a:
        log_ai = math.log(ai)
        for bj in marg_b:
            lo = max(1, ai + bj - n)
            hi = min(ai, bj)
            # log pmf at nij=lo: C(bj,lo)·C(n−bj,ai−lo)/C(n,ai)
            logp = (
                lg(bj + 1) - lg(lo + 1) - lg(bj - lo + 1)
                + lg(n - bj + 1) - lg(ai - lo + 1) - lg(n - bj - ai + lo + 1)
                - lg(n + 1) + lg(ai + 1) + lg(n - ai + 1)
            )
            p = math.exp(logp)
            for nij in range(lo, hi + 1):
                if nij > 0 and p > 0:
                    emi += (nij / n) * (log_n + math.log(nij) - log_ai - math.log(bj)) * p
                if nij < hi:
                    p *= (ai - nij) * (bj - nij) / ((nij + 1) * (n - ai - bj + nij + 1))
    return emi


def _log_fact_expr(k):
    """ln k! (= lgamma(k+1)) as a pure column expression over an
    integer-valued column — Spark ships no lgamma, and a Python UDF
    here would put the hypergeometric EMI kernel on the slow path.

    Exact table for k ≤ 20 (literal array lookup), Stirling series for
    k > 20: lgamma(z) = (z−½)ln z − z + ½ln 2π + 1/12z − 1/360z³
    + 1/1260z⁵ − 1/1680z⁷, whose truncation error at z ≥ 22 is below
    1e-16 relative — pytest pins agreement with math.lgamma."""
    import math

    kd = k.cast("double")
    z = kd + F.lit(1.0)
    small = F.element_at(
        F.array(*[F.lit(math.lgamma(i + 1.0)) for i in range(21)]),
        k.cast("int") + 1,
    )
    stirling = (
        (z - F.lit(0.5)) * F.log(z) - z + F.lit(0.5 * math.log(2 * math.pi))
        + F.lit(1.0 / 12) / z
        - F.lit(1.0 / 360) / (z * z * z)
        + F.lit(1.0 / 1260) / (z * z * z * z * z)
        - F.lit(1.0 / 1680) / (z * z * z * z * z * z * z)
    )
    return F.when(k <= F.lit(20), small).otherwise(stirling)


def expected_mutual_info_distributed(
    marg_a: DataFrame, marg_b: DataFrame, n: int, chunk: int = 65_536
) -> float:
    """E[MI] as ONE Spark job over the marginal tables — the scale path
    for community-size label sets where the driver loop's
    O(|A|·|B|·min(ai,bj)) cells would hang a single core (two 1e5-
    community memberships → 1e10 cells). The cell grid is a crossJoin
    of the two marginal DataFrames (|A|·|B| rows, distributed), each
    cell explodes its admissible nij range [max(1, ai+bj−n), min(ai,bj)]
    with two-level chunked sequences (no generated array exceeds
    ``chunk`` elements even when min(ai,bj) ~ n), and the
    hypergeometric pmf is evaluated per term directly from
    _log_fact_expr — all inside whole-stage codegen, no Python.

    ``marg_a``/``marg_b``: one integer column of per-label counts.

    Guard: exact EMI is inherently Ω(|A|·|B|) — two 1e6-cluster covers
    mean 1e12 cells no matter how well they distribute. Above
    ``$SPARK_GRAFT_EMI_MAX_CELLS`` (default 1e10) the call raises
    instead of launching an open-ended job; callers needing AMI on such
    covers should subsample or bucket the label sets first (E[MI] is a
    smooth function of the marginals, so a size-stratified sample of
    the marginal tables estimates it well)."""
    import os

    a = marg_a.select(F.col(marg_a.columns[0]).cast("long").alias("ai"))
    b = marg_b.select(F.col(marg_b.columns[0]).cast("long").alias("bj"))
    max_cells = float(os.environ.get("SPARK_GRAFT_EMI_MAX_CELLS", "1e10"))
    ka, kb = a.count(), b.count()
    if ka * kb > max_cells:
        raise ValueError(
            f"exact EMI over {ka}x{kb} = {ka * kb:.2e} marginal cells "
            f"exceeds the {max_cells:.0e} cell budget "
            "(SPARK_GRAFT_EMI_MAX_CELLS); subsample or bucket the label "
            "sets before computing AMI at this cover size"
        )
    spark = marg_a.sparkSession
    parts = spark.sparkContext.defaultParallelism
    cells = a.repartition(parts).crossJoin(F.broadcast(b)).select(
        "ai", "bj",
        F.greatest(F.lit(1), F.col("ai") + F.col("bj") - F.lit(n)).alias("lo"),
        F.least("ai", "bj").alias("hi"),
    ).filter(F.col("hi") >= F.col("lo"))
    # two-level explode: chunk index, then ≤chunk-element nij range
    terms = (
        cells.select(
            "ai", "bj", "lo", "hi",
            F.explode(
                F.sequence(
                    F.lit(0),
                    F.floor((F.col("hi") - F.col("lo")) / F.lit(chunk)).cast("long"),
                )
            ).alias("ch"),
        )
        .select(
            "ai", "bj",
            F.explode(
                F.sequence(
                    F.col("lo") + F.col("ch") * F.lit(chunk),
                    F.least(
                        F.col("hi"),
                        F.col("lo") + (F.col("ch") + 1) * F.lit(chunk) - 1,
                    ),
                )
            ).alias("nij"),
        )
    )
    ai, bj, nij = F.col("ai"), F.col("bj"), F.col("nij")
    nn = F.lit(float(n))
    logp = (
        _log_fact_expr(ai) + _log_fact_expr(nn.cast("long") - ai)
        + _log_fact_expr(bj) + _log_fact_expr(nn.cast("long") - bj)
        - _log_fact_expr(nn.cast("long"))
        - _log_fact_expr(nij)
        - _log_fact_expr(ai - nij)
        - _log_fact_expr(bj - nij)
        - _log_fact_expr(nn.cast("long") - ai - bj + nij)
    )
    term = (
        (nij.cast("double") / nn)
        * (F.log(nn) + F.log(nij.cast("double")) - F.log(ai.cast("double"))
           - F.log(bj.cast("double")))
        * F.exp(logp)
    )
    row = terms.agg(F.sum(term).alias("emi")).collect()[0]
    return float(row["emi"] or 0.0)


# above this many (|A|·|B|) marginal cells the driver loop hands EMI to
# the distributed kernel (expected_mutual_info_distributed)
_EMI_DRIVER_CELLS = 250_000


def adjusted_mutual_info_score(
    truth: DataFrame, pred: DataFrame, average_method: str = "arithmetic"
) -> float:
    """AMI = (MI − E[MI]) / (norm(H_a, H_b) − E[MI]); the chance-
    corrected NMI the reference exposes through its sklearn delegate
    set (src/metrics.jl:452-515). ``average_method``: 'arithmetic'
    (modern sklearn default), 'max' (the historical default of the
    sklearn era the reference pinned), 'min', 'geometric'."""
    import math

    from .compare import _entropies

    ct = contingency(truth, pred).persist()
    n = int(ct.agg(F.sum("nij")).collect()[0][0] or 0)
    if n == 0:
        ct.unpersist()
        return 0.0
    ha, hb, mi = _entropies(ct, n)  # H* are Σ p log p (≤ 0)
    ha, hb = -ha, -hb
    ma_df = ct.groupBy("ca").agg(F.sum("nij").alias("na"))
    mb_df = ct.groupBy("cb").agg(F.sum("nij").alias("nb"))
    ka = ma_df.count()
    kb = mb_df.count()
    if ka * kb > _EMI_DRIVER_CELLS:
        # community-scale label sets: the driver loop would be
        # O(|A|·|B|·min(ai,bj)) on one core — run EMI as a Spark job
        emi = expected_mutual_info_distributed(
            ma_df.select("na"), mb_df.select("nb"), n)
        ct.unpersist()
    else:
        marg_a = [int(r.na) for r in ma_df.collect()]
        marg_b = [int(r.nb) for r in mb_df.collect()]
        ct.unpersist()
        emi = expected_mutual_info(marg_a, marg_b)
    if average_method == "arithmetic":
        norm = (ha + hb) / 2.0
    elif average_method == "max":
        norm = max(ha, hb)
    elif average_method == "min":
        norm = min(ha, hb)
    elif average_method == "geometric":
        norm = math.sqrt(ha * hb)
    else:
        raise ValueError(average_method)
    denom = norm - emi
    if abs(denom) < 1e-15:
        return 1.0 if abs(mi - emi) < 1e-15 else 0.0
    return (mi - emi) / denom
