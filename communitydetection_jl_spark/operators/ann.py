"""Similarity search over embedding columns (array<float>).

Two paths:
  - brute-force cosine top-k: exact baseline — broadcast the query set,
    dot products via JVM higher-order functions (zip_with + aggregate),
    top-k per query via window;
  - LSH-bucketed (random hyperplanes): the scale path — signature =
    sign-bit string of h seeded hyperplane projections, candidates share
    a bucket (multi-probe over bands), exact re-rank inside buckets.

Hyperplanes are generated driver-side (seeded NumPy) and embedded as
literal arrays — tiny (h × dim floats), broadcast with the plan.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, Window as W
from pyspark.sql import functions as F


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a):
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x * x), F.lit(0.0), lambda acc, v: acc + v
        )
    )


def with_cosine(df: DataFrame, a_col: str, b_col: str, out: str = "cosine") -> DataFrame:
    a, b = F.col(a_col), F.col(b_col)
    return df.withColumn(
        out,
        _dot(a, b)
        / F.greatest(_norm(a) * _norm(b), F.lit(1e-30)),
    )


def brute_force_topk(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    q_id_col: str = "q_id",
    q_vec_col: str = "q_vec",
) -> DataFrame:
    """Exact cosine top-k per query: (q_id, vec_id, cosine, rank).

    The query side is broadcast; the scan side stays distributed —
    O(n_vectors × n_queries) dots, all inside whole-stage codegen."""
    crossed = vectors.select(
        F.col(id_col).alias("vec_id"), F.col(vec_col).alias("v")
    ).crossJoin(
        F.broadcast(queries.select(F.col(q_id_col).alias("q_id"), F.col(q_vec_col).alias("q")))
    )
    scored = with_cosine(crossed, "v", "q").select("q_id", "vec_id", "cosine")
    w = W.partitionBy("q_id").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def _hyperplanes(dim: int, bits: int, seed: int) -> list[list[float]]:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((bits, dim)).tolist()


def lsh_signature(vec_col, planes: list[list[float]]):
    """Signature bits as a long: sign of each hyperplane projection."""
    sig = F.lit(0).cast("long")
    for i, p in enumerate(planes):
        lit = F.array(*[F.lit(float(x)) for x in p])
        bit = F.when(_dot(F.col(vec_col) if isinstance(vec_col, str) else vec_col, lit) > 0,
                     F.lit(1).cast("long")).otherwise(F.lit(0).cast("long"))
        sig = sig + bit * F.lit(1 << i).cast("long")
    return sig


def lsh_near_pairs(
    vectors: DataFrame,
    dim: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    bits: int = 16,
    num_bands: int = 4,
    threshold: float = 0.9,
    max_bucket: int = 2000,
    seed: int = 42,
) -> DataFrame:
    """Approximate near-duplicate pairs by cosine: bucket on hyperplane
    sign bands, exact cosine verify in-bucket. (id_a < id_b, cosine)."""
    planes = _hyperplanes(dim, bits, seed)
    sig = vectors.select(
        F.col(id_col).alias("id"), F.col(vec_col).alias("v"),
        lsh_signature(vec_col, planes).alias("sig"),
    )
    width = bits // num_bands
    bands = F.array(
        *[
            F.struct(
                F.lit(j).alias("band"),
                F.shiftrightunsigned(F.col("sig"), j * width)
                .bitwiseAND(F.lit((1 << width) - 1))
                .alias("key"),
            )
            for j in range(num_bands)
        ]
    )
    banded = sig.select("id", "v", F.explode(bands).alias("b")).select(
        "id", "v", F.col("b.band").alias("band"), F.col("b.key").alias("key")
    )
    sizes = banded.groupBy("band", "key").agg(F.count("*").alias("bs"))
    banded = banded.join(
        sizes.filter(F.col("bs") <= max_bucket).select("band", "key"),
        ["band", "key"], "left_semi",
    )
    l = banded.select("band", "key", F.col("id").alias("id_a"), F.col("v").alias("v_a"))
    r = banded.select("band", "key", F.col("id").alias("id_b"), F.col("v").alias("v_b"))
    pairs = (
        l.join(r, ["band", "key"])
        .filter(F.col("id_a") < F.col("id_b"))
        .dropDuplicates(["id_a", "id_b"])
    )
    return (
        with_cosine(pairs, "v_a", "v_b")
        .filter(F.col("cosine") >= threshold)
        .select("id_a", "id_b", "cosine")
    )


def ivf_topk(
    vectors: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 10,
    bits: int = 12,
    probe_hamming: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    q_id_col: str = "q_id",
    q_vec_col: str = "q_vec",
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k: LSH-coarse-quantized inverted file.

    Vectors bucket by signature; each query probes its own bucket plus
    all buckets within hamming ``probe_hamming`` (multi-probe), then
    exact cosine + window top-k on the candidates only."""
    planes = _hyperplanes(dim, bits, seed)
    v = vectors.select(
        F.col(id_col).alias("vec_id"), F.col(vec_col).alias("v"),
        lsh_signature(vec_col, planes).alias("bucket"),
    )
    q = queries.select(
        F.col(q_id_col).alias("q_id"), F.col(q_vec_col).alias("q"),
        lsh_signature(q_vec_col, planes).alias("sig"),
    )
    probes = [F.col("sig")]
    if probe_hamming >= 1:
        probes += [F.col("sig").bitwiseXOR(F.lit(1 << i).cast("long")) for i in range(bits)]
    q = q.select("q_id", "q", F.explode(F.array(*probes)).alias("bucket"))
    cand = v.join(q, "bucket").dropDuplicates(["q_id", "vec_id"])
    scored = with_cosine(cand, "v", "q").select("q_id", "vec_id", "cosine")
    w = W.partitionBy("q_id").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)
