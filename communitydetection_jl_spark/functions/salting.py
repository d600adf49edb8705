"""Explicit hub salting — two-level aggregation for power-law keys.

Spark's hash aggregation already does map-side partial aggregation,
which absorbs most groupBy skew; what it cannot fix is a *join* keyed
on a hub vertex (one partition receives the hub's entire adjacency).
These helpers implement the classic remedy:

  - ``salted(df, key, n)``: add a deterministic salt column derived
    from the OTHER columns, turning one hot key into n sub-keys;
  - ``two_level_agg``: partial-aggregate on (key, salt), then final-
    aggregate on key — the explicit form of map-side combine, usable
    when the first level must cross a join;
  - ``salted_join_agg``: the full pattern for gather-style operators:
    fan the small side out to (key, salt) replicas, join the big side
    on (key, salt), aggregate up.

Used by the gather supersteps on hub-skewed web graphs (north rule:
"explicit salting of high-degree hub vertices"); AQE skew-join
splitting covers the same joins adaptively, so salting is opt-in via
``n_salts`` parameters.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted(df: DataFrame, salt_from: list[str], n_salts: int, col_name: str = "_salt") -> DataFrame:
    """Deterministic salt in [0, n_salts) from hashing ``salt_from``."""
    return df.withColumn(col_name, F.pmod(F.xxhash64(*salt_from), F.lit(n_salts)))


def replicate_salts(df: DataFrame, n_salts: int, col_name: str = "_salt") -> DataFrame:
    """Cross the (small) side with all salt values so a salted equi-join
    stays an equi-join."""
    salts = df.sparkSession.range(n_salts).select(F.col("id").cast("long").alias(col_name))
    return df.crossJoin(F.broadcast(salts))


def two_level_agg(
    df: DataFrame,
    key: str,
    value: str,
    n_salts: int = 16,
    agg: str = "sum",
) -> DataFrame:
    """Σ value per key via (key, salt) partial agg then key final agg.

    Equivalent to ``df.groupBy(key).sum(value)`` but with an explicit
    intermediate shuffle granularity of n_salts sub-keys per key."""
    fn = {"sum": F.sum, "count": F.count, "min": F.min, "max": F.max}[agg]
    partial = (
        salted(df, [c for c in df.columns if c != key] or [key], n_salts)
        .groupBy(key, "_salt")
        .agg(fn(value).alias("_partial"))
    )
    final_fn = F.sum if agg in ("sum", "count") else fn
    return partial.groupBy(key).agg(final_fn("_partial").alias(value))


def salted_join_agg(
    big: DataFrame,
    small: DataFrame,
    key: str,
    value_expr,
    out_value: str,
    n_salts: int = 16,
) -> DataFrame:
    """Gather pattern with explicit hub control: join ``big`` (salted on
    key) against ``small`` (replicated across salts) on (key, salt),
    then aggregate Σ value_expr per key.

    ``big`` is the edge/message table (key = hub-prone vertex column);
    ``small`` is a per-vertex state table keyed by ``key``."""
    b = salted(big, [c for c in big.columns if c != key] or [key], n_salts)
    s = replicate_salts(small, n_salts)
    joined = b.join(s, [key, "_salt"])
    partial = joined.groupBy(key, "_salt").agg(F.sum(value_expr).alias("_p"))
    return partial.groupBy(key).agg(F.sum("_p").alias(out_value))
