"""Text-format readers/writers for community files (§2.1 of SURVEY.md).

Reference parity (semantics; distributed re-expression):
  readgrp/writegrp   whitespace groups, '#' comments    src/utils.jl:94-105,157-166
  iLCD_readgrp       groups skipping first 2 tokens     src/utils.jl:112-122
  readmsp/writemsp   node → [labels] membership file    src/utils.jl:169-193
  genlnd             edge list → .lnd lines             src/utils.jl:141-154
  grp2msp/msp2grp    groups ↔ membership reshapes       src/utils.jl:107-139,196-225

Groups are DataFrames (grp: long, members: array<long>); memberships
are (id, comm) / overlapping (id, labels: array<long>).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F


def read_grp(spark: SparkSession, path: str, skip_tokens: int = 0) -> DataFrame:
    """Read groups: one community per line, whitespace-separated vertex
    ids, '#' comment lines skipped. ``skip_tokens=2`` gives iLCD format.
    Returns (grp, members) with grp = 1-based line order by first id."""
    lines = (
        spark.read.text(path)
        .filter(~F.col("value").startswith("#"))
        .filter(F.length(F.trim("value")) > 0)
        .select(
            F.filter(
                F.split(F.trim("value"), r"\s+"), lambda t: t != ""
            ).alias("toks")
        )
        .select(F.slice("toks", skip_tokens + 1, 1_000_000_000).alias("toks"))
        .select(F.transform("toks", lambda t: t.cast("long")).alias("members"))
    )
    # global window is fine here: .grp is the reference's single-file
    # fixture format (communities-per-line), never a web-scale input
    w = W.orderBy(F.col("members")[0])
    return lines.select(
        F.row_number().over(w).cast("long").alias("grp"), "members"
    )


def write_grp(groups: DataFrame, path: str) -> None:
    """Write groups: space-separated member ids, one group per line."""
    groups.select(
        F.concat_ws(" ", F.transform(F.col("members"), lambda m: m.cast("string"))).alias("value")
    ).coalesce(1).write.mode("overwrite").text(path)


def read_msp(spark: SparkSession, path: str) -> DataFrame:
    """Read membership file 'node lbl1 lbl2 ...' → (id, labels)."""
    return (
        spark.read.text(path)
        .filter(~F.col("value").startswith("#"))
        .filter(F.length(F.trim("value")) > 0)
        .select(F.filter(F.split(F.trim("value"), r"\s+"), lambda t: t != "").alias("toks"))
        .select(
            F.col("toks")[0].cast("long").alias("id"),
            F.transform(F.slice("toks", 2, 1_000_000_000), lambda t: t.cast("long")).alias("labels"),
        )
    )


def write_msp(msp: DataFrame, path: str) -> None:
    """Write (id, labels) → 'node lbl1 lbl2 ...' lines."""
    msp.select(
        F.concat_ws(
            " ",
            F.col("id").cast("string"),
            F.concat_ws(" ", F.transform("labels", lambda l: l.cast("string"))),
        ).alias("value")
    ).coalesce(1).write.mode("overwrite").text(path)


def gen_lnd(edges: DataFrame, path: str) -> None:
    """Edge list → .lnd lines 'lineno + src dst' (src/utils.jl:141-154).
    Single-file fixture format (coalesce(1)); the global line-number
    window matches that scope — not a web-scale path."""
    w = W.orderBy("src", "dst")
    edges.select("src", "dst").withColumn(
        "ln", F.row_number().over(w)
    ).select(
        F.concat_ws(" ", F.col("ln").cast("string"), F.lit("+"),
                    F.col("src").cast("string"), F.col("dst").cast("string")).alias("value")
    ).coalesce(1).write.mode("overwrite").text(path)


def grp_to_membership(groups: DataFrame, overlapping: bool = False) -> DataFrame:
    """Groups → hard membership (id, comm): overlap resolved to the
    LARGEST group (grp2pat semantics, src/utils.jl:196-225); or
    (id, labels) when ``overlapping``."""
    exploded = groups.select(
        "grp", F.size("members").alias("gsize"), F.explode("members").alias("id")
    )
    if overlapping:
        return exploded.groupBy("id").agg(F.sort_array(F.collect_list("grp")).alias("labels"))
    return exploded.groupBy("id").agg(
        F.max_by("grp", F.struct(F.col("gsize"), (-F.col("grp")).alias("ng"))).alias("comm")
    )


def membership_to_grp(membership: DataFrame) -> DataFrame:
    """(id, comm) → (grp, members) (getgrp, src/utils.jl:38-50)."""
    lbl = membership.columns[1]
    return membership.groupBy(F.col(lbl).alias("grp")).agg(
        F.sort_array(F.collect_list("id")).alias("members")
    )
