"""Classification metrics + directed map equation."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from communitydetection_jl_spark.operators.classification import (
    accuracy,
    adjusted_rand_index,
    confusion_matrix,
    f1_score,
    hamming_loss,
    mutual_info_score,
    per_class_prf,
)
from communitydetection_jl_spark.operators.objectives import map_equation_directed
from communitydetection_jl_spark.sources import fixtures as fx


@pytest.fixture(scope="module")
def labels(spark):
    truth = spark.createDataFrame(
        [(1, "a"), (2, "a"), (3, "a"), (4, "b"), (5, "b"), (6, "c")],
        "id long, comm string",
    )
    pred = spark.createDataFrame(
        [(1, "a"), (2, "a"), (3, "b"), (4, "b"), (5, "b"), (6, "a")],
        "id long, comm string",
    )
    return truth, pred


def test_accuracy_and_prf(spark, labels):
    truth, pred = labels
    assert accuracy(truth, pred) == pytest.approx(4 / 6)
    assert hamming_loss(truth, pred) == pytest.approx(2 / 6)
    prf = {r.label: r for r in per_class_prf(truth, pred).collect()}
    # class a: tp=2, fp=1 (id6), fn=1 (id3)
    assert (prf["a"].tp, prf["a"].fp, prf["a"].fn) == (2, 1, 1)
    assert prf["a"].precision == pytest.approx(2 / 3)
    assert prf["a"].recall == pytest.approx(2 / 3)
    # class c: never predicted → recall 0
    assert prf["c"].recall == 0.0
    # sklearn cross-check values: macro F1 of this table
    f1a = 2 / 3
    f1b = 2 * (2 / 3) * 1.0 / (2 / 3 + 1.0)
    assert f1_score(truth, pred, "macro") == pytest.approx((f1a + f1b + 0.0) / 3)
    micro = f1_score(truth, pred, "micro")
    assert micro == pytest.approx(accuracy(truth, pred))  # single-label case


def test_confusion_and_ari(spark, labels):
    truth, pred = labels
    cm = {(r.true_label, r.pred_label): r.n for r in confusion_matrix(truth, pred).collect()}
    assert cm[("a", "a")] == 2 and cm[("a", "b")] == 1 and cm[("c", "a")] == 1
    assert adjusted_rand_index(truth, truth) == pytest.approx(1.0)
    assert -0.5 <= adjusted_rand_index(truth, pred) < 1.0
    assert mutual_info_score(truth, truth) > 0


def test_map_equation_directed(spark):
    edges, _ = fx.directed_toy(spark)
    verts = (
        edges.select(F.col("src").alias("id"))
        .unionByName(edges.select(F.col("dst").alias("id")))
        .distinct()
    )
    singles = verts.select("id", F.col("id").alias("comm"))
    two = verts.select("id", (F.col("id") <= 4).cast("long").alias("comm"))
    l_single = map_equation_directed(edges, singles)
    l_two = map_equation_directed(edges, two)
    # grouping the two cycles should compress vs singletons
    assert l_two < l_single
    assert l_two > 0
