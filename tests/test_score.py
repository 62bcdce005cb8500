"""Scoring surrogate + classifier-metric tests (B3, W4, P10)."""

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def spark():
    from folkscope_spark.session import get_spark

    s = get_spark(app="t5", master="local[4]", shuffle_partitions=4)
    yield s
    s.stop()


@pytest.fixture(scope="module")
def labeled(spark):
    # synthetic labeled scores: label 'v' iff plausibility-ish hash high
    from folkscope_spark.score import score_assertions

    df = spark.range(2000).select(
        F.concat(F.lit("tail text number "), F.col("id")).alias("tail"),
        F.lit("capableOf").alias("relation"),
    )
    scored = score_assertions(df)
    return scored.withColumn(
        "label", F.when(F.col("typicality") >= 0.5, "v").otherwise("i")
    ).cache()


def test_scores_deterministic(spark):
    from folkscope_spark.score import score_assertions

    df = spark.createDataFrame(
        [("keeping the feet warm", "capableOf")], "tail string, relation string"
    )
    a = score_assertions(df).first()
    b = score_assertions(df).first()
    assert a["plausibility"] == b["plausibility"]
    assert 0.0 <= a["plausibility"] <= 1.0
    assert a["plausibility"] != a["typicality"]  # independent channels


def test_classifier_metrics_consistency(labeled):
    from folkscope_spark.score import classifier_metrics

    m = classifier_metrics(labeled, ts=0.5)
    assert 0.0 <= m["accuracy"] <= 1.0
    assert 0.0 <= m["f1"] <= 1.0
    # plausibility and typicality are independent hashes -> accuracy ~ 0.5
    assert 0.35 <= m["accuracy"] <= 0.65


def test_perfect_classifier_metrics(spark):
    from folkscope_spark.score import classifier_metrics

    df = spark.createDataFrame(
        [(0.9, "v"), (0.8, "v"), (0.2, "i"), (0.1, "i")],
        "plausibility double, label string",
    )
    m = classifier_metrics(df, ts=0.5)
    assert m == {"accuracy": 1.0, "precision": 1.0, "recall": 1.0, "f1": 1.0}


def test_select_threshold_monotone(spark):
    from folkscope_spark.score import select_threshold

    df = spark.createDataFrame(
        [(0.9, "v"), (0.8, "v"), (0.7, "i"), (0.6, "v"), (0.2, "i")],
        "plausibility double, label string",
    )
    ts = select_threshold(df, min_precision=1.0)
    assert ts == pytest.approx(0.8)  # below 0.8 the 'i' at 0.7 breaks precision 1.0
    ts2 = select_threshold(df, min_precision=0.75)
    assert ts2 == pytest.approx(0.6)


def test_threshold_filter(spark):
    from folkscope_spark.score import threshold

    df = spark.createDataFrame(
        [(0.95,), (0.5,), (0.1,)], "plausibility double"
    )
    assert threshold(df, 0.9).count() == 1
    assert threshold(df, 0.5).count() == 2
    assert threshold(df, 0.0).count() == 3


def test_softmax_reference_parity():
    import numpy as np
    from folkscope_spark.score import softmax

    # oracle re-executed from the reference source (utils.py:402-406)
    def ref(x):
        x = np.asarray(x)
        e = np.exp(x - np.max(x))
        return e / e.sum()

    for v in ([0.0, 1.0], [3.5, -2.0, 0.1], [100.0, 100.0]):
        assert softmax(v) == pytest.approx(ref(v))
    # 2-class softmax == sigmoid of the logit difference
    p = softmax([2.0, 0.5])[0]
    assert p == pytest.approx(1 / (1 + np.exp(-(2.0 - 0.5))))
