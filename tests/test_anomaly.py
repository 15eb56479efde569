"""Robust median/MAD outlier scoring (operators/anomaly.py)."""

from __future__ import annotations

import pytest

from terrorblade_spark.operators.anomaly import robust_outliers


def _flag(df):
    return {r["event_id"]: r["robust_z"] for r in df.collect()}


def test_outlier_hand_computed(spark):
    rows = [(1, i + 1, v) for i, v in enumerate([1.0, 2.0, 3.0, 4.0, 100.0])]
    df = spark.createDataFrame(rows, "g long, event_id long, value double")
    got = _flag(robust_outliers(df, "value", ["g"]))
    # med=3, MAD=1: only 100 crosses |z|>3, z = 97/1.4826
    assert set(got) == {5}
    assert got[5] == pytest.approx(97 / 1.4826)


def test_outlier_robust_to_the_outlier_itself(spark):
    """The motivating property: one wild value must not mask itself.
    With mean/std, z of 1000 among ten 1s is ~3.0 (borderline); the
    median/MAD score is huge."""
    rows = [(1, i, 1.0 + i * 0.01) for i in range(10)] + [(1, 99, 1000.0)]
    df = spark.createDataFrame(rows, "g long, event_id long, value double")
    got = _flag(robust_outliers(df, "value", ["g"]))
    assert 99 in got and got[99] > 1000


def test_outlier_zero_mad_group_skipped(spark):
    """Majority-identical group: MAD = 0 -> no rows, by contract."""
    rows = [(1, i, 5.0) for i in range(4)] + [(1, 9, 500.0)]
    df = spark.createDataFrame(rows, "g long, event_id long, value double")
    assert robust_outliers(df, "value", ["g"]).count() == 0


def test_outlier_groups_are_independent(spark):
    """A value ordinary in one group is anomalous in another."""
    g1 = [(1, i, float(v)) for i, v in enumerate([100, 101, 102, 103, 104])]
    g2 = [(2, 10 + i, float(v)) for i, v in enumerate([1, 2, 3, 2, 104])]
    df = spark.createDataFrame(g1 + g2, "g long, event_id long, value double")
    got = _flag(robust_outliers(df, "value", ["g"]))
    assert set(got) == {14}


def test_outlier_approx_path_matches_exact_on_small_groups(spark):
    rows = [(1, i + 1, float(v)) for i, v in enumerate([1, 2, 3, 4, 100])]
    df = spark.createDataFrame(rows, "g long, event_id long, value double")
    exact = _flag(robust_outliers(df, "value", ["g"]))
    approx = _flag(robust_outliers(df, "value", ["g"], approx_accuracy=10_000))
    assert set(exact) == set(approx)


def test_outlier_rejects_bad_threshold(spark):
    df = spark.createDataFrame([(1, 1, 1.0)], "g long, event_id long, value double")
    with pytest.raises(ValueError):
        robust_outliers(df, "value", ["g"], z_threshold=0)
