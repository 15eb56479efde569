"""Skew/layout diagnostics: injected hot keys must surface in the
profile, and the salt suggestion must scale with the hot key's mass.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from terrorblade_spark.operators.diagnostics import (
    key_skew_profile,
    partition_histogram,
    suggest_salts,
)


def _skewed(spark, hot_rows=900, cold_keys=100):
    hot = spark.range(hot_rows).select(F.lit(0).alias("k"), F.col("id").alias("v"))
    cold = spark.range(cold_keys).select(
        (F.col("id") + 1).alias("k"), F.col("id").alias("v")
    )
    return hot.unionByName(cold)


def test_key_skew_profile_surfaces_hot_key(spark):
    df = _skewed(spark)
    hot, summary = key_skew_profile(df, ["k"], top_n=5)
    hrows = hot.collect()
    assert hrows[0]["k"] == 0 and hrows[0]["n_rows"] == 900
    assert abs(hrows[0]["share"] - 900 / 1000) < 1e-12
    s = summary.first()
    assert s["n_keys"] == 101 and s["total_rows"] == 1000
    assert s["max_rows"] == 900
    # mean = 1000/101 ≈ 9.9 -> skew_ratio ≈ 90.9
    assert 85 < s["skew_ratio"] < 95
    # p50 of per-key counts is 1 (the cold keys dominate the key count)
    assert s["p50_rows"] == 1.0


def test_key_skew_profile_uniform_is_flat(spark):
    df = spark.range(1000).select((F.col("id") % 100).alias("k"))
    _hot, summary = key_skew_profile(df, ["k"])
    s = summary.first()
    assert s["skew_ratio"] == 1.0 and s["max_rows"] == 10


def test_partition_histogram_counts_every_row(spark):
    df = spark.range(1000).repartition(8)
    hist = partition_histogram(df).collect()
    assert sum(r["n_rows"] for r in hist) == 1000
    assert len(hist) <= 8
    # round-robin repartition is roughly balanced (each INPUT partition
    # round-robins independently, so global counts wobble a little)
    assert max(r["n_rows"] for r in hist) <= 2 * (1000 / len(hist))


def test_suggest_salts_scales_with_hot_key(spark):
    df = _skewed(spark)
    _hot, summary = key_skew_profile(df, ["k"])
    # hottest key has 900 rows; at 100 rows/task that needs 9 salts
    assert suggest_salts(summary, target_rows_per_task=100) == 9
    # uniform data needs none
    uni = spark.range(100).select((F.col("id") % 10).alias("k"))
    _h2, s2 = key_skew_profile(uni, ["k"])
    assert suggest_salts(s2, target_rows_per_task=100) == 1
    # cap at 256
    assert suggest_salts(summary, target_rows_per_task=1) == 256


# --- concentration_profile ---------------------------------------------------

from terrorblade_spark.operators.diagnostics import concentration_profile


def _profile(spark, counts, top_k=10):
    rows = [(f"k{i}",) for i, c in enumerate(counts) for _ in range(c)]
    df = spark.createDataFrame(rows, "k string")
    return concentration_profile(df, "k", top_k=top_k).collect()[0]


def test_concentration_uniform_is_zero_gini(spark):
    import pytest as _pt

    row = _profile(spark, [3, 3, 3, 3])
    assert row["n_keys"] == 4 and row["total_rows"] == 12 and row["max_count"] == 3
    assert row["gini"] == _pt.approx(0.0, abs=1e-12)


def test_concentration_hot_key_hand_computed(spark):
    import pytest as _pt

    # 9 keys x 1 row + 1 key x 9 rows: gini = 2*135/(10*18) - 11/10 = 0.4
    row = _profile(spark, [1] * 9 + [9], top_k=1)
    assert row["gini"] == _pt.approx(0.4)
    assert row["top1_share"] == _pt.approx(0.5)
    assert row["max_count"] == 9


def test_concentration_rejects_bad_topk(spark):
    import pytest as _pt

    df = spark.createDataFrame([("a",)], "k string")
    with _pt.raises(ValueError):
        concentration_profile(df, "k", top_k=0)
