"""ranking_metrics (operators/evalmetrics.py) — hand-computed cases.

The end-to-end value oracle is q84_quantization_recall; these tests
pin the metric definitions themselves on tiny hand-checkable inputs.
"""

from __future__ import annotations

import math

import pytest

from terrorblade_spark.operators.evalmetrics import ranking_metrics


def _rel(spark, rows):
    return spark.createDataFrame(
        rows, "query_id long, neighbor_id long, rank int"
    )


def _by_query(df):
    return {r.query_id: r for r in df.collect()}


def test_perfect_partial_and_miss(spark):
    truth = _rel(
        spark,
        [(1, 10, 1), (1, 11, 2), (1, 12, 3)]
        + [(2, 20, 1), (2, 21, 2), (2, 22, 3)]
        + [(3, 30, 1), (3, 31, 2), (3, 32, 3)],
    )
    results = _rel(
        spark,
        # q1: perfect; q2: one hit at rank 3; q3: no hits
        [(1, 10, 1), (1, 11, 2), (1, 12, 3)]
        + [(2, 99, 1), (2, 98, 2), (2, 20, 3)]
        + [(3, 97, 1), (3, 96, 2), (3, 95, 3)],
    )
    got = _by_query(ranking_metrics(results, truth, k=3))
    assert got[1].recall_at_k == 1.0 and got[1].mrr_at_k == 1.0
    assert abs(got[1].ndcg_at_k - 1.0) < 1e-12

    idcg = sum(1.0 / math.log2(i + 1) for i in (1, 2, 3))
    assert abs(got[2].recall_at_k - 1 / 3) < 1e-12
    assert abs(got[2].mrr_at_k - 1 / 3) < 1e-12
    assert abs(got[2].ndcg_at_k - (1.0 / math.log2(4)) / idcg) < 1e-12

    assert got[3].n_hits == 0
    assert got[3].recall_at_k == 0.0
    assert got[3].mrr_at_k == 0.0
    assert got[3].ndcg_at_k == 0.0


def test_truth_capped_recall_and_rank_cutoff(spark):
    # truth has only 2 relevant items (< k=5): denominator is 2, not 5
    truth = _rel(spark, [(1, 10, 1), (1, 11, 2)])
    # hit at rank 2; rank-7 row must be ignored entirely
    results = _rel(spark, [(1, 99, 1), (1, 10, 2), (1, 11, 7)])
    got = _by_query(ranking_metrics(results, truth, k=5))[1]
    assert got.n_truth == 2
    assert got.n_hits == 1
    assert got.recall_at_k == 0.5
    assert got.mrr_at_k == 0.5
    idcg = 1.0 / math.log2(2) + 1.0 / math.log2(3)
    assert abs(got.ndcg_at_k - (1.0 / math.log2(3)) / idcg) < 1e-12


def test_unknown_result_queries_ignored_and_missing_queries_zero(spark):
    truth = _rel(spark, [(1, 10, 1)])
    results = _rel(spark, [(7, 10, 1)])  # query 7 not in truth
    rows = ranking_metrics(results, truth, k=3).collect()
    assert [r.query_id for r in rows] == [1]
    assert rows[0].n_hits == 0 and rows[0].recall_at_k == 0.0


def test_rejects_bad_k(spark):
    t = _rel(spark, [(1, 10, 1)])
    with pytest.raises(ValueError):
        ranking_metrics(t, t, k=0)


def test_binary_auc_hand_computed_and_sklearn_free(spark):
    """Perfect separation -> 1.0; inverted -> 0.0; a hand-computed
    mixed case; single-class -> NULL; NULLs excluded."""
    from terrorblade_spark.operators.evalmetrics import binary_auc

    perfect = spark.createDataFrame(
        [(i, i >= 5, float(i)) for i in range(10)], "id long, y boolean, s double"
    )
    r = binary_auc(perfect, "y", "s", "id").collect()[0]
    assert r["auc"] == 1.0 and r["n_pos"] == 5 and r["n_neg"] == 5
    inverted = spark.createDataFrame(
        [(i, i < 5, float(i)) for i in range(10)], "id long, y boolean, s double"
    )
    assert binary_auc(inverted, "y", "s", "id").collect()[0]["auc"] == 0.0
    # hand case: scores 1..4, positives at scores 2 and 4 -> ranks 2,4
    # AUC = (6 - 3) / (2*2) = 0.75
    mixed = spark.createDataFrame(
        [(1, False, 1.0), (2, True, 2.0), (3, False, 3.0), (4, True, 4.0)],
        "id long, y boolean, s double",
    )
    assert binary_auc(mixed, "y", "s", "id").collect()[0]["auc"] == 0.75
    single = spark.createDataFrame([(1, True, 1.0)], "id long, y boolean, s double")
    assert binary_auc(single, "y", "s", "id").collect()[0]["auc"] is None
    with_nulls = spark.createDataFrame(
        [(1, False, 1.0), (2, True, 2.0), (3, None, 9.0), (4, True, None)],
        "id long, y boolean, s double",
    )
    r2 = binary_auc(with_nulls, "y", "s", "id").collect()[0]
    assert (r2["n_pos"], r2["n_neg"], r2["auc"]) == (1, 1, 1.0)


def test_binary_auc_matches_numpy_reference(spark):
    """Seeded continuous scores vs a direct pairwise numpy count."""
    import numpy as np

    from terrorblade_spark.operators.evalmetrics import binary_auc

    rng = np.random.RandomState(5)
    y = rng.rand(200) < 0.4
    s = rng.rand(200) + y * 0.3        # informative but noisy
    rows = [(i, bool(y[i]), float(s[i])) for i in range(200)]
    got = binary_auc(
        spark.createDataFrame(rows, "id long, y boolean, s double"), "y", "s", "id"
    ).collect()[0]["auc"]
    pos, neg = s[y], s[~y]
    want = (pos[:, None] > neg[None, :]).mean()
    assert got == pytest.approx(want, abs=1e-12)
