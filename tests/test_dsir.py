"""DSIR importance resampling (operators/dsir.py): the weights must
favor target-like documents, the sample must be deterministic and
weight-proportional, and the plan must stay broadcast-model-sized.
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from terrorblade_spark.operators.dsir import (
    dsir_logratio,
    dsir_sample,
    dsir_weights,
    hashed_ngrams,
)


@pytest.fixture(scope="module")
def corpora(spark):
    """Two dialects with disjoint vocabulary: target speaks dialect A."""
    a_words = ["alpha", "beta", "gamma", "delta"]
    b_words = ["omega", "sigma", "theta", "kappa"]

    def doc(words, i, n=30):
        return " ".join(words[(i + j) % len(words)] for j in range(n))

    raw = spark.createDataFrame(
        [(i, doc(a_words, i)) for i in range(40)]
        + [(100 + i, doc(b_words, i)) for i in range(40)],
        "doc_id long, text string",
    )
    target = spark.createDataFrame(
        [(1000 + i, doc(a_words, i + 1)) for i in range(20)],
        "doc_id long, text string",
    )
    return raw, target


def test_hashed_ngrams_includes_unigrams_and_bigrams(spark):
    row = (
        spark.createDataFrame([("a b c",)], "text string")
        .select(hashed_ngrams("text").alias("ng"))
        .head()
    )
    assert row.ng == ["a", "b", "c", "a b", "b c"]


def test_hashed_ngrams_single_and_empty(spark):
    rows = (
        spark.createDataFrame([("solo",), ("",), ("   ",)], "text string")
        .select(hashed_ngrams("text").alias("ng"))
        .collect()
    )
    assert rows[0].ng == ["solo"]
    assert rows[1].ng == []
    assert rows[2].ng == []


def test_weights_separate_dialects(spark, corpora):
    raw, target = corpora
    lr = dsir_logratio(target, raw)
    w = {r.doc_id: r.dsir_weight for r in dsir_weights(raw, lr).collect()}
    a_weights = [w[i] for i in range(40)]
    b_weights = [w[100 + i] for i in range(40)]
    # every dialect-A doc outweighs every dialect-B doc
    assert min(a_weights) > max(b_weights)


def test_sample_is_deterministic_and_target_skewed(spark, corpora):
    raw, target = corpora
    s1 = dsir_sample(raw, target, k=20).collect()
    s2 = dsir_sample(raw, target, k=20).collect()
    assert [r.doc_id for r in s1] == [r.doc_id for r in s2]
    assert len(s1) == 20
    # exp(weight gap) is astronomically in dialect A's favor here, so
    # the proportional sample is all dialect A
    assert all(r.doc_id < 100 for r in s1)
    # keys are emitted sorted descending, ties broken by id
    keys = [(r.gumbel_key, r.doc_id) for r in s1]
    assert keys == sorted(keys, key=lambda t: (-t[0], t[1]))


def test_seed_changes_selection_order_not_weights(spark, corpora):
    raw, target = corpora
    s1 = dsir_sample(raw, target, k=30, seed="s1")
    s2 = dsir_sample(raw, target, k=30, seed="s2")
    w1 = {r.doc_id: r.dsir_weight for r in s1.collect()}
    w2 = {r.doc_id: r.dsir_weight for r in s2.collect()}
    common = set(w1) & set(w2)
    assert common  # heavy overlap expected (same weight mass)
    for d in common:
        assert w1[d] == w2[d]  # weights are seed-independent
    # the Gumbel noise must actually vary with the seed
    assert [r.doc_id for r in s1.collect()] != [r.doc_id for r in s2.collect()]


def test_empty_doc_gets_zero_weight(spark, corpora):
    raw, target = corpora
    raw2 = raw.unionByName(
        raw.sparkSession.createDataFrame([(999, "")], "doc_id long, text string")
    )
    lr = dsir_logratio(target, raw2)
    w = {r.doc_id: r.dsir_weight for r in dsir_weights(raw2, lr).collect()}
    assert w[999] == 0.0


def test_logratio_model_is_bucket_bounded(spark, corpora):
    raw, target = corpora
    n_buckets = 64
    lr = dsir_logratio(target, raw, n_buckets=n_buckets)
    rows = lr.collect()
    assert 0 < len(rows) <= n_buckets
    assert all(0 <= r.bucket < n_buckets for r in rows)


def test_weight_mass_shifts_with_target(spark, corpora):
    """Flipping the target to dialect B flips the weight ordering."""
    raw, _ = corpora
    b_target = raw.where(F.col("doc_id") >= 100).select("doc_id", "text")
    lr = dsir_logratio(b_target, raw)
    w = {r.doc_id: r.dsir_weight for r in dsir_weights(raw, lr).collect()}
    assert min(w[100 + i] for i in range(40)) > max(w[i] for i in range(40))


def test_seeded_uniform_open_stays_inside_open_interval(spark):
    from terrorblade_spark.operators.sampling import seeded_uniform_open

    df = spark.range(20000).select(F.col("id").cast("string").alias("k"))
    row = df.select(
        F.min(seeded_uniform_open("k", "s")).alias("lo"),
        F.max(seeded_uniform_open("k", "s")).alias("hi"),
    ).head()
    assert 0.0 < row.lo and row.hi < 1.0
    # the clamp itself: the largest representable sub-1 double survives
    assert 1.0 - 2.0**-53 < 1.0
