"""bucket_pair_rows: the capped within-bucket pair expansion must emit
the IDENTICAL pair set whether a bucket fits one rank-chunk
(population <= cap: the pure round-10 row-local shape) or is split
into several chunks whose crossings come from the chunk-relation
self-join — the round-11 cap is a memory bound, never a membership
change.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from terrorblade_spark.operators.bucketpairs import bucket_pair_rows


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_hot_leg_matches_cold_leg_scalar(spark):
    # bucket 1: 5 members (2 chunks at cap=3, 3 chunks at cap=2),
    # bucket 2: 2 members (single chunk), bucket 3: singleton (dies
    # before expansion)
    data = [(1, 10), (1, 11), (1, 12), (1, 13), (1, 14), (2, 20), (2, 21), (3, 30)]
    rel = spark.createDataFrame(data, ["bkt", "doc"])
    cold = bucket_pair_rows(rel, ["bkt"], "doc", max_bucket_population=100)
    for cap in (3, 2):
        routed = bucket_pair_rows(rel, ["bkt"], "doc", max_bucket_population=cap)
        assert _rows(cold) == _rows(routed), cap
    # 5 choose 2 + 1 pair
    assert len(_rows(cold)) == 11
    # every pair ordered a < b
    assert all(a < b for (_, a, b) in _rows(cold))


def test_hot_leg_matches_cold_leg_struct_member(spark):
    data = [(1, 10, 7.0), (1, 11, 8.0), (1, 12, 9.0), (2, 20, 1.0), (2, 21, 2.0)]
    rel = spark.createDataFrame(data, ["bkt", "mid", "x"]).select(
        "bkt", F.struct("mid", "x").alias("m")
    )
    cold = bucket_pair_rows(rel, ["bkt"], "m", max_bucket_population=100)
    routed = bucket_pair_rows(rel, ["bkt"], "m", max_bucket_population=2)
    flat_c = sorted((r["bkt"], tuple(r["a"]), tuple(r["b"])) for r in cold.collect())
    flat_r = sorted((r["bkt"], tuple(r["a"]), tuple(r["b"])) for r in routed.collect())
    assert flat_c == flat_r
    assert len(flat_r) == 4  # 3 choose 2 + 1


def test_duplicate_members_never_self_pair_after_strict_filter(spark):
    # duplicate ids in one bucket: the cold leg emits the (x, x)
    # position pair and the hot leg drops it — callers' strict
    # inequality filters make both legs agree (the q33 contract)
    data = [(1, 10), (1, 10), (1, 11), (1, 12)]
    rel = spark.createDataFrame(data, ["bkt", "doc"])
    cold = bucket_pair_rows(rel, ["bkt"], "doc", max_bucket_population=100).where(
        F.col("a") < F.col("b")
    )
    routed = bucket_pair_rows(rel, ["bkt"], "doc", max_bucket_population=2).where(
        F.col("a") < F.col("b")
    )
    assert _rows(cold.distinct()) == _rows(routed.distinct())


def test_invalid_cap_raises(spark):
    rel = spark.createDataFrame([(1, 10)], ["bkt", "doc"])
    with pytest.raises(ValueError):
        bucket_pair_rows(rel, ["bkt"], "doc", max_bucket_population=0)


def test_lsh_candidates_routing_invariance(spark):
    # end-to-end on the real LSH surface: a tiny cap forces every
    # multi-member band bucket through the self-join leg; the candidate
    # pair set must not change
    from terrorblade_spark.operators.dedup import minhash_lsh_candidates

    texts = [
        "the quick brown fox jumps over the lazy dog tonight",
        "the quick brown fox jumps over the lazy dog today",
        "the quick brown fox jumps over the lazy dog tonight",
        "completely different content with no shared shingles here at all",
        "another unrelated document about spark optimization and shuffles",
    ]
    df = spark.createDataFrame(list(enumerate(texts)), ["doc_id", "text"])
    base = minhash_lsh_candidates(df, "doc_id", max_bucket_population=100_000)
    routed = minhash_lsh_candidates(df, "doc_id", max_bucket_population=1)
    assert _rows(base) == _rows(routed)
    assert (0, 2) in {(a, b) for a, b in _rows(base)}  # identical pair found
