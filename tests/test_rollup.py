"""Incremental materialized rollup: batch-fold equals direct
aggregate, bucket-pruned state rewrites, replay idempotence."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from terrorblade_spark.operators.rollup import (
    BUCKET_COL,
    rollup_read,
    rollup_update,
)


def _events(spark, lo, hi):
    return spark.range(lo, hi).select(
        (F.col("id") % 17).alias("user_id"),
        (F.col("id") % 5).cast("string").alias("event_type"),
        (F.col("id") % 1000).cast("double").alias("value"),
        F.concat(F.lit("s"), (F.col("id") % 400).cast("string")).alias("session"),
    )


def test_incremental_folds_equal_direct_aggregate(spark, tmp_path):
    state = str(tmp_path / "rollup")
    batches = [(0, 4_000), (4_000, 7_000), (7_000, 12_000)]
    for lo, hi in batches:
        rollup_update(
            _events(spark, lo, hi),
            state,
            keys=["user_id"],
            sum_cols=["value"],
            min_cols=["value"],
            max_cols=["value"],
            distinct_col="session",
        )

    got = {
        r["user_id"]: r
        for r in rollup_read(spark, state, avg_of=["value"]).collect()
    }
    want = {
        r["user_id"]: r
        for r in _events(spark, 0, 12_000)
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum("value").alias("sum_value"),
            F.min("value").alias("min_value"),
            F.max("value").alias("max_value"),
            F.countDistinct("session").alias("nd"),
        )
        .collect()
    }
    assert set(got) == set(want)
    for u, w in want.items():
        g = got[u]
        assert g["n_rows"] == w["n_rows"]
        assert g["sum_value"] == w["sum_value"]
        assert g["min_value"] == w["min_value"]
        assert g["max_value"] == w["max_value"]
        assert g["avg_value"] == w["sum_value"] / w["n_rows"]
        # HLL estimate of <=400 distinct sessions: tight tolerance
        assert abs(g["approx_distinct"] - w["nd"]) / w["nd"] < 0.05


def test_update_rewrites_only_touched_buckets(spark, tmp_path):
    state = str(tmp_path / "state")
    rollup_update(_events(spark, 0, 5_000), state, keys=["user_id"], n_buckets=16)

    # record per-partition file listings, then fold a batch touching ONE key
    def listing():
        out = {}
        for d in os.listdir(state):
            if d.startswith(f"{BUCKET_COL}="):
                p = os.path.join(state, d)
                out[d] = sorted(
                    (f, os.path.getmtime(os.path.join(p, f)))
                    for f in os.listdir(p)
                    if f.endswith(".parquet")
                )
        return out

    before = listing()
    one_key = _events(spark, 0, 5_000).where(F.col("user_id") == 3)
    rollup_update(one_key, state, keys=["user_id"], n_buckets=16)
    after = listing()

    changed = [d for d in before if before[d] != after.get(d)]
    assert len(changed) == 1  # exactly user 3's bucket was rewritten
    untouched = [d for d in before if d not in changed]
    assert untouched and all(before[d] == after[d] for d in untouched)


def test_merge_fn_skips_replayed_batches(spark, tmp_path):
    from terrorblade_spark.operators.rollup import rollup_merge_fn

    state = str(tmp_path / "stream_state")
    applied = str(tmp_path / "applied")
    batch = _events(spark, 0, 2_000)

    # the exact closure foreachBatch runs, under an at-least-once replay
    merge = rollup_merge_fn(state, keys=["user_id"], applied_dir=applied, sum_cols=["value"])
    merge(batch, 0)
    merge(batch, 0)  # replay of the same micro-batch: must be a no-op
    merge(batch, 1)  # a NEW batch id folds in
    row = rollup_read(spark, state).agg(
        F.sum("n_rows").alias("n"), F.sum("sum_value").alias("s")
    ).first()
    assert row["n"] == 4_000
    direct = _events(spark, 0, 2_000).agg(F.sum("value")).first()[0]
    assert row["s"] == 2 * direct


def test_rebucketing_is_refused(spark, tmp_path):
    import pytest

    state = str(tmp_path / "guard")
    rollup_update(_events(spark, 0, 1_000), state, keys=["user_id"], n_buckets=16)
    with pytest.raises(ValueError, match="n_buckets=16"):
        rollup_update(_events(spark, 0, 1_000), state, keys=["user_id"], n_buckets=8)
