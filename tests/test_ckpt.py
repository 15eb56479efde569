"""flat_local_checkpoint: the stats-free re-wrap must actually be
stats-free (a plain Spark-4 localCheckpoint carries origin statistics —
the SPARK-39748 compounding this module exists to prevent), and the
fallback path must return correct rows AND emit a visible warning
(round-10 VERDICT item 4: a silent fallback quietly re-enables the
exponential planning hang on future session types).
"""

from __future__ import annotations

import warnings

import pytest

from terrorblade_spark.operators import ckpt as ckpt_mod
from terrorblade_spark.operators.ckpt import flat_local_checkpoint


def _size_stats(df) -> int:
    return int(df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes())


def test_rewrap_drops_origin_stats(spark):
    df = spark.range(100).selectExpr("id", "id * 2 as v")
    joined = df.join(df.withColumnRenamed("v", "w"), "id")
    plain = joined.localCheckpoint(eager=True)
    flat = flat_local_checkpoint(joined)
    # plain checkpoint rewrites the origin plan's stats onto the
    # LogicalRDD (small, data-derived); the flat one must carry the
    # constant defaultSizeInBytes leaf instead
    assert _size_stats(plain) < 2**40
    assert _size_stats(flat) >= 2**40
    # and the rows are the checkpointed rows either way
    assert sorted(map(tuple, flat.collect())) == sorted(map(tuple, plain.collect()))


def test_rewrap_adds_no_job(spark):
    tracker = spark.sparkContext.statusTracker()
    df = spark.range(50).selectExpr("id", "id % 7 as g")
    ck = df.localCheckpoint(eager=True)
    before = len(tracker.getJobIdsForGroup(None))
    ckpt_mod._rewrap_stats_free(ck, spark)
    assert len(tracker.getJobIdsForGroup(None)) == before


def test_fallback_warns_once_and_returns_plain_checkpoint(spark, monkeypatch):
    calls = {"n": 0}

    def boom(ck, s):
        calls["n"] += 1
        raise RuntimeError("simulated non-classic session")

    monkeypatch.setattr(ckpt_mod, "_rewrap_stats_free", boom)
    monkeypatch.setattr(ckpt_mod, "_fallback_warned", False)
    df = spark.range(10)
    with pytest.warns(RuntimeWarning, match="stats-free re-wrap unavailable"):
        out = flat_local_checkpoint(df)
    assert sorted(r[0] for r in out.collect()) == list(range(10))
    # second engagement stays quiet (one visible signal per process)
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        out2 = flat_local_checkpoint(df)
    assert out2.count() == 10
    assert calls["n"] == 2
