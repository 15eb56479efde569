"""Streaming pipeline tests: the production foreachBatch dedup-merge
path (idempotent INSERT-OR-IGNORE sink) — the memory-sink batch runners
are test harnesses and are exercised via q47/q57's oracle rows instead.
"""

from __future__ import annotations

import pytest

from terrorblade_spark.streaming.pipeline import dedup_merge_writer, stream_events
from terrorblade_spark.tables import load_table


def _drain(writer, checkpoint: str) -> None:
    q = (
        writer.option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def test_dedup_merge_writer_is_idempotent(spark, sf_dir, tmp_path):
    # replaying the SAME backlog through a fresh checkpoint must add
    # zero rows: the anti-join drops every already-present key
    target = str(tmp_path / "target")
    for i in range(2):
        _drain(
            dedup_merge_writer(
                stream_events(spark, sf_dir), target, keys=["event_id"]
            ),
            str(tmp_path / f"cp{i}"),
        )
    got = spark.read.parquet(target).count()
    want = load_table(spark, sf_dir, "events").count()
    assert got == want


def test_dedup_merge_writer_raises_on_unreadable_target(spark, sf_dir, tmp_path):
    # a target that EXISTS but cannot be read is NOT "first batch":
    # falling through to a blind append would break idempotency, so the
    # writer must propagate the error and fail the stream
    from pyspark.errors.exceptions.captured import StreamingQueryException

    target = tmp_path / "broken"
    target.mkdir()  # empty dir -> UNABLE_TO_INFER_SCHEMA, not PATH_NOT_FOUND
    writer = dedup_merge_writer(
        stream_events(spark, sf_dir), str(target), keys=["event_id"]
    )
    q = (
        writer.option("checkpointLocation", str(tmp_path / "cp"))
        .trigger(availableNow=True)
        .start()
    )
    with pytest.raises(StreamingQueryException):
        q.awaitTermination()
