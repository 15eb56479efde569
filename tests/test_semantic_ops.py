"""Unit tests for the semantic pipeline (SURVEY §2.9 E1–E7): the
embedding UDF's determinism/normalization, sliding distance edge
cases, segment/group math on hand-computed fixtures — mirroring the
reference's own test strategy (tests/test_preprocessors.py:207-236,
629-644 check distance ranges and sessionization edges with injected
vectors).
"""

from __future__ import annotations

import math
from datetime import datetime, timedelta

import pytest
from pyspark.sql import functions as F

from terrorblade_spark.functions.embed import embed_text
from terrorblade_spark.operators.semantic import (
    author_runs,
    calculate_groups,
    concat_author_runs,
    process_message_groups,
    semantic_segments,
    sliding_distance,
)


def _vec_df(spark, rows):
    """rows: (id, label, [floats])"""
    return spark.createDataFrame(
        [(i, lab, [float(x) for x in v]) for i, lab, v in rows],
        "vec_id long, label string, embedding array<double>",
    )


class TestEmbedText:
    def test_deterministic_and_normalized(self, spark):
        df = spark.createDataFrame(
            [(1, "spark catalyst shuffle"), (2, "spark catalyst shuffle"), (3, None)],
            "id long, text string",
        )
        out = (
            df.withColumn("e", embed_text(dim=16)(F.col("text")))
            .orderBy("id")
            .collect()
        )
        assert out[0]["e"] == out[1]["e"]  # same text -> same vector
        norm = math.sqrt(sum(x * x for x in out[0]["e"]))
        assert norm == pytest.approx(1.0, abs=1e-6)
        assert len(out[0]["e"]) == 16
        # null text -> zero vector (not null, not NaN)
        assert out[2]["e"] == [0.0] * 16

    def test_different_text_differs(self, spark):
        df = spark.createDataFrame(
            [(1, "alpha beta"), (2, "gamma delta")], "id long, text string"
        )
        out = df.withColumn("e", embed_text(dim=32)(F.col("text"))).orderBy("id").collect()
        assert out[0]["e"] != out[1]["e"]

    def test_sentence_transformers_real_model_path(self, spark):
        """Exercises the REAL model pandas-UDF path (model singleton per
        executor, Arrow batch transfer, normalize_embeddings) when the
        optional dependency is installed; skipped otherwise. Checks
        shape, unit norm, and run-to-run determinism on 10 rows."""
        pytest.importorskip("sentence_transformers")
        df = spark.createDataFrame(
            [(i, f"document number {i} about spark queries") for i in range(10)],
            "id long, text string",
        )
        udf = embed_text(encoder="sentence-transformers")
        out1 = df.withColumn("e", udf(F.col("text"))).orderBy("id").collect()
        out2 = df.withColumn("e", udf(F.col("text"))).orderBy("id").collect()
        dims = {len(r["e"]) for r in out1}
        assert len(dims) == 1 and dims.pop() > 0  # one fixed model dim
        for r1, r2 in zip(out1, out2):
            assert r1["e"] == r2["e"]  # deterministic across runs
            norm = math.sqrt(sum(x * x for x in r1["e"]))
            assert norm == pytest.approx(1.0, abs=1e-3)


class TestSlidingDistance:
    def test_window1_hand_computed(self, spark):
        # identical consecutive vectors -> distance 0; orthogonal -> 1
        df = _vec_df(
            spark,
            [
                (1, "a", [1, 0]),
                (2, "a", [1, 0]),   # cos=1 -> dist 0
                (3, "a", [0, 1]),   # cos=0 -> dist 1
                (4, "a", [-1, 0]),  # cos=0 vs prev -> wait: cos([0,1],[-1,0])=0 -> 1
                (1, "b", [1, 1]),   # first of partition -> 0
            ],
        )
        out = {
            (r["label"], r["vec_id"]): r["distance"]
            for r in sliding_distance(df, "embedding", ["label"], ["vec_id"]).collect()
        }
        assert out[("a", 1)] == 0.0  # first row
        assert out[("a", 2)] == pytest.approx(0.0)
        assert out[("a", 3)] == pytest.approx(1.0)
        assert out[("a", 4)] == pytest.approx(1.0)
        assert out[("b", 1)] == 0.0

    def test_general_window_mean(self, spark):
        # window=2: row 3's distance = 1 - mean(cos(v3,v1), cos(v3,v2))
        df = _vec_df(spark, [(1, "a", [1, 0]), (2, "a", [0, 1]), (3, "a", [1, 0])])
        out = {
            r["vec_id"]: r["distance"]
            for r in sliding_distance(
                df, "embedding", ["label"], ["vec_id"], window=2
            ).collect()
        }
        assert out[1] == 0.0
        assert out[2] == pytest.approx(1.0)          # vs [1,0] only
        assert out[3] == pytest.approx(1 - 0.5)      # mean(cos=1, cos=0)=0.5

    def test_distance_range(self, spark):
        # any vectors: distance in [0, 2]
        import random

        rnd = random.Random(11)
        rows = [
            (i, "x", [rnd.uniform(-1, 1) for _ in range(8)]) for i in range(1, 40)
        ]
        df = _vec_df(spark, rows)
        dists = [
            r["distance"]
            for r in sliding_distance(df, "embedding", ["x" and "label"], ["vec_id"]).collect()
        ]
        assert all(-1e-9 <= d <= 2 + 1e-9 for d in dists)


class TestSegmentsAndGroups:
    def test_segments_cumsum(self, spark):
        df = spark.createDataFrame(
            [(1, "a", 0.0), (2, "a", 0.95), (3, "a", 0.1), (4, "a", 0.99)],
            "vec_id long, label string, distance double",
        )
        out = {
            r["vec_id"]: r["semantic_segment"]
            for r in semantic_segments(
                df, "distance", ["label"], ["vec_id"], threshold=0.9
            ).collect()
        }
        assert out == {1: 0, 2: 1, 3: 1, 4: 2}

    def test_groups_break_on_either(self, spark):
        df = spark.createDataFrame(
            [
                # (id, label, segment, pre_cluster)
                (1, "a", 0, 0),
                (2, "a", 0, 0),  # no change
                (3, "a", 1, 0),  # segment change -> new group
                (4, "a", 1, 1),  # cluster change -> new group
                (5, "a", 2, 2),  # both change -> ONE new group
            ],
            "vec_id long, label string, semantic_segment long, pre_cluster long",
        )
        out = {
            r["vec_id"]: r["group_id"]
            for r in calculate_groups(df, ["label"], ["vec_id"]).collect()
        }
        assert out == {1: 0, 2: 0, 3: 1, 4: 2, 5: 3}  # first row forced 0


class TestAuthorRuns:
    def _msgs(self, spark):
        t0 = datetime(2024, 1, 1, 12, 0, 0)
        rows = [
            (1, "u", "alice", t0, "hi"),
            (2, "u", "alice", t0 + timedelta(minutes=1), "there"),
            (3, "u", "bob", t0 + timedelta(minutes=2), "yo"),       # author change
            (4, "u", "bob", t0 + timedelta(minutes=40), "later"),   # gap > 5m
        ]
        return spark.createDataFrame(
            rows, "event_id long, chat string, author string, ts timestamp, text string"
        )

    def test_runs_and_concat(self, spark):
        df = self._msgs(spark)
        runs = author_runs(df, "author", "ts", ["chat"], "event_id", gap="5m")
        got = {r["event_id"]: r["message_group"] for r in runs.collect()}
        assert got == {1: 0, 2: 0, 3: 1, 4: 2}

        agg = concat_author_runs(
            runs, "message_group", "ts", "event_id", "text", partition_cols=["chat"]
        ).orderBy("message_group").collect()
        assert [r["text"] for r in agg] == ["hi. there", "yo", "later"]
        assert [r["message_ids"] for r in agg] == [[1, 2], [3], [4]]
        assert agg[0]["n_messages"] == 2


class TestFullPipeline:
    def test_small_cluster_nulled(self, spark):
        # 4 near-identical close-in-time msgs -> one group of 4 (> cluster_size 3);
        # 1 distant msg -> group of 1 -> NULLed by the strict > gate
        t0 = datetime(2024, 1, 1, 8, 0, 0)
        rows = [
            (i, "c", t0 + timedelta(seconds=30 * i), [1.0, 0.0]) for i in range(1, 5)
        ] + [(9, "c", t0 + timedelta(hours=9), [0.0, 1.0])]
        df = spark.createDataFrame(
            rows, "event_id long, chat string, ts timestamp, embeddings array<double>"
        )
        out = process_message_groups(
            df, "embeddings", "ts", ["chat"], "event_id",
            time_window="5m", semantic_threshold=0.7, cluster_size=3,
        )
        got = {r["event_id"]: r["group_id"] for r in out.collect()}
        assert got[1] == got[2] == got[3] == got[4]
        assert got[1] is not None
        assert got[9] is None  # size-1 cluster gated out

    def test_single_shuffle_plan(self, spark):
        # the chained windows must share ONE sort+exchange per entity
        t0 = datetime(2024, 1, 1, 8, 0, 0)
        df = spark.createDataFrame(
            [(i, "c", t0 + timedelta(seconds=i), [1.0, 0.0]) for i in range(5)],
            "event_id long, chat string, ts timestamp, embeddings array<double>",
        )
        plan = (
            process_message_groups(df, "embeddings", "ts", ["chat"], "event_id")
            ._jdf.queryExecution().executedPlan().toString()
        )
        # one exchange for the window chain + one for the group-size count
        assert plan.count("Exchange hashpartitioning") <= 2


def test_sliding_distance_ignores_null_cosines_in_window(spark):
    """Review repro: one zero-norm vector in the trailing window nulled
    the aggregate and the coalesce reported 'perfectly similar' (0.0),
    suppressing a certain semantic break."""
    from terrorblade_spark.operators.semantic import sliding_distance

    df = spark.createDataFrame(
        [(1, 1, [1.0, 0.0]), (1, 2, [0.0, 0.0]), (1, 3, [-1.0, 0.0])],
        "chat long, i long, vec array<float>",
    )
    got = {
        r["i"]: r["distance"]
        for r in sliding_distance(df, "vec", ["chat"], ["i"], window=2).collect()
    }
    assert abs(got[3] - 2.0) < 1e-9  # cosine -1 vs row 1; null row ignored
