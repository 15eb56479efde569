"""Unit tests for relational building blocks: latest_by, idempotent
append, upsert, dictionary encoding (S5–S7, W1, J7 semantics).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from terrorblade_spark.operators.relational import (
    anti_join_new,
    apply_dictionary,
    dictionary_encode,
    idempotent_append,
    latest_by,
    scd_rollup,
    upsert_latest,
)


def test_latest_by_picks_newest_with_tiebreak(spark):
    df = spark.createDataFrame(
        [(1, "old", 10), (1, "new", 20), (2, "only", 5), (1, "tie", 20)],
        ["id", "name", "v"],
    )
    rows = latest_by(df, ["id"], [F.desc("v"), F.asc("name")]).orderBy("id").collect()
    assert [(r["id"], r["name"]) for r in rows] == [(1, "new"), (2, "only")]


def test_idempotent_append_dedups(spark):
    existing = spark.createDataFrame([(1, "a"), (2, "b")], ["k", "v"])
    new = spark.createDataFrame([(2, "DUP"), (3, "c")], ["k", "v"])
    merged = idempotent_append(new, existing, ["k"]).orderBy("k").collect()
    assert [(r["k"], r["v"]) for r in merged] == [(1, "a"), (2, "b"), (3, "c")]


def test_idempotent_append_is_idempotent(spark):
    existing = spark.createDataFrame([(1, "a")], ["k", "v"])
    new = spark.createDataFrame([(1, "a"), (2, "b")], ["k", "v"])
    once = idempotent_append(new, existing, ["k"])
    twice = idempotent_append(new, once, ["k"])
    assert sorted(twice.collect()) == sorted(once.collect())


def test_anti_join_new(spark):
    df = spark.createDataFrame([(1,), (2,), (3,)], ["k"])
    existing = spark.createDataFrame([(2,)], ["k"])
    assert sorted(r["k"] for r in anti_join_new(df, existing, ["k"]).collect()) == [1, 3]


def test_upsert_latest_replaces(spark):
    existing = spark.createDataFrame([(1, "old", 10), (2, "keep", 10)], ["k", "v", "ver"])
    new = spark.createDataFrame([(1, "new", 20), (3, "ins", 1)], ["k", "v", "ver"])
    rows = upsert_latest(new, existing, ["k"], "ver").orderBy("k").collect()
    assert [(r["k"], r["v"]) for r in rows] == [(1, "new"), (2, "keep"), (3, "ins")]


def test_dictionary_encode_dense_deterministic(spark):
    df = spark.createDataFrame([("b",), ("a",), ("b",), (None,), ("c",)], ["name"])
    dim = dictionary_encode(df, "name", "nid").orderBy("nid").collect()
    assert [(r["name"], r["nid"]) for r in dim] == [("a", 0), ("b", 1), ("c", 2)]


def test_dictionary_encode_start_id(spark):
    df = spark.createDataFrame([("x",), ("y",)], ["name"])
    dim = dictionary_encode(df, "name", "nid", start_id=100).orderBy("nid").collect()
    assert [(r["name"], r["nid"]) for r in dim] == [("x", 100), ("y", 101)]


def test_apply_dictionary(spark):
    df = spark.createDataFrame([(1, "photo"), (2, "video"), (3, None)], ["id", "media"])
    dim = dictionary_encode(df, "media", "mid")
    out = apply_dictionary(df, dim, "media", "mid").orderBy("id").collect()
    assert [r["media_id"] for r in out] == [0, 1, None]


def test_scd_rollup(spark):
    df = spark.createDataFrame(
        [(1, "n1", 10), (1, "n1", 30), (1, "n2", 20)], ["id", "name", "ts"]
    )
    rows = scd_rollup(df, ["id", "name"], "ts").orderBy("name").collect()
    assert [(r["name"], r["first_seen"], r["last_seen"]) for r in rows] == [
        ("n1", 10, 30),
        ("n2", 20, 20),
    ]
