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


def test_idempotent_append_null_keys_not_redppended(spark):
    """Review repro: NULL key parts always classified as 'new' under a
    null-unsafe anti-join — every retry re-appended the same row."""
    from terrorblade_spark.operators.relational import idempotent_append

    existing = spark.createDataFrame([(None, 1), (2, 2)], "k long, v long")
    batch = spark.createDataFrame([(None, 1), (3, 3)], "k long, v long")
    out = idempotent_append(batch, existing, ["k"])
    assert out.count() == 3  # the NULL-keyed row is NOT duplicated
    out2 = idempotent_append(batch, out, ["k"])
    assert out2.count() == 3  # stable under replay


def test_upsert_latest_version_tie_prefers_new_row(spark):
    """Review repro: version ties were decided by shuffle order (the
    'tiebreaker' was the constant partition key) — REPLACE semantics
    require the new row to win."""
    from terrorblade_spark.operators.relational import upsert_latest

    existing = spark.createDataFrame([(1, 5, "old")], "k long, ver long, name string")
    new = spark.createDataFrame([(1, 5, "new")], "k long, ver long, name string")
    got = upsert_latest(new, existing, ["k"], "ver").collect()
    assert len(got) == 1 and got[0]["name"] == "new"


def test_apply_dictionary_with_conflicting_id_column(spark):
    """Review repro: df already carrying an 'id' column got two
    identically-named output columns."""
    from terrorblade_spark.operators.relational import (
        apply_dictionary,
        dictionary_encode,
    )

    df = spark.createDataFrame([(10, "red"), (11, "blue")], "id long, color string")
    dim = dictionary_encode(df, "color")
    out = apply_dictionary(df, dim, "color", "id")
    assert sorted(out.columns) == ["color_id", "id"]
    got = {r["id"]: r["color_id"] for r in out.collect()}
    assert got[11] == 0 and got[10] == 1  # blue < red by sort order


def test_dataset_diff_statuses(spark):
    from terrorblade_spark.operators.relational import dataset_diff

    old = spark.createDataFrame(
        [(1, "a", 1.0), (2, "b", 2.0), (3, "c", None), (4, "d", 4.0)],
        "id long, t string, v double",
    )
    new = spark.createDataFrame(
        [(2, "b", 2.0), (3, "c", 3.0), (4, None, 4.0), (5, "e", 5.0)],
        "id long, t string, v double",
    )
    got = {r["id"]: r["status"] for r in dataset_diff(old, new, "id", ["t", "v"]).collect()}
    assert got == {
        1: "removed",
        2: "unchanged",
        3: "changed",   # NULL -> 3.0 is a change, not a join-drop
        4: "changed",   # 'd' -> NULL likewise
        5: "added",
    }


def test_dataset_diff_null_sentinel_no_collision(spark):
    """('a', NULL) must differ from ('a', '') and from a shifted
    concat — the NULL sentinel and field separator prevent both."""
    from terrorblade_spark.operators.relational import dataset_diff

    old = spark.createDataFrame([(1, "a", None), (2, "ab", "c")],
                                "id long, x string, y string")
    new = spark.createDataFrame([(1, "a", ""), (2, "a", "bc")],
                                "id long, x string, y string")
    got = {r["id"]: r["status"] for r in dataset_diff(old, new, "id", ["x", "y"]).collect()}
    assert got == {1: "changed", 2: "changed"}
