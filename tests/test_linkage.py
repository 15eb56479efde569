"""Fuzzy record linkage (operators/linkage.py)."""

from __future__ import annotations

import pytest

from terrorblade_spark.operators.linkage import best_fuzzy_match, fuzzy_match


def _df(spark, rows, schema):
    return spark.createDataFrame(rows, schema)


def test_fuzzy_match_blocked_edit_distance(spark):
    left = _df(spark, [(1, "A", "smith"), (2, "A", "jones"), (3, "B", "smith")],
               "lid long, lblk string, lname string")
    right = _df(spark, [(10, "A", "smyth"), (11, "A", "stone"), (12, "B", "smith")],
                "rid long, rblk string, rname string")
    got = {(r["lid"], r["rid"]): r["edit_distance"]
           for r in fuzzy_match(left, right, "lname", "rname",
                                [("lblk", "rblk")], max_edit=2).collect()}
    # smith~smyth d=1 within block A; cross-block smith/smith never pairs
    assert got[(1, 10)] == 1
    assert (3, 12) in got and got[(3, 12)] == 0
    assert (3, 10) not in got          # blocking respected
    assert (2, 11) not in got          # jones~stone d=3 > 2
    # exact distances, not just the -1 sentinel filter
    assert all(0 <= d <= 2 for d in got.values())


def test_fuzzy_match_excludes_threshold_sentinel_and_nulls(spark):
    """levenshtein(threshold) returns -1 past the band — a naive
    <= max_edit filter would KEEP those rows; NULL keys never match."""
    left = _df(spark, [(1, "A", "aaaaaaaa"), (2, "A", None)],
               "lid long, lblk string, lname string")
    right = _df(spark, [(10, "A", "zzzzzzzz"), (11, "A", None)],
                "rid long, rblk string, rname string")
    got = fuzzy_match(left, right, "lname", "rname", [("lblk", "rblk")], 2).collect()
    assert got == []


def test_fuzzy_match_requires_blocking(spark):
    left = _df(spark, [(1, "x")], "lid long, lname string")
    right = _df(spark, [(2, "x")], "rid long, rname string")
    with pytest.raises(ValueError, match="blocking"):
        fuzzy_match(left, right, "lname", "rname", [])


def test_best_fuzzy_match_min_distance_deterministic_tiebreak(spark):
    left = _df(spark, [(1, "A", "smith")], "lid long, lblk string, lname string")
    right = _df(spark, [(10, "A", "smyth"), (11, "A", "smith"), (12, "A", "smite")],
                "rid long, rblk string, rname string")
    got = best_fuzzy_match(left, right, "lname", "rname", [("lblk", "rblk")],
                           id_l="lid", tiebreak_r="rid", max_edit=2).collect()
    assert len(got) == 1 and got[0]["rid"] == 11 and got[0]["edit_distance"] == 0
    # ties on distance go to the smallest tiebreak id
    right2 = _df(spark, [(20, "A", "smyth"), (21, "A", "smite")],
                 "rid long, rblk string, rname string")
    got2 = best_fuzzy_match(left, right2, "lname", "rname", [("lblk", "rblk")],
                            id_l="lid", tiebreak_r="rid", max_edit=2).collect()
    assert len(got2) == 1 and got2[0]["rid"] == 20 and got2[0]["edit_distance"] == 1


def test_fuzzy_match_agrees_with_duckdb_levenshtein(spark, duck):
    """The kernel's banded distances equal DuckDB's full levenshtein
    on every kept pair (the q108 oracle contract)."""
    words = ["alpha", "alps", "alpine", "beta", "betta", "bet", "gamma", "gama"]
    left = _df(spark, [(i, "blk", w) for i, w in enumerate(words)],
               "lid long, lblk string, lname string")
    right = _df(spark, [(100 + i, "blk", w[::-1][::-1] + ("s" if i % 2 else ""))
                        for i, w in enumerate(words)],
                "rid long, rblk string, rname string")
    got = {(r["lid"], r["rid"]): r["edit_distance"]
           for r in fuzzy_match(left, right, "lname", "rname",
                                [("lblk", "rblk")], max_edit=2).collect()}
    import itertools
    want = {}
    for (i, w), (j, v) in itertools.product(enumerate(words), repeat=2):
        v2 = v + ("s" if j % 2 else "")
        d = duck.execute("SELECT levenshtein(?, ?)", [w, v2]).fetchone()[0]
        if d <= 2:
            want[(i, 100 + j)] = d
    assert got == want


def test_blocking_keys(spark):
    from pyspark.sql import functions as F

    from terrorblade_spark.operators.linkage import blocking_key

    df = spark.createDataFrame(
        [("Smith, John",), ("john SMITH",), ("Smyth John",), ("Jon Smith",)],
        "name string",
    )
    got = df.select(
        blocking_key("name", "prefix", 3).alias("p"),
        blocking_key("name", "soundex").alias("s"),
        blocking_key("name", "token_sort").alias("t"),
    ).collect()
    # token_sort: word order and punctuation collapse
    assert got[0]["t"] == got[1]["t"] == "john smith"
    assert got[2]["t"] == "john smyth"
    # soundex buckets the phonetic twins ("Smith," and "Smyth ..." share S530)
    assert got[0]["s"] == got[2]["s"]
    assert got[0]["p"] == "smi"
    with pytest.raises(ValueError, match="unknown blocking kind"):
        df.select(blocking_key("name", "metaphone"))


def test_blocking_key_feeds_fuzzy_match(spark):
    from pyspark.sql import functions as F

    from terrorblade_spark.operators.linkage import blocking_key, fuzzy_match

    left = spark.createDataFrame([(1, "Smith, John")], "lid long, lname string")
    right = spark.createDataFrame([(2, "john smith"), (3, "jane smith")],
                                  "rid long, rname string")
    lb = left.withColumn("lk", blocking_key("lname", "token_sort"))
    rb = right.withColumn("rk", blocking_key("rname", "token_sort"))
    # match on the NORMALIZED key strings within token_sort blocks
    m = fuzzy_match(lb.withColumn("lnorm", F.col("lk")),
                    rb.withColumn("rnorm", F.col("rk")),
                    "lnorm", "rnorm", [("lk", "rk")], max_edit=0).collect()
    assert [(r["lid"], r["rid"]) for r in m] == [(1, 2)]
