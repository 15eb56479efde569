"""Unit tests for window/sessionization operators on tiny handcrafted
frames (reference-style edge cases: single rows, exact-gap boundaries,
null handling — SURVEY §5).
"""

from __future__ import annotations

from datetime import datetime

import pytest
from pyspark.sql import functions as F

from terrorblade_spark.operators.windows import (
    _parse_gap_seconds,
    context_collect,
    forward_fill,
    global_renumber,
    run_ids,
    sessionize,
    with_gap_ms,
)


def _events(spark, rows):
    """rows: (id, user, minute_offset[, label])"""
    base = datetime(2024, 1, 1)
    data = [
        (
            r[0],
            r[1],
            datetime(2024, 1, 1, r[2] // 60, r[2] % 60),
            r[3] if len(r) > 3 else None,
        )
        for r in rows
    ]
    return spark.createDataFrame(
        data, "id long, user string, ts timestamp, label string"
    )


def test_parse_gap_seconds():
    assert _parse_gap_seconds(90) == 90
    assert _parse_gap_seconds("5m") == 300
    assert _parse_gap_seconds("5 minutes") == 300
    assert _parse_gap_seconds("1h") == 3600
    assert _parse_gap_seconds("2 days") == 172800
    with pytest.raises(ValueError):
        _parse_gap_seconds("abc")


def test_gap_ms_first_row_null(spark):
    df = _events(spark, [(1, "u", 0), (2, "u", 5), (3, "u", 6)])
    rows = with_gap_ms(df, "ts", ["user"], "id").orderBy("id").collect()
    assert rows[0]["gap_ms"] is None
    assert rows[1]["gap_ms"] == 5 * 60 * 1000
    assert rows[2]["gap_ms"] == 1 * 60 * 1000


def test_sessionize_gap_boundary(spark):
    # gap EXACTLY equal to the window does NOT break (strict >),
    # matching the reference's `gap > window` semantics
    # (TextPreprocessor.py:202-206).
    df = _events(spark, [(1, "u", 0), (2, "u", 5), (3, "u", 11)])
    rows = (
        sessionize(df, "ts", ["user"], "id", gap="5m")
        .orderBy("id")
        .collect()
    )
    assert [r["session_id"] for r in rows] == [0, 0, 1]


def test_sessionize_per_user_and_zero_based(spark):
    df = _events(spark, [(1, "a", 0), (2, "b", 0), (3, "a", 120), (4, "b", 1)])
    rows = sessionize(df, "ts", ["user"], "id", gap="1h").orderBy("id").collect()
    sid = {r["id"]: r["session_id"] for r in rows}
    assert sid == {1: 0, 2: 0, 3: 1, 4: 0}


def test_sessionize_extra_break(spark):
    df = _events(spark, [(1, "u", 0, "x"), (2, "u", 1, "x"), (3, "u", 2, "y")])
    w_break = F.lag("label").over(
        __import__("pyspark").sql.Window.partitionBy("user").orderBy("ts", "id")
    )
    rows = (
        sessionize(df, "ts", ["user"], "id", gap="1h", extra_break=F.col("label") != w_break)
        .orderBy("id")
        .collect()
    )
    assert [r["session_id"] for r in rows] == [0, 0, 1]


def test_run_ids_single_row_and_changes(spark):
    df = _events(spark, [(1, "u", 0, "x")])
    assert run_ids(df, F.col("label"), ["user"], ["ts", "id"]).collect()[0]["run_id"] == 0

    df = _events(
        spark,
        [(1, "u", 0, "x"), (2, "u", 1, "x"), (3, "u", 2, "y"), (4, "u", 3, "x")],
    )
    rows = run_ids(df, F.col("label"), ["user"], ["ts", "id"]).orderBy("id").collect()
    assert [r["run_id"] for r in rows] == [0, 0, 1, 2]


def test_run_ids_null_values(spark):
    # null -> null is NOT a change (IS DISTINCT FROM semantics differ:
    # Spark's != returns null; coalesce(null, True) makes first row run 0
    # and null-vs-null comparisons break runs — document actual behavior)
    df = _events(spark, [(1, "u", 0, "x"), (2, "u", 1, None), (3, "u", 2, None)])
    rows = run_ids(df, F.col("label"), ["user"], ["ts", "id"]).orderBy("id").collect()
    # x -> null is a change; null -> null compares null -> coalesced True
    assert rows[0]["run_id"] == 0
    assert rows[1]["run_id"] == rows[0]["run_id"] + 1


def test_forward_fill(spark):
    df = _events(spark, [(1, "u", 0, "a"), (2, "u", 1, None), (3, "u", 2, "b"), (4, "u", 3, None)])
    rows = forward_fill(df, "label", ["user"], ["ts", "id"], "filled").orderBy("id").collect()
    assert [r["filled"] for r in rows] == ["a", "a", "b", "b"]


def test_forward_fill_leading_null(spark):
    df = _events(spark, [(1, "u", 0, None), (2, "u", 1, "a")])
    rows = forward_fill(df, "label", ["user"], ["ts", "id"], "filled").orderBy("id").collect()
    assert rows[0]["filled"] is None
    assert rows[1]["filled"] == "a"


def test_context_collect_edges(spark):
    df = _events(spark, [(i, "u", i) for i in range(1, 6)])
    rows = (
        context_collect(df, "id", ["user"], ["ts", "id"], before=2, after=2)
        .orderBy("id")
        .collect()
    )
    assert rows[0]["context"] == [1, 2, 3]  # truncated at partition start
    assert rows[2]["context"] == [1, 2, 3, 4, 5]
    assert rows[4]["context"] == [3, 4, 5]  # truncated at partition end


def test_global_renumber(spark):
    df = _events(spark, [(3, "u", 30), (1, "u", 10), (2, "u", 20)])
    rows = global_renumber(df, ["ts"], "n").orderBy("n").collect()
    assert [(r["n"], r["id"]) for r in rows] == [(0, 1), (1, 2), (2, 3)]


def test_run_ids_null_values_share_a_run(spark):
    """Review repro: adjacent NULL authors each started a new run
    (NULL != NULL is NULL -> 'changed'); they are the SAME run."""
    from pyspark.sql import functions as F

    from terrorblade_spark.operators.windows import run_ids

    df = spark.createDataFrame(
        [(1, 1, "a"), (1, 2, None), (1, 3, None), (1, 4, "a")],
        "chat long, i long, author string",
    )
    got = [
        r["run_id"]
        for r in run_ids(df, F.col("author"), ["chat"], ["i"]).orderBy("i").collect()
    ]
    assert got == [0, 1, 1, 2]


def test_run_ids_null_first_row_starts_run_zero(spark):
    from pyspark.sql import functions as F

    from terrorblade_spark.operators.windows import run_ids

    df = spark.createDataFrame([(1, 1, None), (1, 2, None)], "chat long, i long, author string")
    got = [r["run_id"] for r in run_ids(df, F.col("author"), ["chat"], ["i"]).orderBy("i").collect()]
    assert got == [0, 0]


# --- exact_quantiles ----------------------------------------------------------


def test_exact_quantiles_matches_numpy_linear(spark):
    import numpy as np

    from terrorblade_spark.operators.windows import exact_quantiles

    rng = np.random.default_rng(11)
    vals = np.round(rng.uniform(-50, 50, 501), 3)
    # inject heavy ties so tied candidate ranks are exercised
    vals[100:180] = 7.0
    df = spark.createDataFrame(
        [(int(i), float(v)) for i, v in enumerate(vals)], "id long, v double"
    )
    qs = (0.0, 0.01, 0.25, 0.5, 0.77, 0.9, 1.0)
    for n_parts in (1, 7):
        rows = {
            r["q"]: (r["pct_cont"], r["pct_disc"])
            for r in exact_quantiles(
                df.repartition(n_parts), "v", qs, tiebreak_cols=("id",)
            ).collect()
        }
        s = np.sort(vals)
        n = len(s)
        for q in qs:
            cont, disc = rows[q]
            # numpy 'linear' is the same (n-1)*q positioning; allow the
            # last-bit algebraic difference (convex vs lerp form)
            assert abs(cont - float(np.percentile(s, q * 100))) < 1e-9, q
            assert disc == float(s[max(int(np.ceil(q * n)) - 1, 0)]), q


def test_exact_quantiles_single_row_and_two_rows(spark):
    from terrorblade_spark.operators.windows import exact_quantiles

    one = spark.createDataFrame([(1, 42.0)], "id long, v double")
    r = exact_quantiles(one, "v", (0.0, 0.5, 1.0), tiebreak_cols=("id",)).collect()
    assert all(row["pct_cont"] == 42.0 and row["pct_disc"] == 42.0 for row in r)

    two = spark.createDataFrame([(1, 10.0), (2, 20.0)], "id long, v double")
    got = {
        row["q"]: (row["pct_cont"], row["pct_disc"])
        for row in exact_quantiles(two, "v", (0.5,), tiebreak_cols=("id",)).collect()
    }
    assert got[0.5] == (15.0, 10.0)  # cont interpolates, disc = first >= 0.5
