"""As-of / range join tests: semantics on crafted rows, a DuckDB
ASOF JOIN twin on real tables, and plan shape (no nested-loop join).
"""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from terrorblade_spark.operators.temporal import asof_join, range_join


def test_asof_join_backward_semantics(spark):
    trades = spark.createDataFrame(
        [("A", 10.0, 1), ("A", 20.0, 2), ("A", 25.0, 3), ("B", 5.0, 4)],
        "sym string, t double, trade_id long",
    )
    quotes = spark.createDataFrame(
        [("A", 9.0, 100.0), ("A", 20.0, 101.0), ("A", 30.0, 102.0), ("C", 1.0, 999.0)],
        "sym string, t double, px double",
    )
    got = {
        r["trade_id"]: r["r_px"]
        for r in asof_join(trades, quotes, on="t", by=["sym"]).collect()
    }
    assert got[1] == 100.0  # 9.0 quote is latest <= 10.0
    assert got[2] == 101.0  # equal timestamp IS visible
    assert got[3] == 101.0  # 30.0 is in the future
    assert got[4] is None   # no quotes for B


def test_asof_join_tolerance(spark):
    left = spark.createDataFrame([("A", 100.0, 1)], "k string, t double, id long")
    right = spark.createDataFrame([("A", 10.0, 5.0)], "k string, t double, v double")
    with_tol = asof_join(left, right, on="t", by=["k"], tolerance_s=50.0).collect()[0]
    assert with_tol["r_v"] is None  # match is 90s old, tolerance 50s
    no_tol = asof_join(left, right, on="t", by=["k"]).collect()[0]
    assert no_tol["r_v"] == 5.0


def test_asof_join_matches_duckdb_on_events(spark, duck, sf_dir):
    from terrorblade_spark.tables import load_table

    ev = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", F.unix_micros("ts").alias("tus"), "value"
    )
    # right side: each user's events value stream; left: the same events
    # shifted — every event asof-joins the latest event at least 1h older
    left = ev.select("event_id", "user_id", (F.col("tus") - 3600_000_000).alias("tq"))
    right = ev.select("user_id", F.col("tus").alias("tq"), F.col("value").alias("v"))
    got = {
        r["event_id"]: r["r_v"]
        for r in asof_join(left, right, on="tq", by=["user_id"]).collect()
    }
    want = {
        r[0]: r[1]
        for r in duck.execute(
            """
            WITH ev AS (
              SELECT event_id, user_id,
                     epoch_us(ts::TIMESTAMP) AS tus, value
              FROM events
            ),
            l AS (SELECT event_id, user_id, tus - 3600000000 AS tq FROM ev),
            r AS (SELECT user_id, tus AS tq, value AS v FROM ev)
            SELECT l.event_id, r.v
            FROM l ASOF LEFT JOIN r
              ON l.user_id = r.user_id AND l.tq >= r.tq
            """
        ).fetchall()
    }
    assert got == want


def test_asof_join_plan_no_nested_loop(spark):
    left = spark.createDataFrame([("A", 1.0, 1)], "k string, t double, id long")
    right = spark.createDataFrame([("A", 1.0, 2.0)], "k string, t double, v double")
    plan = (
        asof_join(left, right, on="t", by=["k"])
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_range_join_containment(spark):
    points = spark.createDataFrame(
        [("u1", 10.0, 1), ("u1", 3600.0, 2), ("u1", 99999.0, 3), ("u2", 10.0, 4)],
        "user string, t double, pid long",
    )
    intervals = spark.createDataFrame(
        [("u1", 0.0, 5000.0, "s1"), ("u1", 3000.0, 4000.0, "s2"), ("u2", 20.0, 30.0, "s3")],
        "user string, s double, e double, sid string",
    )
    got = sorted(
        (r["pid"], r["sid"])
        for r in range_join(points, intervals, "t", "s", "e", by=["user"]).collect()
    )
    # pid1 in s1; pid2 in s1 AND s2 (3600 in [3000,4000)); pid3 nowhere;
    # pid4 outside s3
    assert got == [(1, "s1"), (2, "s1"), (2, "s2")]


def test_range_join_left_keeps_unmatched(spark):
    points = spark.createDataFrame(
        [("u1", 10.0, 1), ("u1", 7000.0, 2)], "user string, t double, pid long"
    )
    intervals = spark.createDataFrame(
        [("u1", 0.0, 100.0, "s1")], "user string, s double, e double, sid string"
    )
    got = {
        r["pid"]: r["sid"]
        for r in range_join(
            points, intervals, "t", "s", "e", by=["user"], how="left"
        ).collect()
    }
    assert got == {1: "s1", 2: None}


def test_range_join_chunk_boundary_exclusive_end(spark):
    # end exactly on a chunk boundary: point at end must NOT match
    points = spark.createDataFrame([("k", 7200.0, 1)], "g string, t double, pid long")
    intervals = spark.createDataFrame(
        [("k", 0.0, 7200.0, "s")], "g string, s double, e double, sid string"
    )
    assert (
        range_join(points, intervals, "t", "s", "e", by=["g"], chunk_s=3600.0).count() == 0
    )


def test_resample_dense_grid_and_zero_fill(spark):
    ev = spark.createDataFrame(
        [
            (1, "2024-01-01 00:10:00", 2.0),
            (1, "2024-01-01 00:40:00", 3.0),
            # 01:00 hour is EMPTY for u1 -> grid row with 0
            (1, "2024-01-01 02:05:00", 5.0),
            (2, "2024-01-01 03:00:00", 7.0),
        ],
        "user_id long, ts_s string, value double",
    ).select("user_id", F.to_timestamp("ts_s").alias("ts"), "value")
    from terrorblade_spark.operators.temporal import resample_events

    rows = resample_events(ev, step="1 hour", agg="sum").collect()
    got = {(r["user_id"], r["bucket"].hour): r["sum_value"] for r in rows}
    assert got == {(1, 0): 5.0, (1, 1): 0.0, (1, 2): 5.0, (2, 3): 7.0}
    # grid spans each entity's own range only: u2 has exactly one row
    assert sum(1 for r in rows if r["user_id"] == 2) == 1


def test_resample_ffill_carries_last_value(spark):
    ev = spark.createDataFrame(
        [
            (1, "2024-01-01 00:00:00", 10.0),
            (1, "2024-01-01 03:00:00", 40.0),
        ],
        "user_id long, ts_s string, value double",
    ).select("user_id", F.to_timestamp("ts_s").alias("ts"), "value")
    from terrorblade_spark.operators.temporal import resample_events

    rows = resample_events(ev, step="1 hour", agg="max", fill="ffill").collect()
    vals = [r["max_value"] for r in sorted(rows, key=lambda r: r["bucket"])]
    assert vals == [10.0, 10.0, 10.0, 40.0]


def test_resample_matches_duckdb_on_events(spark, duck, sf_dir):
    from terrorblade_spark.operators.temporal import resample_events
    from terrorblade_spark.tables import load_table

    ev = load_table(spark, sf_dir, "events")
    got = {
        (r["user_id"], r["bucket"]): r["sum_value"]
        for r in resample_events(ev, step="1 day", agg="sum").collect()
    }
    sql = """
    WITH partials AS (
      SELECT user_id, date_trunc('day', ts) AS bucket,
             sum(value) AS v
      FROM events GROUP BY 1, 2
    ), spans AS (
      SELECT user_id, min(bucket) AS lo, max(bucket) AS hi FROM partials GROUP BY 1
    ), grid AS (
      SELECT user_id, unnest(generate_series(lo, hi, INTERVAL 1 DAY)) AS bucket
      FROM spans
    )
    SELECT g.user_id, g.bucket, coalesce(p.v, 0) AS v
    FROM grid g LEFT JOIN partials p USING (user_id, bucket)
    """
    want = {(u, b): v for u, b, v in duck.execute(sql).fetchall()}
    assert set(got) == set(want)
    # sums are float folds over differing orders -> compare tolerantly
    import math

    assert all(math.isclose(got[k], want[k], rel_tol=1e-9, abs_tol=1e-9) for k in got)


def test_range_join_left_null_payload_no_phantom_rows(spark):
    """Review repro: a matched point with a NULL payload column must
    come back ONCE, not again as a phantom unmatched row (the anti-join
    must be null-safe)."""
    from terrorblade_spark.operators.temporal import range_join

    pts = spark.createDataFrame(
        [(1, 100.0, None), (1, 999999.0, None)], "user_id long, ts double, payload string"
    )
    ivals = spark.createDataFrame(
        [(1, 50.0, 200.0)], "user_id long, start_ts double, end_ts double"
    )
    out = range_join(pts, ivals, "ts", "start_ts", "end_ts", by=["user_id"],
                     chunk_s=100.0, how="left").collect()
    matched = [r for r in out if r["ts"] == 100.0]
    unmatched = [r for r in out if r["ts"] == 999999.0]
    assert len(matched) == 1 and matched[0]["start_ts"] == 50.0
    assert len(unmatched) == 1 and unmatched[0]["start_ts"] is None


def test_asof_join_payload_free_right_side(spark):
    """Review repro: a right table with only (key, ts) — tolerance
    checks — must not ParseException on the struct DDL."""
    from terrorblade_spark.operators.temporal import asof_join

    left = spark.createDataFrame([(1, 10.0), (1, 20.0)], "k long, t double")
    right = spark.createDataFrame([(1, 15.0)], "k long, t double")
    out = asof_join(left, right, on="t", by=["k"]).collect()
    assert len(out) == 2  # no crash; left rows all survive


# --- ewma --------------------------------------------------------------------

from terrorblade_spark.operators.temporal import ewma


def _ewma_vals(df):
    return {r["i"]: r["ewma"] for r in df.collect()}


def test_ewma_hand_computed(spark):
    import pytest as _pt

    df = spark.createDataFrame(
        [(1, 1, 10.0), (1, 2, 20.0), (1, 3, 30.0)], "g long, i long, value double"
    )
    got = _ewma_vals(ewma(df, "value", ["g"], ["i"], alpha=0.5, window=4))
    assert got[1] == _pt.approx(10.0)
    assert got[2] == _pt.approx((20 + 0.5 * 10) / 1.5)
    assert got[3] == _pt.approx((30 + 0.5 * 20 + 0.25 * 10) / 1.75)


def test_ewma_window_truncates(spark):
    import pytest as _pt

    df = spark.createDataFrame(
        [(1, 1, 10.0), (1, 2, 20.0), (1, 3, 30.0)], "g long, i long, value double"
    )
    got = _ewma_vals(ewma(df, "value", ["g"], ["i"], alpha=0.5, window=2))
    # row 3 sees only [20, 30]: (30 + 0.5*20) / 1.5
    assert got[3] == _pt.approx((30 + 0.5 * 20) / 1.5)


def test_ewma_partitions_independent(spark):
    import pytest as _pt

    df = spark.createDataFrame(
        [(1, 1, 10.0), (2, 2, 99.0)], "g long, i long, value double"
    )
    got = _ewma_vals(ewma(df, "value", ["g"], ["i"]))
    assert got[1] == _pt.approx(10.0) and got[2] == _pt.approx(99.0)


def test_ewma_null_positions_age_weights(spark):
    """NULL rows occupy a frame slot (ages keep advancing, pandas
    ewm(ignore_na=False)) but contribute to neither numerator nor
    denominator; an all-NULL frame yields NULL, never a crash."""
    df = spark.createDataFrame(
        [("a", 1, 1.0), ("a", 2, None), ("a", 3, 2.0), ("b", 1, None)],
        "g string, i int, value double",
    )
    out = ewma(df, "value", ["g"], ["g", "i"], alpha=0.5, window=4)
    got = _ewma_vals(out.where(F.col("g") == "a"))
    # row i=2 (NULL): only the age-1 value 1.0 is valid -> 1.0 exactly
    assert got[1] == pytest.approx(1.0)
    assert got[2] == pytest.approx(1.0)
    # row i=3: (1*2.0 + 0.25*1.0) / (1 + 0.25); the age-1 NULL slot
    # ages the older value to weight 0.25 but adds no denominator mass
    assert got[3] == pytest.approx(2.25 / 1.25)
    assert out.where(F.col("g") == "b").collect()[0]["ewma"] is None


def test_ewma_rejects_bad_params(spark):
    import pytest as _pt

    df = spark.createDataFrame([(1, 1, 1.0)], "g long, i long, value double")
    with _pt.raises(ValueError):
        ewma(df, "value", ["g"], ["i"], alpha=1.0)
    with _pt.raises(ValueError):
        ewma(df, "value", ["g"], ["i"], window=0)
