"""Funnel + cohort retention: DuckDB twins over the events table and
hand-built edge cases (broken funnels, conversion windows)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from terrorblade_spark.operators.funnel import (
    funnel_counts,
    funnel_steps,
    retention_matrix,
)
from terrorblade_spark.tables import load_table


@pytest.fixture(scope="module")
def events(spark, sf_dir):
    return load_table(spark, sf_dir, "events")


@pytest.fixture(scope="module")
def step_types(duck):
    rows = duck.execute(
        "SELECT event_type FROM events GROUP BY 1 ORDER BY count(*) DESC LIMIT 3"
    ).fetchall()
    return [r[0] for r in rows]


def test_funnel_steps_match_duckdb(events, duck, step_types):
    s1, s2, s3 = step_types
    got = {
        r["user_id"]: (r["t_1"], r["t_2"], r["t_3"], r["steps_completed"])
        for r in funnel_steps(events, [s1, s2, s3]).collect()
    }
    want = {}
    sql = f"""
    WITH f1 AS (
      SELECT user_id, min(ts) AS t1 FROM events WHERE event_type = '{s1}' GROUP BY 1
    ), f2 AS (
      SELECT e.user_id, min(e.ts) AS t2 FROM events e JOIN f1 USING (user_id)
      WHERE e.event_type = '{s2}' AND e.ts > f1.t1 GROUP BY 1
    ), f3 AS (
      SELECT e.user_id, min(e.ts) AS t3 FROM events e JOIN f2 USING (user_id)
      WHERE e.event_type = '{s3}' AND e.ts > f2.t2 GROUP BY 1
    )
    SELECT f1.user_id, f1.t1, f2.t2, f3.t3
    FROM f1 LEFT JOIN f2 USING (user_id) LEFT JOIN f3 USING (user_id)
    """
    for uid, t1, t2, t3 in duck.execute(sql).fetchall():
        want[uid] = (t1, t2, t3, 1 + (t2 is not None) + (t3 is not None))
    assert got == want


def test_funnel_counts_monotone_and_based(events, step_types):
    rows = funnel_counts(events, step_types).collect()
    assert [r["step"] for r in rows] == [1, 2, 3]
    ns = [r["n_entities"] for r in rows]
    assert ns[0] >= ns[1] >= ns[2]  # a funnel can only narrow
    assert rows[0]["conversion"] == 1.0
    for r in rows:
        assert r["conversion"] == r["n_entities"] / ns[0]


def test_funnel_conversion_window(spark):
    ev = spark.createDataFrame(
        [
            # u1 completes within the window; u2's step B is too late
            (1, "A", "2024-01-01 00:00:00"),
            (1, "B", "2024-01-01 00:30:00"),
            (2, "A", "2024-01-01 00:00:00"),
            (2, "B", "2024-01-01 02:30:00"),
            # u3 does B BEFORE A: ordering must break the funnel
            (3, "B", "2024-01-01 00:00:00"),
            (3, "A", "2024-01-01 00:10:00"),
        ],
        "user_id long, event_type string, ts_s string",
    ).select("user_id", "event_type", F.to_timestamp("ts_s").alias("ts"))
    got = {
        r["user_id"]: r["steps_completed"]
        for r in funnel_steps(ev, ["A", "B"], within_ms=3_600_000).collect()
    }
    assert got == {1: 2, 2: 1, 3: 1}


def test_retention_matrix_matches_duckdb(events, duck):
    got = {
        (r["cohort"], r["offset"]): r["n_active"]
        for r in retention_matrix(events, period="week").collect()
    }
    sql = """
    WITH firsts AS (
      SELECT user_id, min(date_trunc('week', ts))::DATE AS cohort
      FROM events GROUP BY 1
    ), activity AS (
      SELECT DISTINCT user_id, date_trunc('week', ts)::DATE AS p FROM events
    )
    SELECT cohort, (p - cohort) / 7 AS offset, count(DISTINCT user_id) AS n
    FROM activity JOIN firsts USING (user_id)
    GROUP BY 1, 2
    """
    want = {(c, int(o)): n for c, o, n in duck.execute(sql).fetchall()}
    assert got == want
    # offset-0 cell of each cohort is the cohort size (everyone is
    # active in their own first week by construction)
    cohort_sizes = {}
    for (c, o), n in got.items():
        if o == 0:
            cohort_sizes[c] = n
    assert all(
        n <= cohort_sizes[c] for (c, o), n in got.items()
    ), "no later-week cell can exceed its cohort size"


def test_funnel_empty_base_reports_zero(spark, events):
    rows = funnel_counts(events, ["no_such_event_type", "also_missing"]).collect()
    assert [r["n_entities"] for r in rows] == [0, 0]
    assert all(r["conversion"] == 0.0 for r in rows)
