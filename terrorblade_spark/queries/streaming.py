"""Streaming query surface (SURVEY §2.12): the watermarked
session_window plan driven over the backlog with availableNow. The
oracle is the equivalent batch gap-sessionization — a streaming result
that hash-matches batch SQL is the strongest equivalence check
Structured Streaming admits.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from terrorblade_spark.registry import query

# ONE sessionization oracle template for the whole suite: a tie-break
# or gap-comparison fix in sessions.py must reach q47/q57 too
from terrorblade_spark.queries.sessions import _SESSIONIZE_SQL

_SESSIONIZE_30M = _SESSIONIZE_SQL.format(gap_ms=1_800_000, src="events")


@query(
    "q47_streaming_sessions",
    oracle=f"""
    SELECT user_id,
           min(ts) AS session_start,
           max(ts) + INTERVAL 30 MINUTE AS session_end,
           count(*) AS n_events,
           sum(CAST(value AS DECIMAL(18,6)))::DOUBLE AS total_value
    FROM ({_SESSIONIZE_30M})
    GROUP BY user_id, session_id
    ORDER BY user_id, session_start
    """,
)
def q47_streaming_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    from terrorblade_spark.streaming.pipeline import run_sessionization_batch

    return run_sessionization_batch(spark, sf_dir, gap="30 minutes").orderBy(
        "user_id", "session_start"
    )


# --- q57: custom stateful operator (applyInPandasWithState) ------------------
# Per-user running session/event counts with explicit state + event-time
# timeout eviction. The oracle is the equivalent batch sessionization
# rollup — a stateful stream that converges to the batch answer over the
# same backlog.

@query(
    "q57_stateful_session_counts",
    oracle=f"""
    SELECT user_id,
           CAST(max(session_id) + 1 AS BIGINT) AS n_sessions,
           count(*) AS n_events
    FROM ({_SESSIONIZE_30M})
    GROUP BY user_id
    ORDER BY user_id
    """,
)
def q57_stateful_session_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    from terrorblade_spark.streaming.pipeline import run_stateful_sessions_batch

    return run_stateful_sessions_batch(spark, sf_dir, gap_s=1800).orderBy("user_id")
