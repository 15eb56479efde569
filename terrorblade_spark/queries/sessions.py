"""Sessionization + time-window query surface (SURVEY §2.5 W4, §2.9 E2,
§2.12) over the events table: gap sessions, native session_window,
tumbling/sliding windows, and the full Q7 'long message groups' analog.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from terrorblade_spark.functions.exprs import csv_join, dec_sum
from terrorblade_spark.operators.windows import global_renumber, sessionize
from terrorblade_spark.registry import query
from terrorblade_spark.tables import load_table

_SESSIONIZE_SQL = """
      SELECT *,
             CAST(sum(CASE WHEN gap_ms IS NULL OR gap_ms > {gap_ms} THEN 1 ELSE 0 END)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS UNBOUNDED PRECEDING) - 1 AS BIGINT) AS session_id
      FROM (
        SELECT *, epoch_ms(ts) - lag(epoch_ms(ts))
                    OVER (PARTITION BY user_id ORDER BY ts, event_id) AS gap_ms
        FROM {src}
      )
"""


# --- q19: session assignment (W4/E2 cumsum-of-breaks) -----------------------

@query(
    "q19_session_assignment",
    oracle=f"""
    SELECT event_id, user_id, ts, session_id
    FROM ({_SESSIONIZE_SQL.format(gap_ms=3600000, src="events")})
    ORDER BY user_id, ts, event_id
    """,
)
def q19_session_assignment(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    s = sessionize(e, "ts", ["user_id"], "event_id", gap="1 hour")
    return s.select("event_id", "user_id", "ts", "session_id").orderBy(
        "user_id", "ts", "event_id"
    )


# --- q20: per-session rollup (A8 with min-size gate A3) ---------------------

@query(
    "q20_session_stats",
    oracle=f"""
    SELECT user_id, session_id,
           count(*) AS n_events,
           min(ts) AS session_start,
           max(ts) AS session_end,
           epoch_ms(max(ts)) - epoch_ms(min(ts)) AS duration_ms,
           count(DISTINCT event_type) AS n_event_types,
           sum(CAST(value AS DECIMAL(18,6)))::DOUBLE AS total_value,
           array_to_string(array_agg(event_id ORDER BY ts, event_id), ',') AS event_ids
    FROM ({_SESSIONIZE_SQL.format(gap_ms=3600000, src="events")})
    GROUP BY user_id, session_id
    HAVING count(*) >= 3
    ORDER BY user_id, session_id
    """,
)
def q20_session_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    # event_ids is comma-joined: the harness cannot hash list cells
    e = load_table(spark, sf_dir, "events")
    s = sessionize(e, "ts", ["user_id"], "event_id", gap="1 hour")
    ordered = F.array_sort(F.collect_list(F.struct("ts", "event_id")))
    return (
        s.groupBy("user_id", "session_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            (F.unix_millis(F.max("ts")) - F.unix_millis(F.min("ts"))).alias("duration_ms"),
            F.countDistinct("event_type").alias("n_event_types"),
            dec_sum("value", 6).alias("total_value"),
            csv_join(F.transform(ordered, lambda x: x.event_id)).alias("event_ids"),
        )
        .where(F.col("n_events") >= 3)
        .orderBy("user_id", "session_id")
    )


# --- q23: sliding windows (1h window, 30m slide) ----------------------------
# Also the §2.12 tumbling-window evidence: a tumbling window is the
# slide == width special case of the same window() operator, and the
# streaming session_window path is exercised end-to-end by q47.

@query(
    "q23_sliding_windows",
    oracle="""
    WITH assigned AS (
      SELECT time_bucket(INTERVAL '30 minutes', ts) AS w0, user_id, value FROM events
    ), exploded AS (
      SELECT w0 AS window_start, user_id, value FROM assigned
      UNION ALL
      SELECT w0 - INTERVAL 30 MINUTE AS window_start, user_id, value FROM assigned
    )
    SELECT window_start, count(*) AS n_events,
           sum(CAST(value AS DECIMAL(18,6)))::DOUBLE AS total_value
    FROM exploded
    GROUP BY 1
    ORDER BY 1
    """,
)
def q23_sliding_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"))
        .agg(F.count(F.lit(1)).alias("n_events"), dec_sum("value", 6).alias("total_value"))
        .select(F.col("w.start").alias("window_start"), "n_events", "total_value")
        .orderBy("window_start")
    )


# --- q24: long-session mining — the Q7 flagship pipeline --------------------

@query(
    "q24_long_session_mining",
    oracle="""
    WITH long_events AS (
      SELECT * FROM events WHERE value >= 50
    ), sess AS (
      SELECT *,
             CAST(sum(CASE WHEN gap_ms IS NULL OR gap_ms > 7200000 THEN 1 ELSE 0 END)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS UNBOUNDED PRECEDING) - 1 AS BIGINT) AS session_id
      FROM (
        SELECT *, epoch_ms(ts) - lag(epoch_ms(ts))
                    OVER (PARTITION BY user_id ORDER BY ts, event_id) AS gap_ms
        FROM long_events
      )
    ), grouped AS (
      SELECT user_id, session_id,
             count(*) AS n_events,
             min(ts) AS start_time,
             max(ts) AS end_time,
             epoch_ms(max(ts)) - epoch_ms(min(ts)) AS duration_ms,
             count(DISTINCT event_type) AS n_event_types,
             sum(CAST(value AS DECIMAL(18,6)))::DOUBLE AS total_value,
             array_to_string(array_agg(event_id ORDER BY ts, event_id), ',') AS event_ids
      FROM sess
      GROUP BY user_id, session_id
      HAVING count(*) >= 3
    )
    SELECT CAST(row_number() OVER (ORDER BY start_time, user_id) - 1 AS BIGINT) AS group_number,
           user_id, n_events, start_time, end_time, duration_ms,
           n_event_types, total_value, event_ids
    FROM grouped
    ORDER BY group_number
    """,
)
def q24_long_session_mining(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events").where(F.col("value") >= 50)
    s = sessionize(e, "ts", ["user_id"], "event_id", gap="2 hours")
    ordered = F.array_sort(F.collect_list(F.struct("ts", "event_id")))
    grouped = (
        s.groupBy("user_id", "session_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("ts").alias("start_time"),
            F.max("ts").alias("end_time"),
            (F.unix_millis(F.max("ts")) - F.unix_millis(F.min("ts"))).alias("duration_ms"),
            F.countDistinct("event_type").alias("n_event_types"),
            dec_sum("value", 6).alias("total_value"),
            csv_join(F.transform(ordered, lambda x: x.event_id)).alias("event_ids"),
        )
        .where(F.col("n_events") >= 3)
    )
    return (
        global_renumber(grouped, ["start_time", "user_id"], "group_number")
        .select(
            "group_number", "user_id", "n_events", "start_time", "end_time",
            "duration_ms", "n_event_types", "total_value", "event_ids",
        )
        .orderBy("group_number")
    )


# --- q62: seeded random qualifying cluster (O6) ------------------------------
# The reference picks a random cluster among those with >= min_size
# messages (telegram_database.py:482-517, random.choice over the
# qualifying ids). Re-expressed engine-portably: order qualifying
# sessions by a seeded md5 of the cluster key and take the first — a
# deterministic "random" draw that DuckDB reproduces bit-for-bit, and
# at scale a TakeOrderedAndProject over post-agg rows (no global sort
# of raw events) followed by a 1-row broadcast join back.

@query(
    "q62_random_cluster",
    oracle=f"""
    WITH s AS ({_SESSIONIZE_SQL.format(gap_ms=3600000, src="events")}),
    pick AS (
      SELECT user_id, session_id FROM s
      GROUP BY user_id, session_id
      HAVING count(*) >= 3
      ORDER BY md5('42:' || user_id::VARCHAR || ':' || session_id::VARCHAR)
      LIMIT 1
    )
    SELECT s.event_id, s.user_id, s.session_id, s.ts, s.event_type, s.value
    FROM s JOIN pick USING (user_id, session_id)
    ORDER BY s.ts, s.event_id
    """,
)
def q62_random_cluster(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    s = sessionize(e, "ts", ["user_id"], "event_id", gap="1 hour")
    pick = (
        s.groupBy("user_id", "session_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .where(F.col("n_events") >= 3)
        .withColumn(
            "draw",
            F.md5(
                F.concat_ws(
                    ":",
                    F.lit("42"),
                    F.col("user_id").cast("string"),
                    F.col("session_id").cast("string"),
                )
            ),
        )
        .orderBy("draw")
        .limit(1)
        .select("user_id", "session_id")
    )
    return (
        s.join(F.broadcast(pick), ["user_id", "session_id"])
        .select("event_id", "user_id", "session_id", "ts", "event_type", "value")
        .orderBy("ts", "event_id")
    )


# --- q25: overlap context around sessions (W8, set-wise — no driver loop) ---

@query(
    "q25_session_overlap_context",
    oracle=f"""
    WITH seqd AS (
      SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS seq
      FROM events
    ), sess AS (
      SELECT user_id, session_id, min(seq) AS min_seq, max(seq) AS max_seq, min(ts) AS session_start
      FROM ({_SESSIONIZE_SQL.format(gap_ms=3600000, src="seqd")})
      GROUP BY user_id, session_id
      HAVING count(*) >= 3
    )
    SELECT s.user_id, s.session_id,
           count(*) AS n_with_context,
           array_to_string(array_agg(e.event_id ORDER BY e.seq), ',') AS context_event_ids
    FROM sess s JOIN seqd e
      ON e.user_id = s.user_id AND e.seq BETWEEN s.min_seq - 3 AND s.max_seq + 3
    GROUP BY s.user_id, s.session_id
    ORDER BY s.user_id, s.session_id
    """,
)
def q25_session_overlap_context(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seqd = e.withColumn("seq", F.row_number().over(w))
    sess = (
        sessionize(seqd, "ts", ["user_id"], "event_id", gap="1 hour")
        .groupBy("user_id", "session_id")
        .agg(
            F.min("seq").alias("min_seq"),
            F.max("seq").alias("max_seq"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .where(F.col("n_events") >= 3)
    )
    joined = sess.alias("s").join(
        seqd.alias("e"),
        (F.col("e.user_id") == F.col("s.user_id"))
        & F.col("e.seq").between(F.col("s.min_seq") - 3, F.col("s.max_seq") + 3),
    )
    ordered = F.array_sort(F.collect_list(F.struct(F.col("e.seq"), F.col("e.event_id"))))
    return (
        joined.groupBy(F.col("s.user_id").alias("user_id"), F.col("s.session_id").alias("session_id"))
        .agg(
            F.count(F.lit(1)).alias("n_with_context"),
            csv_join(F.transform(ordered, lambda x: x.event_id)).alias("context_event_ids"),
        )
        .orderBy("user_id", "session_id")
    )


# --- q88: conversation -> (context, response) training pairs -----------------
# The SFT extraction (operators/sft.py) at gate scale: sessionized
# per-user event streams stand in for conversations (the Telegram
# dialog shape is unit-tested in tests/test_sft.py); each event
# becomes a pair whose input is the previous <=3 turns formatted
# "author: text" and whose target is the event's own payload. The
# oracle reuses q19's sessionize SQL plus the q15 ROWS-framed
# array_agg — pure string/window algebra, no float anywhere.

_Q88_CTX = 3


@query(
    "q88_conversation_pairs",
    oracle=f"""
    WITH s AS ({_SESSIONIZE_SQL.format(gap_ms=3600000, src="events")}),
    lined AS (
      SELECT user_id, session_id, event_id, ts,
             event_type || ': ' || props AS line, props
      FROM s
    ),
    ctx AS (
      SELECT user_id, session_id, event_id,
             array_agg(line) OVER (PARTITION BY user_id, session_id
                                   ORDER BY ts, event_id
                                   ROWS BETWEEN {_Q88_CTX} PRECEDING AND 1 PRECEDING) AS c,
             props AS response
      FROM lined
    )
    SELECT user_id, session_id, event_id,
           len(c)::INT AS n_context,
           array_to_string(c, chr(10)) AS context, response
    FROM ctx WHERE len(c) >= 1
    ORDER BY user_id, session_id, event_id
    """,
)
def q88_conversation_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from terrorblade_spark.operators.sft import conversation_pairs

    e = load_table(spark, sf_dir, "events")
    s = sessionize(e, "ts", ["user_id"], "event_id", gap="1 hour")
    pairs = conversation_pairs(
        s,
        group_cols=["user_id", "session_id"],
        order_cols=["ts", "event_id"],
        author_col="event_type",
        text_col="props",
        id_col="event_id",
        context_size=_Q88_CTX,
        min_context=1,
    )
    return pairs.select(
        "user_id", "session_id", "event_id", "n_context", "context", "response"
    ).orderBy("user_id", "session_id", "event_id")


# --- q128: global session concurrency sweep -----------------------------------
# "How many sessions are open at each instant" — the sweep-line
# analytic: sessions become +1/-1 boundary points; the running sum
# over the TOTAL point order is the concurrency. The running sum is
# windows.distributed_prefix_sum (range partition + k-row broadcast
# offsets), so no single-partition window forms at any corpus size.
# Tie order (-1 before +1 at equal ts) means a session ending exactly
# when another starts never counts as overlap. All-integer values.


@query(
    "q128_session_concurrency",
    oracle=f"""
    WITH s AS (
      SELECT user_id, session_id, min(ts) AS st, max(ts) AS en
      FROM ({{src}})
      GROUP BY user_id, session_id
    ),
    p AS (
      SELECT st AS ts, 1 AS delta, user_id, session_id FROM s
      UNION ALL
      SELECT en AS ts, -1 AS delta, user_id, session_id FROM s
    )
    SELECT ts, delta, user_id, session_id,
           sum(delta) OVER (
             ORDER BY ts, delta, user_id, session_id
             ROWS UNBOUNDED PRECEDING
           )::BIGINT AS concurrency
    FROM p
    ORDER BY ts, delta, user_id, session_id
    """.format(src=_SESSIONIZE_SQL.format(gap_ms=3600000, src="events")),
)
def q128_session_concurrency(spark: SparkSession, sf_dir: str) -> DataFrame:
    from terrorblade_spark.operators.windows import distributed_prefix_sum

    e = load_table(spark, sf_dir, "events")
    s = sessionize(e, "ts", ["user_id"], "event_id", gap="1 hour")
    spans = s.groupBy("user_id", "session_id").agg(
        F.min("ts").alias("st"), F.max("ts").alias("en")
    )
    # +1/-1 boundary points explode row-locally from ONE spans pass —
    # a two-branch union would re-run the sessionize window + span agg
    # per branch (4 Window nodes / 2 corpus scans at any scale)
    points = spans.select(
        F.explode(
            F.array(
                F.struct(F.col("st").alias("ts"), F.lit(1).alias("delta")),
                F.struct(F.col("en").alias("ts"), F.lit(-1).alias("delta")),
            )
        ).alias("p"),
        "user_id",
        "session_id",
    ).select("p.ts", "p.delta", "user_id", "session_id")
    swept = distributed_prefix_sum(
        points, "delta", ["ts", "delta", "user_id", "session_id"],
        out_col="concurrency",
    )
    return swept.select(
        "ts", "delta", "user_id", "session_id",
        F.col("concurrency").cast("long").alias("concurrency"),
    ).orderBy("ts", "delta", "user_id", "session_id")
