"""Window-function query surface (SURVEY §2.5 W1–W8, A6–A10) over the
events table. One entity window per query — single sort+shuffle plans.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from terrorblade_spark.functions.exprs import dec_sum
from terrorblade_spark.operators.windows import (
    context_collect,
    forward_fill,
    run_ids,
    with_gap_ms,
)
from terrorblade_spark.registry import query
from terrorblade_spark.tables import load_table


# --- q12: gap to previous event (W3) ----------------------------------------

@query(
    "q12_event_gaps",
    oracle="""
    SELECT event_id, user_id, ts,
           epoch_ms(ts) - lag(epoch_ms(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS gap_ms
    FROM events
    ORDER BY user_id, ts, event_id
    """,
)
def q12_event_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    return with_gap_ms(e, "ts", ["user_id"], "event_id").select(
        "event_id", "user_id", "ts", "gap_ms"
    ).orderBy("user_id", "ts", "event_id")


# --- q13: sequence number per user (W2) -------------------------------------

@query(
    "q13_first_events_per_user",
    oracle="""
    SELECT user_id, event_id, seq FROM (
      SELECT user_id, event_id,
             row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS seq
      FROM events
    ) WHERE seq <= 5
    ORDER BY user_id, seq
    """,
)
def q13_first_events_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        e.withColumn("seq", F.row_number().over(w))
        .where(F.col("seq") <= 5)
        .select("user_id", "event_id", "seq")
        .orderBy("user_id", "seq")
    )


# --- q14: forward fill (W6) -------------------------------------------------

@query(
    "q14_forward_fill",
    oracle="""
    SELECT event_id, user_id,
           last_value(CASE WHEN value < 10 THEN NULL ELSE value END IGNORE NULLS)
             OVER (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS value_filled
    FROM events
    ORDER BY user_id, event_id
    """,
)
def q14_forward_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events").withColumn(
        "value_nulled", F.when(F.col("value") < 10, F.lit(None)).otherwise(F.col("value"))
    )
    filled = forward_fill(e, "value_nulled", ["user_id"], ["ts", "event_id"], "value_filled")
    return filled.select("event_id", "user_id", "value_filled").orderBy("user_id", "event_id")


# --- q15: ±2 context snippet around purchases (W7) --------------------------

@query(
    "q15_purchase_context",
    oracle="""
    SELECT event_id, user_id, context FROM (
      SELECT event_id, user_id, event_type,
             array_agg(event_id) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                       ROWS BETWEEN 2 PRECEDING AND 2 FOLLOWING) AS context
      FROM events
    ) WHERE event_type = 'purchase'
    ORDER BY user_id, event_id
    """,
)
def q15_purchase_context(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    ctx = context_collect(e, "event_id", ["user_id"], ["ts", "event_id"], before=2, after=2)
    return (
        ctx.where(F.col("event_type") == "purchase")
        .select("event_id", "user_id", "context")
        .orderBy("user_id", "event_id")
    )


# --- q16: consecutive same-type runs + ordered concat (E5/E6 + A1) ----------

@query(
    "q16_event_type_runs",
    oracle="""
    WITH breaks AS (
      SELECT *,
             CASE WHEN event_type IS DISTINCT FROM
                    lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                  THEN 1 ELSE 0 END AS is_break
      FROM events
    ),
    runs AS (
      SELECT *,
             CAST(sum(is_break)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS UNBOUNDED PRECEDING) - 1 AS BIGINT) AS run_id
      FROM breaks
    )
    SELECT user_id, run_id,
           min(event_type) AS event_type,
           count(*) AS n_events,
           min(ts) AS run_start,
           string_agg(props, '. ' ORDER BY ts, event_id) AS props_concat,
           array_agg(event_id ORDER BY ts, event_id) AS event_ids
    FROM runs
    GROUP BY user_id, run_id
    HAVING count(*) >= 2
    ORDER BY user_id, run_id
    """,
)
def q16_event_type_runs(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    runs = run_ids(e, F.col("event_type"), ["user_id"], ["ts", "event_id"])
    ordered_structs = F.array_sort(F.collect_list(F.struct("ts", "event_id", "props")))
    return (
        runs.groupBy("user_id", "run_id")
        .agg(
            F.min("event_type").alias("event_type"),
            F.count(F.lit(1)).alias("n_events"),
            F.min("ts").alias("run_start"),
            F.array_join(
                F.transform(ordered_structs, lambda s: s.props), ". "
            ).alias("props_concat"),
            F.transform(ordered_structs, lambda s: s.event_id).alias("event_ids"),
        )
        .where(F.col("n_events") >= 2)
        .orderBy("user_id", "run_id")
    )


# --- q17: monthly activity heatmap (A7/A10) ---------------------------------

@query(
    "q17_activity_heatmap",
    oracle="""
    SELECT CAST(EXTRACT(year FROM ts) AS INTEGER) AS y,
           CAST(EXTRACT(month FROM ts) AS INTEGER) AS m,
           CAST(EXTRACT(hour FROM ts) AS INTEGER) AS h,
           count(*) AS n_events,
           count(DISTINCT user_id) AS n_users,
           sum(CAST(value AS DECIMAL(18,6)))::DOUBLE / count(*) AS avg_value
    FROM events
    GROUP BY 1, 2, 3
    ORDER BY 1, 2, 3
    """,
)
def q17_activity_heatmap(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy(
            F.year("ts").alias("y"), F.month("ts").alias("m"), F.hour("ts").alias("h")
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
            (dec_sum("value", 6) / F.count(F.lit(1))).alias("avg_value"),
        )
        .orderBy("y", "m", "h")
    )


# --- q18: value quantiles per event type (A6/Q8) ----------------------------

@query(
    "q18_value_quantiles",
    oracle="""
    SELECT event_type,
           count(*) AS n,
           min(value) AS min_value,
           max(value) AS max_value,
           sum(CAST(value AS DECIMAL(18,6)))::DOUBLE / count(*) AS mean_value,
           quantile_cont(value, 0.25) AS p25,
           quantile_cont(value, 0.5) AS p50,
           quantile_cont(value, 0.75) AS p75,
           quantile_cont(value, 0.9) AS p90,
           quantile_cont(value, 0.95) AS p95,
           quantile_cont(value, 0.997) AS p997
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def q18_value_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("value").alias("min_value"),
            F.max("value").alias("max_value"),
            (dec_sum("value", 6) / F.count(F.lit(1))).alias("mean_value"),
            F.expr("percentile(value, 0.25)").alias("p25"),
            F.expr("percentile(value, 0.5)").alias("p50"),
            F.expr("percentile(value, 0.75)").alias("p75"),
            F.expr("percentile(value, 0.9)").alias("p90"),
            F.expr("percentile(value, 0.95)").alias("p95"),
            F.expr("percentile(value, 0.997)").alias("p997"),
        )
        .orderBy("event_type")
    )
