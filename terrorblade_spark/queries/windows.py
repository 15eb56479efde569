"""Window-function query surface (SURVEY §2.5 W1–W8, A6–A10) over the
events table. One entity window per query — single sort+shuffle plans.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from terrorblade_spark.functions.exprs import csv_join, dec_sum
from terrorblade_spark.operators.windows import (
    context_collect,
    forward_fill,
    with_gap_ms,
)
from terrorblade_spark.registry import query
from terrorblade_spark.tables import load_table


# --- q12: per-event window columns (W2 row_number + W3 lag gap + W6 ffill) --
# One entity window spec shared by all three expressions, so Catalyst
# plans a single sort+exchange for the whole per-event enrichment.

@query(
    "q12_event_window_columns",
    oracle="""
    SELECT event_id, user_id, ts,
           epoch_ms(ts) - lag(epoch_ms(ts)) OVER w AS gap_ms,
           CAST(row_number() OVER w AS BIGINT) AS seq,
           last_value(CASE WHEN value < 10 THEN NULL ELSE value END IGNORE NULLS)
             OVER (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS value_filled
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ORDER BY user_id, ts, event_id
    """,
)
def q12_event_window_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events").withColumn(
        "value_nulled", F.when(F.col("value") < 10, F.lit(None)).otherwise(F.col("value"))
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    g = with_gap_ms(e, "ts", ["user_id"], "event_id").withColumn(
        "seq", F.row_number().over(w).cast("long")
    )
    filled = forward_fill(g, "value_nulled", ["user_id"], ["ts", "event_id"], "value_filled")
    return filled.select(
        "event_id", "user_id", "ts", "gap_ms", "seq", "value_filled"
    ).orderBy("user_id", "ts", "event_id")


# --- q15: ±2 context snippet around purchases (W7) --------------------------

@query(
    "q15_purchase_context",
    oracle="""
    SELECT event_id, user_id,
           array_to_string(list_transform(context, v -> v::VARCHAR), ',') AS context
    FROM (
      SELECT event_id, user_id, event_type,
             array_agg(event_id) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                       ROWS BETWEEN 2 PRECEDING AND 2 FOLLOWING) AS context
      FROM events
    ) WHERE event_type = 'purchase'
    ORDER BY user_id, event_id
    """,
)
def q15_purchase_context(spark: SparkSession, sf_dir: str) -> DataFrame:
    # context is emitted comma-joined: the harness hash-compares cell
    # values and cannot hash list cells (see functions.exprs.csv_join)
    e = load_table(spark, sf_dir, "events")
    ctx = context_collect(e, "event_id", ["user_id"], ["ts", "event_id"], before=2, after=2)
    return (
        ctx.where(F.col("event_type") == "purchase")
        .select("event_id", "user_id", csv_join("context").alias("context"))
        .orderBy("user_id", "event_id")
    )


# (consecutive same-type runs + ordered concat are oracle-gated by
# q44_author_run_concat, which is the same run_ids/break-cumsum shape
# PLUS the time-gap break (author_runs) and the A1 concat operator
# (concat_author_runs); run_ids itself is also exercised green inside
# q43's calculate_groups)


# --- q17: activity heatmap + value quantiles (A6/A7/A10/Q8) -----------------
# Heatmap buckets (A7/A10) and quantile aggregation (A6/Q8) in one
# grouped pass — the quantile columns ride the same shuffle the
# count/countDistinct need anyway.

@query(
    "q17_activity_heatmap",
    oracle="""
    SELECT CAST(EXTRACT(year FROM ts) AS INTEGER) AS y,
           CAST(EXTRACT(month FROM ts) AS INTEGER) AS m,
           CAST(EXTRACT(hour FROM ts) AS INTEGER) AS h,
           count(*) AS n_events,
           count(DISTINCT user_id) AS n_users,
           min(value) AS min_value,
           max(value) AS max_value,
           sum(CAST(value AS DECIMAL(18,6)))::DOUBLE / count(*) AS avg_value,
           quantile_cont(value, 0.25) AS p25,
           quantile_cont(value, 0.5) AS p50,
           quantile_cont(value, 0.9) AS p90,
           quantile_cont(value, 0.997) AS p997
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
            F.min("value").alias("min_value"),
            F.max("value").alias("max_value"),
            (dec_sum("value", 6) / F.count(F.lit(1))).alias("avg_value"),
            F.expr("percentile(value, 0.25)").alias("p25"),
            F.expr("percentile(value, 0.5)").alias("p50"),
            F.expr("percentile(value, 0.9)").alias("p90"),
            F.expr("percentile(value, 0.997)").alias("p997"),
        )
        .orderBy("y", "m", "h")
    )


# --- q126: rank-family window functions (percent_rank / cume_dist / ntile) ----
# The remaining SQL window-rank family in one pass: all four columns
# share a single (event_type)-partitioned ordering, so Catalyst plans
# ONE Window over one Exchange. The order ends in the unique event_id
# (the W2 rule) making every rank engine-portable; percent_rank and
# cume_dist are exact-integer ratios (one IEEE division), 6-dp rounded.


@query(
    "q126_value_rank_profile",
    oracle="""
    SELECT event_id, event_type,
           round(percent_rank() OVER w, 6) AS pct_rank,
           round(cume_dist() OVER w, 6) AS cume,
           ntile(4) OVER w AS quartile,
           row_number() OVER w AS rn
    FROM events
    WINDOW w AS (PARTITION BY event_type ORDER BY value, event_id)
    ORDER BY event_type, rn
    """,
)
def q126_value_rank_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window as _W

    ev = load_table(spark, sf_dir, "events").select("event_id", "event_type", "value")
    w = _W.partitionBy("event_type").orderBy("value", "event_id")
    return (
        ev.select(
            "event_id",
            "event_type",
            F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
            F.round(F.cume_dist().over(w), 6).alias("cume"),
            F.ntile(4).over(w).alias("quartile"),
            F.row_number().over(w).alias("rn"),
        )
        .orderBy("event_type", "rn")
    )

# --- q129: exact global percentiles at corpus scale --------------------------
# Spark's exact `percentile` aggregate holds every distinct value in
# ONE aggregation buffer — a single-node bottleneck the moment the
# column has corpus-scale cardinality. q129 computes EXACT global
# percentile_cont AND percentile_disc through distributed_rank: range
# partition + k-row broadcast offsets, then a row-local candidate-rank
# filter (<=3 ranks per q survive) and a tiny resolve aggregation.
# Bit-exactness contract: cont is the convex form lo*(1-frac)+hi*frac,
# disc the value at ceil(q*n)-1 — both probed bit-equal to DuckDB's
# native WITHIN GROUP implementations (see operators/windows.py).

_Q129_QS = (0.01, 0.25, 0.5, 0.77, 0.9, 0.999)


@query(
    "q129_global_percentiles",
    oracle="\nUNION ALL\n".join(
        f"""SELECT {q} AS q,
           percentile_cont({q}) WITHIN GROUP (ORDER BY CAST(l_extendedprice AS DOUBLE)) AS pct_cont,
           percentile_disc({q}) WITHIN GROUP (ORDER BY CAST(l_extendedprice AS DOUBLE)) AS pct_disc
    FROM lineitem"""
        for q in _Q129_QS
    )
    + "\nORDER BY q",
)
def q129_global_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    from terrorblade_spark.operators.windows import exact_quantiles

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_extendedprice", "l_orderkey", "l_linenumber"
    )
    return exact_quantiles(
        li, "l_extendedprice", _Q129_QS, tiebreak_cols=("l_orderkey", "l_linenumber")
    ).orderBy("q")
