"""Event-analytics query surface: the temporal joins (as-of, range),
funnel, cohort retention, and grid resampling operators — previously
unit-tested only — each value-checked against a DuckDB oracle here.

Determinism contracts (the hash-compare is bit-for-bit):
- as-of right side is pre-aggregated to one row per (key, ts) so the
  "latest at-or-before" match is unique on both engines;
- all double outputs are either order-independent (max, count ratios)
  or decimal-summed before the final double cast;
- week truncation is ISO-Monday on both engines; offset division uses
  floor semantics on both (`//` in DuckDB, double-div + long cast on
  non-negatives in Spark).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from terrorblade_spark.operators.funnel import funnel_counts, retention_matrix
from terrorblade_spark.operators.temporal import asof_join, range_join, resample_events
from terrorblade_spark.registry import query
from terrorblade_spark.tables import load_table


# --- q72: as-of (point-in-time) join ----------------------------------------
# Each purchase gets the latest view at-or-before it by the same user —
# merge_asof 'backward' semantics, ties visible. The Spark plan is the
# union+window sort-merge (operators/temporal.py:27), never a
# BroadcastNestedLoopJoin; the oracle is DuckDB's native ASOF JOIN.

@query(
    "q72_asof_view_before_purchase",
    oracle="""
    WITH views AS (
      SELECT user_id, ts, ts AS view_ts, max(value) AS view_value
      FROM events WHERE event_type = 'view' GROUP BY user_id, ts
    ),
    purchases AS (
      SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'
    )
    SELECT p.event_id, p.user_id, p.ts, v.view_ts, v.view_value
    FROM purchases p
    ASOF LEFT JOIN views v
      ON p.user_id = v.user_id AND p.ts >= v.ts
    ORDER BY p.user_id, p.ts, p.event_id
    """,
)
def q72_asof_view_before_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    purchases = e.where(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    # one row per (user, ts): the as-of match is unique -> deterministic
    views = (
        e.where(F.col("event_type") == "view")
        .groupBy("user_id", "ts")
        .agg(F.max("value").alias("view_value"))
        .withColumn("view_ts", F.col("ts"))
    )
    out = asof_join(purchases, views, on="ts", by=["user_id"], right_prefix="")
    return out.orderBy("user_id", "ts", "event_id")


# --- q73: range (interval-containment) join ---------------------------------
# Clicks landing inside each user's 2-hour post-signup window. The
# Spark plan chunk-quantizes both sides into an equi-join
# (operators/temporal.py:99) — work linear in interval length, never
# |points| x |intervals|; the oracle is the plain theta join DuckDB's
# IEJoin handles at oracle scale.

_Q73_WINDOW_S = 7200


@query(
    "q73_clicks_in_signup_window",
    oracle=f"""
    SELECT s.user_id AS user_id, s.event_id AS signup_id, c.event_id AS click_id
    FROM (SELECT user_id, event_id, ts FROM events WHERE event_type = 'signup') s
    JOIN (SELECT user_id, event_id, ts FROM events WHERE event_type = 'click') c
      ON c.user_id = s.user_id
     AND c.ts >= s.ts
     AND c.ts < s.ts + INTERVAL {_Q73_WINDOW_S} SECOND
    ORDER BY 1, 2, 3
    """,
)
def q73_clicks_in_signup_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    signups = e.where(F.col("event_type") == "signup").select(
        "user_id",
        F.col("event_id").alias("signup_id"),
        F.col("ts").alias("start_ts"),
        (F.col("ts") + F.expr(f"INTERVAL {_Q73_WINDOW_S} SECOND")).alias("end_ts"),
    )
    clicks = e.where(F.col("event_type") == "click").select(
        "user_id", F.col("event_id").alias("click_id"), "ts"
    )
    joined = range_join(
        clicks, signups, "ts", "start_ts", "end_ts",
        by=["user_id"], chunk_s=float(_Q73_WINDOW_S),
    )
    return joined.select("user_id", "signup_id", "click_id").orderBy(
        "user_id", "signup_id", "click_id"
    )


# --- q74: ordered-step funnel ------------------------------------------------
# signup -> view -> purchase, each step strictly after the previous.
# One bounded min-ts aggregation per step (operators/funnel.py:32) —
# no per-entity event arrays.

_Q74_STEPS = ("signup", "view", "purchase")


@query(
    "q74_event_funnel",
    oracle=f"""
    WITH s1 AS (
      SELECT user_id, min(ts) AS t1 FROM events
      WHERE event_type = '{_Q74_STEPS[0]}' GROUP BY user_id
    ),
    s2 AS (
      SELECT e.user_id, min(e.ts) AS t2 FROM events e JOIN s1 USING (user_id)
      WHERE e.event_type = '{_Q74_STEPS[1]}' AND e.ts > s1.t1 GROUP BY e.user_id
    ),
    s3 AS (
      SELECT e.user_id, min(e.ts) AS t3 FROM events e JOIN s2 USING (user_id)
      WHERE e.event_type = '{_Q74_STEPS[2]}' AND e.ts > s2.t2 GROUP BY e.user_id
    ),
    n AS (
      SELECT (SELECT count(*) FROM s1) AS n1,
             (SELECT count(*) FROM s2) AS n2,
             (SELECT count(*) FROM s3) AS n3
    )
    SELECT 1 AS step, '{_Q74_STEPS[0]}' AS step_name, n1 AS n_entities,
           CASE WHEN n1 > 0 THEN 1.0::DOUBLE ELSE 0.0::DOUBLE END AS conversion FROM n
    UNION ALL
    SELECT 2, '{_Q74_STEPS[1]}', n2,
           CASE WHEN n1 > 0 THEN n2::DOUBLE / n1::DOUBLE ELSE 0.0::DOUBLE END FROM n
    UNION ALL
    SELECT 3, '{_Q74_STEPS[2]}', n3,
           CASE WHEN n1 > 0 THEN n3::DOUBLE / n1::DOUBLE ELSE 0.0::DOUBLE END FROM n
    ORDER BY step
    """,
)
def q74_event_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    return funnel_counts(e, list(_Q74_STEPS))


# --- q75: weekly cohort retention --------------------------------------------

@query(
    "q75_weekly_retention",
    oracle="""
    WITH firsts AS (
      SELECT user_id, min(date_trunc('week', ts)::DATE) AS cohort
      FROM events GROUP BY user_id
    ),
    activity AS (
      SELECT DISTINCT user_id, date_trunc('week', ts)::DATE AS p FROM events
    )
    SELECT cohort,
           (date_diff('day', cohort, p) // 7)::BIGINT AS "offset",
           count(DISTINCT a.user_id) AS n_active
    FROM activity a JOIN firsts f USING (user_id)
    GROUP BY 1, 2
    ORDER BY cohort, "offset"
    """,
)
def q75_weekly_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    return retention_matrix(e, entity_col="user_id", ts_col="ts", period="week")


# --- q76: hourly grid resample with zero fill --------------------------------
# One aggregation pass over events; the dense grid is generated with
# sequence() per entity (operators/temporal.py:162). Decimal partials
# keep the double output bit-comparable.

@query(
    "q76_hourly_resample",
    oracle="""
    WITH p AS (
      SELECT event_type, date_trunc('hour', ts) AS bucket,
             sum(CAST(value AS DECIMAL(18,6))) AS v
      FROM events GROUP BY 1, 2
    ),
    spans AS (
      SELECT event_type, min(bucket) AS lo, max(bucket) AS hi FROM p GROUP BY 1
    ),
    grid AS (
      SELECT event_type, unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS bucket
      FROM spans
    )
    SELECT g.event_type, g.bucket, COALESCE(p.v, 0)::DOUBLE AS sum_value
    FROM grid g LEFT JOIN p USING (event_type, bucket)
    ORDER BY event_type, bucket
    """,
)
def q76_hourly_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events").withColumn(
        "value", F.col("value").cast("decimal(18,6)")
    )
    out = resample_events(
        e, entity_col="event_type", ts_col="ts", value_col="value",
        step="1 hour", agg="sum", fill="zero",
    )
    return out.select(
        "event_type", "bucket", F.col("sum_value").cast("double").alias("sum_value")
    ).orderBy("event_type", "bucket")


# --- q79: thread reconstruction (pointer doubling) ---------------------------
# Per-user reply chains: each event's parent is the user's previous
# event when the gap is <= 30 min (the sessionization threshold as a
# reply-chain proxy — the message data model's reply_to_message_id has
# the same directed-forest shape). The engine resolves every event's
# THREAD ROOT and DEPTH by pointer doubling (O(log chain) equi-join
# rounds, operators/components.py resolve_roots); the oracle walks the
# same chains with a recursive CTE — O(chain) sequential steps, fine at
# oracle scale, the exact reason the engine doubles instead.

_Q79_GAP_MS = 1_800_000


@query(
    "q79_event_thread_roots",
    oracle=f"""
    WITH RECURSIVE parent AS (
      SELECT event_id,
             CASE WHEN epoch_ms(ts) - lag(epoch_ms(ts)) OVER w <= {_Q79_GAP_MS}
                  THEN lag(event_id) OVER w END AS p
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    chain(event_id, root, depth) AS (
      SELECT event_id, event_id, 0 FROM parent WHERE p IS NULL
      UNION ALL
      SELECT c.event_id, ch.root, ch.depth + 1
      FROM parent c JOIN chain ch ON c.p = ch.event_id
    )
    SELECT event_id, root AS thread_root, depth
    FROM chain ORDER BY event_id
    """,
)
def q79_event_thread_roots(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from terrorblade_spark.operators.components import resolve_roots

    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.unix_millis(F.col("ts")) - F.lag(F.unix_millis(F.col("ts"))).over(w)
    with_parent = e.select(
        "event_id",
        F.when(gap <= _Q79_GAP_MS, F.lag("event_id").over(w)).alias("parent_id"),
    )
    edges = with_parent.where(F.col("parent_id").isNotNull()).select(
        F.col("event_id").alias("child"), F.col("parent_id").alias("parent")
    )
    resolved = resolve_roots(edges, "child", "parent")
    return (
        with_parent.select("event_id")
        .join(resolved, with_parent.event_id == resolved.node, "left")
        .select(
            "event_id",
            F.coalesce("root", "event_id").alias("thread_root"),
            F.coalesce("depth", F.lit(0)).cast("int").alias("depth"),
        )
        .orderBy("event_id")
    )


# --- q118: per-user EWMA smoothing of event values ---------------------------
# Bounded-window exponentially-weighted moving average (pandas
# ewm(adjust=True) truncated to 8 rows): per user in (ts, event_id)
# order. alpha = 0.5 makes every weight an exact binary fraction, so
# each weighted term is exact on both engines and 6-dp rounding
# absorbs the fold's sub-ulp drift (operators/temporal.py ewma).

_Q118_ALPHA = 0.5
_Q118_WINDOW = 8


@query(
    "q118_event_ewma",
    oracle=f"""
    WITH w AS (
      SELECT user_id, event_id, value,
             list(value) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN {_Q118_WINDOW - 1} PRECEDING AND CURRENT ROW
             ) AS l
      FROM events
    )
    SELECT user_id, event_id, value,
           CASE WHEN list_sum(list_transform(
                  range(0, len(l)),
                  j -> CASE WHEN l[len(l) - j] IS NOT NULL
                       THEN power({1 - _Q118_ALPHA}, j) ELSE 0 END
                )) > 0
           THEN round(
             list_sum(list_transform(
               range(0, len(l)), j -> l[len(l) - j] * power({1 - _Q118_ALPHA}, j)
             ))
             / list_sum(list_transform(
               range(0, len(l)),
               j -> CASE WHEN l[len(l) - j] IS NOT NULL
                    THEN power({1 - _Q118_ALPHA}, j) ELSE 0 END
             )),
             6
           ) END AS ewma
    FROM w
    ORDER BY user_id, event_id
    """,
)
def q118_event_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    from terrorblade_spark.operators.temporal import ewma

    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "event_id", "ts", "value"
    )
    out = ewma(
        ev,
        "value",
        partition_cols=["user_id"],
        order_cols=["ts", "event_id"],
        alpha=_Q118_ALPHA,
        window=_Q118_WINDOW,
    )
    return out.select(
        "user_id", "event_id", "value", F.round("ewma", 6).alias("ewma")
    ).orderBy("user_id", "event_id")


# --- q119: robust (median/MAD) outlier events --------------------------------
# Per-user robust z-scores: both engines interpolate the even-count
# median identically ((a+b)/2 of the two middle doubles), deviations
# subtract exactly, and the single division rounds to 6 dp. MAD = 0
# groups are skipped by contract (operators/anomaly.py).


@query(
    "q119_value_outliers",
    oracle="""
    WITH med AS (
      SELECT user_id, median(value) AS med FROM events GROUP BY user_id
    ),
    dev AS (
      SELECT e.user_id, e.event_id, e.value, e.value - m.med AS d
      FROM events e JOIN med m USING (user_id)
    ),
    mad AS (
      SELECT user_id, median(abs(d)) AS mad FROM dev GROUP BY user_id
    )
    SELECT d.user_id, d.event_id, d.value,
           round(d.d / (1.4826 * m.mad), 6) AS robust_z
    FROM dev d JOIN mad m USING (user_id)
    WHERE m.mad > 0 AND abs(d.d / (1.4826 * m.mad)) > 3
    ORDER BY d.user_id, d.event_id
    """,
)
def q119_value_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    from terrorblade_spark.operators.anomaly import robust_outliers

    ev = load_table(spark, sf_dir, "events").select("user_id", "event_id", "value")
    out = robust_outliers(ev, "value", ["user_id"], z_threshold=3.0)
    return out.select(
        "user_id", "event_id", "value", F.round("robust_z", 6).alias("robust_z")
    ).orderBy("user_id", "event_id")


# --- q122: schema-on-read JSON property profile -------------------------------
# events.props is a JSON string column; extract $.k JVM-side
# (get_json_object — no Python, no pre-parsing pass) and profile it
# per event type. All-integer aggregates plus one exact division.


@query(
    "q122_props_json_stats",
    oracle="""
    WITH t AS (
      SELECT event_type,
             CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
      FROM events
    )
    SELECT event_type,
           count(*)::BIGINT AS n_events,
           count(k)::BIGINT AS n_k,
           sum(k)::BIGINT AS sum_k,
           min(k) AS min_k,
           max(k) AS max_k,
           count(DISTINCT k)::BIGINT AS n_distinct_k,
           round(sum(k)::DOUBLE / count(k), 6) AS avg_k
    FROM t
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def q122_props_json_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "event_type", F.get_json_object("props", "$.k").cast("long").alias("k")
    )
    return (
        ev.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.count("k").alias("n_k"),
            F.sum("k").alias("sum_k"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
            F.countDistinct("k").alias("n_distinct_k"),
            F.round(F.sum("k").cast("double") / F.count("k"), 6).alias("avg_k"),
        )
        .orderBy("event_type")
    )


# --- q123: reproducible Pearson correlation per event type --------------------
# corr(value, json k) from decimal-exact moments (operators/stats.py
# pearson_corr): Spark's builtin corr sums doubles in shuffle order
# and cannot hash-match an oracle; exact moments make the closed form
# a pure function of the data. Oracle mirrors the same DECIMAL sums.


@query(
    "q123_value_k_correlation",
    oracle="""
    WITH t AS (
      SELECT event_type, value,
             CAST(json_extract_string(props, '$.k') AS BIGINT)::DOUBLE AS k
      FROM events
      WHERE value IS NOT NULL
        AND json_extract_string(props, '$.k') IS NOT NULL
    ),
    m AS (
      SELECT event_type,
             count(*)::DOUBLE AS n,
             sum(CAST(value AS DECIMAL(28,6)))::DOUBLE AS sx,
             sum(CAST(k AS DECIMAL(28,6)))::DOUBLE AS sy,
             sum(CAST(value * value AS DECIMAL(28,12)))::DOUBLE AS sxx,
             sum(CAST(k * k AS DECIMAL(28,12)))::DOUBLE AS syy,
             sum(CAST(value * k AS DECIMAL(28,12)))::DOUBLE AS sxy
      FROM t GROUP BY event_type
    )
    SELECT event_type, n::BIGINT AS n,
           round(
             (n * sxy - sx * sy)
             / sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)),
             6
           ) AS corr
    FROM m
    ORDER BY event_type
    """,
)
def q123_value_k_correlation(spark: SparkSession, sf_dir: str) -> DataFrame:
    from terrorblade_spark.operators.stats import pearson_corr

    ev = load_table(spark, sf_dir, "events").select(
        "event_type",
        "value",
        F.get_json_object("props", "$.k").cast("long").alias("k"),
    )
    out = pearson_corr(ev, "value", "k", group_cols=["event_type"])
    return out.select(
        "event_type", "n", F.round("corr", 6).alias("corr")
    ).orderBy("event_type")


# --- q125: Spearman rank correlation per event type ---------------------------
# Pearson over tie-averaged ranks (avg_rank = rank() + (ties-1)/2, the
# fractional-rank convention). Ranks are integers/halves — exact at
# decimal scale 2 — and the moments are decimal-summed, so the closed
# form is bit-portable; the oracle mirrors windows + DECIMAL sums.


@query(
    "q125_value_k_spearman",
    oracle="""
    WITH t AS (
      SELECT event_type, value,
             CAST(json_extract_string(props, '$.k') AS BIGINT)::DOUBLE AS k
      FROM events
      WHERE value IS NOT NULL
        AND json_extract_string(props, '$.k') IS NOT NULL
    ),
    ranked AS (
      SELECT event_type,
             rank() OVER (PARTITION BY event_type ORDER BY value)::DOUBLE
               + (count(*) OVER (PARTITION BY event_type, value)::DOUBLE - 1.0) / 2.0
               AS rx,
             rank() OVER (PARTITION BY event_type ORDER BY k)::DOUBLE
               + (count(*) OVER (PARTITION BY event_type, k)::DOUBLE - 1.0) / 2.0
               AS ry
      FROM t
    ),
    m AS (
      SELECT event_type,
             count(*)::DOUBLE AS n,
             sum(CAST(rx AS DECIMAL(28,2)))::DOUBLE AS sx,
             sum(CAST(ry AS DECIMAL(28,2)))::DOUBLE AS sy,
             sum(CAST(rx * rx AS DECIMAL(28,4)))::DOUBLE AS sxx,
             sum(CAST(ry * ry AS DECIMAL(28,4)))::DOUBLE AS syy,
             sum(CAST(rx * ry AS DECIMAL(28,4)))::DOUBLE AS sxy
      FROM ranked GROUP BY event_type
    )
    SELECT event_type, n::BIGINT AS n,
           round(
             (n * sxy - sx * sy)
             / sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)),
             6
           ) AS spearman
    FROM m
    ORDER BY event_type
    """,
)
def q125_value_k_spearman(spark: SparkSession, sf_dir: str) -> DataFrame:
    from terrorblade_spark.operators.stats import spearman_corr

    ev = load_table(spark, sf_dir, "events").select(
        "event_type",
        "value",
        F.get_json_object("props", "$.k").cast("long").alias("k"),
    )
    out = spearman_corr(ev, "value", "k", group_cols=["event_type"])
    return out.select(
        "event_type", "n", F.round("spearman", 6).alias("spearman")
    ).orderBy("event_type")


# --- q127: key-concentration (skew) profile of the orders table ---------------
# "Is o_custkey skewed" as one row: Gini over per-key counts via the
# rank closed form. The global rank of the key-count relation comes
# from distributed_rank (range partition + broadcast offsets — no
# single-partition window), so the same plan profiles a billion-key
# table. All-integer inputs; two divisions; 6-dp rounded.


@query(
    "q127_custkey_concentration",
    oracle="""
    WITH cc AS (
      SELECT o_custkey AS k, count(*)::BIGINT AS c
      FROM orders GROUP BY o_custkey
    ),
    n AS (
      SELECT count(*)::BIGINT AS n, sum(c)::BIGINT AS t, max(c)::BIGINT AS mx
      FROM cc
    ),
    r AS (
      SELECT c, row_number() OVER (ORDER BY c, k)::BIGINT AS i FROM cc
    ),
    s AS (
      SELECT sum(i * c)::BIGINT AS s FROM r
    ),
    tp AS (
      SELECT sum(r.c)::BIGINT AS topc FROM r CROSS JOIN n WHERE r.i > n.n - 10
    )
    SELECT n.n AS n_keys, n.t AS total_rows, n.mx AS max_count,
           round(2.0 * s.s / (n.n * n.t) - (n.n + 1.0) / n.n, 6) AS gini,
           round(tp.topc::DOUBLE / n.t, 6) AS top10_share
    FROM n CROSS JOIN s CROSS JOIN tp
    """,
)
def q127_custkey_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    from terrorblade_spark.operators.diagnostics import concentration_profile

    orders = load_table(spark, sf_dir, "orders").select("o_custkey")
    out = concentration_profile(orders, "o_custkey", top_k=10)
    return out.select(
        "n_keys",
        "total_rows",
        "max_count",
        F.round("gini", 6).alias("gini"),
        F.round("top10_share", 6).alias("top10_share"),
    )
