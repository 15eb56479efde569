"""Relational query surface: scans, filters, joins, aggregations,
sorts/top-k, set ops (SURVEY §2.1–§2.4, §2.6–§2.7) over the test star
schema. Each query has a DuckDB oracle; numeric determinism via
decimal-exact sums (see functions.exprs).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from terrorblade_spark.functions.exprs import dec_sum
from terrorblade_spark.operators.relational import dictionary_encode, latest_by
from terrorblade_spark.registry import query
from terrorblade_spark.tables import load_table


# --- q01: flagship pricing summary (A4-family agg; TPC-H Q1 shape) ----------

@query(
    "q01_pricing_summary",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           sum(CAST(l_quantity AS DECIMAL(18,2)))::DOUBLE AS sum_qty,
           sum(CAST(l_extendedprice AS DECIMAL(18,2)))::DOUBLE AS sum_base_price,
           sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4)))::DOUBLE AS sum_disc_price,
           sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))
               * CAST(1 + l_tax AS DECIMAL(9,2)))::DOUBLE AS sum_charge,
           sum(CAST(l_quantity AS DECIMAL(18,2)))::DOUBLE / count(*) AS avg_qty,
           sum(CAST(l_extendedprice AS DECIMAL(18,2)))::DOUBLE / count(*) AS avg_price,
           count(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
)
def q01_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = load_table(spark, sf_dir, "lineitem").where(
        F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp")
    )
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    # rounding the double triple-product at 4dp is ambiguous across engines
    # (true value has 6dp); multiply exactly in decimal instead
    charge_dec = disc_price.cast("decimal(18,4)") * (
        F.lit(1) + F.col("l_tax")
    ).cast("decimal(9,2)")
    return (
        l.groupBy("l_returnflag", "l_linestatus")
        .agg(
            dec_sum("l_quantity").alias("sum_qty"),
            dec_sum("l_extendedprice").alias("sum_base_price"),
            dec_sum(disc_price, 4).alias("sum_disc_price"),
            F.sum(charge_dec).cast("double").alias("sum_charge"),
            (dec_sum("l_quantity") / F.count(F.lit(1))).alias("avg_qty"),
            (dec_sum("l_extendedprice") / F.count(F.lit(1))).alias("avg_price"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


# --- q02: per-customer order stats (Q1/Q2 get_user_stats analog, A4) --------

@query(
    "q02_customer_order_stats",
    oracle="""
    SELECT c.c_custkey, c.c_name, c.c_mktsegment,
           count(o.o_orderkey) AS n_orders,
           sum(CAST(o.o_totalprice AS DECIMAL(18,2)))::DOUBLE AS total_spent,
           min(o.o_orderdate) AS first_order,
           max(o.o_orderdate) AS last_order,
           count(DISTINCT o.o_orderpriority) AS n_priorities
    FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey
    GROUP BY c.c_custkey, c.c_name, c.c_mktsegment
    ORDER BY c.c_custkey
    """,
)
def q02_customer_order_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    # broadcast the dim side: the fact (orders) streams, no shuffle of orders
    return (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("c_custkey", "c_name", "c_mktsegment")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            dec_sum("o_totalprice").alias("total_spent"),
            F.min("o_orderdate").alias("first_order"),
            F.max("o_orderdate").alias("last_order"),
            F.countDistinct("o_orderpriority").alias("n_priorities"),
        )
        .orderBy("c_custkey")
    )


# --- q03: top revenue orders (J + A + O2 top-k; TPC-H Q3 shape) -------------

@query(
    "q03_top_revenue_orders",
    oracle="""
    SELECT l.l_orderkey, o.o_orderdate,
           sum(CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(18,4)))::DOUBLE AS revenue
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
    GROUP BY l.l_orderkey, o.o_orderdate
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
)
def q03_top_revenue_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer").where(F.col("c_mktsegment") == "BUILDING")
    o = load_table(spark, sf_dir, "orders")
    l = load_table(spark, sf_dir, "lineitem")
    # filter orders through the broadcast customer dim BEFORE touching
    # lineitem: the segment predicate keeps ~1/5 of orders, so only
    # those rows reach the fact join (c_custkey is the customer PK, so
    # the semi-join is equivalent to the oracle's inner join, and no
    # customer column is read downstream). At small SF, AQE then
    # broadcasts the shrunken orders side — lineitem never shuffles;
    # at 100 TB the same shape shuffles 1/5 of orders instead of all.
    ob = o.join(F.broadcast(c.select("c_custkey")), o.o_custkey == F.col("c_custkey"), "leftsemi")
    return (
        l.join(ob, l.l_orderkey == ob.o_orderkey)
        .groupBy("l_orderkey", "o_orderdate")
        .agg(dec_sum(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4).alias("revenue"))
        .orderBy(F.desc("revenue"), "l_orderkey")
        .limit(10)
    )


# (the TPC-H-Q5-shape star rollup — lineitem ⋈ broadcast supplier ⋈
# nation ⋈ region — is retired as a registry entry: q03 already
# oracle-gates the multi-join + broadcast-dim + decimal-agg shape, and
# the all-dims-broadcast star plan stays asserted in
# tests/test_plans.py::test_small_dims_broadcast)


# --- q05: latest event per user (W1 latest-name dedup) ----------------------

@query(
    "q05_latest_event_per_user",
    oracle="""
    SELECT user_id, ts AS last_ts, event_id AS last_event_id,
           event_type AS last_event_type, value AS last_value
    FROM (
      SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
      FROM events
    ) WHERE rn = 1
    ORDER BY user_id
    """,
)
def q05_latest_event_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    return (
        latest_by(e, ["user_id"], [F.desc("ts"), F.desc("event_id")])
        .select(
            "user_id",
            F.col("ts").alias("last_ts"),
            F.col("event_id").alias("last_event_id"),
            F.col("event_type").alias("last_event_type"),
            F.col("value").alias("last_value"),
        )
        .orderBy("user_id")
    )


# --- q06: customers without 1995 orders (J7 anti-join) ----------------------

@query(
    "q06_customers_without_1995_orders",
    oracle="""
    SELECT c_custkey, c_name FROM customer
    WHERE c_custkey NOT IN (
      SELECT o_custkey FROM orders
      WHERE o_orderdate >= TIMESTAMP '1995-01-01' AND o_orderdate < TIMESTAMP '1996-01-01'
    )
    ORDER BY c_custkey
    """,
)
def q06_customers_without_1995_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1995-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-01-01").cast("timestamp"))
    )
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_anti")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    )


# --- q07: event_type dictionary (S7 dictionary encode) ----------------------

@query(
    "q07_event_type_dict",
    oracle="""
    SELECT CAST(dense_rank() OVER (ORDER BY event_type) - 1 AS INTEGER) AS event_type_id,
           event_type, count(*) AS n_events
    FROM events
    GROUP BY event_type
    ORDER BY event_type_id
    """,
)
def q07_event_type_dict(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    dim = dictionary_encode(e, "event_type", "event_type_id")
    counts = e.groupBy("event_type").agg(F.count(F.lit(1)).alias("n_events"))
    return (
        dim.join(counts, "event_type")
        .select("event_type_id", "event_type", "n_events")
        .orderBy("event_type_id")
    )


# --- q08: top customer per nation (window rank over join) -------------------

@query(
    "q08_top_customer_per_nation",
    oracle="""
    SELECT n_name, c_custkey, c_name, c_acctbal FROM (
      SELECT n.n_name, c.c_custkey, c.c_name, c.c_acctbal,
             row_number() OVER (PARTITION BY n.n_name ORDER BY c.c_acctbal DESC, c.c_custkey) AS rn
      FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
    ) WHERE rn <= 3
    ORDER BY n_name, c_acctbal DESC, c_custkey
    """,
)
def q08_top_customer_per_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    joined = c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
    w = Window.partitionBy("n_name").orderBy(F.desc("c_acctbal"), "c_custkey")
    return (
        joined.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 3)
        .select("n_name", "c_custkey", "c_name", "c_acctbal")
        .orderBy("n_name", F.desc("c_acctbal"), "c_custkey")
    )


# --- q10: idempotent append semantics (S5 dedup-union, U-family) ------------

@query(
    "q10_idempotent_union",
    oracle="""
    WITH batch1 AS (SELECT event_id, user_id, ts, event_type FROM events WHERE event_id % 3 != 2),
         batch2 AS (SELECT event_id, user_id, ts, event_type FROM events WHERE event_id % 3 != 0)
    SELECT count(*) AS n_rows, count(DISTINCT event_id) AS n_distinct
    FROM (
      SELECT * FROM batch1
      UNION ALL
      SELECT * FROM batch2 b WHERE NOT EXISTS (SELECT 1 FROM batch1 a WHERE a.event_id = b.event_id)
    )
    """,
)
def q10_idempotent_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    from terrorblade_spark.operators.relational import idempotent_append

    e = load_table(spark, sf_dir, "events").select("event_id", "user_id", "ts", "event_type")
    batch1 = e.where(F.col("event_id") % 3 != 2)
    batch2 = e.where(F.col("event_id") % 3 != 0)
    merged = idempotent_append(batch2, batch1, ["event_id"])
    return merged.agg(
        F.count(F.lit(1)).alias("n_rows"), F.countDistinct("event_id").alias("n_distinct")
    )


# --- q56: incremental high-watermark ingest (S2) -----------------------------
# The reference resumes Telethon fetches from min_id = MAX(message_id)
# per chat (parse_telegram_client.py:241-247). Re-expressed set-wise:
# watermarks from the existing store, then only rows ABOVE the
# watermark ingest (new entities pass through). The watermark dim is
# one row per user -> broadcast join, no shuffle of the source.

@query(
    "q56_high_watermark_ingest",
    oracle="""
    WITH existing AS (
      SELECT * FROM events WHERE ts < TIMESTAMP '1995-06-01'
    ),
    wm AS (
      SELECT user_id, max(event_id) AS hwm FROM existing GROUP BY user_id
    )
    SELECT e.user_id,
           count(*) AS n_new,
           min(e.event_id) AS first_new_id,
           max(e.event_id) AS last_new_id
    FROM events e LEFT JOIN wm ON e.user_id = wm.user_id
    WHERE wm.hwm IS NULL OR e.event_id > wm.hwm
    GROUP BY e.user_id
    ORDER BY e.user_id
    """,
)
def q56_high_watermark_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    existing = ev.where(F.col("ts") < F.lit("1995-06-01").cast("timestamp"))
    wm = existing.groupBy("user_id").agg(F.max("event_id").alias("hwm"))
    # no broadcast hint on wm: per-user watermarks scale with user
    # cardinality — let AQE size the join
    fresh = ev.join(wm, on="user_id", how="left").where(
        F.col("hwm").isNull() | (F.col("event_id") > F.col("hwm"))
    )
    return (
        fresh.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_new"),
            F.min("event_id").alias("first_new_id"),
            F.max("event_id").alias("last_new_id"),
        )
        .orderBy("user_id")
    )


# --- q60: multi-level rollup via GROUPING SETS ------------------------------
# The OLAP rollup surface (detail / per-year / per-priority / grand
# total in one pass). Spark evaluates GROUPING SETS as a single
# Expand + one shuffle — the same plan shape a separate UNION ALL of
# four groupBys would need four scans and four shuffles for. gid is
# computed as explicit grouping() arithmetic because the engines'
# grouping_id() bit orders aren't part of any standard; NULLS FIRST is
# explicit because Spark and DuckDB default opposite null sort order.

_Q60_SQL = """
SELECT order_year, priority,
       CAST(2 * grouping(order_year) + grouping(priority) AS BIGINT) AS gid,
       count(*) AS n_orders,
       CAST(sum(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS total_price
FROM (SELECT year(o_orderdate) AS order_year, o_orderpriority AS priority,
             o_totalprice
      FROM {orders})
GROUP BY GROUPING SETS ((order_year, priority), (order_year), (priority), ())
ORDER BY gid, order_year NULLS FIRST, priority NULLS FIRST
"""


@query(
    "q60_priority_rollup",
    oracle=_Q60_SQL.format(orders="orders"),
)
def q60_priority_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("q60_orders")
    return spark.sql(_Q60_SQL.format(orders="q60_orders"))


# --- q61: salted two-phase aggregation under the oracle gate ----------------
# l_returnflag has 3 distinct values over the whole fact table — the
# textbook skewed-reducer case (at 100 TB each key would pin one
# reducer for ~billions of rows). salted_agg splits each hot key
# across 16 salts (phase 1: map-side-combined partials per
# (key, salt)), then merges at most 16 tiny rows per key (phase 2).
# Salting must be invisible in the result, so the oracle is the plain
# unsalted GROUP BY.

@query(
    "q61_salted_returnflag_stats",
    oracle="""
    SELECT l_returnflag,
           count(*) AS n_items,
           sum(CAST(l_quantity AS DECIMAL(18,2)))::DOUBLE AS total_qty,
           min(l_shipdate) AS first_ship,
           max(l_shipdate) AS last_ship
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
)
def q61_salted_returnflag_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    from terrorblade_spark.io import salted_agg

    li = load_table(spark, sf_dir, "lineitem")
    out = salted_agg(
        li,
        keys=["l_returnflag"],
        partial_aggs={
            "p_n": F.count(F.lit(1)),
            "p_qty": F.sum(F.col("l_quantity").cast("decimal(18,2)")),
            "p_min": F.min("l_shipdate"),
            "p_max": F.max("l_shipdate"),
        },
        merge_aggs={
            "n_items": F.sum("p_n"),
            "total_qty": F.sum("p_qty"),
            "first_ship": F.min("p_min"),
            "last_ship": F.max("p_max"),
        },
        n_salts=16,
    )
    return out.select(
        "l_returnflag",
        "n_items",
        F.col("total_qty").cast("double").alias("total_qty"),
        "first_ship",
        "last_ship",
    ).orderBy("l_returnflag")


# --- q98: pivot (wide per-user activity matrix) ------------------------------
# The one relational reshape the surface lacked. Implemented as ONE
# grouped conditional aggregate (count/sum over when(event_type = t)),
# NOT DataFrame.pivot(): measured on this plan, .pivot() compiles to a
# (user, type) pre-aggregate + a pivotfirst re-aggregate = TWO hash
# exchanges, where the conditional form is a single exchange with
# map-side partials — at 100 TB the second corpus shuffle is the whole
# cost. Values are pinned (the catalog's five event types) so both
# engines agree on the column set; value sums are decimal-exact.

_Q98_TYPES = ["click", "error", "purchase", "signup", "view"]


@query(
    "q98_event_type_pivot",
    oracle=f"""
    SELECT user_id,
           {", ".join(
               f"count(CASE WHEN event_type = '{t}' THEN 1 END)::BIGINT AS n_{t}, "
               f"coalesce(sum(CASE WHEN event_type = '{t}' THEN CAST(value AS DECIMAL(18,6)) END), 0)::DOUBLE AS v_{t}"
               for t in _Q98_TYPES
           )}
    FROM events
    GROUP BY user_id
    ORDER BY user_id
    """,
)
def q98_event_type_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    aggs = []
    for t in _Q98_TYPES:
        hit = F.col("event_type") == t
        aggs.append(F.count(F.when(hit, F.lit(1))).alias(f"n_{t}"))
        aggs.append(
            F.coalesce(
                F.sum(F.when(hit, F.col("value").cast("decimal(18,6)"))),
                F.lit(0).cast("decimal(18,6)"),
            ).cast("double").alias(f"v_{t}")
        )
    return e.groupBy("user_id").agg(*aggs).orderBy("user_id")


# --- q99: unpivot / melt (the inverse reshape) -------------------------------
# q98's wide matrix melted back to long form with DataFrame.unpivot
# (ids=user_id, values=the five n_* columns) — the wide->long half of
# the reshape pair. unpivot is a narrow row-to-rows expand (no
# shuffle beyond q98's single aggregate exchange); the oracle states
# the same thing as a UNION ALL over the conditional counts, filtered
# to non-zero exactly as the engine filters, so both sides carry one
# row per (user, active type).


@query(
    "q99_event_type_unpivot",
    oracle=f"""
    WITH wide AS (
      SELECT user_id,
             {", ".join(
                 f"count(CASE WHEN event_type = '{t}' THEN 1 END)::BIGINT AS n_{t}"
                 for t in _Q98_TYPES
             )}
      FROM events GROUP BY user_id
    )
    SELECT user_id, event_type, n FROM (
      {" UNION ALL ".join(
          f"SELECT user_id, '{t}' AS event_type, n_{t} AS n FROM wide"
          for t in _Q98_TYPES
      )}
    ) WHERE n > 0
    ORDER BY user_id, event_type
    """,
)
def q99_event_type_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    wide = e.groupBy("user_id").agg(
        *[
            F.count(F.when(F.col("event_type") == t, F.lit(1))).alias(f"n_{t}")
            for t in _Q98_TYPES
        ]
    )
    long = wide.unpivot(
        ids=["user_id"],
        values=[f"n_{t}" for t in _Q98_TYPES],
        variableColumnName="event_type",
        valueColumnName="n",
    ).select(
        "user_id",
        F.expr("substring(event_type, 3)").alias("event_type"),
        "n",
    )
    return long.where(F.col("n") > 0).orderBy("user_id", "event_type")


# --- q108: fuzzy record linkage (full value oracle) ---------------------------
# Entity resolution over the customer dimension: a perturbed twin
# relation (char 10 of every name replaced with 'x' — one edit) is
# matched back to the originals, best match per perturbed row by
# (distance, custkey). Blocking is the scale lever and this query
# demonstrates a COMPOSITE block: nation alone leaves 6k-row blocks at
# sf1 (~900M candidate pairs — measured, the oracle ran minutes);
# adding three suffix chars untouched by the perturbation (positions
# 16-18 of the fixed-format name) cuts blocks ~1000x while provably
# keeping every true match. The engine's banded levenshtein(threshold)
# kernel returns exact distances for every kept pair, so DuckDB's full
# levenshtein + a row_number keeper mirrors it — all-integer algebra.


@query(
    "q108_fuzzy_customer_match",
    oracle="""
    WITH pert AS (
      SELECT c_custkey AS p_id, c_nationkey AS p_nation,
             substr(c_name, 1, 9) || 'x' || substr(c_name, 11) AS p_name
      FROM customer
    ),
    cand AS (
      SELECT p.p_id, p.p_name, c.c_custkey, c.c_name,
             levenshtein(p.p_name, c.c_name) AS edit_distance
      FROM pert p
      JOIN customer c
        ON c.c_nationkey = p.p_nation
       AND substr(c.c_name, 16, 3) = substr(p.p_name, 16, 3)
      WHERE abs(length(p.p_name) - length(c.c_name)) <= 2
        AND levenshtein(p.p_name, c.c_name) <= 2
    ),
    best AS (
      SELECT *, row_number() OVER (
        PARTITION BY p_id ORDER BY edit_distance, c_custkey
      ) AS rn
      FROM cand
    )
    SELECT p_id, p_name, c_custkey, c_name, edit_distance
    FROM best WHERE rn = 1
    ORDER BY p_id
    """,
)
def q108_fuzzy_customer_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    from terrorblade_spark.operators.linkage import best_fuzzy_match

    cust = load_table(spark, sf_dir, "customer")
    # a second independent read: pert/orig derived from ONE relation
    # trip Spark's ambiguous-self-join analyzer inside the match join
    cust2 = load_table(spark, sf_dir, "customer")
    pert = cust.select(
        F.col("c_custkey").alias("p_id"),
        F.col("c_nationkey").alias("p_nation"),
        F.concat(
            F.substring("c_name", 1, 9), F.lit("x"), F.expr("substring(c_name, 11)")
        ).alias("p_name"),
    ).withColumn("p_sfx", F.substring("p_name", 16, 3))
    orig = cust2.select(
        "c_custkey", "c_nationkey", "c_name", F.substring("c_name", 16, 3).alias("c_sfx")
    )
    out = best_fuzzy_match(
        pert,
        orig,
        "p_name",
        "c_name",
        [("p_nation", "c_nationkey"), ("p_sfx", "c_sfx")],
        id_l="p_id",
        tiebreak_r="c_custkey",
        max_edit=2,
    )
    return out.select("p_id", "p_name", "c_custkey", "c_name", "edit_distance").orderBy(
        "p_id"
    )


# --- q116: brand co-purchase association rules (support/confidence/lift) ------
# Market-basket mining at the brand level: baskets are orders' distinct
# part brands (quantity-qualified), rules are unordered brand pairs
# with confidence and lift. The engine expands pairs ROW-LOCALLY from
# each basket's sorted brand array (operators/assoc.py — no self-join
# on the basket key); the oracle uses the classic self-join. Counts are
# integers and confidence/lift are single IEEE divisions of
# exact-in-double integers, so 6-dp rounding matches bit-for-bit.

_Q116_MIN_QTY = 25
_Q116_MIN_SUPPORT = 5

_Q116_BASKET_SQL = f"""
      SELECT DISTINCT l.l_orderkey AS bk, p.p_brand AS it
      FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
      WHERE l.l_quantity >= {_Q116_MIN_QTY}
"""


@query(
    "q116_brand_copurchase_rules",
    oracle=f"""
    WITH b AS MATERIALIZED ({_Q116_BASKET_SQL}),
    pairs AS (
      SELECT x.it AS item_a, y.it AS item_b, count(*)::BIGINT AS pair_count
      FROM b x JOIN b y ON x.bk = y.bk AND x.it < y.it
      GROUP BY x.it, y.it
      HAVING count(*) >= {_Q116_MIN_SUPPORT}
    ),
    supp AS (
      SELECT it, count(*)::BIGINT AS n FROM b GROUP BY it
    ),
    tot AS (
      SELECT count(DISTINCT bk)::DOUBLE AS nb FROM b
    )
    SELECT p.item_a, p.item_b, p.pair_count,
           sa.n AS count_a, sb.n AS count_b,
           round(p.pair_count / sa.n, 6) AS confidence,
           round(p.pair_count * tot.nb / (sa.n * sb.n), 6) AS lift
    FROM pairs p
    JOIN supp sa ON sa.it = p.item_a
    JOIN supp sb ON sb.it = p.item_b
    CROSS JOIN tot
    ORDER BY p.item_a, p.item_b
    """,
)
def q116_brand_copurchase_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    from terrorblade_spark.operators.assoc import association_rules

    li = load_table(spark, sf_dir, "lineitem").where(
        F.col("l_quantity") >= _Q116_MIN_QTY
    )
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    baskets = li.join(part, li["l_partkey"] == part["p_partkey"]).select(
        F.col("l_orderkey").alias("bk"), F.col("p_brand").alias("it")
    )
    rules = association_rules(
        baskets, "bk", "it", min_pair_support=_Q116_MIN_SUPPORT
    )
    return rules.select(
        "item_a",
        "item_b",
        "pair_count",
        "count_a",
        "count_b",
        F.round("confidence", 6).alias("confidence"),
        F.round("lift", 6).alias("lift"),
    ).orderBy("item_a", "item_b")
