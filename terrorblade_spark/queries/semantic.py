"""Semantic-pipeline query surface (SURVEY §2.9 E1–E7): sliding
distances, segments, combined groups, author runs, and the full
process_message_groups pipeline — exercised over the embeddings and
events tables so each step has a DuckDB oracle, INCLUDING the E1
embedding UDF and the full E7 pipeline: the hash encoder is md5
arithmetic DuckDB reproduces exactly (functions.embed.duck_hash_vec).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from terrorblade_spark.functions.exprs import csv_join
from terrorblade_spark.functions.embed import duck_hash_vec, duck_hash_vec_unit, embed_text
from terrorblade_spark.operators.semantic import (
    author_runs,
    calculate_groups,
    concat_author_runs,
    semantic_segments,
    sliding_distance,
)
from terrorblade_spark.registry import query
from terrorblade_spark.tables import load_table

# cosine between a vector and its lag, in DuckDB (embeddings cast to
# double so the fold matches Spark bit-for-bit — see queries.vector).
# Zero-norm guard mirrors Spark's cosine(): without it DuckDB computes
# 0/0 = NaN (not NULL — the coalesce would NOT catch it) while Spark
# yields NULL -> 0.0; q46's oracle below uses the same guarded form.
_DCOS = (
    "CASE WHEN list_dot_product(v, v) > 0 AND list_dot_product(pv, pv) > 0 "
    "THEN list_dot_product(v, pv) / "
    "(sqrt(list_dot_product(v, v)) * sqrt(list_dot_product(pv, pv))) END"
)

_SLIDING_SQL = f"""
      SELECT vec_id, label,
             coalesce(1.0 - ({_DCOS}), 0.0) AS distance
      FROM (
        SELECT vec_id, label, embedding::DOUBLE[] AS v,
               lag(embedding::DOUBLE[]) OVER (PARTITION BY label ORDER BY vec_id) AS pv
        FROM embeddings
      )
"""


# --- q43: E3+E4+E5 in one gated query ----------------------------------------
# One plan emits all three stage columns (sliding distance, semantic
# segment, combined group) so a single CORRECTNESS slot value-checks the
# full chain; the 50-slot harness budget is why the stages are no
# longer gated separately (each stage is still unit-tested in
# tests/test_semantic_ops.py).

_SEGMENTS_SQL = f"""
      SELECT vec_id, label, distance,
             CAST(sum(CASE WHEN distance > 0.9 THEN 1 ELSE 0 END)
               OVER (PARTITION BY label ORDER BY vec_id
                     ROWS UNBOUNDED PRECEDING) AS BIGINT) AS semantic_segment
      FROM ({_SLIDING_SQL})
"""


@query(
    "q43_semantic_groups",
    oracle=f"""
    WITH seg AS ({_SEGMENTS_SQL}),
    pre AS (
      SELECT *, vec_id // 25 AS pre_cluster FROM seg
    ), breaks AS (
      SELECT *,
             CASE WHEN (semantic_segment IS DISTINCT FROM
                          lag(semantic_segment) OVER (PARTITION BY label ORDER BY vec_id))
                    OR (pre_cluster IS DISTINCT FROM
                          lag(pre_cluster) OVER (PARTITION BY label ORDER BY vec_id))
                  THEN 1 ELSE 0 END AS is_break
      FROM pre
    )
    SELECT vec_id, label, distance, semantic_segment,
           CAST(sum(is_break) OVER (PARTITION BY label ORDER BY vec_id
                                    ROWS UNBOUNDED PRECEDING) - 1 AS BIGINT) AS group_id
    FROM breaks
    ORDER BY label, vec_id
    """,
)
def q43_semantic_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    d = sliding_distance(emb, "embedding", ["label"], ["vec_id"])
    seg = semantic_segments(d, "distance", ["label"], ["vec_id"], threshold=0.9)
    # integer floor division on BOTH sides (DuckDB's CAST(double AS
    # BIGINT) rounds while Spark's truncates — never cast a quotient)
    pre = seg.withColumn("pre_cluster", F.floor(F.col("vec_id") / 25).cast("long"))
    return (
        calculate_groups(pre, ["label"], ["vec_id"])
        .select("vec_id", "label", "distance", "semantic_segment", "group_id")
        .orderBy("label", "vec_id")
    )


# --- q44: author runs + ordered concat (E6 + A1) over events -----------------

@query(
    "q44_author_run_concat",
    oracle="""
    WITH g AS (
      SELECT *, epoch_ms(ts) - lag(epoch_ms(ts))
                  OVER (PARTITION BY user_id ORDER BY ts, event_id) AS gap_ms,
             CASE WHEN event_type IS DISTINCT FROM
                    lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                  THEN 1 ELSE 0 END AS author_changed
      FROM events
    ), runs AS (
      SELECT *, CAST(sum(CASE WHEN gap_ms IS NULL OR gap_ms > 1800000
                                OR author_changed = 1 THEN 1 ELSE 0 END)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS UNBOUNDED PRECEDING) - 1 AS BIGINT) AS message_group
      FROM g
    )
    SELECT user_id, message_group,
           min(ts) AS ts,
           count(*) AS n_messages,
           string_agg(props, '. ' ORDER BY ts, event_id) AS text,
           array_to_string(array_agg(event_id ORDER BY ts, event_id), ',') AS message_ids
    FROM runs
    GROUP BY user_id, message_group
    ORDER BY user_id, message_group
    """,
)
def q44_author_run_concat(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events").withColumnRenamed("props", "text")
    runs = author_runs(e, "event_type", "ts", ["user_id"], "event_id", gap="30m")
    return (
        concat_author_runs(
            runs, "message_group", "ts", "event_id", "text", partition_cols=["user_id"]
        )
        .select(
            "user_id", "message_group", "ts", "n_messages", "text",
            csv_join("message_ids").alias("message_ids"),
        )
        .orderBy("user_id", "message_group")
    )


# --- q45: E1 embedding UDF under the oracle gate -----------------------------
# The hash encoder is md5 token arithmetic, so DuckDB reproduces its
# un-normalized bucket sums exactly (duck_hash_vec). The query emits
# scale-invariant, integer-exact views of the UDF's float32 output —
# dim, non-zero count, (bucket:sign) pattern — plus the l2 invariant
# rounded to 3 places (float32 quantization error is ~1e-7, so the
# round can never flip). No float values cross the comparison.

_Q45_VEC = duck_hash_vec("text", 64)


@query(
    "q45_embed_documents",
    oracle=f"""
    WITH v AS (SELECT doc_id, {_Q45_VEC} AS vec FROM documents)
    SELECT doc_id,
           CAST(64 AS INT) AS dim,
           CAST(len(list_filter(vec, x -> x <> 0)) AS INT) AS nnz,
           array_to_string(list_filter(list_transform(vec, (x, i) ->
             CASE WHEN x > 0 THEN (i - 1)::VARCHAR || ':1'
                  WHEN x < 0 THEN (i - 1)::VARCHAR || ':-1' END),
             s -> s IS NOT NULL), ',') AS sign_pattern,
           CAST(CASE WHEN len(list_filter(vec, x -> x <> 0)) > 0
                     THEN 1.0 ELSE 0.0 END AS DOUBLE) AS unit_norm
    FROM v
    ORDER BY doc_id
    """,
)
def q45_embed_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    emb = embed_text(dim=64)
    e = d.withColumn("emb", emb(F.col("text")))
    sq = F.aggregate(
        F.col("emb"), F.lit(0.0), lambda a, x: a + x.cast("double") * x.cast("double")
    )
    sign_entries = F.filter(
        F.transform(
            "emb",
            lambda x, i: F.when(x > 0, F.concat(i.cast("string"), F.lit(":1"))).when(
                x < 0, F.concat(i.cast("string"), F.lit(":-1"))
            ),
        ),
        lambda s: s.isNotNull(),
    )
    return e.select(
        "doc_id",
        F.lit(64).alias("dim"),
        F.size(F.filter("emb", lambda x: x != 0)).alias("nnz"),
        F.array_join(sign_entries, ",").alias("sign_pattern"),
        F.round(sq, 3).alias("unit_norm"),
    ).orderBy("doc_id")


# --- q46: full E7 pipeline over events + hash embeddings ---------------------
# End-to-end oracle: DuckDB rebuilds the hash embeddings (un-normalized
# — cosine is scale-invariant) and replays the whole pipeline: temporal
# pre-clusters (1h gap), sliding cosine distance, segments (> 0.95),
# combined groups, strict > 3 size gate, per-user rollup.

_Q46_VEC = duck_hash_vec_unit("props", 32)


@query(
    "q46_message_group_pipeline",
    oracle=f"""
    WITH base AS (
      SELECT event_id, user_id, ts, {_Q46_VEC} AS v FROM events
    ), seq AS (
      SELECT *, lag(v) OVER w AS pv,
             epoch_ms(ts) - lag(epoch_ms(ts)) OVER w AS gap_ms
      FROM base
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), dist AS (
      SELECT *,
             coalesce(CASE WHEN list_dot_product(v, v) > 0 AND list_dot_product(pv, pv) > 0
                           THEN 1.0 - list_dot_product(v, pv) /
                                (sqrt(list_dot_product(v, v)) * sqrt(list_dot_product(pv, pv)))
                      END, 0.0) AS distance,
             CAST(sum(CASE WHEN gap_ms IS NULL OR gap_ms > 3600000 THEN 1 ELSE 0 END)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS UNBOUNDED PRECEDING) - 1 AS BIGINT) AS pre_cluster
      FROM seq
    ), seg AS (
      SELECT *, CAST(sum(CASE WHEN distance > 0.95 THEN 1 ELSE 0 END)
        OVER (PARTITION BY user_id ORDER BY ts, event_id
              ROWS UNBOUNDED PRECEDING) AS BIGINT) AS semantic_segment
      FROM dist
    ), brk AS (
      SELECT *, CASE WHEN (semantic_segment IS DISTINCT FROM lag(semantic_segment) OVER w2)
                       OR (pre_cluster IS DISTINCT FROM lag(pre_cluster) OVER w2)
                     THEN 1 ELSE 0 END AS is_break
      FROM seg
      WINDOW w2 AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), grp AS (
      SELECT *, CAST(sum(is_break) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                         ROWS UNBOUNDED PRECEDING) - 1 AS BIGINT) AS g0
      FROM brk
    ), gated AS (
      SELECT *, CASE WHEN count(*) OVER (PARTITION BY user_id, g0) > 3 THEN g0 END AS group_id
      FROM grp
    )
    SELECT user_id, count(*) AS n_events,
           count(DISTINCT group_id) AS n_groups,
           CAST(sum(CASE WHEN group_id IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_ungrouped
    FROM gated
    GROUP BY user_id
    ORDER BY user_id
    """,
)
def q46_message_group_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    from terrorblade_spark.operators.semantic import process_message_groups

    e = load_table(spark, sf_dir, "events")
    emb = embed_text(dim=32)
    with_vec = e.withColumn("embeddings", emb(F.col("props")))
    grouped = process_message_groups(
        with_vec, "embeddings", "ts", ["user_id"], "event_id",
        time_window="1h", semantic_threshold=0.95, cluster_size=3,
    )
    return (
        grouped.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct("group_id").alias("n_groups"),
            F.sum(F.when(F.col("group_id").isNull(), 1).otherwise(0)).alias("n_ungrouped"),
        )
        .orderBy("user_id")
    )
