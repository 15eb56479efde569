"""Training-data plumbing queries: deterministic corpus shuffle and
int8 embedding quantization — the two ends of a training epoch (what
order rows stream in; how vectors fit in memory).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from terrorblade_spark.operators.sampling import shuffle_corpus
from terrorblade_spark.operators.sketches import sketch_profile
from terrorblade_spark.operators.vector import quantize_int8
from terrorblade_spark.registry import query
from terrorblade_spark.tables import load_table

# --- q63: deterministic training-order shuffle ------------------------------

_SHUF_SEED = "epoch0"
_SHARDS = 8


@query(
    "q63_corpus_shuffle",
    oracle=f"""
    WITH hashed AS (
      SELECT doc_id,
             ('0x' || substring(md5('{_SHUF_SEED}/' || doc_id::VARCHAR), 1, 15))::BIGINT AS h
      FROM documents
    )
    SELECT doc_id,
           (h % {_SHARDS})::INT AS shard,
           (row_number() OVER (PARTITION BY h % {_SHARDS} ORDER BY h, doc_id) - 1)::BIGINT AS pos
    FROM hashed
    ORDER BY shard, pos
    """,
)
def q63_corpus_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents").select("doc_id")
    return shuffle_corpus(d, "doc_id", seed=_SHUF_SEED, n_shards=_SHARDS).orderBy(
        "shard", "pos"
    )


# --- q64: symmetric int8 embedding quantization -----------------------------

@query(
    "q64_embedding_quantize",
    oracle="""
    WITH sc AS (
      SELECT vec_id, embedding::DOUBLE[] AS v,
             list_max(list_transform(embedding::DOUBLE[], x -> abs(x))) / 127.0 AS scale
      FROM embeddings
    )
    SELECT vec_id, scale,
           array_to_string(
             list_transform(
               v, x -> (CASE WHEN scale > 0 THEN round(x / scale, 0) ELSE 0.0 END)::INT::VARCHAR
             ), ','
           ) AS qvec
    FROM sc
    ORDER BY vec_id
    """,
)
def q64_embedding_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    q = quantize_int8(e, "embedding", "qvec", "scale")
    # qvec emitted as a canonical comma-joined string (the harness's
    # row canonicalizer hashes scalar cells, not arrays)
    return q.select(
        "vec_id",
        "scale",
        F.array_join(F.transform("qvec", lambda v: v.cast("string")), ",").alias("qvec"),
    ).orderBy("vec_id")


# --- q65: sketch-based corpus profile (no oracle: HLL / rank-sketch ---------
# estimates are engine-specific; Spark's are deterministic, DuckDB's
# differ by design, so the driver runs its rows-only check)

@query("q65_sketch_profile")
def q65_sketch_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return sketch_profile(
        ev,
        ["event_type"],
        ["user_id"],
        percentile_col="value",
        percentiles=(0.5, 0.9, 0.99),
    ).orderBy("event_type")
