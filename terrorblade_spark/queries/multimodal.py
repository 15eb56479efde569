"""Multimodal query surface: binary media columns with typed metadata
(SURVEY §1.1 files-table generalized to payloads). The deterministic
derivation (media_from_documents) lets DuckDB reproduce the binary
payloads exactly, so metadata/dedup/rollup queries are fully
oracle-checked; the decode/featurize steps (numpy inside mapInPandas)
are oracle-checked over their md5-derivable outputs (seed, feature
cosine pairs) and unit-tested (tests/test_multimodal.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from terrorblade_spark.functions.embed import duck_hash_vec_unit
from terrorblade_spark.multimodal.media import (
    decode_images,
    extract_features,
    media_fingerprint,
    media_from_documents,
    sample_frames,
)
from terrorblade_spark.operators.vector import sign_lsh_bucket
from terrorblade_spark.queries.vector import _duck_lsh_signs
from terrorblade_spark.registry import query
from terrorblade_spark.tables import load_table

# the SQL twin of media_from_documents (kind round-robin + utf8 payload).
# DuckDB's md5 only accepts VARCHAR, so the oracle fingerprints md5(text)
# — identical to Spark's md5(encode(text, 'UTF-8')) byte-for-byte.
_MEDIA_SQL = """
      SELECT doc_id AS media_id,
             CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
             encode(text) AS content,
             text AS payload_text,
             CASE WHEN doc_id % 3 = 0 THEN doc_id % 640 + 16 END AS width,
             CASE WHEN doc_id % 3 = 0 THEN doc_id % 480 + 16 END AS height,
             CASE WHEN doc_id % 3 <> 0 THEN n_chars * 10 END AS duration_ms
      FROM documents
"""


# --- q48: metadata-only profile (payload column never read) ------------------

@query(
    "q48_media_profile",
    oracle=f"""
    SELECT kind,
           count(*) AS n_media,
           CAST(sum(octet_length(content)) AS BIGINT) AS total_bytes,
           count(DISTINCT md5(payload_text)) AS n_distinct_payloads,
           max(width) AS max_width,
           max(duration_ms) AS max_duration_ms
    FROM ({_MEDIA_SQL})
    GROUP BY kind
    ORDER BY kind
    """,
)
def q48_media_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    m = media_from_documents(load_table(spark, sf_dir, "documents"))
    return (
        m.groupBy("kind")
        .agg(
            F.count(F.lit(1)).alias("n_media"),
            F.sum(F.octet_length("content")).alias("total_bytes"),
            F.countDistinct(media_fingerprint(F.col("content"))).alias(
                "n_distinct_payloads"
            ),
            F.max("meta.width").alias("max_width"),
            F.max("meta.duration_ms").alias("max_duration_ms"),
        )
        .orderBy("kind")
    )


# --- q50: video frame-sample rollup (sampling plumbing, SQL-checkable) -------
# (binary exact-dedup — groupBy(media_fingerprint(content)) — is the
# q31 hash-groupBy shape over the content column; q48 already
# hash-checks the fingerprint expression via n_distinct_payloads)

@query(
    "q50_frame_sample_rollup",
    oracle=f"""
    SELECT media_id,
           CAST(ceil(duration_ms / 1000.0) AS BIGINT) AS n_frames,
           (CAST(ceil(duration_ms / 1000.0) AS BIGINT) - 1) * 1000 AS last_frame_ms
    FROM ({_MEDIA_SQL})
    WHERE kind = 'video' AND duration_ms > 0
    ORDER BY media_id
    """,
)
def q50_frame_sample_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    m = media_from_documents(load_table(spark, sf_dir, "documents"))
    frames = sample_frames(m, every_ms=1000)
    return (
        frames.groupBy("media_id")
        .agg(
            F.count(F.lit(1)).alias("n_frames"),
            F.max("frame_ms").alias("last_frame_ms"),
        )
        .orderBy("media_id")
    )


# --- q51: image decode through mapInPandas, oracle-gated ---------------------
# The fake decoder's pixel stats are RNG-derived (unit-tested in
# tests/test_multimodal.py); what the oracle CAN check exactly is the
# decode path's md5-derived seed plus the metadata the decoder resolves
# — which still exercises the whole mapInPandas plumbing end-to-end.

@query(
    "q51_image_decode_stats",
    oracle=f"""
    SELECT media_id,
           CAST(width AS INT) AS width,
           CAST(height AS INT) AS height,
           ('0x' || substring(md5(payload_text), 1, 8))::BIGINT AS decode_seed
    FROM ({_MEDIA_SQL})
    WHERE kind = 'image'
    ORDER BY media_id
    """,
)
def q51_image_decode_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    m = media_from_documents(load_table(spark, sf_dir, "documents"))
    d = decode_images(m)
    return d.select("media_id", "width", "height", "decode_seed").orderBy("media_id")


# --- q52: cross-modal feature near-dup (featurize -> LSH bucket -> cosine) ---
# The hash featurizer is md5 arithmetic, so DuckDB rebuilds the vectors
# (duck_hash_vec_unit replays the float32 quantization — thresholds
# cannot flip) and replays the whole candidate generation. Candidates
# are BOUNDED by a sign-LSH bucket join (same operator as q54): a bare
# within-kind self-join is quadratic in corpus size — the classic
# scale-killer at 100 TB — while (kind, bucket) co-partitions the join
# and caps each task's pair count. Only pair ids cross the comparison;
# the cosine VALUE passes through float32 and would be a rounding trap.

@query(
    "q52_media_feature_neardup",
    oracle=f"""
    WITH signs AS ({_duck_lsh_signs(6, 32)}),
    feats AS (
      SELECT media_id, kind, {duck_hash_vec_unit("payload_text", 32)} AS v
      FROM ({_MEDIA_SQL})
    ),
    bucketed AS (
      SELECT f.media_id, f.kind, f.v,
             CAST(sum(CASE WHEN list_dot_product(f.v, s.signs) > 0
                           THEN 1 << s.p ELSE 0 END) AS INTEGER) AS bucket
      FROM feats f, signs s GROUP BY f.media_id, f.kind, f.v
    )
    SELECT a.kind AS kind, a.media_id AS id_a, b.media_id AS id_b
    FROM bucketed a JOIN bucketed b
      ON a.kind = b.kind AND a.bucket = b.bucket AND a.media_id < b.media_id
    WHERE CASE WHEN list_dot_product(a.v, a.v) > 0 AND list_dot_product(b.v, b.v) > 0
               THEN list_dot_product(a.v, b.v) /
                    (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v)))
          END >= 0.5
    ORDER BY kind, id_a, id_b
    """,
)
def q52_media_feature_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from terrorblade_spark.operators.vector import dot, norm

    m = media_from_documents(load_table(spark, sf_dir, "documents"))
    feats = extract_features(m, dim=32).withColumn(
        "bucket", sign_lsh_bucket(F.col("features"), planes=6, dims=32)
    )
    # Round-10 reshape (guide §2.4/§3.5, the q33 recipe): one
    # groupBy(kind, bucket) collects each bucket's members (sorted by
    # media_id, so expanded pairs are already id_a < id_b) and pairs
    # expand row-locally via posexplode + slice — replacing the bucket
    # self-join, which consumed the featurized relation TWICE and
    # therefore forced a persist + eager-count materialization of the
    # mapInPandas output. Now featurize runs once inside one plan,
    # nothing is persisted, and one full scan + the join shuffle
    # disappear. Row width stays bounded by bucket population P (the
    # slice), not O(P^2). The per-row L2 norm is folded ONCE here and
    # reused for every pair the row participates in — the old plan
    # re-folded both norms per pair (3 array aggregates per pair -> 1).
    # Arithmetic is bit-identical: dot/(norm_a*norm_b) with the same
    # sequential fold and the same multiply order, a = smaller-id side.
    feats = feats.where(F.col("kind").isNotNull()).withColumn(
        "nrm", norm(F.col("features"))
    )
    # Round-11 population cap (guide §2.5): pairs expand through
    # bucket_pair_rows — row-local within bounded rank-chunks, a
    # chunk-relation self-join across them (identical pair set;
    # members carry the feature vector, so the cap is the
    # vector-member 8192 like semantic LSH).
    from terrorblade_spark.operators.bucketpairs import bucket_pair_rows

    pairs = bucket_pair_rows(
        feats.select(
            "kind", "bucket", F.struct("media_id", "features", "nrm").alias("m")
        ),
        ["kind", "bucket"], "m", max_bucket_population=8192,
        # ONE execution of the featurize mapInPandas across the cap's
        # consumer branches (measured: without it the hot legs re-ran
        # the feature pipeline; AQE stage reuse is unreliable across
        # them even for canonically-equal exchanges — bucketpairs.py)
        materialize=True,
    )
    d = dot(F.col("a.features"), F.col("b.features"))
    n = F.col("a.nrm") * F.col("b.nrm")
    sim = F.when(n > 0, d / n)
    return (
        pairs.where(sim >= 0.5)
        .select(
            "kind",
            F.col("a.media_id").alias("id_a"),
            F.col("b.media_id").alias("id_b"),
        )
        .orderBy("kind", "id_a", "id_b")
    )
