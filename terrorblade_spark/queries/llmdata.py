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


# --- q67: eval-set decontamination ------------------------------------------
# eval set = first 20 docs by id (deterministic); every train doc gets
# its shingle-overlap contamination stats against that broadcast set

_DECON_N = 3
_DECON_MAX = 0.5


def _q67_oracle() -> str:
    from terrorblade_spark.operators.textops import duck_shingles

    sh = duck_shingles("text", _DECON_N)
    return f"""
    WITH shingled AS (SELECT doc_id, {sh} AS sh FROM documents),
    eval_ids AS (SELECT doc_id FROM documents ORDER BY doc_id LIMIT 20),
    eval_sh AS (
      SELECT DISTINCT unnest(sh) AS shingle FROM shingled
      WHERE doc_id IN (SELECT doc_id FROM eval_ids)
    ),
    train_sh AS (SELECT doc_id, unnest(sh) AS shingle FROM shingled),
    hits AS (
      SELECT t.doc_id, count(*) AS n_contaminated
      FROM train_sh t JOIN eval_sh e USING (shingle) GROUP BY 1
    )
    SELECT s.doc_id,
           CAST(len(s.sh) AS BIGINT) AS n_shingles,
           coalesce(h.n_contaminated, 0) AS n_contaminated,
           CASE WHEN len(s.sh) > 0
                THEN coalesce(h.n_contaminated, 0)::DOUBLE / len(s.sh)::DOUBLE
                ELSE 0.0 END AS contamination_ratio,
           CAST(CASE WHEN len(s.sh) > 0
                 AND coalesce(h.n_contaminated, 0)::DOUBLE / len(s.sh)::DOUBLE
                     > {_DECON_MAX}
                THEN 1 ELSE 0 END AS BIGINT) AS is_contaminated
    FROM shingled s LEFT JOIN hits h USING (doc_id)
    ORDER BY doc_id
    """


@query("q67_decontaminate", oracle=_q67_oracle())
def q67_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    from terrorblade_spark.operators.curation import decontaminate

    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    eval_df = d.orderBy("doc_id").limit(20)
    out = decontaminate(d, eval_df, n=_DECON_N, max_overlap_ratio=_DECON_MAX)
    return out.select(
        "doc_id",
        "n_shingles",
        "n_contaminated",
        "contamination_ratio",
        F.col("is_contaminated").cast("long").alias("is_contaminated"),
    ).orderBy("doc_id")


# --- q68: repetition signals (Gopher-style dup-line / top-bigram) -----------

_Q68_ORACLE = """
WITH base AS (
  SELECT doc_id, text,
         list_filter(string_split(text, chr(10)), x -> len(trim(x)) > 0) AS lines,
         list_transform(
           list_filter(regexp_split_to_array(trim(text), '\\s+'), t -> t <> ''),
           t -> lower(t)
         ) AS toks
  FROM documents
), grams AS (
  SELECT doc_id, lines,
         CASE WHEN len(toks) >= 2
              THEN list_transform(range(1, len(toks)), i -> toks[i] || ' ' || toks[i + 1])
              ELSE [] END AS gs,
         len(text) AS n_chars
  FROM base
), stats AS (
  SELECT doc_id,
         coalesce(list_sum(list_transform(lines, x -> len(x))), 0) AS line_chars,
         coalesce(list_sum(list_transform(lines,
           x -> CASE WHEN len(list_filter(lines, y -> y = x)) > 1
                     THEN len(x) ELSE 0 END)), 0) AS dup_chars,
         coalesce(list_max(list_transform(list_distinct(lines),
           x -> len(list_filter(lines, y -> y = x)))), 0) AS max_rep,
         coalesce(list_max(list_transform(list_distinct(gs),
           g -> len(list_filter(gs, h -> h = g)) * len(g))), 0) AS top_covered,
         n_chars
  FROM grams
)
SELECT doc_id,
       CASE WHEN line_chars > 0 THEN dup_chars::DOUBLE / line_chars::DOUBLE
            ELSE 0.0 END AS dup_line_char_frac,
       CAST(max_rep AS BIGINT) AS max_line_repeat,
       CASE WHEN n_chars > 0 AND top_covered > 0
            THEN top_covered::DOUBLE / n_chars::DOUBLE
            ELSE 0.0 END AS top_bigram_char_frac
FROM stats
ORDER BY doc_id
"""


@query("q68_repetition_signals", oracle=_Q68_ORACLE)
def q68_repetition_signals(spark: SparkSession, sf_dir: str) -> DataFrame:
    from terrorblade_spark.operators.curation import repetition_signals

    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    return repetition_signals(d).select(
        "doc_id", "dup_line_char_frac", "max_line_repeat", "top_bigram_char_frac"
    ).orderBy("doc_id")


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
