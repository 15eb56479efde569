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


# --- q67: curation profile (decontamination + repetition + Gopher gate) -----
# ONE gated query for the whole curation stack — eval-set shingle
# decontamination (eval = first 20 docs by id, broadcast probe),
# repetition signals, and the Gopher-style quality reasons — so a
# single CORRECTNESS slot value-checks all three operators (the
# harness verifies only the first 50 registered queries).

_DECON_N = 3
_DECON_MAX = 0.5


def _q67_oracle() -> str:
    from terrorblade_spark.operators.textops import duck_shingles

    sh = duck_shingles("text", _DECON_N)
    return f"""
    WITH base AS (
      SELECT doc_id, text, {sh} AS sh,
             list_filter(string_split(text, chr(10)), x -> len(trim(x)) > 0) AS lines,
             list_transform(
               list_filter(regexp_split_to_array(trim(text), '\\s+'), t -> t <> ''),
               t -> lower(t)
             ) AS toks
      FROM documents
    ),
    eval_ids AS (SELECT doc_id FROM documents ORDER BY doc_id LIMIT 20),
    eval_sh AS (
      SELECT DISTINCT unnest(sh) AS shingle FROM base
      WHERE doc_id IN (SELECT doc_id FROM eval_ids)
    ),
    train_sh AS (SELECT doc_id, unnest(sh) AS shingle FROM base),
    hits AS (
      SELECT t.doc_id, count(*) AS n_contaminated
      FROM train_sh t JOIN eval_sh e USING (shingle) GROUP BY 1
    ),
    grams AS (
      SELECT doc_id,
             CASE WHEN len(toks) >= 2
                  THEN list_transform(range(1, len(toks)), i -> toks[i] || ' ' || toks[i + 1])
                  ELSE [] END AS gs
      FROM base
    ),
    sig AS (
      SELECT b.doc_id,
             CAST(len(b.sh) AS BIGINT) AS n_shingles,
             coalesce(h.n_contaminated, 0) AS n_contaminated,
             CAST(len(b.toks) AS BIGINT) AS n_words,
             CASE WHEN len(b.toks) > 0
                  THEN coalesce(list_sum(list_transform(b.toks, t -> len(t))), 0)::DOUBLE
                       / len(b.toks)::DOUBLE
                  ELSE 0.0 END AS mean_wl,
             CASE WHEN len(b.toks) > 0
                  THEN (len(b.text) - len(regexp_replace(b.text, '#|\\.\\.\\.', '', 'g')))::DOUBLE
                       / len(b.toks)::DOUBLE
                  ELSE 0.0 END AS sym_ratio,
             coalesce(list_sum(list_transform(b.lines, x -> len(x))), 0) AS line_chars,
             coalesce(list_sum(list_transform(b.lines,
               x -> CASE WHEN len(list_filter(b.lines, y -> y = x)) > 1
                         THEN len(x) ELSE 0 END)), 0) AS dup_chars,
             coalesce(list_max(list_transform(list_distinct(b.lines),
               x -> len(list_filter(b.lines, y -> y = x)))), 0) AS max_rep,
             coalesce(list_max(list_transform(list_distinct(g.gs),
               gg -> len(list_filter(g.gs, h2 -> h2 = gg)) * len(gg))), 0) AS top_covered,
             len(b.text) AS n_chars
      FROM base b LEFT JOIN hits h USING (doc_id) JOIN grams g USING (doc_id)
    ),
    fr AS (
      SELECT *,
             CASE WHEN line_chars > 0 THEN dup_chars::DOUBLE / line_chars::DOUBLE
                  ELSE 0.0 END AS dup_frac
      FROM sig
    )
    SELECT doc_id, n_shingles, n_contaminated,
           CASE WHEN n_shingles > 0
                THEN n_contaminated::DOUBLE / n_shingles::DOUBLE
                ELSE 0.0 END AS contamination_ratio,
           CAST(CASE WHEN n_shingles > 0
                 AND n_contaminated::DOUBLE / n_shingles::DOUBLE > {_DECON_MAX}
                THEN 1 ELSE 0 END AS BIGINT) AS is_contaminated,
           dup_frac AS dup_line_char_frac,
           CAST(max_rep AS BIGINT) AS max_line_repeat,
           CASE WHEN n_chars > 0 AND top_covered > 0
                THEN top_covered::DOUBLE / n_chars::DOUBLE
                ELSE 0.0 END AS top_bigram_char_frac,
           coalesce(array_to_string(list_filter([
             CASE WHEN n_words < 5 THEN 'too_few_words' END,
             CASE WHEN n_words > 100000 THEN 'too_many_words' END,
             CASE WHEN mean_wl < 2.0 THEN 'mean_word_len_low' END,
             CASE WHEN mean_wl > 12.0 THEN 'mean_word_len_high' END,
             CASE WHEN sym_ratio > 0.1 THEN 'symbol_ratio' END,
             CASE WHEN dup_frac > 0.3 THEN 'dup_lines' END
           ], x -> x IS NOT NULL), ','), '') AS quality_reasons,
           CAST(CASE WHEN n_words >= 5 AND n_words <= 100000
                      AND mean_wl >= 2.0 AND mean_wl <= 12.0
                      AND sym_ratio <= 0.1 AND dup_frac <= 0.3
                     THEN 1 ELSE 0 END AS BIGINT) AS keep
    FROM fr
    ORDER BY doc_id
    """


@query("q67_curation_profile", oracle=_q67_oracle())
def q67_curation_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    from terrorblade_spark.functions.exprs import csv_join
    from terrorblade_spark.operators.curation import decontaminate, gopher_filter

    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    eval_df = d.orderBy("doc_id").limit(20)
    out = gopher_filter(decontaminate(d, eval_df, n=_DECON_N, max_overlap_ratio=_DECON_MAX))
    return out.select(
        "doc_id",
        "n_shingles",
        "n_contaminated",
        "contamination_ratio",
        F.col("is_contaminated").cast("long").alias("is_contaminated"),
        "dup_line_char_frac",
        "max_line_repeat",
        "top_bigram_char_frac",
        csv_join("quality_reasons").alias("quality_reasons"),
        F.col("keep").cast("long").alias("keep"),
    ).orderBy("doc_id")


# --- q70: PII redaction -------------------------------------------------------
# counts are taken on the PROGRESSIVELY redacted text (emails first, so
# address digits never half-match the phone pattern) — mirrored below


def _q70_oracle() -> str:
    from terrorblade_spark.operators.curation import PII_PATTERNS

    sql_pat = {k: p.replace("\\", "\\\\").replace("'", "''") for k, p, _ in PII_PATTERNS}
    tok = {k: t for k, _, t in PII_PATTERNS}
    return f"""
    WITH s0 AS (SELECT doc_id, text FROM documents),
    s1 AS (
      SELECT doc_id,
             CAST(len(regexp_extract_all(text, '{sql_pat["email"]}')) AS BIGINT) AS n_email,
             regexp_replace(text, '{sql_pat["email"]}', '{tok["email"]}', 'g') AS text
      FROM s0
    ), s2 AS (
      SELECT doc_id, n_email,
             CAST(len(regexp_extract_all(text, '{sql_pat["ipv4"]}')) AS BIGINT) AS n_ipv4,
             regexp_replace(text, '{sql_pat["ipv4"]}', '{tok["ipv4"]}', 'g') AS text
      FROM s1
    )
    SELECT doc_id, n_email, n_ipv4,
           CAST(len(regexp_extract_all(text, '{sql_pat["phone"]}')) AS BIGINT) AS n_phone,
           regexp_replace(text, '{sql_pat["phone"]}', '{tok["phone"]}', 'g') AS text
    FROM s2
    ORDER BY doc_id
    """


@query("q70_pii_redaction", oracle=_q70_oracle())
def q70_pii_redaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    from terrorblade_spark.operators.curation import redact_pii

    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    return redact_pii(d).select(
        "doc_id", "n_email", "n_ipv4", "n_phone", "text"
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


# --- q77: stratified quota sample --------------------------------------------
# Exactly min(quota, |stratum|) docs per language, deterministically:
# one window over the stratum ordered by a seeded md5 hash (no rand(),
# so retries/AQE re-plans cannot change the sample) — the engine-
# portable draw the oracle reproduces bit-for-bit.

_STRAT_SEED = "strat-v1"
_STRAT_QUOTA = 50


@query(
    "q77_stratified_sample",
    oracle=f"""
    WITH h AS (
      SELECT doc_id, lang,
             ('0x' || substring(md5('{_STRAT_SEED}' || doc_id::VARCHAR), 1, 15))::BIGINT AS o
      FROM documents
    )
    SELECT doc_id, lang FROM (
      SELECT doc_id, lang,
             row_number() OVER (PARTITION BY lang ORDER BY o, doc_id) AS rn
      FROM h
    ) WHERE rn <= {_STRAT_QUOTA}
    ORDER BY lang, doc_id
    """,
)
def q77_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from terrorblade_spark.operators.sampling import stratified_quota_sample

    d = load_table(spark, sf_dir, "documents").select("doc_id", "lang")
    out = stratified_quota_sample(
        d, ["lang"], quota=_STRAT_QUOTA, id_col="doc_id", seed=_STRAT_SEED
    )
    return out.orderBy("lang", "doc_id")


# --- q81: DSIR importance resampling -----------------------------------------
# Target the raw corpus at the English subset: fit smoothed hashed-
# n-gram bucket distributions over target and raw, weight every doc by
# its log importance ratio, Gumbel-top-k sample k docs with probability
# proportional to exp(weight). Every stage (md5 bucket hash, count
# ratios, ln, seeded uniform, 6-dp rounding) is engine-portable, so the
# SELECTION ITSELF is value-oracled — see operators/dsir.py for why the
# rounding is what makes a float-weighted sample deterministic.

_DSIR_B = 4096
_DSIR_ALPHA = 0.5
_DSIR_K = 100
_DSIR_SEED = "dsir-v1"
_DSIR_SALT = "dsir-b"
_DSIR_SPAN = float(1 << 60)


@query(
    "q81_dsir_sample",
    oracle=f"""
    WITH docs AS (
      SELECT doc_id, lang,
             list_transform(
               list_filter(regexp_split_to_array(trim(text), '\\s+'), t -> t <> ''),
               t -> lower(t)
             ) AS toks
      FROM documents
    ),
    ng AS (
      SELECT doc_id, lang,
             list_concat(
               toks,
               list_transform(range(1, len(toks)), i -> toks[i] || ' ' || toks[i + 1])
             ) AS ngrams
      FROM docs
    ),
    bk AS (
      SELECT doc_id, lang,
             ('0x' || substring(md5('{_DSIR_SALT}' || u.ngram), 1, 15))::BIGINT % {_DSIR_B} AS bucket
      FROM ng, unnest(ngrams) AS u(ngram)
    ),
    tc AS (SELECT bucket, count(*) AS c_t FROM bk WHERE lang = 'en' GROUP BY 1),
    rc AS (SELECT bucket, count(*) AS c_r FROM bk GROUP BY 1),
    tt AS (SELECT sum(c_t) AS t FROM tc),
    rt AS (SELECT sum(c_r) AS t FROM rc),
    ratio AS (
      SELECT rc.bucket,
             ln((coalesce(tc.c_t, 0) + {_DSIR_ALPHA}) / (tt.t + {_DSIR_ALPHA * _DSIR_B}))
             - ln((rc.c_r + {_DSIR_ALPHA}) / (rt.t + {_DSIR_ALPHA * _DSIR_B})) AS lr
      FROM rc LEFT JOIN tc USING (bucket), tt, rt
    ),
    w AS (
      SELECT d.doc_id,
             coalesce(round(s.w, 6), 0.0) AS dsir_weight
      FROM (SELECT doc_id FROM documents) d
      LEFT JOIN (
        SELECT bk.doc_id, sum(ratio.lr) AS w
        FROM bk JOIN ratio USING (bucket) GROUP BY 1
      ) s USING (doc_id)
    ),
    keyed AS (
      SELECT doc_id, dsir_weight,
             round(
               dsir_weight - ln(-ln(least(
                 (('0x' || substring(md5('{_DSIR_SEED}' || doc_id::VARCHAR), 1, 15))::BIGINT + 0.5)
                 / {_DSIR_SPAN!r},
                 1 - power(2.0, -53)
               ))), 6
             ) AS gumbel_key
      FROM w
    )
    SELECT doc_id, dsir_weight, gumbel_key
    FROM keyed
    ORDER BY gumbel_key DESC, doc_id
    LIMIT {_DSIR_K}
    """,
)
def q81_dsir_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from terrorblade_spark.operators.dsir import dsir_sample

    d = load_table(spark, sf_dir, "documents")
    raw = d.select("doc_id", "text")
    target = d.where(F.col("lang") == "en").select("doc_id", "text")
    return dsir_sample(
        raw,
        target,
        k=_DSIR_K,
        n_buckets=_DSIR_B,
        alpha=_DSIR_ALPHA,
        seed=_DSIR_SEED,
        salt=_DSIR_SALT,
    )


# --- q85: temperature-flattened language mix (full value oracle) ------------
# The multilingual balancing recipe on real uneven strata (the fixture
# langs run 64..218 docs at sf0.01): documents split per lang become
# the source list, q_i ∝ n_i^alpha with alpha=0.3 flattens toward the
# small languages, and each source keeps a seeded-uniform Bernoulli
# draw below its fraction. Portability: fractions are rounded to 6 dp
# on BOTH engines (round_fracs — pow/sum last-ulp differences die
# there), draws are the shared md5 hash64 / 2^60. The per-lang source
# index is alphabetical rank, mirrored by row_number OVER (ORDER BY
# lang) in the oracle.

_Q85_TOTAL = 300
_Q85_ALPHA = 0.3
_Q85_SEED = "q85mix"


@query(
    "q85_temperature_mix",
    oracle=f"""
    WITH langs AS (
      SELECT lang, count(*) AS n,
             CAST(row_number() OVER (ORDER BY lang) - 1 AS INTEGER) AS src
      FROM documents GROUP BY lang
    ),
    w AS (SELECT lang, n, src, power(n::DOUBLE, {_Q85_ALPHA}) AS wgt FROM langs),
    f AS (
      SELECT lang, src,
             round(least(1.0, {_Q85_TOTAL}.0 * wgt / (SELECT sum(wgt) FROM w) / n), 6) AS frac
      FROM w
    )
    SELECT d.doc_id, d.lang, f.src AS mix_source
    FROM documents d JOIN f ON d.lang = f.lang
    WHERE ('0x' || substring(md5('{_Q85_SEED}/src' || f.src::VARCHAR || '/' || d.doc_id::VARCHAR), 1, 15))::BIGINT
            / 1152921504606846976.0 < f.frac
    ORDER BY d.doc_id
    """,
)
def q85_temperature_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    from terrorblade_spark.operators.sampling import temperature_mix_by

    d = load_table(spark, sf_dir, "documents").select("doc_id", "lang")
    # single-DataFrame form: source indices and keep fractions derive
    # inside the plan — building this query runs NO driver job (the
    # list form needed a distinct().collect() to enumerate languages)
    mixed = temperature_mix_by(
        d,
        "lang",
        "doc_id",
        total_rows=_Q85_TOTAL,
        alpha=_Q85_ALPHA,
        seed=_Q85_SEED,
        round_fracs=6,
    )
    return mixed.select("doc_id", "lang", "mix_source").orderBy("doc_id")


# --- q86: token-budget sequence packing (full value oracle) -----------------
# pack_sequences' greedy next-fit is per-shard SEQUENTIAL state — the
# exact reason the engine runs it as a sharded applyInPandas, not a
# window — so the oracle walks the same hash-ordered chains with a
# recursive CTE (depth = max docs per shard), the q79 pointer-chain
# pattern. Everything is integer (n_chars as the token count) and
# md5-hash ordered: no float portability risk anywhere.

_Q86_BUDGET = 2000
_Q86_SHARDS = 8
_Q86_SEED = "q86"


@query(
    "q86_packed_sequences",
    oracle=f"""
    WITH RECURSIVE hashed AS (
      SELECT doc_id, n_chars,
             ('0x' || substring(md5('{_Q86_SEED}' || doc_id::VARCHAR), 1, 15))::BIGINT AS h
      FROM documents
    ),
    ordered AS (
      SELECT doc_id, least(n_chars, {_Q86_BUDGET})::BIGINT AS t,
             (h % {_Q86_SHARDS})::INT AS shard, h,
             row_number() OVER (PARTITION BY h % {_Q86_SHARDS} ORDER BY h, doc_id) AS rn
      FROM hashed
    ),
    packed(shard, rn, doc_id, t, bin, acc) AS (
      SELECT shard, rn, doc_id, t, 0::BIGINT, t FROM ordered WHERE rn = 1
      UNION ALL
      SELECT o.shard, o.rn, o.doc_id, o.t,
             CASE WHEN p.acc + o.t > {_Q86_BUDGET} AND p.acc > 0
                  THEN p.bin + 1 ELSE p.bin END,
             CASE WHEN p.acc + o.t > {_Q86_BUDGET} AND p.acc > 0
                  THEN o.t ELSE p.acc + o.t END
      FROM ordered o JOIN packed p ON o.shard = p.shard AND o.rn = p.rn + 1
    )
    SELECT doc_id, shard, bin, t AS bin_tokens
    FROM packed ORDER BY doc_id
    """,
)
def q86_packed_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    from terrorblade_spark.operators.packing import pack_sequences

    d = load_table(spark, sf_dir, "documents").select("doc_id", "n_chars")
    packed = pack_sequences(
        d, "doc_id", "n_chars", budget=_Q86_BUDGET,
        num_shards=_Q86_SHARDS, seed=_Q86_SEED,
    )
    return packed.select("doc_id", "shard", "bin", "bin_tokens").orderBy("doc_id")


# --- q92: contrastive negative sampling (full value oracle) ------------------
# negative_samples' whole shape mirrored: the seeded-hash candidate
# pool (threshold = pool_size / corpus-count, one double division both
# engines compute identically), self + positive exclusion, and the
# per-(anchor, candidate) md5 ranking with neg_id tiebreak. Positives
# here are (anchor, anchor+1) so the exclusion path is exercised.

_Q92_POOL = 64
_Q92_K = 5
_Q92_SEED = "q92"
_Q92_U = "('0x' || substring(md5({expr}), 1, 15))::BIGINT"


@query(
    "q92_negative_samples",
    oracle=f"""
    WITH n AS (SELECT count(*)::DOUBLE AS c FROM documents),
    pool AS (
      SELECT doc_id AS neg_id FROM documents, n
      WHERE {_Q92_U.format(expr=f"'{_Q92_SEED}/pool' || doc_id::VARCHAR")}
              / 1152921504606846976.0
            < least(1.0, {_Q92_POOL}.0 / greatest(c, 1.0))
    ),
    anchors AS (SELECT doc_id AS anchor_id FROM documents WHERE doc_id < 10),
    cand AS (
      SELECT a.anchor_id, p.neg_id FROM anchors a, pool p
      WHERE a.anchor_id != p.neg_id AND p.neg_id != a.anchor_id + 1
    ),
    ranked AS (
      SELECT anchor_id, neg_id,
             CAST(row_number() OVER (
               PARTITION BY anchor_id
               ORDER BY {_Q92_U.format(expr=f"'{_Q92_SEED}' || anchor_id::VARCHAR || '|' || neg_id::VARCHAR")},
                        neg_id
             ) AS INT) AS neg_rank
      FROM cand
    )
    SELECT anchor_id, neg_id, neg_rank FROM ranked
    WHERE neg_rank <= {_Q92_K}
    ORDER BY anchor_id, neg_rank
    """,
)
def q92_negative_samples(spark: SparkSession, sf_dir: str) -> DataFrame:
    from terrorblade_spark.operators.sampling import negative_samples

    d = load_table(spark, sf_dir, "documents").select("doc_id")
    anchors = d.where(F.col("doc_id") < 10).select(F.col("doc_id").alias("anchor_id"))
    positives = anchors.select(
        "anchor_id", (F.col("anchor_id") + 1).alias("doc_id")
    )
    out = negative_samples(
        d, anchors, positives=positives, k=_Q92_K, pool_size=_Q92_POOL, seed=_Q92_SEED
    )
    return out.select("anchor_id", "neg_id", "neg_rank").orderBy("anchor_id", "neg_rank")


# --- q94: materialized packed training sequences (full value oracle) ---------
# materialize_packed on top of q86's assignments: one row per
# (shard, bin) with the member texts joined in the packer's hash
# order (ids compared AS STRINGS — the operator's struct sort key),
# token totals, and the member-id list. The oracle re-walks q86's
# recursive next-fit and does the ordered concat with
# string_agg(... ORDER BY h, doc_id::VARCHAR).


@query(
    "q94_materialized_packs",
    oracle=f"""
    WITH RECURSIVE hashed AS (
      SELECT doc_id, n_chars, text,
             ('0x' || substring(md5('{_Q86_SEED}' || doc_id::VARCHAR), 1, 15))::BIGINT AS h
      FROM documents
    ),
    ordered AS (
      SELECT doc_id, text, least(n_chars, {_Q86_BUDGET})::BIGINT AS t,
             (h % {_Q86_SHARDS})::INT AS shard, h,
             row_number() OVER (PARTITION BY h % {_Q86_SHARDS} ORDER BY h, doc_id) AS rn
      FROM hashed
    ),
    packed(shard, rn, doc_id, t, bin, acc) AS (
      SELECT shard, rn, doc_id, t, 0::BIGINT, t FROM ordered WHERE rn = 1
      UNION ALL
      SELECT o.shard, o.rn, o.doc_id, o.t,
             CASE WHEN p.acc + o.t > {_Q86_BUDGET} AND p.acc > 0
                  THEN p.bin + 1 ELSE p.bin END,
             CASE WHEN p.acc + o.t > {_Q86_BUDGET} AND p.acc > 0
                  THEN o.t ELSE p.acc + o.t END
      FROM ordered o JOIN packed p ON o.shard = p.shard AND o.rn = p.rn + 1
    )
    SELECT p.shard, p.bin,
           count(*) AS n_docs,
           sum(p.t)::BIGINT AS n_tokens,
           string_agg(p.doc_id::VARCHAR, ',' ORDER BY o.h, p.doc_id::VARCHAR) AS member_ids,
           string_agg(o.text, chr(10) || chr(10) ORDER BY o.h, p.doc_id::VARCHAR) AS text
    FROM packed p JOIN ordered o ON p.shard = o.shard AND p.doc_id = o.doc_id
    GROUP BY p.shard, p.bin
    ORDER BY p.shard, p.bin
    """,
)
def q94_materialized_packs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from terrorblade_spark.functions.exprs import csv_join
    from terrorblade_spark.operators.packing import materialize_packed, pack_sequences

    d = load_table(spark, sf_dir, "documents").select("doc_id", "n_chars", "text")
    packed = pack_sequences(
        d, "doc_id", "n_chars", budget=_Q86_BUDGET,
        num_shards=_Q86_SHARDS, seed=_Q86_SEED,
    )
    out = materialize_packed(packed, "doc_id", "text", seed=_Q86_SEED)
    return out.select(
        "shard", "bin", "n_docs", "n_tokens",
        csv_join("member_ids").alias("member_ids"), "text",
    ).orderBy("shard", "bin")


# --- q95: corpus boilerplate-line removal (full value oracle) ----------------
# remove_boilerplate_lines end to end: every doc gets a synthetic
# footer line injected between two copies of its text (the fixture
# docs are single-line), so the footer's line-df is 100% of the corpus
# (>> the 0.5% cap) while each doc's own content line stays under it.
# The oracle mirrors the whole plan — positioned line split, md5 line
# hash, distinct-doc df vs the greatest(2, 0.005*n) cap, and the
# ordered NULL-skipping reassembly. All integer/string algebra.

_Q95_FOOTER = "SUBSCRIBE TO OUR NEWSLETTER"


@query(
    "q95_boilerplate_removal",
    oracle=f"""
    WITH d2 AS (
      SELECT doc_id, text || chr(10) || '{_Q95_FOOTER}' || chr(10) || text AS text
      FROM documents
    ),
    cap AS (
      SELECT greatest(2.0, count(*)::DOUBLE * 0.005) AS v FROM d2
    ),
    ex AS (
      SELECT doc_id, g.i - 1 AS pos, parts[g.i] AS line,
             length(trim(parts[g.i])) = 0 AS blank,
             ('0x' || substring(md5(trim(parts[g.i])), 1, 15))::BIGINT AS lh
      FROM (SELECT doc_id, string_split(text, chr(10)) AS parts FROM d2),
           unnest(generate_series(1, len(parts))) AS g(i)
    ),
    hot AS (
      SELECT lh FROM ex WHERE NOT blank
      GROUP BY lh HAVING count(DISTINCT doc_id)::DOUBLE > (SELECT v FROM cap)
    ),
    flagged AS (
      SELECT e.*, (h.lh IS NOT NULL AND NOT e.blank) AS drop
      FROM ex e LEFT JOIN hot h ON e.lh = h.lh
    )
    SELECT doc_id,
           string_agg(CASE WHEN NOT drop THEN line END, chr(10) ORDER BY pos) AS text,
           sum(drop::INT)::BIGINT AS n_removed_lines
    FROM flagged GROUP BY doc_id
    ORDER BY doc_id
    """,
)
def q95_boilerplate_removal(spark: SparkSession, sf_dir: str) -> DataFrame:
    from terrorblade_spark.operators.curation import remove_boilerplate_lines

    d = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        F.concat_ws(
            "\n", F.col("text"), F.lit(_Q95_FOOTER), F.col("text")
        ).alias("text"),
    )
    out = remove_boilerplate_lines(d, "doc_id", "text")
    return out.select("doc_id", "text", "n_removed_lines").orderBy("doc_id")


# --- q100: DPO preference-pair extraction (full value oracle) ----------------
# Prompt group = (user_id, event_type); candidates = that group's
# events scored by `value`, payload = props. chosen/rejected are the
# (score, id)-extremes — deterministic tie-break, margin-gated gap.
# Everything is passthrough doubles plus ONE subtraction (bit-portable
# IEEE on both engines); no float sums, no rounding needed.

_Q100_MARGIN = 0.5


@query(
    "q100_preference_pairs",
    oracle=f"""
    WITH c AS (
      SELECT user_id, event_type, event_id, value, props
      FROM events WHERE value IS NOT NULL
    ),
    ranked AS (
      SELECT *,
        row_number() OVER (PARTITION BY user_id, event_type
                           ORDER BY value DESC, event_id DESC) AS rb,
        row_number() OVER (PARTITION BY user_id, event_type
                           ORDER BY value ASC, event_id ASC) AS rw,
        count(*) OVER (PARTITION BY user_id, event_type) AS n
      FROM c
    )
    SELECT b.user_id, b.event_type, b.n AS n_candidates,
           b.event_id AS chosen_id, b.value AS chosen_score,
           b.props AS chosen_props,
           w.event_id AS rejected_id, w.value AS rejected_score,
           w.props AS rejected_props,
           b.value - w.value AS score_gap
    FROM (SELECT * FROM ranked WHERE rb = 1) b
    JOIN (SELECT * FROM ranked WHERE rw = 1) w
      ON b.user_id IS NOT DISTINCT FROM w.user_id
     AND b.event_type IS NOT DISTINCT FROM w.event_type
    WHERE b.n >= 2 AND b.value - w.value >= {_Q100_MARGIN}
    ORDER BY b.user_id, b.event_type
    """,
)
def q100_preference_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from terrorblade_spark.operators.sft import preference_pairs

    e = load_table(spark, sf_dir, "events")
    pairs = preference_pairs(
        e,
        group_cols=["user_id", "event_type"],
        score_col="value",
        id_col="event_id",
        payload_cols=["props"],
        margin=_Q100_MARGIN,
    )
    return pairs.orderBy("user_id", "event_type")


# --- q101: epoch-repetition balancing (full value oracle) --------------------
# Data-constrained upsampling: repeat each language's documents
# ceil(max_n / n) times (capped at 4 epochs) so en no longer drowns
# fr/de/es/zh. Pure integer arithmetic end to end — count, max, DIV,
# least, and a 1..n_epochs series — so the oracle is exact.


@query(
    "q101_epoch_balance",
    oracle="""
    WITH cnt AS (
      SELECT lang, count(*) AS __n FROM documents GROUP BY lang
    ),
    mx AS (SELECT max(__n) AS __m FROM cnt),
    plan AS (
      SELECT lang, least(4, (__m + __n - 1) // __n) AS n_epochs
      FROM cnt CROSS JOIN mx
    )
    SELECT d.doc_id, d.lang, p.n_epochs, t.epoch
    FROM documents d
    JOIN plan p USING (lang)
    JOIN (SELECT range AS epoch FROM range(1, 5)) t
      ON t.epoch <= p.n_epochs
    ORDER BY d.doc_id, t.epoch
    """,
)
def q101_epoch_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    from terrorblade_spark.operators.sampling import repeat_to_balance

    d = load_table(spark, sf_dir, "documents").select("doc_id", "lang")
    out = repeat_to_balance(d, "lang", max_epochs=4)
    return out.select("doc_id", "lang", "n_epochs", "epoch").orderBy(
        "doc_id", "epoch"
    )


# --- q102: curriculum ordering (full value oracle) ---------------------------
# Easy->hard difficulty buckets by exact rank arithmetic over the
# (n_chars, doc_id) total order — bucket = (rank * k) div N, no
# percentile estimation — plus a seeded-md5 intra-bucket shuffle. The
# distributed rank (range partition + k-row broadcast offsets) is
# boundary-independent, so it equals the oracle's single row_number.


@query(
    "q102_curriculum_order",
    oracle="""
    WITH r AS (
      SELECT doc_id, n_chars,
             row_number() OVER (ORDER BY n_chars, doc_id) - 1 AS gr,
             count(*) OVER () AS n
      FROM documents
    )
    SELECT doc_id, n_chars,
           (gr * 4) // n AS bucket,
           ('0x' || substring(md5('cur-v1/' || doc_id::VARCHAR), 1, 15))::BIGINT AS draw
    FROM r
    ORDER BY bucket, draw, doc_id
    """,
)
def q102_curriculum_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    from terrorblade_spark.operators.sampling import curriculum_order

    d = load_table(spark, sf_dir, "documents").select("doc_id", "n_chars")
    out = curriculum_order(d, "doc_id", "n_chars", n_buckets=4, seed="cur-v1")
    return out.select("doc_id", "n_chars", "bucket", "draw").orderBy(
        "bucket", "draw", "doc_id"
    )


# --- q103: corpus-wide keep-first line dedup (full value oracle) --------------
# dedup_lines end to end. The fixture docs are single-line, so the
# query synthesizes a 4-line doc: own text / a corpus-wide shared line
# / a blank / (even docs: a cohort line, odd docs: the own text
# AGAIN). Expected: the shared line survives only in the min doc_id,
# the cohort line only in the first even doc, each odd doc loses its
# within-doc repeat, and every blank survives. The oracle mirrors the
# semantics with a row_number-over-line-hash window (the Spark side
# uses the skew-safe min-struct aggregate — same keeper by
# construction: both are the (doc_id, pos) minimum).

_Q103_SHARED = "SHARED LINE ALPHA"
_Q103_COHORT = "EVEN COHORT LINE"


@query(
    "q103_line_dedup",
    oracle=f"""
    WITH d2 AS (
      SELECT doc_id,
             text || chr(10) || '{_Q103_SHARED}' || chr(10) || chr(10) ||
             CASE WHEN doc_id % 2 = 0 THEN '{_Q103_COHORT}' ELSE text END AS text
      FROM documents
    ),
    ex AS (
      SELECT doc_id, g.i - 1 AS pos, parts[g.i] AS line,
             length(trim(parts[g.i])) = 0 AS blank,
             ('0x' || substring(md5(trim(parts[g.i])), 1, 15))::BIGINT AS lh
      FROM (SELECT doc_id, string_split(text, chr(10)) AS parts FROM d2),
           unnest(generate_series(1, len(parts))) AS g(i)
    ),
    flagged AS (
      SELECT doc_id, pos, line,
             (NOT blank) AND
             row_number() OVER (PARTITION BY lh ORDER BY doc_id, pos) > 1 AS drop
      FROM ex
    )
    SELECT doc_id,
           string_agg(CASE WHEN NOT drop THEN line END, chr(10) ORDER BY pos) AS text,
           sum(drop::INT)::BIGINT AS n_removed_lines
    FROM flagged GROUP BY doc_id
    ORDER BY doc_id
    """,
)
def q103_line_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from terrorblade_spark.operators.curation import dedup_lines

    d = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        F.concat_ws(
            "\n",
            F.col("text"),
            F.lit(_Q103_SHARED),
            F.lit(""),
            F.when(F.col("doc_id") % 2 == 0, F.lit(_Q103_COHORT)).otherwise(
                F.col("text")
            ),
        ).alias("text"),
    )
    out = dedup_lines(d, "doc_id", "text")
    return out.select("doc_id", "text", "n_removed_lines").orderBy("doc_id")


# --- q111: corpus topic table (rows-only by declared design) ------------------
# LDA topic indices and term weights are inference-stochastic (seeded,
# but engine-specific — no DuckDB twin exists), so like q65's HLL
# estimates this registers WITHOUT an oracle: the driver checks rows
# (= n_topics, stable) + schema. Structural correctness is unit-tested
# in tests/test_topics.py (planted vocabularies separate; dominant
# topics cohere).

_Q111_TOPICS = 4


@query("q111_corpus_topics")
def q111_corpus_topics(spark: SparkSession, sf_dir: str) -> DataFrame:
    from terrorblade_spark.operators.topics import fit_topics, topic_terms

    d = load_table(spark, sf_dir, "documents").select("text")
    model = fit_topics(d, n_topics=_Q111_TOPICS, max_iter=15, min_df=2.0)
    return topic_terms(model, n_terms=6)


# --- q112: distributed ROC-AUC (full value oracle) -----------------------------
# binary_auc end-to-end: does document length predict English? (a real
# curation question — length-based quality gates are language-biased,
# and this measures exactly how much). Ranks are the id-tie-broken
# total order on both engines, so the Mann-Whitney statistic is
# bit-portable: rank sums are exact integers and the final expression
# is identical IEEE arithmetic on exact-int-valued doubles (the q100
# one-subtraction precedent).


@query(
    "q112_length_language_auc",
    oracle="""
    WITH scored AS (
      SELECT doc_id, (lang = 'en') AS y, n_chars::DOUBLE AS s
      FROM documents WHERE lang IS NOT NULL AND n_chars IS NOT NULL
    ),
    ranked AS (
      SELECT y, row_number() OVER (ORDER BY s, doc_id) AS r FROM scored
    )
    SELECT
      (sum(CASE WHEN y THEN r END)::DOUBLE
         - sum(y::INT)::DOUBLE * (sum(y::INT) + 1)::DOUBLE / 2.0)
      / (sum(y::INT)::DOUBLE * sum((NOT y)::INT)::DOUBLE) AS auc,
      sum(y::INT)::BIGINT AS n_pos,
      sum((NOT y)::INT)::BIGINT AS n_neg
    FROM ranked
    """,
)
def q112_length_language_auc(spark: SparkSession, sf_dir: str) -> DataFrame:
    from terrorblade_spark.operators.evalmetrics import binary_auc

    d = load_table(spark, sf_dir, "documents").select(
        "doc_id", (F.col("lang") == "en").alias("y"), F.col("n_chars").alias("s")
    )
    return binary_auc(d, "y", "s", "doc_id")


# --- q113: crawl-over-crawl dataset diff (full value oracle) -------------------
# dataset_diff between the fixture corpus and a synthesized "next
# crawl": every 10th doc dropped, every 7th doc's text rewritten, a
# new doc added per 13th id. The oracle mirrors the content-hash
# collapse (concat_ws with the 0x1f separator and 0x00 NULL sentinel,
# md5 hash64) and the full-outer status derivation — all-integer.


@query(
    "q113_corpus_diff",
    oracle=r"""
    WITH old AS (
      SELECT doc_id, text, lang FROM documents
    ),
    new AS (
      SELECT doc_id,
             CASE WHEN doc_id % 7 = 0 THEN text || ' [rev2]' ELSE text END AS text,
             lang
      FROM documents WHERE doc_id % 10 <> 0
      UNION ALL
      SELECT doc_id + 1000000, 'fresh page', 'en'
      FROM documents WHERE doc_id % 13 = 0
    ),
    ho AS (
      SELECT doc_id,
             ('0x' || substring(md5(
               coalesce(text, chr(0)) || chr(31) || coalesce(lang, chr(0))
             ), 1, 15))::BIGINT AS h
      FROM old
    ),
    hn AS (
      SELECT doc_id,
             ('0x' || substring(md5(
               coalesce(text, chr(0)) || chr(31) || coalesce(lang, chr(0))
             ), 1, 15))::BIGINT AS h
      FROM new
    )
    SELECT coalesce(ho.doc_id, hn.doc_id) AS doc_id,
           CASE WHEN ho.h IS NULL THEN 'added'
                WHEN hn.h IS NULL THEN 'removed'
                WHEN ho.h <> hn.h THEN 'changed'
                ELSE 'unchanged' END AS status
    FROM ho FULL OUTER JOIN hn ON ho.doc_id = hn.doc_id
    ORDER BY doc_id
    """,
)
def q113_corpus_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    from terrorblade_spark.operators.relational import dataset_diff

    old = load_table(spark, sf_dir, "documents").select("doc_id", "text", "lang")
    base = load_table(spark, sf_dir, "documents").select("doc_id", "text", "lang")
    new = base.where(F.col("doc_id") % 10 != 0).select(
        "doc_id",
        F.when(F.col("doc_id") % 7 == 0, F.concat(F.col("text"), F.lit(" [rev2]")))
        .otherwise(F.col("text"))
        .alias("text"),
        "lang",
    ).unionByName(
        base.where(F.col("doc_id") % 13 == 0).select(
            (F.col("doc_id") + 1_000_000).alias("doc_id"),
            F.lit("fresh page").alias("text"),
            F.lit("en").alias("lang"),
        )
    )
    out = dataset_diff(old, new, "doc_id", ["text", "lang"])
    return out.orderBy("doc_id")
