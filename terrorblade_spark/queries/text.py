"""Text-analysis query surface over the documents table: token stats,
language-ID heuristic, quality scoring, fingerprinting (all pure
Catalyst expressions — see operators.textops).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from terrorblade_spark.operators.textops import (
    STOPWORDS,
    fingerprint,
    predict_language,
    quality_score,
)
from terrorblade_spark.registry import query
from terrorblade_spark.tables import load_table

_DUCK_TOKENS = "list_filter(regexp_split_to_array(trim(text), '\\s+'), t -> t <> '')"
_DUCK_LTOKENS = f"list_transform({_DUCK_TOKENS}, t -> lower(t))"


# --- q26: per-document text profile -----------------------------------------
# Token counting, the language-ID heuristic, and quality scoring are all
# narrow per-row expressions over the same scan, so they ship as one
# query: every column is computed in a single Project over the parquet
# read — no shuffle at all until the display sort.

def _duck_stop_ratio(lang: str) -> str:
    stop = ", ".join(f"'{s}'" for s in STOPWORDS[lang])
    return (
        f"(CASE WHEN len({_DUCK_LTOKENS}) > 0 THEN "
        f"len(list_filter({_DUCK_LTOKENS}, t -> list_contains([{stop}], t)))::DOUBLE"
        f" / len({_DUCK_LTOKENS})::DOUBLE ELSE 0.0 END)"
    )


def _duck_pred_lang() -> str:
    scores = ", ".join(
        f"{{'score': {_duck_stop_ratio(lang)}, 'lang': '{lang}'}}"
        for lang in sorted(STOPWORDS, reverse=True)
    )
    return (
        f"(SELECT CASE WHEN b.score > 0 THEN b.lang ELSE 'und' END "
        f"FROM (SELECT list_aggregate([{scores}], 'max') AS b) _pl)"
    )


# q30 (fingerprints) was merged into this query's `fingerprint` column
# to fit the harness's 50-slot gate budget; the operator keeps its own
# unit coverage in tests/test_exprs.py.
@query(
    "q26_text_profile",
    oracle=f"""
    SELECT doc_id, lang, source,
           CAST(len({_DUCK_TOKENS}) AS BIGINT) AS n_tokens,
           CAST(length(text) AS BIGINT) AS n_chars_q,
           {_duck_pred_lang()} AS pred_lang,
           (CASE WHEN length(text) > 0 THEN
             (length(text) - length(regexp_replace(text, '[\\.,;:!\\?]', '', 'g')))::DOUBLE / length(text)::DOUBLE
            ELSE 0.0 END) AS punct_ratio,
           (CASE WHEN length(text) > 0 THEN
             (length(text) - length(regexp_replace(text, '[0-9]', '', 'g')))::DOUBLE / length(text)::DOUBLE
            ELSE 0.0 END) AS digit_ratio,
           (CASE WHEN length(text) > 0 THEN
             (length(text) - length(regexp_replace(text, '[A-Z]', '', 'g')))::DOUBLE / length(text)::DOUBLE
            ELSE 0.0 END) AS upper_ratio,
           (CASE WHEN len({_DUCK_TOKENS}) > 0 THEN
             list_sum(list_transform({_DUCK_TOKENS}, t -> length(t)))::DOUBLE / len({_DUCK_TOKENS})::DOUBLE
            ELSE 0.0 END) AS mean_token_len,
           ('0x' || substring(md5(array_to_string({_DUCK_LTOKENS}, ' ')), 1, 15))::BIGINT
             AS fingerprint
    FROM documents
    ORDER BY doc_id
    """,
)
def q26_text_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return (
        fingerprint(predict_language(quality_score(d, "text"), "text"), "text")
        .select(
            "doc_id", "lang", "source", "n_tokens", "n_chars_q", "pred_lang",
            "punct_ratio", "digit_ratio", "upper_ratio", "mean_token_len",
            "fingerprint",
        )
        .orderBy("doc_id")
    )


# --- q27: token-length distribution per source (corpus profiling) -----------

@query(
    "q27_corpus_profile",
    oracle=f"""
    SELECT lang, source,
           count(*) AS n_docs,
           CAST(sum(CAST(len({_DUCK_TOKENS}) AS BIGINT)) AS BIGINT) AS total_tokens,
           min(n_chars) AS min_chars,
           max(n_chars) AS max_chars,
           sum(CAST(n_chars AS DECIMAL(18,2)))::DOUBLE / count(*) AS avg_chars
    FROM documents
    GROUP BY lang, source
    ORDER BY lang, source
    """,
)
def q27_corpus_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    from terrorblade_spark.functions.exprs import dec_sum
    from terrorblade_spark.operators.textops import word_count_expr

    d = load_table(spark, sf_dir, "documents")
    return (
        d.groupBy("lang", "source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(word_count_expr("text")).alias("total_tokens"),
            F.min("n_chars").alias("min_chars"),
            F.max("n_chars").alias("max_chars"),
            (dec_sum("n_chars") / F.count(F.lit(1))).alias("avg_chars"),
        )
        .orderBy("lang", "source")
    )


def _duck_bpe() -> str:
    from terrorblade_spark.operators.textops import duck_bpe_ish

    return duck_bpe_ish("text")


# --- q59: BPE-ish subword token budgeting ------------------------------------
# LLM-corpus budgeting needs token counts closer to a BPE vocabulary
# than whitespace words. Both engines run the identical regex, so the
# per-doc counts and the corpus rollup are hash-checked.

@query(
    "q59_subword_token_budget",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, source,
             CAST(len({_duck_bpe()}) AS BIGINT) AS n_subword,
             CAST(len({_DUCK_TOKENS}) AS BIGINT) AS n_whitespace
      FROM documents
    )
    SELECT source,
           count(*) AS n_docs,
           CAST(sum(n_subword) AS BIGINT) AS total_subword_tokens,
           CAST(sum(n_whitespace) AS BIGINT) AS total_whitespace_tokens,
           sum(CAST(n_subword AS DECIMAL(18,2)))::DOUBLE
             / sum(CAST(n_whitespace AS DECIMAL(18,2)))::DOUBLE AS bpe_inflation
    FROM t
    GROUP BY source
    ORDER BY source
    """,
)
def q59_subword_token_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    from terrorblade_spark.functions.exprs import dec_sum, tokens
    from terrorblade_spark.operators.textops import bpe_ish_tokens

    d = load_table(spark, sf_dir, "documents")
    t = d.select(
        "source",
        F.size(bpe_ish_tokens("text")).cast("long").alias("n_subword"),
        F.size(tokens("text")).cast("long").alias("n_whitespace"),
    )
    return (
        t.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_subword").alias("total_subword_tokens"),
            F.sum("n_whitespace").alias("total_whitespace_tokens"),
            (
                F.sum(F.col("n_subword").cast("decimal(18,2)")).cast("double")
                / F.sum(F.col("n_whitespace").cast("decimal(18,2)")).cast("double")
            ).alias("bpe_inflation"),
        )
        .orderBy("source")
    )


# --- q71: persisted-index BM25 serving ---------------------------------------
# The production serving shape: the inverted index is LOADED from its
# persisted term-bucketed form (operators.models.save_bm25), not
# rebuilt — per-query cost is term-pruned file reads + a
# TakeOrderedAndProject, independent of corpus re-tokenization. The
# index is built (once) on first call per fixture dir and reused.

_Q71_QUERY = "data model spark"
_Q71_K = 15
_Q71_K1, _Q71_B = 1.2, 0.75


def _q71_index_path(sf_dir: str) -> str:
    """Cache key = fixture dir + a FINGERPRINT of documents.parquet
    (relative path, size, mtime of every file): a regenerated fixture
    at the same path gets a fresh key instead of silently serving the
    stale index (the same drift class load_table's schema guard
    catches on the read side)."""
    import hashlib
    import os

    h = hashlib.md5(sf_dir.rstrip("/").encode())
    docs = os.path.join(sf_dir, "documents.parquet")
    paths = [docs]
    if os.path.isdir(docs):
        paths = [
            os.path.join(root, name)
            for root, _, names in os.walk(docs)
            for name in sorted(names)
        ]
    for p in sorted(paths):
        try:
            st = os.stat(p)
        except FileNotFoundError:
            continue
        h.update(f"{os.path.relpath(p, sf_dir)}:{st.st_size}:{st.st_mtime_ns}".encode())
    tag = h.hexdigest()[:16]
    return os.path.join(
        os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
        ".data", "index", f"bm25_{tag}",
    )


@query(
    "q71_bm25_persisted_topk",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id AS doc, lower(t) AS term
      FROM documents,
           unnest({_DUCK_TOKENS}) AS u(t)
    ),
    postings AS (
      SELECT term, doc, count(*) AS tf FROM tok GROUP BY 1, 2
    ),
    doclen AS (SELECT doc, sum(tf) AS dl FROM postings GROUP BY 1),
    stats AS (SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM doclen),
    q(term) AS (VALUES {", ".join(f"('{t}')" for t in sorted(set(_Q71_QUERY.split())))}),
    dfreq AS (
      SELECT p.term, count(*) AS df FROM postings p JOIN q USING (term) GROUP BY 1
    ),
    scored AS (
      SELECT p.doc AS doc_id,
             sum(ln(1 + (s.n_docs - f.df + 0.5) / (f.df + 0.5))
                 * p.tf * ({_Q71_K1} + 1)
                 / (p.tf + {_Q71_K1} * (1 - {_Q71_B} + {_Q71_B} * d.dl / s.avgdl))) AS score
      FROM postings p
      JOIN q USING (term)
      JOIN dfreq f USING (term)
      JOIN doclen d USING (doc)
      CROSS JOIN stats s
      GROUP BY 1
    )
    SELECT CAST(row_number() OVER (ORDER BY score DESC, doc_id ASC) AS INT) AS rank,
           doc_id
    FROM scored
    ORDER BY rank
    LIMIT {_Q71_K}
    """,
)
def q71_bm25_persisted_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Serve BM25 top-k from the PERSISTED index. Output is the ranked
    id list (rank, doc_id) — ranks are engine-comparable where raw
    ln()-based scores need not be bit-identical across engines."""
    import os

    from pyspark.sql import Window

    from terrorblade_spark.operators.models import load_bm25, save_bm25
    from terrorblade_spark.operators.search import bm25_index, bm25_topk

    path = _q71_index_path(sf_dir)
    from terrorblade_spark.operators.models import _META

    if not os.path.exists(os.path.join(path, _META)):
        docs = load_table(spark, sf_dir, "documents")
        idx = bm25_index(docs, "doc_id", persist=False)
        save_bm25(idx, path)
    idx = load_bm25(spark, path)
    top = bm25_topk(idx, _Q71_QUERY, k=_Q71_K, k1=_Q71_K1, b=_Q71_B)
    w = Window.orderBy(F.desc("score"), F.asc("doc"))
    # the window runs over k rows (post-limit), not the corpus
    return top.select(
        F.row_number().over(w).cast("int").alias("rank"),
        F.col("doc").alias("doc_id"),
    ).orderBy("rank")


# --- q89: hybrid retrieval (BM25 + cosine fused by RRF, full oracle) ---------
# The whole hybrid stack value-checked in one query: lexical Okapi
# top-fetch_k (q71's rank-portable formula), vector cosine top-fetch_k
# (q36's fold-identical scoring), reciprocal-rank fusion
# rrf(d) = sum_r 1/(c + rank_r(d)). Each doc receives at most one term
# per retriever, so the fused sum is <= 2 commutative-exact double
# adds — bit-identical across engines; the output is the fused rank
# list plus the 6-dp score.

_Q89_QUERY = "table hash merge"
_Q89_K = 10
_Q89_FETCH = 20
_Q89_C = 60


@query(
    "q89_hybrid_search",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id AS doc, lower(t) AS term
      FROM documents, unnest({_DUCK_TOKENS}) AS u(t)
    ),
    postings AS (SELECT term, doc, count(*) AS tf FROM tok GROUP BY 1, 2),
    doclen AS (SELECT doc, sum(tf) AS dl FROM postings GROUP BY 1),
    stats AS (SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM doclen),
    q(term) AS (VALUES {", ".join(f"('{t}')" for t in sorted(set(_Q89_QUERY.split())))}),
    dfreq AS (
      SELECT p.term, count(*) AS df FROM postings p JOIN q USING (term) GROUP BY 1
    ),
    lex_scored AS (
      SELECT p.doc AS doc_id,
             sum(ln(1 + (s.n_docs - f.df + 0.5) / (f.df + 0.5))
                 * p.tf * ({_Q71_K1} + 1)
                 / (p.tf + {_Q71_K1} * (1 - {_Q71_B} + {_Q71_B} * d.dl / s.avgdl))) AS score
      FROM postings p
      JOIN q USING (term) JOIN dfreq f USING (term) JOIN doclen d USING (doc)
      CROSS JOIN stats s GROUP BY 1
    ),
    lex AS (
      SELECT doc_id, CAST(row_number() OVER (ORDER BY score DESC, doc_id) AS INT) AS rank
      FROM lex_scored ORDER BY rank LIMIT {_Q89_FETCH}
    ),
    qv AS (SELECT embedding::DOUBLE[] AS qvec FROM embeddings WHERE vec_id = 0),
    sem_scored AS (
      SELECT e.vec_id AS doc_id,
             list_dot_product(e.embedding::DOUBLE[], qv.qvec)
               / (sqrt(list_dot_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[]))
                  * sqrt(list_dot_product(qv.qvec, qv.qvec))) AS score
      FROM embeddings e, qv
    ),
    sem AS (
      SELECT doc_id, CAST(row_number() OVER (ORDER BY score DESC, doc_id) AS INT) AS rank
      FROM sem_scored ORDER BY rank LIMIT {_Q89_FETCH}
    ),
    fused AS (
      SELECT doc_id, sum(1.0 / ({_Q89_C} + rank)) AS rrf
      FROM (SELECT * FROM lex UNION ALL SELECT * FROM sem) GROUP BY doc_id
    )
    SELECT CAST(row_number() OVER (ORDER BY rrf DESC, doc_id) AS INT) AS rank,
           doc_id, round(rrf, 6) AS rrf_r
    FROM fused ORDER BY rank LIMIT {_Q89_K}
    """,
)
def q89_hybrid_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    from terrorblade_spark.operators.search import hybrid_search

    docs = load_table(spark, sf_dir, "documents")
    emb = load_table(spark, sf_dir, "embeddings")
    qvec = emb.where(F.col("vec_id") == 0)
    fused = hybrid_search(
        docs, emb, _Q89_QUERY, qvec,
        k=_Q89_K, fetch_k=_Q89_FETCH, rrf_c=_Q89_C,
    )
    w = Window.orderBy(F.desc("rrf_score"), F.asc("doc"))
    return fused.select(
        F.row_number().over(w).cast("int").alias("rank"),
        F.col("doc").alias("doc_id"),
        F.round("rrf_score", 6).alias("rrf_r"),
    ).orderBy("rank")


# --- q90: corpus drift (Jensen-Shannon over fitted unigram tables) -----------
# compare_corpora's summary row, value-oracled: split the corpus into
# two snapshots (even/odd doc_id), fit the ML unigram tables, JS =
# sum over the union vocabulary of p*ln(p/m)/2 + q*ln(q/m)/2. The
# oracle mirrors the operator's exact arithmetic — exp(ln(c/t))
# renormalized over retained mass, then the JS fold — and the ln/exp
# last-ulp engine differences die in the 6-dp rounding (sums of ~30
# terms drift ~1e-15). Overlap counts are exact integers.


@query(
    "q90_corpus_drift",
    oracle=f"""
    WITH tokA AS (
      SELECT lower(t) AS tok FROM documents, unnest({_DUCK_TOKENS}) AS u(t)
      WHERE doc_id % 2 = 0
    ),
    tokB AS (
      SELECT lower(t) AS tok FROM documents, unnest({_DUCK_TOKENS}) AS u(t)
      WHERE doc_id % 2 = 1
    ),
    uniA AS (SELECT tok, count(*) AS c FROM tokA GROUP BY 1),
    uniB AS (SELECT tok, count(*) AS c FROM tokB GROUP BY 1),
    pa AS (
      SELECT tok, exp(ln(c::DOUBLE / (SELECT sum(c) FROM uniA))) AS praw FROM uniA
    ),
    pb AS (
      SELECT tok, exp(ln(c::DOUBLE / (SELECT sum(c) FROM uniB))) AS qraw FROM uniB
    ),
    j AS (
      SELECT coalesce(a.tok, b.tok) AS tok,
             coalesce(a.praw / (SELECT sum(praw) FROM pa), 0.0) AS p,
             coalesce(b.qraw / (SELECT sum(qraw) FROM pb), 0.0) AS q
      FROM pa a FULL OUTER JOIN pb b ON a.tok = b.tok
    )
    SELECT round(sum(CASE WHEN p > 0 THEN p * ln(p / ((p + q) / 2)) ELSE 0.0 END) / 2
               + sum(CASE WHEN q > 0 THEN q * ln(q / ((p + q) / 2)) ELSE 0.0 END) / 2, 6)
             AS js_r,
           sum(CASE WHEN p > 0 THEN 1 ELSE 0 END)::BIGINT AS n_tokens_a,
           sum(CASE WHEN q > 0 THEN 1 ELSE 0 END)::BIGINT AS n_tokens_b,
           sum(CASE WHEN p > 0 AND q > 0 THEN 1 ELSE 0 END)::BIGINT AS n_shared
    FROM j
    """,
)
def q90_corpus_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    from terrorblade_spark.operators.lm import compare_corpora, fit_ngram_lm

    d = load_table(spark, sf_dir, "documents")
    lm_a = fit_ngram_lm(d.where(F.col("doc_id") % 2 == 0))
    lm_b = fit_ngram_lm(d.where(F.col("doc_id") % 2 == 1))
    summary, _ = compare_corpora(lm_a, lm_b)
    return summary.select(
        F.round("js_divergence", 6).alias("js_r"),
        "n_tokens_a",
        "n_tokens_b",
        "n_shared",
    )


# --- q91: overlapping document chunking (full value oracle) ------------------
# chunk_documents' narrow row-to-rows plan mirrored in SQL: the token
# array sliced at stride (max_tokens - overlap), final chunk short,
# single-chunk floor for short docs. All integers and string joins —
# no float anywhere; the tokenizer is the q59-proven regex split.

_Q91_MAX = 32
_Q91_OVERLAP = 8


@query(
    "q91_document_chunks",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, {_DUCK_TOKENS} AS toks FROM documents
    ),
    sized AS (
      SELECT doc_id, toks, len(toks) AS n FROM t WHERE len(toks) > 0
    ),
    chunks AS (
      SELECT doc_id, i AS chunk_idx,
             array_to_string(
               list_slice(toks, i * {_Q91_MAX - _Q91_OVERLAP} + 1,
                          i * {_Q91_MAX - _Q91_OVERLAP} + {_Q91_MAX}), ' ') AS chunk_text,
             least(n - i * {_Q91_MAX - _Q91_OVERLAP}, {_Q91_MAX})::BIGINT AS chunk_tokens
      FROM sized,
           unnest(generate_series(
             0, greatest((n - {_Q91_OVERLAP} + {_Q91_MAX - _Q91_OVERLAP} - 1)
                           // {_Q91_MAX - _Q91_OVERLAP}, 1) - 1)) AS g(i)
    )
    SELECT doc_id, chunk_idx::BIGINT AS chunk_idx, chunk_tokens, chunk_text
    FROM chunks ORDER BY doc_id, chunk_idx
    """,
)
def q91_document_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    from terrorblade_spark.operators.packing import chunk_documents

    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    out = chunk_documents(d, "doc_id", "text", max_tokens=_Q91_MAX, overlap=_Q91_OVERLAP)
    return out.select("doc_id", "chunk_idx", "chunk_tokens", "chunk_text").orderBy(
        "doc_id", "chunk_idx"
    )


# --- q117: per-document TF-IDF keywords ---------------------------------------
# Top-3 terms per document by smoothed TF-IDF (tf * (ln((1+N)/(1+df))
# + 1), the sklearn smooth-idf form) over the q59-proven lowercased
# whitespace tokenization. The only float is ONE ln of a ratio of
# small-integer-valued doubles times an integer tf — identical libm
# inputs on both engines, and the 6-dp round absorbs any sub-ulp
# divergence (the q104 rule). Rank ties break by term ascending, so
# the row set is deterministic.

@query(
    "q117_tfidf_keywords",
    oracle=f"""
    WITH toks AS MATERIALIZED (
      SELECT doc_id AS doc, t.term
      FROM documents, unnest({_DUCK_LTOKENS}) AS t(term)
    ),
    p AS MATERIALIZED (
      SELECT doc, term, count(*)::BIGINT AS tf FROM toks GROUP BY doc, term
    ),
    dfreq AS (
      SELECT term, count(*)::DOUBLE AS df FROM p GROUP BY term
    ),
    n AS (
      SELECT count(DISTINCT doc)::DOUBLE AS nd FROM p
    )
    SELECT doc, rank, term, score FROM (
      SELECT p.doc, p.term,
             row_number() OVER (
               PARTITION BY p.doc
               ORDER BY p.tf * (ln((1.0 + n.nd) / (1.0 + d.df)) + 1.0) DESC,
                        p.term ASC
             ) AS rank,
             round(p.tf * (ln((1.0 + n.nd) / (1.0 + d.df)) + 1.0), 6) AS score
      FROM p JOIN dfreq d USING (term) CROSS JOIN n
    ) WHERE rank <= 3
    ORDER BY doc, rank
    """,
)
def q117_tfidf_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    from terrorblade_spark.operators.search import tfidf_keywords

    docs = load_table(spark, sf_dir, "documents")
    out = tfidf_keywords(docs, "doc_id", "text", k=3)
    return out.select(
        "doc", "rank", "term", F.round("score", 6).alias("score")
    ).orderBy("doc", "rank")


# --- q120/q121: lang x source categorical association -------------------------
# Contingency-table chi-square over document metadata — the
# distribution-level "did the mix shift" statistic next to the
# row-level dataset diff (q113) and JS drift (q90). Observed counts
# and margins are integers; expected/contrib are exact-integer
# products with one IEEE division each, 6-dp rounded; the q121 totals
# are decimal-exact sums of the rounded cells (order-free), with the
# zero-observed grid cells folded in analytically (their terms sum to
# N - sum(expected over observed cells)).

_Q120_CELLS_SQL = """
      SELECT lang AS row, source AS col, count(*)::BIGINT AS n
      FROM documents GROUP BY lang, source
"""


@query(
    "q120_lang_source_association",
    oracle=f"""
    WITH cells AS MATERIALIZED ({_Q120_CELLS_SQL}),
    r AS (SELECT row, sum(n)::BIGINT AS n_row FROM cells GROUP BY row),
    c AS (SELECT col, sum(n)::BIGINT AS n_col FROM cells GROUP BY col),
    t AS (SELECT sum(n)::DOUBLE AS nn FROM cells)
    SELECT cells.row AS lang, cells.col AS source, cells.n,
           r.n_row, c.n_col,
           round(r.n_row * c.n_col / t.nn, 6) AS expected,
           round(
             (cells.n - r.n_row * c.n_col / t.nn)
             * (cells.n - r.n_row * c.n_col / t.nn)
             / (r.n_row * c.n_col / t.nn),
             6
           ) AS contrib
    FROM cells
    JOIN r ON r.row = cells.row
    JOIN c ON c.col = cells.col
    CROSS JOIN t
    ORDER BY lang, source
    """,
)
def q120_lang_source_association(spark: SparkSession, sf_dir: str) -> DataFrame:
    from terrorblade_spark.operators.stats import crosstab_stats

    docs = load_table(spark, sf_dir, "documents")
    out = crosstab_stats(docs, "lang", "source")
    return out.select(
        F.col("row").alias("lang"),
        F.col("col").alias("source"),
        "n",
        "n_row",
        "n_col",
        F.round("expected", 6).alias("expected"),
        F.round("contrib", 6).alias("contrib"),
    ).orderBy("lang", "source")


@query(
    "q121_lang_source_chi2",
    oracle=f"""
    WITH cells AS MATERIALIZED ({_Q120_CELLS_SQL}),
    r AS (SELECT row, sum(n)::BIGINT AS n_row FROM cells GROUP BY row),
    c AS (SELECT col, sum(n)::BIGINT AS n_col FROM cells GROUP BY col),
    t AS (SELECT sum(n)::DOUBLE AS nn FROM cells),
    percell AS (
      SELECT cells.n,
             round(r.n_row * c.n_col / t.nn, 6) AS expected,
             round(
               (cells.n - r.n_row * c.n_col / t.nn)
               * (cells.n - r.n_row * c.n_col / t.nn)
               / (r.n_row * c.n_col / t.nn),
               6
             ) AS contrib,
             cells.row, cells.col
      FROM cells
      JOIN r ON r.row = cells.row
      JOIN c ON c.col = cells.col
      CROSS JOIN t
    ),
    agg AS (
      SELECT sum(CAST(contrib AS DECIMAL(18,6)))::DOUBLE AS chi_obs,
             sum(CAST(expected AS DECIMAL(18,6)))::DOUBLE AS exp_obs,
             sum(n)::BIGINT AS n,
             (count(DISTINCT row)
              + max(CASE WHEN row IS NULL THEN 1 ELSE 0 END))::BIGINT AS r,
             (count(DISTINCT col)
              + max(CASE WHEN col IS NULL THEN 1 ELSE 0 END))::BIGINT AS c
      FROM percell
    )
    SELECT round(chi_obs + (n - exp_obs), 6) AS chi2,
           (r - 1) * (c - 1) AS dof,
           n,
           round(sqrt((chi_obs + (n - exp_obs)) / (n * (least(r, c) - 1))), 6)
             AS cramers_v
    FROM agg
    """,
)
def q121_lang_source_chi2(spark: SparkSession, sf_dir: str) -> DataFrame:
    from terrorblade_spark.operators.stats import chi_square

    docs = load_table(spark, sf_dir, "documents")
    out = chi_square(docs, "lang", "source")
    return out.select(
        F.round("chi2", 6).alias("chi2"),
        "dof",
        "n",
        F.round("cramers_v", 6).alias("cramers_v"),
    )


# --- q124: OLAP rollup totals over corpus metadata ----------------------------
# GROUPING SETS surface: one pass produces per-(lang, source) stats,
# per-lang subtotals, and the grand total, disambiguated by the
# grouping-id bitmask (a NULL category level vs a subtotal row are
# different things; Spark's grouping_id() and DuckDB's
# GROUPING(lang, source) emit the same mask). All-integer aggregates.


@query(
    "q124_corpus_rollup",
    oracle="""
    SELECT lang, source,
           GROUPING(lang, source)::BIGINT AS gid,
           count(*)::BIGINT AS n_docs,
           sum(n_chars)::BIGINT AS total_chars,
           max(n_chars)::BIGINT AS max_chars
    FROM documents
    GROUP BY ROLLUP(lang, source)
    ORDER BY gid, lang, source
    """,
)
def q124_corpus_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.rollup("lang", "source")
        .agg(
            F.grouping_id().alias("gid"),
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
            F.max("n_chars").alias("max_chars"),
        )
        .select("lang", "source", "gid", "n_docs", "total_chars", "max_chars")
        .orderBy("gid", "lang", "source")
    )
