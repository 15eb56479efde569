"""DSIR-style data selection: importance resampling on hashed n-gram
features (Xie et al. 2023, "Data Selection for Language Models via
Importance Resampling" — the public recipe behind targeting a raw web
corpus at a high-quality reference set). The reference repo has no
analog; this extends the engine's beyond-reference curation surface
alongside the n-gram LM (operators/lm.py) and the learned classifier
(operators/classifier.py).

The method: featurize every document as a bag of hashed uni+bi-grams
(B buckets), fit smoothed bucket distributions p_target and p_raw,
weight each raw document by its log importance ratio
``sum_ngrams log(p_target[bucket] / p_raw[bucket])``, then draw a
without-replacement sample of size k with probability proportional to
the importance weight via Gumbel top-k (key = weight + Gumbel noise).

Scale design — everything is counts, hashes, and one bounded model:

- Featurization is the array-zip bigram trick (zero joins, the
  lm.py/_token_stream pattern): tokens never self-join for adjacency.
- The fitted model is exactly B rows of (bucket, log_ratio) — corpus
  size independent, broadcast to the scoring join. The smoothing
  totals fold in as 1-row broadcast scalars (no driver-side count()).
- Scoring shuffles only (doc, bucket) pairs into one per-doc sum; the
  Gumbel draw is the engine-portable seeded-md5 uniform
  (operators/sampling.seeded_uniform), so retries/AQE cannot change
  the sample and DuckDB reproduces the selection (q81 oracle).
- Weights and ranking keys are rounded to 6 decimals on BOTH engines:
  a float sum's addition order differs between engines (and between
  partitionings), so the raw doubles are only ~1e-13 reproducible —
  rounding makes the selection itself deterministic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from terrorblade_spark.functions.exprs import hash64, tokens


def hashed_ngrams(text_col: str) -> F.Column:
    """Array of lowercased unigrams + space-joined bigrams for a text
    column — the DSIR feature set (hashing happens at bucket time)."""
    toks = F.transform(tokens(text_col), lambda t: F.lower(t))
    n = F.size(toks)
    bigrams = F.when(
        n >= 2,
        F.zip_with(
            F.slice(toks, 1, n - 1),
            F.slice(toks, 2, n - 1),
            lambda a, b: F.concat(a, F.lit(" "), b),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return F.concat(toks, bigrams)


def _bucketed(df: DataFrame, id_col: str, text_col: str, n_buckets: int, salt: str) -> DataFrame:
    """(doc, bucket) — one row per n-gram OCCURRENCE (not distinct):
    DSIR weights count every occurrence, like the LM likelihood."""
    return df.select(
        F.col(id_col).alias("doc"), F.explode(hashed_ngrams(text_col)).alias("ng")
    ).select("doc", F.pmod(hash64(F.col("ng"), salt=salt), F.lit(n_buckets)).alias("bucket"))


def _ratio_from_buckets(
    target_bk: DataFrame, raw_bk: DataFrame, n_buckets: int, alpha: float
) -> DataFrame:
    tc = target_bk.groupBy("bucket").agg(F.count(F.lit(1)).alias("c_t"))
    rc = raw_bk.groupBy("bucket").agg(F.count(F.lit(1)).alias("c_r"))
    t_tot = tc.agg(F.sum("c_t").alias("__tt"))
    r_tot = rc.agg(F.sum("c_r").alias("__tr"))
    ab = float(alpha) * n_buckets
    return (
        rc.join(tc, "bucket", "left")
        .crossJoin(F.broadcast(t_tot))
        .crossJoin(F.broadcast(r_tot))
        .select(
            "bucket",
            (
                F.log((F.coalesce("c_t", F.lit(0)) + F.lit(float(alpha))) / (F.col("__tt") + F.lit(ab)))
                - F.log((F.col("c_r") + F.lit(float(alpha))) / (F.col("__tr") + F.lit(ab)))
            ).alias("log_ratio"),
        )
    )


def dsir_logratio(
    target: DataFrame,
    raw: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 4096,
    alpha: float = 0.5,
    salt: str = "dsir-b",
) -> DataFrame:
    """Fit the (bucket, log_ratio) model: ``ln p_target[b] - ln p_raw[b]``
    with add-alpha smoothing over ``n_buckets`` hashed n-gram buckets.

    Only buckets present in ``raw`` are emitted (B rows max) — raw IS
    the corpus being scored, so every scoring join key is covered; a
    bucket absent from both corpora has ratio ln(T_r+aB)-ln(T_t+aB)
    which scoring never needs. Totals attach as 1-row broadcast
    scalars: building this plan triggers no Spark job.
    """
    return _ratio_from_buckets(
        _bucketed(target, id_col, text_col, n_buckets, salt),
        _bucketed(raw, id_col, text_col, n_buckets, salt),
        n_buckets,
        alpha,
    )


def _weights_from_bk(raw: DataFrame, bk: DataFrame, logratio: DataFrame, id_col: str) -> DataFrame:
    """(id, dsir_weight) from a precomputed (doc, bucket) relation —
    the single definition both the standalone scorer and the sampler
    share, so smoothing/rounding can never drift between them (and the
    q81 oracle)."""
    w = (
        bk.join(F.broadcast(logratio), "bucket")
        .groupBy("doc")
        .agg(F.round(F.sum("log_ratio"), 6).alias("dsir_weight"))
    )
    return (
        raw.select(F.col(id_col))
        .join(w, F.col(id_col) == F.col("doc"), "left")
        .select(id_col, F.coalesce("dsir_weight", F.lit(0.0)).alias("dsir_weight"))
    )


def dsir_weights(
    raw: DataFrame,
    logratio: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 4096,
    salt: str = "dsir-b",
) -> DataFrame:
    """Per-document importance weight: sum of ``log_ratio`` over the
    doc's n-gram occurrences, rounded to 6 decimals (see module doc).
    Docs with no tokens weight 0. Output: (id_col, dsir_weight)."""
    bk = _bucketed(raw, id_col, text_col, n_buckets, salt)
    return _weights_from_bk(raw, bk, logratio, id_col)


def dsir_sample(
    raw: DataFrame,
    target: DataFrame,
    k: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 4096,
    alpha: float = 0.5,
    seed: str = "dsir-v1",
    salt: str = "dsir-b",
) -> DataFrame:
    """Select ``k`` documents from ``raw`` with probability proportional
    to exp(importance weight), without replacement, deterministically:
    Gumbel top-k with the seeded-md5 uniform as the noise source.

    key = round(weight + (-ln(-ln u)), 6), with u the open-interval
    seeded uniform (sampling.seeded_uniform_open: +0.5 avoids 0, a
    clamp to 1-2^-53 avoids the ~128 top hash values that round to
    exactly 1.0 — ln(1)=0 would make the outer log blow up, and the
    two engines disagree on it: Spark returns NULL, DuckDB errors).
    Every piece (md5, one division, two logs, one add, round) is
    engine-portable, so the selection itself carries a full DuckDB
    oracle (q81). Ties on the rounded key break by id.

    Output: (id_col, dsir_weight, gumbel_key), the selected k rows.
    One corpus-wide top-k (TakeOrderedAndProject) — no global sort.

    The raw corpus's (doc, bucket) relation feeds BOTH the model fit
    and the weight scoring, so it is computed once and persisted
    (narrow: two longs per n-gram occurrence; MEMORY_AND_DISK so a
    100 TB corpus spills instead of re-tokenizing + re-hashing — md5
    over every n-gram is the dominant cost, measured ~2x the rest of
    the pipeline at an 80k-doc probe). The k-row result materializes
    eagerly (localCheckpoint) so the cache can be released before
    returning instead of leaking for the session lifetime.
    """
    from pyspark import StorageLevel

    bk = _bucketed(raw, id_col, text_col, n_buckets, salt).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    lr = _ratio_from_buckets(
        _bucketed(target, id_col, text_col, n_buckets, salt), bk, n_buckets, alpha
    )
    w = _weights_from_bk(raw, bk, lr, id_col)
    from terrorblade_spark.operators.sampling import seeded_uniform_open

    u = seeded_uniform_open(id_col, seed)
    keyed = w.select(
        id_col,
        "dsir_weight",
        F.round(F.col("dsir_weight") - F.log(-F.log(u)), 6).alias("gumbel_key"),
    )
    out = (
        keyed.orderBy(F.desc("gumbel_key"), F.col(id_col).asc())
        .limit(k)
        .localCheckpoint(eager=True)
    )
    bk.unpersist()
    return out
