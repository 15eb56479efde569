"""Corpus n-gram language-model scoring: the perplexity-style quality
signal (CCNet/Gopher-era pipelines filter or bucket documents by LM
score; the reference has no analog — this is part of the engine's
beyond-reference curation surface).

A unigram-backoff bigram model fit on the corpus itself (or a held-out
reference corpus), applied as a per-document mean negative log
likelihood. Everything is counts + logs — deterministic, JVM-side,
reproducible in SQL.

Scale design:

- FIT is two map-side-combined groupBys over the exploded token
  stream (unigram counts, bigram counts), each capped to a top-V
  vocabulary — model size is V + V_bi rows of (ngram, logp),
  independent of corpus size.
- SCORE is explode -> equi-join against the model relation(s) ->
  per-doc aggregation. The model is ≤ a few hundred thousand rows, so
  AQE broadcasts it; the corpus side never shuffles more than
  (doc, token) pairs into the final per-doc groupBy.
- Out-of-vocabulary tokens get a fixed floor logp (standard smoothing
  shortcut) so scores stay finite and the join can stay inner+fill.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from terrorblade_spark.functions.exprs import tokens
from terrorblade_spark.tables import spread


@dataclass(frozen=True)
class NgramLM:
    unigrams: DataFrame  # (tok, logp) — logp = ln(count / total)
    bigrams: DataFrame  # (tok_a, tok_b, logp_cond) — ln(c(ab)/c(a))
    oov_logp: float

    def unpersist(self) -> None:
        self.unigrams.unpersist()
        self.bigrams.unpersist()


def _token_stream(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(doc, tok, prev_tok) rows — prev_tok null at position 0.

    The adjacency comes from zipping the token array with its own
    1-shifted slice BEFORE exploding (same pattern as
    ``textops.shingles``), so bigram context costs zero joins — the
    naive alternative (posexplode then self-join on (doc, pos+1))
    shuffles the whole token stream twice."""
    toks = F.transform(tokens(text_col), lambda t: F.lower(t))
    prevs = F.concat(
        F.array(F.lit(None).cast("string")),
        F.slice(toks, 1, F.greatest(F.size(toks) - 1, F.lit(0))),
    )
    # zip_with pads the shorter side with null: an EMPTY token array
    # against the [null] prev array would fabricate one (null, null)
    # row, so empty docs must map to an empty pair array explicitly
    pairs = F.when(
        F.size(toks) > 0,
        F.zip_with(
            toks, prevs, lambda cur, prev: F.struct(cur.alias("tok"), prev.alias("prev_tok"))
        ),
    ).otherwise(F.array().cast("array<struct<tok:string,prev_tok:string>>"))
    return spread(df.select(id_col, text_col)).select(
        F.col(id_col).alias("doc"), F.explode(pairs).alias("p")
    ).select("doc", F.col("p.tok").alias("tok"), F.col("p.prev_tok").alias("prev_tok"))


def fit_ngram_lm(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    vocab_size: int = 65_536,
    bigram_vocab: int = 262_144,
    oov_logp: float = -20.0,
) -> NgramLM:
    """Fit unigram + bigram maximum-likelihood tables, truncated to the
    top ``vocab_size`` / ``bigram_vocab`` most frequent entries (the
    long tail backs off to ``oov_logp``)."""
    toks = _token_stream(df, id_col, text_col).persist()
    uni = (
        toks.groupBy("tok")
        .agg(F.count(F.lit(1)).alias("c"))
        .orderBy(F.desc("c"), F.asc("tok"))
        .limit(vocab_size)
    ).persist()
    total = uni.agg(F.sum("c").alias("t"))
    unigrams = (
        uni.crossJoin(F.broadcast(total))
        .select("tok", F.log(F.col("c").cast("double") / F.col("t").cast("double")).alias("logp"))
        .persist()
    )
    # adjacency is already row-local (prev_tok from the array zip)
    pairs = toks.where(F.col("prev_tok").isNotNull()).select(
        F.col("prev_tok").alias("tok_a"), F.col("tok").alias("tok_b")
    )
    bi = (
        pairs.groupBy("tok_a", "tok_b")
        .agg(F.count(F.lit(1)).alias("c_ab"))
        .orderBy(F.desc("c_ab"), F.asc("tok_a"), F.asc("tok_b"))
        .limit(bigram_vocab)
    )
    bigrams = (
        bi.join(uni.select(F.col("tok").alias("tok_a"), F.col("c").alias("c_a")), "tok_a")
        .select(
            "tok_a",
            "tok_b",
            F.log(F.col("c_ab").cast("double") / F.col("c_a").cast("double")).alias("logp_cond"),
        )
        .persist()
    )
    # materialize BOTH persisted model tables before dropping their
    # parents: unpersisting toks/uni with unigrams still lazy would
    # make the first score/save re-run the whole corpus tokenization
    bigrams.count()
    unigrams.count()
    toks.unpersist()
    uni.unpersist()
    return NgramLM(unigrams=unigrams, bigrams=bigrams, oov_logp=oov_logp)


def score_documents(
    df: DataFrame,
    lm: NgramLM,
    id_col: str = "doc_id",
    text_col: str = "text",
    order: int = 2,
) -> DataFrame:
    """Per-document mean negative log likelihood (lower = more fluent
    under the corpus LM) as (id, n_scored_tokens, mean_nll).

    ``order=1`` scores unigrams only; ``order=2`` scores the first
    token by unigram and subsequent tokens by conditional bigram with
    unigram backoff for unseen pairs.

    Docs with no tokens score NULL mean_nll with n_scored_tokens = 0
    (nothing to judge — callers decide; forcing 0 would rank empty docs
    as maximally fluent). Every input id appears in the output — the
    aggregate is left-joined back to the id set, so inner-joining the
    scores does not silently drop token-less docs.
    """
    toks = _token_stream(df, id_col, text_col)
    # disambiguated model relations (the corpus side also has `tok`)
    uni = lm.unigrams.select(F.col("tok").alias("u_tok"), F.col("logp").alias("uni_logp"))
    if order == 1:
        scored = toks.join(uni, F.col("tok") == F.col("u_tok"), "left").select(
            "doc", F.coalesce(F.col("uni_logp"), F.lit(lm.oov_logp)).alias("lp")
        )
    elif order == 2:
        bi = lm.bigrams.select(
            F.col("tok_a").alias("b_tok_a"),
            F.col("tok_b").alias("b_tok_b"),
            "logp_cond",
        )
        scored = (
            toks.join(
                bi,
                (F.col("prev_tok") == F.col("b_tok_a")) & (F.col("tok") == F.col("b_tok_b")),
                "left",
            )
            .join(uni, F.col("tok") == F.col("u_tok"), "left")
            .select(
                "doc",
                F.coalesce(
                    F.col("logp_cond"),
                    F.col("uni_logp"),
                    F.lit(lm.oov_logp),
                ).alias("lp"),
            )
        )
    else:
        raise ValueError("order must be 1 or 2")
    agg = scored.groupBy("doc").agg(
        F.count(F.lit(1)).alias("n_scored_tokens"), F.avg(-F.col("lp")).alias("mean_nll")
    )
    # token-less docs emit no scored rows; the documented contract is a
    # NULL-scored row per input id, not a missing one
    return (
        df.select(F.col(id_col)).distinct()
        .join(agg, F.col(id_col) == F.col("doc"), "left")
        .select(
            id_col,
            F.coalesce("n_scored_tokens", F.lit(0)).alias("n_scored_tokens"),
            "mean_nll",
        )
    )


def perplexity_bucket(
    scores: DataFrame,
    nll_col: str = "mean_nll",
    n_buckets: int = 3,
    rel_err: float = 0.001,
) -> DataFrame:
    """CCNet-style head/middle/tail split by LM score: documents bucket
    by mean NLL into ``n_buckets`` ~equal-frequency buckets (bucket 0 =
    most fluent).

    Boundaries come from ``approxQuantile`` (driver-side metadata, one
    sketch pass) and the assignment is a row-local comparison — NEVER a
    global ntile window, whose single-partition sort would serialize
    billions of per-doc rows through one task at scale."""
    from terrorblade_spark.functions.exprs import boundary_bucket

    probs = [i / n_buckets for i in range(1, n_buckets)]
    bounds = scores.stat.approxQuantile(nll_col, probs, rel_err)
    # inclusive=False: a doc whose NLL equals a boundary stays in the
    # LOWER (more fluent) bucket — the original bucket semantics
    bucket = boundary_bucket(F.col(nll_col), bounds, inclusive=False)
    return scores.withColumn("ppl_bucket", bucket.cast("int"))


def compare_corpora(lm_a: NgramLM, lm_b: NgramLM, top_k: int = 20):
    """Distribution drift between two corpus snapshots via their fitted
    unigram tables: Jensen-Shannon divergence (symmetric, finite under
    disjoint support — the monitoring metric for "did this week's crawl
    shift?") plus the top divergent tokens by |p - q|.

    Cost is a full-outer join of two TOP-V tables (model-sized, not
    corpus-sized) and one aggregate; at 100 TB the corpora themselves
    are never touched — fit once per snapshot, compare tables forever.
    Probabilities are renormalized over each table's retained mass so
    the comparison is between the truncated distributions both models
    actually represent.

    Returns ``(summary, top_tokens)``: a 1-row DataFrame with
    ``js_divergence`` (nats) and overlap stats, and a ``top_k``-row
    DataFrame of the most-shifted tokens.
    """
    a = lm_a.unigrams.select("tok", F.exp("logp").alias("pa"))
    b = lm_b.unigrams.select("tok", F.exp("logp").alias("pb"))
    a_norm = a.crossJoin(F.broadcast(a.agg(F.sum("pa").alias("za"))))
    b_norm = b.crossJoin(F.broadcast(b.agg(F.sum("pb").alias("zb"))))
    joined = (
        a_norm.select("tok", (F.col("pa") / F.col("za")).alias("p"))
        .join(
            b_norm.select("tok", (F.col("pb") / F.col("zb")).alias("q")),
            "tok",
            "full_outer",
        )
        .na.fill(0.0, ["p", "q"])
    )
    m = (F.col("p") + F.col("q")) / 2
    term = F.when(F.col("p") > 0, F.col("p") * F.log(F.col("p") / m)).otherwise(0.0) / 2 + F.when(
        F.col("q") > 0, F.col("q") * F.log(F.col("q") / m)
    ).otherwise(0.0) / 2
    contrib = joined.select(
        "tok", "p", "q", term.alias("js_term"), F.abs(F.col("p") - F.col("q")).alias("shift")
    )
    summary = contrib.agg(
        F.sum("js_term").alias("js_divergence"),
        F.sum((F.col("p") > 0).cast("long")).alias("n_tokens_a"),
        F.sum((F.col("q") > 0).cast("long")).alias("n_tokens_b"),
        F.sum(((F.col("p") > 0) & (F.col("q") > 0)).cast("long")).alias("n_shared"),
    )
    top = contrib.orderBy(F.desc("shift"), F.asc("tok")).limit(top_k).select(
        "tok", "p", "q", "shift"
    )
    return summary, top
