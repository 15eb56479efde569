"""Distributed retrieval-quality metrics (recall@k, MRR@k, NDCG@k).

The reference ships retrieval features (vector_store.py:224
similarity_search / :254 distance_search) but no way to MEASURE them; every index knob in this
repo (IVF nprobe, PQ shortlist, LSH planes, int8 quantization) trades
recall for cost, and tuning that trade on a corpus that doesn't fit
one machine needs the scoring itself to be a distributed join, not a
driver-side loop. The probes under tools/ compute recall with
collects; this operator is the engine-native form — and, being plain
relational algebra over two ranked relations, it carries a FULL DuckDB
value oracle (q84_quantization_recall) unlike the probes.

Semantics (binary relevance, the standard ANN-benchmark definitions —
e.g. the public ann-benchmarks suite):

- ``truth`` is the ideal ranking (exact top-k per query), ``results``
  the system under test; both are (query, item, rank) relations with
  1-based ranks. Rows ranked past k on either side are ignored.
- an item is RELEVANT for a query iff it appears in truth@k
- recall@k  = |results@k ∩ truth@k| / |truth@k|  (truth-capped, so a
  query with fewer than k true neighbors isn't penalized)
- MRR@k     = 1 / rank of the first relevant result (0 if none)
- NDCG@k    = Σ_hits 1/log2(1+rank) / Σ_{i=1..|truth@k|} 1/log2(1+i)

Queries come from ``truth`` (a query with no results row scores 0 on
every metric); result rows for unknown queries are ignored. Shape:
both inputs are ≤ k rows per query, so every join here is on
(query, item) over k-bounded relations — the metric computation is
strictly smaller than the searches that produced it. No UDFs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _dcg_term(rank_col: str):
    return F.lit(1.0) / F.log2(F.col(rank_col).cast("double") + F.lit(1.0))


def ranking_metrics(
    results: DataFrame,
    truth: DataFrame,
    k: int,
    query_col: str = "query_id",
    item_col: str = "neighbor_id",
    rank_col: str = "rank",
) -> DataFrame:
    """Per-query recall@k / MRR@k / NDCG@k of ``results`` against
    ``truth`` (see module doc for the exact definitions). Returns
    (query_col, n_truth, n_hits, recall_at_k, mrr_at_k, ndcg_at_k),
    one row per truth query."""
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    t_k = truth.where(F.col(rank_col) <= k).select(
        query_col, item_col, F.col(rank_col).alias("__t_rank")
    )
    r_k = results.where(F.col(rank_col) <= k).select(
        query_col, item_col, F.col(rank_col).alias("__r_rank")
    )
    per_truth = t_k.groupBy(query_col).agg(
        F.count(F.lit(1)).alias("n_truth"),
        F.sum(_dcg_term("__t_rank")).alias("__idcg"),
    )
    hits = r_k.join(t_k, on=[query_col, item_col])
    per_hits = hits.groupBy(query_col).agg(
        F.count(F.lit(1)).alias("n_hits"),
        F.min("__r_rank").alias("__first_hit"),
        F.sum(_dcg_term("__r_rank")).alias("__dcg"),
    )
    out = per_truth.join(per_hits, on=query_col, how="left")
    n_hits = F.coalesce(F.col("n_hits"), F.lit(0))
    return out.select(
        query_col,
        F.col("n_truth"),
        n_hits.alias("n_hits"),
        (n_hits.cast("double") / F.col("n_truth")).alias("recall_at_k"),
        F.coalesce(F.lit(1.0) / F.col("__first_hit"), F.lit(0.0)).alias("mrr_at_k"),
        (F.coalesce(F.col("__dcg"), F.lit(0.0)) / F.col("__idcg")).alias("ndcg_at_k"),
    )


def binary_auc(
    df: DataFrame,
    label_col: str,
    score_col: str,
    id_col: str,
) -> DataFrame:
    """ROC-AUC of ``score_col`` against boolean ``label_col`` as the
    Mann-Whitney rank statistic, computed distributed:
    ``AUC = (sum of positive 1-based ranks - P(P+1)/2) / (P * N)``.

    Ranks come from :func:`~terrorblade_spark.operators.windows.
    distributed_rank` over ``(score, id)`` — the range-partition +
    broadcast-offset shape, never a single-partition window over the
    corpus. The id tie-break makes the statistic DETERMINISTIC under
    tied scores (standard AUC mid-ranks ties; this ranks them in id
    order instead — identical when scores are distinct, documented and
    engine-portable when not, since the oracle applies the same total
    order). NULL labels/scores are excluded. Returns one row
    ``(auc, n_pos, n_neg)``; AUC is NULL for a single-class input.
    """
    from terrorblade_spark.operators.windows import distributed_rank

    scored = df.select(
        F.col(id_col).alias("__id"),
        F.col(label_col).cast("boolean").alias("__y"),
        F.col(score_col).cast("double").alias("__s"),
    ).where(F.col("__y").isNotNull() & F.col("__s").isNotNull())
    ranked = distributed_rank(scored, ["__s", "__id"], out_col="__r")
    agg = ranked.agg(
        F.sum(F.when(F.col("__y"), F.col("__r") + 1)).alias("__rsum"),
        F.count(F.when(F.col("__y"), F.lit(1))).alias("n_pos"),
        F.count(F.when(~F.col("__y"), F.lit(1))).alias("n_neg"),
    )
    return agg.select(
        F.when(
            (F.col("n_pos") > 0) & (F.col("n_neg") > 0),
            (
                F.col("__rsum").cast("double")
                - F.col("n_pos").cast("double") * (F.col("n_pos") + 1).cast("double") / 2.0
            )
            / (F.col("n_pos").cast("double") * F.col("n_neg").cast("double")),
        ).alias("auc"),
        "n_pos",
        "n_neg",
    )
