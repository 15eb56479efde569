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
