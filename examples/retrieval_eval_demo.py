"""Retrieval + evaluation tour: the round-5 serving/eval surface in
one runnable script over the driver testdata.

    python examples/retrieval_eval_demo.py [sf_dir]

Stages:
1. Hybrid search — BM25 + cosine fused by reciprocal-rank fusion
   (operators/search.hybrid_search, value-oracled as q89).
2. PCA the embedding table, report the spectrum, and measure what an
   int8-quantized store costs retrieval with ranking_metrics
   (operators/pca.py q83, operators/evalmetrics.py q84).
3. Leakage-safe train/eval split over the near-dup graph
   (operators/sampling.leakage_safe_split, q87) and SFT pair
   extraction from sessionized event streams (operators/sft.py, q88).
"""

from __future__ import annotations

import os
import sys

from pyspark.sql import functions as F

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from terrorblade_spark.operators.dedup import minhash_lsh_candidates  # noqa: E402
from terrorblade_spark.operators.evalmetrics import ranking_metrics  # noqa: E402
from terrorblade_spark.operators.pca import pca_fit  # noqa: E402
from terrorblade_spark.operators.sampling import leakage_safe_split  # noqa: E402
from terrorblade_spark.operators.search import hybrid_search  # noqa: E402
from terrorblade_spark.operators.sft import conversation_pairs  # noqa: E402
from terrorblade_spark.operators.vector import knn_join, quantize_int8  # noqa: E402
from terrorblade_spark.operators.windows import sessionize  # noqa: E402
from terrorblade_spark.session import get_spark  # noqa: E402
from terrorblade_spark.tables import load_table  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("retrieval-demo")
    docs = load_table(spark, sf_dir, "documents")
    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")

    # 1. hybrid retrieval
    qvec = emb.where(F.col("vec_id") == 0)
    fused = hybrid_search(docs, emb, "table hash merge", qvec, k=5, fetch_k=20)
    print("hybrid top-5 (BM25 + cosine, RRF):")
    for r in fused.collect():
        print(f"  doc {r.doc}  rrf={r.rrf_score:.4f}")

    # 2. spectrum + quantization cost
    model = pca_fit(emb, "embedding", k=16)
    ratios = model.explained_variance_ratio()
    print(f"PCA: top-16 components carry {sum(ratios):.3f} of variance "
          f"(n={model.n}, dim={model.dim})")
    queries = emb.where(F.col("vec_id") % 101 == 0)
    truth = knn_join(queries, emb, k=10)
    deq = quantize_int8(emb).select(
        "vec_id",
        F.transform("qvec", lambda x: x.cast("double") * F.col("scale")).alias("embedding"),
    )
    results = knn_join(queries, deq, k=10)
    m = ranking_metrics(results, truth, k=10).agg(
        F.avg("recall_at_k").alias("recall"), F.avg("ndcg_at_k").alias("ndcg")
    ).collect()[0]
    print(f"int8-stored corpus: recall@10={m.recall:.3f} ndcg@10={m.ndcg:.3f}")

    # 3. leakage-safe split + SFT pairs
    pairs = minhash_lsh_candidates(docs, "doc_id", "text", num_hashes=32, bands=8)
    split = leakage_safe_split(docs.select("doc_id"), "doc_id", pairs, 0.1)
    counts = {r.split: r.n for r in
              split.groupBy("split").agg(F.count("*").alias("n")).collect()}
    print(f"leakage-safe split: {counts}")

    events = load_table(spark, sf_dir, "events")
    s = sessionize(events, "ts", ["user_id"], "event_id", gap="1 hour")
    sft = conversation_pairs(
        s, ["user_id", "session_id"], ["ts", "event_id"],
        "event_type", "props", "event_id", context_size=3,
    )
    print(f"SFT pairs from sessionized streams: {sft.count()} examples")
    ex = sft.where(F.col("n_context") == 3).first()
    if ex is not None:
        print(f"  example context:\n    " + ex.context.replace("\n", "\n    "))
        print(f"  response: {ex.response}")

    # DPO preference pairs: per (user, event_type) prompt group, the
    # value-scored extremes become (chosen, rejected) — one aggregate,
    # no window (q100)
    from terrorblade_spark.operators.sft import preference_pairs

    dpo = preference_pairs(
        events, ["user_id", "event_type"], "value", "event_id",
        payload_cols=["props"], margin=0.5,
    )
    p = dpo.first()
    print(f"DPO preference pairs: {dpo.count()} "
          f"(e.g. chosen {p.chosen_score:.2f} vs rejected {p.rejected_score:.2f})")


if __name__ == "__main__":
    main()
