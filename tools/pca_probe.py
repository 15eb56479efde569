"""Scale probe for operators/pca.py: fit cost at 128k vectors and
what PCA dimension cuts cost retrieval, scored with the distributed
ranking_metrics operator (no driver-side recall loops).

Corpus A: 64 deterministically-jittered replicas of the sf0.1
embeddings (2000 x 64 -> 128k). Truth = full-dim Euclidean top-10
(== cosine order for unit vectors); results = Euclidean top-10 in the
PCA-k space. The fixture embeddings are near-ISOTROPIC (flat
spectrum) — PCA's worst case — so leg A measures that recall tracks
cumulative explained variance, not a headline recall number.

Corpus B: the same corpus projected onto its own top-16 components
and reconstructed (pca_reconstruct) — a decaying spectrum like real
sentence-embedding corpora. There PCA-16 must recover ~all of the
retrieval quality at 1/4 the dimensions. Results in COVERAGE.md.

Usage: python tools/pca_probe.py [sf_dir]
"""

from __future__ import annotations

import sys
import time

import numpy as np
import pandas as pd
from pyspark.sql import functions as F

sys.path.insert(0, ".")

from terrorblade_spark.operators.evalmetrics import ranking_metrics  # noqa: E402
from terrorblade_spark.operators.pca import pca_fit, pca_transform  # noqa: E402
from terrorblade_spark.session import get_spark  # noqa: E402
from terrorblade_spark.tables import load_table  # noqa: E402

COPIES = 64
JITTER = 0.05
K = 10
N_QUERIES = 20


def build_corpus(spark, sf_dir: str):
    base = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding").toPandas()
    x0 = np.stack(base["embedding"].to_numpy()).astype("float64")
    n0, d = x0.shape
    rng = np.random.default_rng(42)
    mats = []
    ids = []
    for rep in range(COPIES):
        x = x0 + rng.standard_normal((n0, d)) * JITTER
        x /= np.linalg.norm(x, axis=1, keepdims=True)
        mats.append(x)
        ids.append(base["vec_id"].to_numpy() + rep * 10_000_000)
    x_all = np.concatenate(mats)
    id_all = np.concatenate(ids)
    pdf = pd.DataFrame({"vec_id": id_all, "embedding": list(x_all)})
    return spark.createDataFrame(pdf).repartition(32, "vec_id").persist(), len(id_all), d


def l2_knn(queries, corpus, k, vec_col):
    """Euclidean k-NN join (HOF fold; smaller = nearer)."""
    q = F.broadcast(
        queries.select(F.col("vec_id").alias("query_id"), F.col(vec_col).alias("__q"))
    )
    d2 = F.aggregate(
        F.zip_with(vec_col, "__q", lambda a, b: (a - b) * (a - b)),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    from pyspark.sql import Window

    scored = (
        corpus.crossJoin(q)
        .where(F.col("vec_id") != F.col("query_id"))
        .select("query_id", F.col("vec_id").alias("neighbor_id"), d2.alias("d2"))
    )
    w = Window.partitionBy("query_id").orderBy("d2", "neighbor_id")
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank")
    )


def main(sf_dir: str) -> None:
    spark = get_spark("pca-probe")
    corpus, n, d = build_corpus(spark, sf_dir)
    print(f"corpus: {n} vectors, dim {d}")

    t0 = time.time()
    model = pca_fit(corpus, "embedding", k=d)
    fit_s = time.time() - t0
    ratios = model.explained_variance_ratio()
    print(
        f"pca_fit(k={d}): {fit_s:.1f}s; explained variance "
        f"top-8 {sum(ratios[:8]):.3f} top-16 {sum(ratios[:16]):.3f} "
        f"top-32 {sum(ratios[:32]):.3f}"
    )

    queries = corpus.where(F.col("vec_id") % 6101 == 0).limit(N_QUERIES).persist()
    nq = queries.count()
    t0 = time.time()
    truth = l2_knn(queries, corpus, K, "embedding").persist()
    truth.count()
    truth_s = time.time() - t0
    print(f"truth: full-dim top-{K} for {nq} queries in {truth_s:.1f}s")

    for kdim in (8, 16, 32):
        t0 = time.time()
        proj = pca_transform(corpus, model_k(model, kdim), "embedding", out_col="p").select(
            "vec_id", F.col("p").alias("embedding")
        ).persist()
        proj.count()
        qproj = proj.join(queries.select("vec_id"), "vec_id").persist()
        res = l2_knn(qproj, proj, K, "embedding")
        m = ranking_metrics(res, truth, K)
        row = m.agg(
            F.avg("recall_at_k").alias("r"), F.avg("ndcg_at_k").alias("n")
        ).collect()[0]
        wall = time.time() - t0
        print(
            f"PCA-{kdim}: recall@{K} {row.r:.3f} ndcg {row.n:.3f} "
            f"(transform+search {wall:.1f}s, dims {kdim}/{d})"
        )
        proj.unpersist()
        qproj.unpersist()

    # --- leg B: decaying-spectrum corpus (top-16 reconstruction) ---------
    from terrorblade_spark.operators.pca import pca_reconstruct

    y16 = pca_transform(corpus, model_k(model, 16), "embedding", out_col="p")
    lowrank = (
        pca_reconstruct(y16, model_k(model, 16), "p", "embedding2")
        .select("vec_id", F.col("embedding2").alias("embedding"))
        .persist()
    )
    lowrank.count()
    model_b = pca_fit(lowrank, "embedding", k=16)
    rb = model_b.explained_variance_ratio()
    q_b = lowrank.join(queries.select("vec_id"), "vec_id").persist()
    truth_b = l2_knn(q_b, lowrank, K, "embedding").persist()
    truth_b.count()
    t0 = time.time()
    proj_b = pca_transform(lowrank, model_b, "embedding", out_col="p").select(
        "vec_id", F.col("p").alias("embedding")
    ).persist()
    proj_b.count()
    res_b = l2_knn(proj_b.join(queries.select("vec_id"), "vec_id"), proj_b, K, "embedding")
    row = ranking_metrics(res_b, truth_b, K).agg(
        F.avg("recall_at_k").alias("r"), F.avg("ndcg_at_k").alias("n")
    ).collect()[0]
    print(
        f"leg B (decaying spectrum, top-16 var {sum(rb):.3f}): PCA-16 "
        f"recall@{K} {row.r:.3f} ndcg {row.n:.3f} ({time.time()-t0:.1f}s)"
    )


def model_k(model, k):
    from terrorblade_spark.operators.pca import PCAModel

    return PCAModel(
        mean=model.mean,
        components=model.components[:k],
        eigenvalues=model.eigenvalues[:k],
        n=model.n,
        total_variance=model.total_variance,
    )


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1")
