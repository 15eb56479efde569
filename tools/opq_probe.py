"""OPQ-lite probe: does a PCA rotation in front of product
quantization buy recall at the same code budget?

Classic PQ splits dimensions into m CONTIGUOUS subspaces; when
variance is spread unevenly (or correlated) across that arbitrary
split, some codebooks waste their codes. The public OPQ recipe (Ge et
al. 2013) learns a rotation that BALANCES variance across subspaces.
This probe measures the decomposition at the same (m, n_codes) code
budget on a decaying-spectrum corpus (top-16 reconstruction of the
jittered fixture — the leg-B corpus of tools/pca_probe.py):

1. raw PQ (contiguous split of the original dims);
2. PCA-sorted PQ — a deliberate NEGATIVE control: concentrating all
   variance into the first subspaces starves the rest, ADC distances
   collapse into ties, recall craters. "Just PCA first" is a real
   deployment mistake this measures;
3. PCA + round-robin eigenvalue allocation (component i -> subspace
   i mod m) — the cheap OPQ-lite that decorrelates AND balances.

Truth = exact Euclidean top-10 in the input space (rotation preserves
distances, so both variants share one truth set). Results recorded in
COVERAGE.md.

Usage: python tools/opq_probe.py [sf_dir]
"""

from __future__ import annotations

import sys
import time

from pyspark.sql import functions as F

sys.path.insert(0, ".")

from pca_probe import build_corpus, l2_knn, model_k  # noqa: E402

from terrorblade_spark.operators.evalmetrics import ranking_metrics  # noqa: E402
from terrorblade_spark.operators.pca import (  # noqa: E402
    pca_fit,
    pca_reconstruct,
    pca_transform,
)
from terrorblade_spark.operators.vector import (  # noqa: E402
    pq_adc_topk,
    pq_build,
    pq_encode,
)
from terrorblade_spark.session import get_spark  # noqa: E402

K = 10
M = 8
N_CODES = 16
N_QUERIES = 30


def pq_recall(corpus, queries, label):
    books = pq_build(corpus, m=M, n_codes=N_CODES, train_fraction=0.2).persist()
    books.count()
    t0 = time.time()
    encoded = pq_encode(corpus, books, m=M).persist()
    encoded.count()
    enc_s = time.time() - t0
    qrows = queries.collect()
    truth = l2_knn(queries, corpus, K, "embedding").persist()
    truth.count()
    rows = []
    t0 = time.time()
    for qr in qrows:
        top = pq_adc_topk(encoded, books, list(qr.embedding), K, m=M).collect()
        rows += [(qr.vec_id, r.vec_id, i + 1) for i, r in enumerate(top)]
    res = corpus.sparkSession.createDataFrame(
        rows, "query_id long, neighbor_id long, rank int"
    )
    m = ranking_metrics(res, truth, K).agg(
        F.avg("recall_at_k").alias("r")
    ).collect()[0]
    q_s = time.time() - t0
    print(f"{label}: recall@{K} {m.r:.3f} (encode {enc_s:.1f}s, {len(qrows)} queries in {q_s:.1f}s)")
    books.unpersist(); encoded.unpersist(); truth.unpersist()
    return m.r


def main(sf_dir: str) -> None:
    spark = get_spark("opq-probe")
    corpus0, n, d = build_corpus(spark, sf_dir)
    # decaying-spectrum corpus: top-16 reconstruction (pca_probe leg B)
    base_model = pca_fit(corpus0, "embedding", k=16)
    y16 = pca_transform(corpus0, base_model, "embedding", out_col="p")
    lowrank = (
        pca_reconstruct(y16, base_model, "p", "emb2")
        .select("vec_id", F.col("emb2").alias("embedding"))
        .persist()
    )
    lowrank.count()
    corpus0.unpersist()
    print(f"corpus: {n} vectors, dim {d} (decaying spectrum)")

    queries = lowrank.where(F.col("vec_id") % 4001 == 0).limit(N_QUERIES).persist()
    print(f"queries: {queries.count()}")

    r_raw = pq_recall(lowrank, queries, f"raw PQ (m={M}, {N_CODES} codes)")

    rot_model = pca_fit(lowrank, "embedding", k=d)
    rotated = pca_transform(lowrank, rot_model, "embedding", out_col="p").select(
        "vec_id", F.col("p").alias("embedding")
    ).persist()
    rotated.count()
    rqueries = rotated.join(queries.select("vec_id"), "vec_id").persist()
    r_sorted = pq_recall(
        rotated, rqueries, f"PCA-sorted PQ, negative control (m={M}, {N_CODES} codes)"
    )

    # round-robin eigenvalue allocation via the API the probe
    # motivated: every subspace sees a mix of high- and low-variance
    # directions (OPQ's balancing goal, without the learned rotation)
    from terrorblade_spark.operators.pca import balanced_components

    bal_model = balanced_components(rot_model, M)
    balanced = pca_transform(lowrank, bal_model, "embedding", out_col="p").select(
        "vec_id", F.col("p").alias("embedding")
    ).persist()
    balanced.count()
    bqueries = balanced.join(queries.select("vec_id"), "vec_id").persist()
    r_bal = pq_recall(
        balanced, bqueries, f"PCA + round-robin allocation (m={M}, {N_CODES} codes)"
    )
    print(
        f"vs raw: sorted {r_sorted - r_raw:+.3f}, balanced {r_bal - r_raw:+.3f} "
        "recall at identical code budget"
    )


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1")
