"""Scale probe for ``semantic_neardup_pairs_lsh`` (q82's candidate
stage) — the round-10 reshape replaced the bucket self-join (which
consumed the scan+normalize+bucket pipeline twice) with one
groupBy(bucket) that collects each bucket's (id, unit-vector) members
and expands pairs row-locally. This probe exercises that shape decades
past the sf0.1 bench (5k rows) with ANALYTIC ground truth:

- ``n`` base vectors: seeded standard-normal draws (pure function of
  the id), pairwise near-orthogonal at dims=64 — random pairs land in
  a shared sign-LSH bucket with probability ~2^-planes and then die at
  the dot threshold, so every surviving pair must be planted
  (``alien_pairs`` is reported and must be 0).
- ``twins`` planted pairs at an EXACT cosine: twin = c*u + sqrt(1-c^2)*w
  with w a seeded unit vector orthogonalized against u, so every
  planted pair has cos(base, twin) = c bit-computably. The
  random-hyperplane heuristic predicts per-pair candidate probability
  (1 - theta/pi)^planes at theta = arccos(c); the probe compares
  measured twin recall against that curve (the planes here are fixed
  +-1 md5-sign matrices, not iid Gaussian hyperplanes, so the curve is
  a high-dims approximation — tolerance is correspondingly looser than
  the MinHash probe's exact banding math).

--shape old monkeypatches the round-8 self-join implementation back in
(verbatim from git fb1022a) so old vs new compare on the same box,
heap, and data; the output pair SET must be identical (both shapes are
exact over the same buckets — only the plan shape differs).

Usage:
    python tools/semantic_lsh_scale_probe.py [--n 5000000]
        [--twins 100000] [--dims 64] [--planes 24] [--twin-cos 0.999]
        [--threshold 0.99] [--shape new|old]

Prints one JSON line; paste into OPTIMIZATION_r10.md and commit the log.
"""

from __future__ import annotations

import argparse
import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from pyspark.sql import functions as F  # noqa: E402

TWIN_OFF = 1_000_000_000


def make_vectors(spark, n: int, twins: int, dims: int, twin_cos: float):
    """(vec_id, embedding): ids < TWIN_OFF are seeded base vectors;
    TWIN_OFF+i is base i rotated to EXACTLY cos = twin_cos."""
    ids = spark.range(n).unionByName(
        spark.range(twins).select((F.col("id") + TWIN_OFF).alias("id"))
    )
    ids = ids.repartition(int(spark.conf.get("spark.sql.shuffle.partitions")))

    def gen(batches):
        import numpy as np
        import pandas as pd

        s = math.sqrt(1.0 - twin_cos * twin_cos)
        for pdf in batches:
            out = []
            for i in pdf["id"].to_numpy():
                base = int(i) % TWIN_OFF
                rng = np.random.default_rng(base * 2654435761 % 2**31)
                u = rng.standard_normal(dims)
                u /= np.linalg.norm(u)
                if i >= TWIN_OFF:
                    # w: seeded direction orthogonalized against u —
                    # twin = c*u + s*w has <twin, u> = c exactly
                    rng2 = np.random.default_rng((base * 2654435761 + 7) % 2**31)
                    w = rng2.standard_normal(dims)
                    w -= np.dot(w, u) * u
                    w /= np.linalg.norm(w)
                    v = twin_cos * u + s * w
                else:
                    v = u
                out.append(v.astype("float64").tolist())
            yield pd.DataFrame({"vec_id": pdf["id"], "embedding": out})

    return ids.mapInPandas(gen, "vec_id long, embedding array<double>")


def old_semantic_neardup_pairs_lsh(
    vectors, threshold, id_col="vec_id", vec_col="embedding", planes=6, dims=64
):
    """Round-8 shape, verbatim from git fb1022a: bucket self-join that
    consumes the scan+normalize+bucket pipeline twice."""
    from terrorblade_spark.operators.vector import dot, norm, sign_lsh_bucket

    base = vectors.select(id_col, vec_col).withColumn("__n", norm(F.col(vec_col)))
    unit = base.where(F.col("__n") > 0).select(
        F.col(id_col),
        sign_lsh_bucket(F.col(vec_col), planes, dims).alias("__b"),
        F.transform(F.col(vec_col), lambda x: x.cast("double") / F.col("__n")).alias(
            "__u"
        ),
    )
    left = unit.select(
        F.col("__b"), F.col(id_col).alias("id_a"), F.col("__u").alias("__ua")
    )
    right = unit.select(
        F.col("__b"), F.col(id_col).alias("id_b"), F.col("__u").alias("__ub")
    )
    return (
        left.join(right, "__b")
        .where(F.col("id_a") < F.col("id_b"))
        .where(dot(F.col("__ua"), F.col("__ub")) >= F.lit(float(threshold)))
        .select("id_a", "id_b")
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=5_000_000)
    ap.add_argument("--twins", type=int, default=100_000)
    ap.add_argument("--dims", type=int, default=64)
    ap.add_argument("--planes", type=int, default=24)
    ap.add_argument("--twin-cos", type=float, default=0.999)
    ap.add_argument("--threshold", type=float, default=0.99)
    ap.add_argument("--shape", choices=["new", "old"], default="new")
    args = ap.parse_args()

    from pyspark import StorageLevel

    import terrorblade_spark.operators.dedup as dd
    from terrorblade_spark.session import get_spark

    spark = get_spark("semantic-lsh-scale-probe")

    t0 = time.time()
    vecs = make_vectors(spark, args.n, args.twins, args.dims, args.twin_cos).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    total = vecs.count()
    out: dict[str, object] = {
        "probe": "semantic_lsh_scale",
        "shape": args.shape,
        "vectors": total,
        "twins": args.twins,
        "dims": args.dims,
        "planes": args.planes,
        "twin_cos": args.twin_cos,
        "threshold": args.threshold,
        "gen_s": round(time.time() - t0, 1),
    }

    fn = old_semantic_neardup_pairs_lsh if args.shape == "old" else dd.semantic_neardup_pairs_lsh
    t0 = time.time()
    pairs = fn(
        vecs,
        args.threshold,
        id_col="vec_id",
        vec_col="embedding",
        planes=args.planes,
        dims=args.dims,
    ).persist(StorageLevel.MEMORY_AND_DISK)
    out["cand_pairs"] = pairs.count()
    elapsed = max(time.time() - t0, 1e-6)
    out["pairs_s"] = round(elapsed, 1)
    out["vecs_per_s"] = int(total / elapsed)

    a, b = F.col("id_a"), F.col("id_b")
    twin_hits = pairs.where((b - a == TWIN_OFF) & (a < args.twins)).count()
    out["twin_hits"] = twin_hits
    out["alien_pairs"] = out["cand_pairs"] - twin_hits
    out["twin_recall"] = round(twin_hits / args.twins, 4)
    theta = math.acos(args.twin_cos)
    out["twin_recall_predicted"] = round((1.0 - theta / math.pi) ** args.planes, 4)
    # pair-set digest: order-independent xor of per-pair hashes, so the
    # two shapes can be compared without shipping the pairs (xor, not
    # sum: ANSI mode makes a 1.5M-term long sum an overflow error)
    dig = pairs.agg(
        F.bit_xor(F.xxhash64("id_a", "id_b")).alias("d"),
    ).collect()[0]["d"]
    out["pair_set_digest"] = int(dig) if dig is not None else 0

    print(json.dumps(out), flush=True)
    assert out["alien_pairs"] == 0, out
    # fixed-sign planes vs the iid-hyperplane curve: allow a loose band
    assert abs(out["twin_recall"] - out["twin_recall_predicted"]) < 0.08, out
    spark.stop()


if __name__ == "__main__":
    main()
