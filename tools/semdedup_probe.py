"""SemDeDup scale probe: >= 1M vectors with planted near-dup twins.

Round-5 verified semantic_dedup (operators/dedup.py) only to 35k
vectors; this probe mirrors the IVF-PQ recall harness
(tools/ann_recall_probe.py) one decade up: a clustered synthetic
corpus (topic centers + per-member noise — the geometry real
embedding corpora have), plus T planted twin pairs whose cosine sits
safely above the dedup threshold. It then runs the operator's exact
stage sequence with per-stage wall timing:

  normalize -> k-means fit+assign (ivf_build, k ~ sqrt(N) contract)
  -> within-cluster blocked-BLAS pairs -> connected components

and reports: twin recall (planted twin lands in the same component as
its base), peak cluster population (must stay within the BLAS block
contract), and per-stage wall seconds.

Geometry: centers ~ 4*N(0,1)^d, member noise ~ 2*N(0,1)^d so
same-topic members sit at cos ~ 0.80 (below threshold — natural
clusters must NOT mass-pair), twin noise ~ 0.5*N(0,1)^d so twins sit
at cos ~ 0.99 (safely above).

Usage:
    python tools/semdedup_probe.py [--n 1000000] [--dim 64]
        [--centers 256] [--twins 5000] [--threshold 0.95]
        [--n-clusters 1024]

Prints one JSON line; paste into COVERAGE.md.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from pyspark.sql import functions as F  # noqa: E402


def make_corpus(spark, n: int, dim: int, centers: int, twins: int, seed: int = 11):
    """(vec_id, embedding): ids 0..n-1 are the base corpus; ids
    n..n+twins-1 are near-dup twins of bases 0..twins-1."""
    c = np.random.default_rng(seed).standard_normal((centers, dim)) * 4.0
    b_centers = spark.sparkContext.broadcast(c)

    def gen(batches):
        import pandas as pd

        for pdf in batches:
            ids = pdf["id"].to_numpy()
            rng = np.random.default_rng(int(ids[0]) + 1)
            cc = b_centers.value
            base_ids = np.where(ids < n, ids, ids - n)
            assign = base_ids % cc.shape[0]
            # base vector is a pure function of base id (per-row seeded
            # generator keyed on base id) so a twin reproduces its
            # base's vector exactly, then adds its own small noise
            noise = np.stack(
                [
                    np.random.default_rng(int(b) * 7 + 3).standard_normal(cc.shape[1])
                    for b in base_ids
                ]
            )
            vecs = cc[assign] + 2.0 * noise
            is_twin = ids >= n
            if is_twin.any():
                vecs[is_twin] += 0.5 * rng.standard_normal(
                    (int(is_twin.sum()), cc.shape[1])
                )
            yield pd.DataFrame(
                {"vec_id": ids, "embedding": [v.tolist() for v in vecs]}
            )

    ids = spark.range(n).unionByName(
        spark.range(n, n + twins)
    )
    return ids.repartition(64).mapInPandas(
        gen, "vec_id long, embedding array<double>"
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1_000_000)
    ap.add_argument("--dim", type=int, default=64)
    ap.add_argument("--centers", type=int, default=256)
    ap.add_argument("--twins", type=int, default=5_000)
    ap.add_argument("--threshold", type=float, default=0.95)
    ap.add_argument("--n-clusters", type=int, default=1_024)
    ap.add_argument("--probes", type=int, default=2)
    ap.add_argument(
        "--incremental-batch",
        type=int,
        default=0,
        help="after the batch run, gate a batch of this many vectors "
        "(half twins of state canonicals, half fresh) against the "
        "admitted state via semantic_dedup_incremental and report "
        "gate wall time + admit correctness",
    )
    args = ap.parse_args()

    from pyspark import StorageLevel

    from terrorblade_spark.operators.components import connected_components
    from terrorblade_spark.operators.dedup import (
        _assign_probes_blas,
        _cluster_edges_blas,
    )
    from terrorblade_spark.operators.vector import ivf_build, unit_normalize
    from terrorblade_spark.session import get_spark

    spark = get_spark("semdedup-probe")
    out: dict[str, object] = {
        "n": args.n,
        "twins": args.twins,
        "dim": args.dim,
        "n_clusters": args.n_clusters,
        "threshold": args.threshold,
    }

    t0 = time.time()
    corpus = make_corpus(
        spark, args.n, args.dim, args.centers, args.twins
    ).persist(StorageLevel.MEMORY_AND_DISK)
    corpus.count()
    out["gen_s"] = round(time.time() - t0, 1)

    # --- stage 1: normalize (the operator's shared helper) ---
    t0 = time.time()
    unit = unit_normalize(corpus, "vec_id", "embedding")

    # --- stage 2: k-means fit + assign (k ~ sqrt(N) contract) ---
    assigned, centroids = ivf_build(
        unit,
        n_lists=args.n_clusters,
        id_col="vec_id",
        vec_col="embedding",
        seed=42,
        train_fraction=0.1,
    )
    assigned = assigned.persist(StorageLevel.MEMORY_AND_DISK)
    assigned.count()
    out["fit_assign_s"] = round(time.time() - t0, 1)

    pops = assigned.groupBy("list_id").agg(F.count(F.lit(1)).alias("m"))
    stats = pops.agg(
        F.max("m").alias("mx"), F.avg("m").alias("avg"), F.count(F.lit(1)).alias("k")
    ).collect()[0]
    out["peak_cluster_pop"] = int(stats["mx"])
    out["avg_cluster_pop"] = round(float(stats["avg"]), 1)
    out["clusters_used"] = int(stats["k"])

    # --- stage 3: within-cluster blocked-BLAS pairs (multi-probe
    # candidate expansion when --probes > 1, the operator's
    # assign_probes path) ---
    t0 = time.time()
    out["probes"] = args.probes
    if args.probes > 1:
        candidates, _bc = _assign_probes_blas(
            assigned.select("vec_id", "embedding"), centroids, args.probes,
            "vec_id", "embedding",
        )
    else:
        candidates = assigned
    edges = _cluster_edges_blas(
        candidates, "vec_id", "embedding", float(args.threshold)
    )
    if args.probes > 1:
        edges = edges.distinct()
    edges = edges.persist(StorageLevel.MEMORY_AND_DISK)
    out["n_pairs"] = edges.count()
    out["pairs_s"] = round(time.time() - t0, 1)

    # --- stage 4: connected components ---
    t0 = time.time()
    comp = connected_components(edges, "id_a", "id_b").persist(
        StorageLevel.MEMORY_AND_DISK
    )
    out["n_component_nodes"] = comp.count()
    out["components_s"] = round(time.time() - t0, 1)

    # --- twin recall: twin n+i must share a component with base i ---
    base = comp.select(
        F.col("node").alias("b_node"), F.col("component").alias("b_comp")
    )
    twin = comp.select(
        (F.col("node") - args.n).alias("b_node"),
        F.col("component").alias("t_comp"),
    ).where(F.col("b_node") >= 0)
    joined = twin.join(base, "b_node")
    hits = joined.where(F.col("t_comp") == F.col("b_comp")).count()
    out["twin_recall"] = round(hits / args.twins, 4)

    # giant-component sanity: spurious natural-cluster pairing would
    # show up as one blob holding most nodes
    biggest = (
        comp.groupBy("component").agg(F.count(F.lit(1)).alias("m"))
        .agg(F.max("m"))
        .collect()[0][0]
    )
    out["largest_component"] = int(biggest)

    # analytic ground truth (round 9, the MinHash-probe evidence
    # format): the planted geometry pins the twin-pair cosine — twin =
    # base + 0.5*N(0,1)^d, so E[cos] = E[|b|]/sqrt(E[|b|^2]+0.25d)
    # ~ 0.99 at dim 64 — and the expected outcome is every twin
    # absorbed into its base's component and ZERO natural merges
    # (same-topic cos ~0.80 < threshold). Measure both sides:
    # the actual twin cosine distribution, and canonical count vs plan.
    tw = unit.where(F.col("vec_id") >= args.n).select(
        (F.col("vec_id") - args.n).alias("b_id"),
        F.col("embedding").alias("t_emb"),
    )
    bs = unit.where(F.col("vec_id") < args.twins).select(
        F.col("vec_id").alias("b_id"), F.col("embedding").alias("b_emb")
    )
    cos_stats = (
        tw.join(bs, "b_id")
        .select(
            F.aggregate(
                F.zip_with("t_emb", "b_emb", lambda a, b: a * b),
                F.lit(0.0),
                lambda acc, v: acc + v,
            ).alias("cos")  # both unit-normalized: dot == cosine
        )
        .agg(F.avg("cos").alias("avg"), F.min("cos").alias("mn"))
        .collect()[0]
    )
    out["twin_cos_mean"] = round(float(cos_stats["avg"]), 4)
    out["twin_cos_min"] = round(float(cos_stats["mn"]), 4)
    # canonicals = rows minus merged-away nodes; plan = n (every twin
    # absorbed, nothing else merged)
    merged_away = comp.where(F.col("node") != F.col("component")).count()
    out["canonical_count"] = args.n + args.twins - merged_away
    out["expected_canonicals"] = args.n

    # --- incremental-gate leg: daily-ingest shape against the state ---
    if args.incremental_batch > 0:
        from terrorblade_spark.operators.dedup import (
            _assign_probes_blas,
            semantic_dedup_incremental,
        )

        half = args.incremental_batch // 2
        # canonical state = min-id keep over the components found above
        rejected_ids = comp.where(F.col("node") != F.col("component")).select(
            F.col("node").alias("vec_id")
        )
        canon_vecs = assigned.select("vec_id", "embedding").join(
            rejected_ids, "vec_id", "left_anti"
        )
        state, st_bc = _assign_probes_blas(
            canon_vecs, centroids, args.probes, "vec_id", "embedding"
        )
        state = state.persist(StorageLevel.MEMORY_AND_DISK)
        out["inc_state_rows"] = state.count()

        # half twins of canonical bases 0..half-1 (same generator, so
        # the twin reproduces its base + fresh small noise), half fresh
        # random directions (near nothing). Offsets derive from n so
        # the twin and fresh id ranges can never collide at any --n
        twin_off = max(10_000_000, 10 * args.n)
        fresh_off = 2 * twin_off
        inc_twins = make_corpus(
            spark, args.n, args.dim, args.centers, half
        ).where(F.col("vec_id") >= args.n).select(
            (F.col("vec_id") + twin_off).alias("vec_id"), "embedding"
        )

        def gen_fresh(batches):
            import pandas as pd

            for pdf in batches:
                rng = np.random.default_rng(90_000 + int(pdf["id"].iloc[0]))
                yield pd.DataFrame(
                    {
                        "vec_id": pdf["id"].to_numpy() + fresh_off,
                        "embedding": [
                            rng.standard_normal(args.dim).tolist()
                            for _ in range(len(pdf))
                        ],
                    }
                )

        fresh = spark.range(half).repartition(8).mapInPandas(
            gen_fresh, "vec_id long, embedding array<double>"
        )
        inc_batch = inc_twins.unionByName(fresh)
        t0 = time.time()
        try:
            adm, _new_state = semantic_dedup_incremental(
                inc_batch, state, centroids,
                threshold=float(args.threshold), assign_probes=args.probes,
            )
            adm_ids = {r.vec_id for r in adm.select("vec_id").collect()}
        finally:
            st_bc.unpersist()
            state.unpersist()
        out["inc_gate_s"] = round(time.time() - t0, 1)
        out["inc_batch"] = args.incremental_batch
        out["inc_fresh_admitted"] = sum(1 for i in adm_ids if i >= fresh_off)
        n_twin_adm = sum(1 for i in adm_ids if twin_off <= i < fresh_off)
        out["inc_twin_reject_rate"] = round(1 - n_twin_adm / half, 4)

    print(json.dumps(out))
    assert out["twin_recall"] >= 0.95, out
    assert out["peak_cluster_pop"] < 50_000, out
    if args.incremental_batch > 0:
        assert out["inc_twin_reject_rate"] >= 0.95, out
        assert out["inc_fresh_admitted"] >= 0.99 * (args.incremental_batch // 2), out
    spark.stop()


if __name__ == "__main__":
    main()
