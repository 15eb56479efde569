"""Incremental semantic gate vs canonical-state size (VERDICT r7 task 3).

The gate's 100 TB story rests on per-batch cost scaling with the state
rows in TOUCHED CELLS — O(new x members) per cell, with state only ever
the BLAS right-hand side — not with total state in any worse way. This
probe sweeps canonical state across a decade (default 1M -> 3M -> 10M)
at a FIXED batch (100k: half twins of state canonicals, half fresh
vectors), holding the coarse quantizer fixed (the operator's contract:
the quantizer is fitted once; growing state makes cells denser, which
is exactly the read-amplification curve to measure), and reports per
state size:

  - gate wall seconds,
  - pair_flops = sum over cells of (batch probe rows x state members)
    — the kernel's actual work, computed from the two cell histograms,
  - ns_per_pair = wall / pair_flops — the normalized cost that should
    stay ~FLAT across the decade (a rising curve would mean some stage
    scales super-linearly in state: a shuffle, a collect, a replan),
  - twin-reject rate (>= 0.95) and fresh-admit rate (>= 0.99) — the
    gate must stay CORRECT while it scales.

COMPACTION REHEARSAL (--compact-rehearsal): the state table a real
ingest maintains is a txn.TxnTable accreting one manifest entry per
batch; after many folds reads pay per-entry planning. The rehearsal
builds the 1M state as N appended chunks, gates one batch through
semantic_ingest_txn (timed), runs TxnTable.compact, gates a second
batch (timed), and asserts entries collapsed and correctness held.

Geometry matches tools/semdedup_probe.py: centers 4*N(0,1)^d, member
noise 2*N(0,1)^d (natural same-topic cos ~0.80, below threshold), twin
noise 0.5*N(0,1)^d (cos ~0.99, above). Base vector is a pure function
of base id so a twin reproduces its base exactly before adding noise.

Usage:
    python tools/semgate_state_probe.py [--state-sizes 1000000,3000000,10000000]
        [--batch 100000] [--dim 64] [--centers 256] [--n-lists 1024]
        [--probes 2] [--threshold 0.95] [--compact-rehearsal]

Prints one JSON line; paste into COVERAGE.md and commit the log.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from pyspark.sql import functions as F  # noqa: E402

TWIN_OFF = 1_000_000_000  # twin of base b has id TWIN_OFF + b
FRESH_OFF = 2_000_000_000


def make_vectors(spark, id_df, dim: int, centers: int, seed: int = 11):
    """(vec_id, embedding) for any id set: ids < TWIN_OFF are base
    corpus rows (pure function of id), TWIN_OFF..FRESH_OFF twins of
    base (id - TWIN_OFF), >= FRESH_OFF fresh random directions."""
    c = np.random.default_rng(seed).standard_normal((centers, dim)) * 4.0
    b_centers = spark.sparkContext.broadcast(c)

    def gen(batches):
        import pandas as pd

        for pdf in batches:
            ids = pdf["id"].to_numpy()
            rng = np.random.default_rng(int(ids[0]) % 2**31 + 1)
            cc = b_centers.value
            out = np.empty((len(ids), cc.shape[1]))
            fresh = ids >= FRESH_OFF
            basey = ~fresh
            base_ids = np.where(ids < TWIN_OFF, ids, ids - TWIN_OFF)
            if basey.any():
                noise = np.stack(
                    [
                        np.random.default_rng(int(b) * 7 + 3).standard_normal(
                            cc.shape[1]
                        )
                        for b in base_ids[basey]
                    ]
                )
                out[basey] = cc[base_ids[basey] % cc.shape[0]] + 2.0 * noise
            twin = (ids >= TWIN_OFF) & ~fresh
            if twin.any():
                out[twin] += 0.5 * rng.standard_normal(
                    (int(twin.sum()), cc.shape[1])
                )
            if fresh.any():
                out[fresh] = rng.standard_normal((int(fresh.sum()), cc.shape[1]))
            yield pd.DataFrame(
                {"vec_id": ids, "embedding": [v.tolist() for v in out]}
            )

    return id_df.repartition(64).mapInPandas(
        gen, "vec_id long, embedding array<double>"
    )


def make_batch(spark, batch: int, sweep_tag: int, dim: int, centers: int):
    """Half twins of canonical bases (disjoint base ranges per sweep
    tag so repeated batches are fresh content), half fresh randoms."""
    half = batch // 2
    twin_ids = spark.range(half).select(
        (F.col("id") + F.lit(TWIN_OFF + sweep_tag * half)).alias("id")
    )
    # twins target bases sweep_tag*half .. sweep_tag*half + half - 1
    fresh_ids = spark.range(half).select(
        (F.col("id") + F.lit(FRESH_OFF + sweep_tag * half)).alias("id")
    )
    return make_vectors(
        spark, twin_ids.unionByName(fresh_ids), dim, centers
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--state-sizes", default="1000000,3000000,10000000")
    ap.add_argument("--batch", type=int, default=100_000)
    ap.add_argument("--dim", type=int, default=64)
    ap.add_argument("--centers", type=int, default=256)
    ap.add_argument("--n-lists", type=int, default=1_024)
    ap.add_argument("--probes", type=int, default=2)
    ap.add_argument("--threshold", type=float, default=0.95)
    ap.add_argument("--compact-rehearsal", action="store_true")
    ap.add_argument("--compact-chunks", type=int, default=4)
    # round 9 (VERDICT r8 task 3): run the rehearsal ALONE in a fresh
    # session — the r8 rehearsal ran after the 10M sweep in the same
    # JVM and its post-compact timing was polluted by end-of-session
    # GC state; with --skip-sweep the before/after gate walls are the
    # only Spark jobs after the quantizer fit
    ap.add_argument("--skip-sweep", action="store_true")
    args = ap.parse_args()
    sizes = [int(s) for s in args.state_sizes.split(",")]

    from pyspark import StorageLevel

    from terrorblade_spark.operators.dedup import (
        _assign_probes_blas,
        semantic_dedup_incremental,
        semantic_ingest_txn,
    )
    from terrorblade_spark.operators.vector import ivf_build, unit_normalize
    from terrorblade_spark.session import get_spark
    from terrorblade_spark.txn import TxnTable

    spark = get_spark("semgate-state-probe")
    out: dict[str, object] = {
        "probe": "semgate_state_sweep",
        "batch": args.batch,
        "dim": args.dim,
        "n_lists": args.n_lists,
        "probes": args.probes,
        "threshold": args.threshold,
        "sweep": [],
    }

    # fixed quantizer: fitted ONCE on the smallest state slice (the
    # operator contract — growing state densifies cells, which is the
    # curve under test)
    base_ids = spark.range(sizes[0])
    first = unit_normalize(
        make_vectors(spark, base_ids, args.dim, args.centers), "vec_id", "embedding"
    )
    _, centroids = ivf_build(
        first, n_lists=args.n_lists, id_col="vec_id", vec_col="embedding",
        seed=42, train_fraction=min(1.0, 100_000 / sizes[0]),
    )
    centroids = centroids.persist(StorageLevel.MEMORY_AND_DISK)
    centroids.count()

    half = args.batch // 2
    for si, s in enumerate([] if args.skip_sweep else sizes):
        leg: dict[str, object] = {"state_n": s}
        t0 = time.time()
        canon = unit_normalize(
            make_vectors(spark, spark.range(s), args.dim, args.centers),
            "vec_id",
            "embedding",
        )
        state, st_bc = _assign_probes_blas(
            canon, centroids, args.probes, "vec_id", "embedding"
        )
        state = state.persist(StorageLevel.MEMORY_AND_DISK)
        leg["state_rows"] = state.count()
        leg["state_build_s"] = round(time.time() - t0, 1)

        batch = make_batch(spark, args.batch, si, args.dim, args.centers).persist(
            StorageLevel.MEMORY_AND_DISK
        )
        batch.count()

        # pair_flops: the kernel's work, from the two cell histograms
        bprobe, bp_bc = _assign_probes_blas(
            unit_normalize(batch, "vec_id", "embedding"),
            centroids, args.probes, "vec_id", "embedding",
        )
        bcells = bprobe.groupBy("list_id").agg(F.count(F.lit(1)).alias("bn"))
        scells = state.groupBy("list_id").agg(F.count(F.lit(1)).alias("sn"))
        leg["pair_flops"] = int(
            bcells.join(scells, "list_id")
            .agg(F.sum(F.col("bn") * F.col("sn")).alias("p"))
            .collect()[0]["p"]
            or 0
        )
        bp_bc.unpersist()

        t0 = time.time()
        adm, _ns = semantic_dedup_incremental(
            batch, state, centroids,
            threshold=args.threshold, assign_probes=args.probes,
            max_exact_group=None,  # documented: routed after the exact gate
        )
        adm_ids = {r["vec_id"] for r in adm.select("vec_id").collect()}
        leg["gate_s"] = round(time.time() - t0, 1)
        leg["ns_per_pair"] = round(leg["gate_s"] * 1e9 / max(leg["pair_flops"], 1), 2)
        n_twin_adm = sum(1 for i in adm_ids if TWIN_OFF <= i < FRESH_OFF)
        leg["twin_reject_rate"] = round(1 - n_twin_adm / half, 4)
        leg["fresh_admit_rate"] = round(
            sum(1 for i in adm_ids if i >= FRESH_OFF) / half, 4
        )
        out["sweep"].append(leg)
        print(f"# state {s}: {json.dumps(leg)}", flush=True)
        st_bc.unpersist()
        state.unpersist()
        batch.unpersist()

    if args.compact_rehearsal:
        reh: dict[str, object] = {"state_n": sizes[0], "chunks": args.compact_chunks}
        canon = unit_normalize(
            make_vectors(spark, spark.range(sizes[0]), args.dim, args.centers),
            "vec_id",
            "embedding",
        )
        state, st_bc = _assign_probes_blas(
            canon, centroids, args.probes, "vec_id", "embedding"
        )
        state = state.persist(StorageLevel.MEMORY_AND_DISK)
        state.count()
        with tempfile.TemporaryDirectory() as tmp:
            table = TxnTable(os.path.join(tmp, "semstate"))
            for ci in range(args.compact_chunks):
                table.append(
                    state.where(F.col("vec_id") % args.compact_chunks == ci),
                    applied_id=f"chunk-{ci}",
                )
            reh["entries_before"] = len(table.latest().entries)

            def timed_gate(tag: int) -> tuple[float, float]:
                b = make_batch(spark, args.batch, tag, args.dim, args.centers)
                t0 = time.time()
                adm = semantic_ingest_txn(
                    table, b, centroids, threshold=args.threshold,
                    assign_probes=args.probes, applied_id=f"batch-{tag}",
                    max_exact_group=None,
                )
                ids = {r["vec_id"] for r in adm.select("vec_id").collect()}
                w = time.time() - t0
                twin_adm = sum(1 for i in ids if TWIN_OFF <= i < FRESH_OFF)
                return w, 1 - twin_adm / half

            # tags continue past the sweep's (0..len(sizes)-1); twin
            # bases tag*half..(tag+1)*half must stay inside the
            # rehearsal state (sizes[0]), which holds for small tags
            w1, rej1 = timed_gate(len(sizes) + 1)
            reh["gate_before_compact_s"] = round(w1, 1)
            reh["twin_reject_before"] = round(rej1, 4)
            t0 = time.time()
            table.compact(spark)
            reh["compact_s"] = round(time.time() - t0, 1)
            reh["entries_after"] = len(table.latest().entries)
            w2, rej2 = timed_gate(len(sizes) + 2)
            reh["gate_after_compact_s"] = round(w2, 1)
            reh["twin_reject_after"] = round(rej2, 4)
        st_bc.unpersist()
        state.unpersist()
        out["compact_rehearsal"] = reh
        print(f"# rehearsal: {json.dumps(reh)}", flush=True)

    print(json.dumps(out))
    for leg in out["sweep"]:
        assert leg["twin_reject_rate"] >= 0.95, leg
        assert leg["fresh_admit_rate"] >= 0.99, leg
    if args.compact_rehearsal:
        reh = out["compact_rehearsal"]
        assert reh["entries_after"] < reh["entries_before"], reh
        assert reh["twin_reject_before"] >= 0.95, reh
        assert reh["twin_reject_after"] >= 0.95, reh
    spark.stop()


if __name__ == "__main__":
    main()
