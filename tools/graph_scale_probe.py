"""Graph suite scale probe: the Pregel recipe at ~100M edges.

Round-5 probed the graph operators (operators/graph.py) only to 2M
edges; this runs pagerank (10 supersteps, per-superstep wall/shuffle/
storage via the on_superstep hook), bfs_distances, label_propagation,
and kcore on a seeded power-law digraph two decades larger, and
reports per-stage numbers for COVERAGE.md. The superlinearity check:
s/superstep here vs the 2M baseline must not grow faster than the
edge ratio.

Shuffle bytes and block-manager footprint come from the UI REST API
(re-enabled for this session via get_spark(extra_conf=...)); the
localCheckpoint footprint is the sum of cached RDD sizes, whose peak
across superstep boundaries is the "peak localCheckpoint footprint".

Usage:
    python tools/graph_scale_probe.py [--nodes 10000000] [--avg-deg 10]
        [--supersteps 10] [--bfs-hops 4] [--lpa-rounds 2]
        [--lpa-stable] [--lpa-check-every 1] [--kcore-k 10]
        [--skip-kcore] [--skip-lpa] [--skip-bfs] [--skip-pagerank]

Legs share one JVM, so a full run measures later legs under the GC
pressure of earlier ones' accumulated cache/checkpoint blocks (the
round-7 full run inflated bfs 4x vs its round-6 number). For a
comparable per-leg wall time, run the leg alone in a fresh session
via the skip flags.

Prints one JSON line; paste into COVERAGE.md.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from pyspark.sql import functions as F  # noqa: E402

from tools.pagerank_probe import build_edges  # noqa: E402


def _rest(spark, path: str):
    base = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId
    try:
        with urllib.request.urlopen(
            f"{base}/api/v1/applications/{app}{path}", timeout=10
        ) as r:
            return json.loads(r.read().decode())
    except Exception:
        return []


def shuffle_write_bytes(spark) -> int:
    return sum(
        s.get("shuffleWriteBytes", 0) for s in _rest(spark, "/stages?status=COMPLETE")
    )


def storage_bytes(spark) -> int:
    return sum(
        r.get("memoryUsed", 0) + r.get("diskUsed", 0)
        for r in _rest(spark, "/storage/rdd")
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--nodes", type=int, default=10_000_000)
    ap.add_argument("--avg-deg", type=int, default=10)
    ap.add_argument("--supersteps", type=int, default=10)
    ap.add_argument("--bfs-hops", type=int, default=4)
    ap.add_argument("--lpa-rounds", type=int, default=2)
    ap.add_argument("--lpa-stable", action="store_true")
    ap.add_argument("--lpa-check-every", type=int, default=1)
    ap.add_argument("--kcore-k", type=int, default=10)
    ap.add_argument("--skip-bfs", action="store_true")
    ap.add_argument("--skip-pagerank", action="store_true")
    ap.add_argument("--skip-lpa", action="store_true")
    ap.add_argument("--skip-kcore", action="store_true")
    args = ap.parse_args()

    from pyspark import StorageLevel

    from terrorblade_spark.operators.graph import (
        bfs_distances,
        kcore,
        label_propagation,
        pagerank,
    )
    from terrorblade_spark.session import get_spark

    spark = get_spark(
        "graph-scale-probe",
        extra_conf={"spark.ui.enabled": "true", "spark.ui.port": "4055"},
    )
    n_edges = args.nodes * args.avg_deg
    out: dict[str, object] = {"nodes": args.nodes, "edges": n_edges}

    t0 = time.time()
    edges = build_edges(spark, args.nodes, args.avg_deg).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    out["edge_rows"] = edges.count()
    out["gen_s"] = round(time.time() - t0, 1)

    # --- pagerank, per-superstep instrumentation ---
    if not args.skip_pagerank:
        marks: list[dict[str, float]] = []
        last = {"t": time.time(), "w": shuffle_write_bytes(spark)}
        peak = {"storage": 0}

        def cb(i: int) -> None:
            now = time.time()
            w = shuffle_write_bytes(spark)
            st = storage_bytes(spark)
            peak["storage"] = max(peak["storage"], st)
            marks.append(
                {
                    "superstep": i,
                    "wall_s": round(now - last["t"], 1),
                    "shuffle_write_mb": round((w - last["w"]) / 1e6, 1),
                    "storage_mb": round(st / 1e6, 1),
                }
            )
            last["t"], last["w"] = now, w

        t0 = time.time()
        pr = pagerank(edges, n_iter=args.supersteps, on_superstep=cb)
        agg = pr.agg(
            F.count(F.lit(1)).alias("n"), F.sum("pagerank").alias("mass")
        ).collect()[0]
        out["pagerank_total_s"] = round(time.time() - t0, 1)
        out["pagerank_nodes"] = int(agg["n"])
        out["pagerank_mass"] = round(float(agg["mass"]), 9)
        # superstep 0 includes the one-time link build + init checkpoint;
        # the steady-state cost is the tail supersteps
        steady = [m["wall_s"] for m in marks[1:]]
        out["superstep_s"] = [m["wall_s"] for m in marks]
        out["superstep_shuffle_mb"] = [m["shuffle_write_mb"] for m in marks]
        out["steady_superstep_s"] = round(sum(steady) / max(len(steady), 1), 1)
        out["peak_storage_mb"] = round(peak["storage"] / 1e6, 1)
        out["edge_visits_per_s"] = int(
            n_edges * args.supersteps / out["pagerank_total_s"]
        )
        assert abs(float(agg["mass"]) - 1.0) < 1e-6, out

    # --- bfs from 10 low-id seeds (the planted hubs) ---
    if not args.skip_bfs:
        seeds = spark.range(10).select(F.col("id").alias("node"))
        t0 = time.time()
        d = bfs_distances(edges, seeds, max_hops=args.bfs_hops)
        reach = d.groupBy("distance").agg(F.count(F.lit(1)).alias("n")).collect()
        out["bfs_s"] = round(time.time() - t0, 1)
        out["bfs_frontier"] = {
            int(r["distance"]): int(r["n"]) for r in sorted(reach, key=lambda r: r["distance"])
        }

    # --- label propagation ---
    if not args.skip_lpa:
        t0 = time.time()
        lp = label_propagation(
            edges,
            n_iter=args.lpa_rounds,
            stop_when_stable=args.lpa_stable,
            check_every=args.lpa_check_every,
        )
        stats = lp.agg(
            F.count(F.lit(1)).alias("n"),
            F.countDistinct("community").alias("k"),
        ).collect()[0]
        out["lpa_s"] = round(time.time() - t0, 1)
        out["lpa_stable"] = bool(args.lpa_stable)
        out["lpa_nodes"] = int(stats["n"])
        out["lpa_communities"] = int(stats["k"])

    # --- k-core peel ---
    if not args.skip_kcore:
        t0 = time.time()
        core = kcore(edges, k=args.kcore_k)
        stats = core.agg(
            F.count(F.lit(1)).alias("n"), F.min("core_degree").alias("mn")
        ).collect()[0]
        out["kcore_s"] = round(time.time() - t0, 1)
        out["kcore_members"] = int(stats["n"])
        assert stats["mn"] is None or stats["mn"] >= args.kcore_k, out

    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
