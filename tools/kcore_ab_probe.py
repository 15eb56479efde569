"""Interleaved kcore fold-cadence A/B (VERDICT r9 task 1).

The r8/r9 probes measured fold_every=1 ~2x faster than the shipped
adaptive default at 100M power-law edges, but each setting ran in a
block, so box drift could masquerade as cadence effect. This probe
interleaves the legs (A/B/C repeated, same session, same persisted
graph, >= --reps each) on TWO graph shapes:

- power-law (``--nodes N --avg-deg D``, the r8/r9 graph): bulk peel
  waves — the regime where deferring folds makes every delta step
  broadcast a 10^5..10^6-row pend and stream the node-sized degree
  relation under it, which is what made the old adaptive default lose;
- deep cascade (``--deep``): a ring lattice (every node degree 4,
  entirely k=2-core, never peels, keeps the survivor above the local
  finisher threshold) plus a long path whose peel is inherently
  sequential (2 nodes/step from the free ends) — the regime the delta
  path exists for, where folding the node-sized degree relation every
  step is pure overhead.

Legs:
  adaptive_r9  — fold_every=16, pend-size trigger only at deg_n/8
                 (the r9 shipped default: delta_max_pend disabled)
  fold1        — fold_every=1 (the guard makes this fold every 2 steps)
  tuned        — fold_every=16 + delta_max_pend=65536 (round-10
                 default: fold as soon as pend passes ~64k rows, so
                 bulk waves degenerate to fold-per-wave while tiny
                 cascades keep the delta path)

Members must be identical across every leg; per-leg walls + medians
are printed for the default decision.

Usage:
    python tools/kcore_ab_probe.py --nodes 10000000 --avg-deg 10 --reps 3
    python tools/kcore_ab_probe.py --deep --ring-nodes 5000000 --path-nodes 200 --reps 2
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from pyspark.sql import functions as F  # noqa: E402

from tools.pagerank_probe import build_edges  # noqa: E402


def build_deep_cascade(spark, ring_nodes: int, path_nodes: int):
    """Ring lattice (i -> i+1, i -> i+2 mod n: undirected degree 4) +
    a free path on fresh ids — with k=2 the ring never peels and the
    path peels two nodes per cascade step."""
    ring = spark.range(ring_nodes).select(
        F.col("id").alias("src"),
        ((F.col("id") + 1) % ring_nodes).alias("dst"),
    )
    ring2 = spark.range(ring_nodes).select(
        F.col("id").alias("src"),
        ((F.col("id") + 2) % ring_nodes).alias("dst"),
    )
    path = spark.range(path_nodes - 1).select(
        (F.col("id") + ring_nodes).alias("src"),
        (F.col("id") + ring_nodes + 1).alias("dst"),
    )
    return ring.unionByName(ring2).unionByName(path)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--nodes", type=int, default=10_000_000)
    ap.add_argument("--avg-deg", type=int, default=10)
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--deep", action="store_true")
    ap.add_argument("--ring-nodes", type=int, default=5_000_000)
    ap.add_argument("--path-nodes", type=int, default=200)
    args = ap.parse_args()

    from pyspark import StorageLevel

    from terrorblade_spark.operators.graph import kcore
    from terrorblade_spark.session import get_spark

    spark = get_spark("kcore-ab-probe")

    t0 = time.time()
    if args.deep:
        k = 2
        edges = build_deep_cascade(spark, args.ring_nodes, args.path_nodes)
        shape = {
            "shape": "deep_cascade",
            "ring_nodes": args.ring_nodes,
            "path_nodes": args.path_nodes,
        }
    else:
        k = args.k
        edges = build_edges(spark, args.nodes, args.avg_deg)
        shape = {"shape": "power_law", "nodes": args.nodes}
    edges = edges.persist(StorageLevel.MEMORY_AND_DISK)
    n_edges = edges.count()
    gen_s = round(time.time() - t0, 1)

    settings = {
        # r9 shipped default: modulo-16 cadence, size trigger only at
        # deg_n/8 (delta_max_pend effectively off at the broadcast cap)
        "adaptive_r9": dict(fold_every=16, delta_max_pend=2_000_000),
        "fold1": dict(fold_every=1, delta_max_pend=2_000_000),
        # round-10 candidate default
        "tuned": dict(fold_every=16, delta_max_pend=65_536),
    }
    order = list(settings) * args.reps  # interleaved: A B C A B C ...
    legs = []
    members = None
    for tag in order:
        t0 = time.time()
        core = kcore(edges, k=k, **settings[tag])
        got = core.count()
        wall = round(time.time() - t0, 1)
        legs.append({"tag": tag, "s": wall, "members": int(got)})
        print(f"# {json.dumps(legs[-1])}", flush=True)
        if members is None:
            members = got
        assert got == members, (tag, got, members)

    med = {}
    for tag in settings:
        ws = sorted(l["s"] for l in legs if l["tag"] == tag)
        med[tag] = ws[len(ws) // 2]
    print(
        json.dumps(
            {
                **shape,
                "edges": int(n_edges),
                "k": k,
                "gen_s": gen_s,
                "reps": args.reps,
                "members": int(members),
                "median_s": med,
                "legs": legs,
            }
        )
    )


if __name__ == "__main__":
    main()
