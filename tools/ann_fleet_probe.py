"""Two-node sharded ANN serving probe (VERDICT r9 task 4).

Demonstrates the deployment shape the LocalIVFPQIndex docstring
promises for 100 TB: shards are built ONCE by the distributed pack
(``ivfpq_local_index(shard_path=...)``), then each serving NODE loads
only its LIST-ID RANGE of rows (``ivfpq_local_index_from_shards`` with
``list_range``) while the model (coarse centroids + PQ codebooks) is
replicated everywhere. The router computes ONE global coarse probe set
from the replicated quantizer, sends it to the node(s) owning the
probed lists, merges the nodes' ADC shortlists under the single-box
(adc asc, id asc) cut, and takes top-k by (cos desc, id asc).

Identity argument (verified empirically per query here, exactly — ids
AND cosines): each node's local short_n cut is a superset of the
global cut's members within that node, so the merged relation contains
every global-shortlist row; re-applying the same cut over the union
reconstructs the single-box shortlist, and the re-rank reads the same
stored floats. The fleet answer is therefore the single-box answer by
construction — this probe turns that argument into a transcript.

Usage:
    SPARK_GRAFT_DRIVER_MEM=48g python tools/ann_fleet_probe.py \
        [--n 10000000] [--clusters 1024] [--n-lists 1024] \
        [--nprobe 32] [--shortlist 2048] [--queries 20] [--k 10]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ann_recall_probe import make_corpus  # noqa: E402  (same corpus model)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1_000_000)
    ap.add_argument("--dim", type=int, default=64)
    ap.add_argument("--clusters", type=int, default=256)
    ap.add_argument("--n-lists", type=int, default=256)
    ap.add_argument("--nprobe", type=int, default=8)
    ap.add_argument("--m", type=int, default=8)
    ap.add_argument("--n-codes", type=int, default=64)
    ap.add_argument("--queries", type=int, default=20)
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--shortlist", type=int, default=1024)
    args = ap.parse_args()

    from terrorblade_spark.operators.vector import (
        ivfpq_build,
        ivfpq_local_index,
        ivfpq_local_index_from_shards,
    )
    from terrorblade_spark.session import get_spark

    spark = get_spark("ann-fleet-probe")
    corpus, centers = make_corpus(spark, args.n, args.dim, args.clusters)
    corpus = corpus.persist()
    n = corpus.count()

    t0 = time.time()
    enc, cents, cb = ivfpq_build(
        corpus, n_lists=args.n_lists, m=args.m, n_codes=args.n_codes,
        seed=7, max_iter=10, train_fraction=0.05,
    )
    enc = enc.persist()
    enc.count()
    t_build = time.time() - t0

    shard_dir = tempfile.mkdtemp(prefix="ann_fleet_shards_")
    try:
        t0 = time.time()
        box = ivfpq_local_index(
            enc, cents, cb, m=args.m, shard_path=shard_dir
        )
        t_box = time.time() - t0
        # the corpus + encoded relations are no longer needed resident
        corpus.unpersist()
        enc.unpersist()
        half = args.n_lists // 2
        t0 = time.time()
        node_a = ivfpq_local_index_from_shards(
            shard_dir, cents, cb, m=args.m, list_range=(0, half)
        )
        node_b = ivfpq_local_index_from_shards(
            shard_dir, cents, cb, m=args.m, list_range=(half, args.n_lists)
        )
        t_nodes = time.time() - t0
        assert len(node_a.ids) + len(node_b.ids) == len(box.ids)
        assert node_a.lists.max(initial=-1) < half <= node_b.lists.min(
            initial=half
        )
        print(
            f"# shards={shard_dir} box_rows={len(box.ids)} "
            f"node_a_rows={len(node_a.ids)} node_b_rows={len(node_b.ids)} "
            f"box_mb={box.nbytes() / 1e6:.0f} "
            f"node_mb={node_a.nbytes() / 1e6:.0f}+{node_b.nbytes() / 1e6:.0f}",
            flush=True,
        )

        qrng = np.random.default_rng(999)
        identical = 0
        fleet_lat = []
        box_lat = []
        split_counts = []
        for qi in range(args.queries):
            c = qrng.integers(0, args.clusters)
            qvec = (centers[c] + qrng.standard_normal(args.dim)).tolist()
            q = np.asarray(qvec, dtype=np.float64)
            qn = float(np.linalg.norm(q))

            t0 = time.time()
            single = box.query_rows(
                qvec, args.k, nprobe=args.nprobe, shortlist=args.shortlist
            )
            box_lat.append(time.time() - t0)

            t0 = time.time()
            # router: ONE global probe from the replicated quantizer
            probe = node_a._probe_lists(q, qn, args.nprobe)
            own_a = [l for l in probe if l < half]
            own_b = [l for l in probe if l >= half]
            ids_l, adc_l, cos_l = [], [], []
            for node, own in ((node_a, own_a), (node_b, own_b)):
                if not own:
                    continue
                i_, a_, c_ = node.shortlist_rows(
                    qvec, args.nprobe, args.shortlist, probe_lids=own
                )
                ids_l.append(i_)
                adc_l.append(a_)
                cos_l.append(c_)
            ids = np.concatenate(ids_l) if ids_l else np.empty(0, np.int64)
            adc = np.concatenate(adc_l) if adc_l else np.empty(0)
            cos = np.concatenate(cos_l) if cos_l else np.empty(0)
            if len(ids) > args.shortlist:  # single-box cut over the union
                cut = np.lexsort((ids, adc))[: args.shortlist]
                ids, cos = ids[cut], cos[cut]
            top = np.lexsort((ids, -cos))[: args.k]
            fleet = [(int(ids[i]), float(cos[i])) for i in top]
            fleet_lat.append(time.time() - t0)

            same = fleet == [(i, c) for i, c in single]
            identical += same
            split_counts.append((len(own_a), len(own_b)))
            print(
                f"# q{qi}: probe_split={len(own_a)}a/{len(own_b)}b "
                f"fleet={fleet_lat[-1] * 1000:.1f}ms "
                f"box={box_lat[-1] * 1000:.1f}ms "
                f"{'identical' if same else 'DIVERGED'}",
                flush=True,
            )

        fleet_lat.sort()
        box_lat.sort()
        out = {
            "probe": "ann_fleet_2node",
            "n_vectors": int(n),
            "dim": args.dim,
            "n_lists": args.n_lists,
            "nprobe": args.nprobe,
            "shortlist": args.shortlist,
            "k": args.k,
            "queries": args.queries,
            "identical_topk": f"{identical}/{args.queries}",
            "t_index_build_s": round(t_build, 1),
            "t_box_load_s": round(t_box, 1),
            "t_two_node_load_s": round(t_nodes, 1),
            "node_rows": [int(len(node_a.ids)), int(len(node_b.ids))],
            "fleet_latency_median_ms": round(
                fleet_lat[len(fleet_lat) // 2] * 1000, 1
            ),
            "box_latency_median_ms": round(box_lat[len(box_lat) // 2] * 1000, 1),
            "mean_probe_split": [
                round(sum(a for a, _ in split_counts) / len(split_counts), 1),
                round(sum(b for _, b in split_counts) / len(split_counts), 1),
            ],
        }
        print(json.dumps(out))
    finally:
        shutil.rmtree(shard_dir, ignore_errors=True)


if __name__ == "__main__":
    main()
