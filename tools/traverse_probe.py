"""Scale probe: BFS reach + label propagation + association rules on
synthetic data well beyond gate scale.

- BFS / LPA run on the same seeded power-law digraph as
  tools/pagerank_probe.py (2M edges default) — per-hop/round wall
  times, frontier sizes, and structural invariants (distances
  monotone by construction; LPA labels are member ids).
- association_rules runs on synthetic baskets with a deliberate
  HOT basket (10k items) to prove the fused row-local expansion +
  deterministic cap bound the quadratic blowup.

Usage: python tools/traverse_probe.py [n_nodes] [avg_degree]
Results recorded in COVERAGE.md.
"""

from __future__ import annotations

import sys
import time

from pyspark.sql import functions as F

sys.path.insert(0, ".")

from tools.pagerank_probe import build_edges  # noqa: E402
from terrorblade_spark.operators.assoc import association_rules  # noqa: E402
from terrorblade_spark.operators.graph import bfs_distances, label_propagation  # noqa: E402
from terrorblade_spark.session import get_spark  # noqa: E402


def main(n_nodes: int, avg_deg: int) -> None:
    spark = get_spark("traverse-probe")
    n_edges = n_nodes * avg_deg
    edges = build_edges(spark, n_nodes, avg_deg)

    # --- BFS from the top hub neighborhood ---------------------------------
    seeds = spark.range(10).select(F.col("id").alias("node"))
    t0 = time.time()
    dist = bfs_distances(edges, seeds, max_hops=6)
    per_hop = {
        r["distance"]: r["n"]
        for r in dist.groupBy("distance").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    dt = time.time() - t0
    reached = sum(per_hop.values())
    print(
        f"bfs: {n_edges:,} edges, 6 hops in {dt:.1f}s — reached {reached:,}/"
        f"{n_nodes:,} nodes; frontier sizes {per_hop}"
    )
    assert per_hop.get(0) == 10
    # out-degrees are uniform (~avg_deg), so the frontier grows about
    # avg_deg-fold per hop from the 10 seeds — geometric expansion,
    # sanity-checked as strict monotone growth
    fronts = [per_hop[h] for h in sorted(per_hop)]
    assert all(a < b for a, b in zip(fronts, fronts[1:])), per_hop

    # --- label propagation --------------------------------------------------
    t0 = time.time()
    labels = label_propagation(edges, n_iter=4)
    agg = labels.agg(
        F.count(F.lit(1)).alias("n"), F.countDistinct("community").alias("k")
    ).collect()[0]
    dt = time.time() - t0
    print(
        f"lpa: 4 rounds in {dt:.1f}s ({dt / 4:.2f}s/round) — "
        f"{agg['n']:,} nodes -> {agg['k']:,} communities"
    )
    # labels must be member node ids (the canonical-id convention)
    bad = labels.join(
        labels.select(F.col("node").alias("community")).distinct(),
        "community",
        "left_anti",
    ).count()
    assert bad == 0, f"{bad} labels are not member ids"

    # --- association rules with a hot basket -------------------------------
    # 200k baskets x ~5 items, plus ONE basket holding 10k distinct
    # items: uncapped it alone would expand to ~50M pairs; the cap
    # bounds it to max_basket_items^2/2
    norm = (
        spark.range(1_000_000)
        .select(
            (F.col("id") % 200_000).alias("bk"),
            F.expr(
                "cast(conv(substring(md5(cast(id as string)),1,15),16,10) % 2000 as long)"
            ).alias("it"),
        )
    )
    hot = spark.range(10_000).select(
        F.lit(999_999_999).alias("bk"), (F.col("id") + 10_000).alias("it")
    )
    baskets = norm.unionByName(hot)
    t0 = time.time()
    rules = association_rules(
        baskets, "bk", "it", min_pair_support=5, max_basket_items=64
    )
    n_rules = rules.count()
    dt = time.time() - t0
    print(
        f"assoc: 1M basket lines (+1 hot basket of 10k items), cap=64 -> "
        f"{n_rules:,} rules (support>=5) in {dt:.1f}s"
    )
    # the hot basket contributes at most C(64,2) pair instances, each
    # support-1 — none can appear in the support>=5 rule set
    assert rules.where(F.col("item_a") >= 10_000).count() == 0


if __name__ == "__main__":
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 400_000
    d = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    main(n, d)
