"""Scale probe: degree-ordered triangle counting under a planted hub.

The claim behind operators/graph.triangle_count: orienting each edge
from its lower-(degree, id) endpoint bounds every wedge pivot's
fan-out, so a web-scale hub never becomes a quadratic pivot. This
probe plants a hub of degree H in a random background graph and
measures (a) the oriented wedge count vs the naive pivot-at-every-
vertex wedge count (which grows C(H,2)), and (b) wall time as H grows
while the oriented wedge count stays flat.

Usage: python tools/triangle_probe.py
Results recorded in COVERAGE.md.
"""

from __future__ import annotations

import sys
import time

from pyspark.sql import functions as F

sys.path.insert(0, ".")

from terrorblade_spark.operators.graph import triangle_count  # noqa: E402
from terrorblade_spark.session import get_spark  # noqa: E402

N_NODES = 100_000
N_BG = 300_000


def build_edges(spark, hub_degree: int):
    bg = (
        spark.range(N_BG)
        .select(
            F.expr("conv(substring(md5(cast(id as string)),1,15),16,10)").cast("long")
            .alias("h1"),
            F.expr("conv(substring(md5(concat('b/', cast(id as string))),1,15),16,10)")
            .cast("long")
            .alias("h2"),
        )
        .select((F.col("h1") % N_NODES + 1).alias("src"), (F.col("h2") % N_NODES + 1).alias("dst"))
    )
    hub = spark.range(hub_degree).select(
        F.lit(0).cast("long").alias("src"), (F.col("id") % N_NODES + 1).alias("dst")
    )
    return bg.unionByName(hub)


def wedge_counts(spark, edges):
    """Oriented vs naive wedge counts (both exact, driver-side sums of
    per-node C(d,2) — cheap aggregates, no wedge materialization)."""
    und = (
        edges.where(F.col("src") != F.col("dst"))
        .select(F.least("src", "dst").alias("u"), F.greatest("src", "dst").alias("v"))
        .distinct()
    )
    deg = (
        und.select(F.col("u").alias("n")).unionByName(und.select(F.col("v").alias("n")))
        .groupBy("n").agg(F.count(F.lit(1)).alias("d"))
    )
    naive = deg.agg(F.sum(F.col("d") * (F.col("d") - 1) / 2).alias("w")).first()["w"]
    du = deg.select(F.col("n").alias("u"), F.col("d").alias("du"))
    dv = deg.select(F.col("n").alias("v"), F.col("d").alias("dv"))
    lower = (F.col("du") < F.col("dv")) | ((F.col("du") == F.col("dv")) & (F.col("u") < F.col("v")))
    odeg = (
        und.join(du, "u").join(dv, "v")
        .select(F.when(lower, F.col("u")).otherwise(F.col("v")).alias("s"))
        .groupBy("s").agg(F.count(F.lit(1)).alias("d"))
    )
    oriented = odeg.agg(F.sum(F.col("d") * (F.col("d") - 1) / 2).alias("w")).first()["w"]
    return int(naive), int(oriented)


def main() -> None:
    spark = get_spark("triangle-probe")
    for hub in (5_000, 50_000):
        edges = build_edges(spark, hub)
        naive, oriented = wedge_counts(spark, edges)
        t0 = time.time()
        total = triangle_count(edges).agg(F.sum("n_triangles")).first()[0] // 3
        dt = time.time() - t0
        print(
            f"hub={hub:,}: naive wedges {naive:,} vs oriented {oriented:,} "
            f"({naive / oriented:,.0f}x fewer); {total:,} triangles in {dt:.1f}s"
        )
    spark.stop()


if __name__ == "__main__":
    main()
