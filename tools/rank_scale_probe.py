"""Scale probe: distributed_rank (range partition + k-row broadcast
offsets) vs the single-partition global_renumber window at 10M rows.

The single-partition window funnels EVERY row through one task — the
shape that works on a laptop and dies on a cluster. distributed_rank
pays two narrow passes instead; this probe measures the crossover on
one box and verifies the two produce identical ranks.

Usage: python tools/rank_scale_probe.py [n_rows]
Results recorded in COVERAGE.md.
"""

from __future__ import annotations

import sys
import time

from pyspark.sql import functions as F

sys.path.insert(0, ".")

from terrorblade_spark.operators.windows import distributed_rank, global_renumber  # noqa: E402
from terrorblade_spark.session import get_spark  # noqa: E402


def main(n: int) -> None:
    spark = get_spark("rank-scale-probe")
    # total order: a non-monotone sort key + unique id tie-break
    df = (
        spark.range(n)
        .withColumn("key", F.expr("conv(substring(md5(cast(id as string)),1,15),16,10)").cast("long"))
        .select("id", "key")
        .persist()
    )
    df.count()

    t0 = time.time()
    dr = distributed_rank(df, ["key", "id"], out_col="rank")
    agg_d = dr.agg(
        F.count(F.lit(1)).alias("n"),
        F.min("rank").alias("mn"),
        F.max("rank").alias("mx"),
        # decimal accumulator: rank*key products overflow long under ANSI
        F.sum((F.col("rank") * (F.col("key") % 1_000_003)).cast("decimal(38,0)")).alias("chk"),
    ).collect()[0]
    t_dist = time.time() - t0
    assert agg_d["n"] == n and agg_d["mn"] == 0 and agg_d["mx"] == n - 1
    print(f"distributed_rank: {n:,} rows in {t_dist:.1f}s ({n / t_dist:,.0f} rows/s)")

    t0 = time.time()
    gr = global_renumber(df, ["key", "id"], out_col="rank")
    agg_s = gr.agg(
        F.count(F.lit(1)).alias("n"),
        F.min("rank").alias("mn"),
        F.max("rank").alias("mx"),
        # decimal accumulator: rank*key products overflow long under ANSI
        F.sum((F.col("rank") * (F.col("key") % 1_000_003)).cast("decimal(38,0)")).alias("chk"),
    ).collect()[0]
    t_single = time.time() - t0
    print(f"single-partition window: {n:,} rows in {t_single:.1f}s ({n / t_single:,.0f} rows/s)")

    # identical assignment: same (rank*key) checksum over the full relation
    assert agg_d["chk"] == agg_s["chk"], (agg_d["chk"], agg_s["chk"])
    print(f"checksums agree: {agg_d['chk']}")
    print(f"ratio single/distributed: {t_single / t_dist:.2f}x")
    df.unpersist()
    spark.stop()


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 10_000_000)
