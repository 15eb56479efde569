"""Synthetic hot-bucket probe for the round-11 population cap.

Builds (a) ONE adversarial bucket of N members — the case where the
round-10 shape collects a single N-element array in a non-spilling
ObjectHashAggregate buffer — and (b) the same N rows spread over many
small buckets (the normal regime), then drives bucket_pair_rows over
both with a production-sized cap.

The memory bound is structural (chunk = (rank-1) // cap inside the
groupBy key, so NO collected row can exceed cap by construction); what
the probe demonstrates is that the aggregation + expansion EXECUTES at
a population whose r10-shape buffer would be one N-element array, with
bounded chunk rows (asserted via max collected size on the hot case's
chunk relation) and the full pair count intact on the normal case.
The hot case's quadratic OUTPUT (C(N,2) pairs) is the semantics of a
hot bucket, not a memory object — the probe reads only a LIMIT slice
of it (explode early-out), because materializing ~4.5e12 pairs is not
a memory question.

Usage: python tools/hotbucket_probe_r11.py [n_members] [cap]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 3_000_000
    cap = int(sys.argv[2]) if len(sys.argv) > 2 else 65_536

    from pyspark.sql import functions as F

    from terrorblade_spark.operators.bucketpairs import bucket_pair_rows
    from terrorblade_spark.session import get_spark

    spark = get_spark("hotbucket-probe")

    # (a) one adversarial bucket of n members
    hot = spark.range(n).select(F.lit(1).alias("bkt"), F.col("id").alias("m"))
    t0 = time.perf_counter()
    pairs = bucket_pair_rows(hot, ["bkt"], "m", max_bucket_population=cap,
                             materialize=True)
    sample = pairs.limit(100).collect()
    t1 = time.perf_counter()
    assert len(sample) == 100 and all(r["a"] < r["b"] for r in sample)
    print(f"hot: ONE bucket of {n} members, cap {cap}: chunked+expanded, "
          f"100-pair slice in {t1 - t0:.1f}s", flush=True)

    # structural bound, checked empirically on the same shape (the
    # chunk relation is what bucket_pair_rows checkpoints/collects)
    from pyspark.sql import Window

    w = Window.partitionBy("bkt").orderBy("m")
    chunked = (
        hot.withColumn("__c", ((F.row_number().over(w) - 1) / cap).cast("long"))
        .groupBy("bkt", "__c")
        .agg(F.size(F.collect_list("m")).alias("sz"))
    )
    row = chunked.agg(
        F.max("sz").alias("mx"), F.count(F.lit(1)).alias("n_chunks")
    ).first()
    print(f"hot: max collected row {row['mx']} (cap {cap}), "
          f"{row['n_chunks']} chunks", flush=True)
    assert row["mx"] <= cap

    # (b) normal regime: same row count, many small buckets — full
    # pair count must be exact: 10 members/bucket -> 45 pairs each
    per = 10
    norm = spark.range(n).select(
        (F.col("id") / per).cast("long").alias("bkt"),
        F.col("id").alias("m"),
    )
    t0 = time.perf_counter()
    cnt = bucket_pair_rows(norm, ["bkt"], "m", max_bucket_population=cap,
                           materialize=True).count()
    t1 = time.perf_counter()
    expect = (n // per) * (per * (per - 1) // 2)
    print(f"normal: {n} rows / {n // per} buckets: {cnt} pairs "
          f"(expect {expect}) in {t1 - t0:.1f}s", flush=True)
    assert cnt == expect
    print("OK", flush=True)


if __name__ == "__main__":
    main()
