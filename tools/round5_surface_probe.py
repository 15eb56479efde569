"""Scale probe for the round-5 serving/eval surface: SFT extraction,
leakage-safe splitting, and distributed ranking metrics at 16x the
bench data. Results recorded in COVERAGE.md.

Usage: python tools/round5_surface_probe.py [sf_dir]
"""

from __future__ import annotations

import sys
import time

from pyspark.sql import Window
from pyspark.sql import functions as F

sys.path.insert(0, ".")

from terrorblade_spark.operators.dedup import minhash_lsh_candidates  # noqa: E402
from terrorblade_spark.operators.evalmetrics import ranking_metrics  # noqa: E402
from terrorblade_spark.operators.sampling import leakage_safe_split  # noqa: E402
from terrorblade_spark.operators.sft import conversation_pairs  # noqa: E402
from terrorblade_spark.operators.windows import sessionize  # noqa: E402
from terrorblade_spark.session import get_spark  # noqa: E402
from terrorblade_spark.tables import load_table  # noqa: E402

COPIES = 16


def main(sf_dir: str) -> None:
    spark = get_spark("round5-probe")
    reps = F.broadcast(spark.range(COPIES).withColumnRenamed("id", "rep"))

    # --- SFT extraction over 16x events (user_id shifted per replica) ---
    e = load_table(spark, sf_dir, "events")
    big_e = e.crossJoin(reps).select(
        (F.col("event_id") + F.col("rep") * 10_000_000).alias("event_id"),
        "ts",
        (F.col("user_id") + F.col("rep") * 1_000_000).alias("user_id"),
        "event_type",
        "props",
    ).persist()
    n_events = big_e.count()
    t0 = time.time()
    s = sessionize(big_e, "ts", ["user_id"], "event_id", gap="1 hour")
    pairs = conversation_pairs(
        s, ["user_id", "session_id"], ["ts", "event_id"],
        "event_type", "props", "event_id", context_size=4,
    )
    n_pairs = pairs.count()
    sft_s = time.time() - t0
    print(f"SFT: {n_events} events -> {n_pairs} pairs in {sft_s:.1f}s "
          f"({n_pairs / sft_s:,.0f} pairs/s)")
    big_e.unpersist()

    # --- leakage-safe split over 16x documents (suffix-varied) ---
    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    big_d = d.crossJoin(reps).select(
        (F.col("doc_id") + F.col("rep") * 10_000_000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" rep"), F.col("rep").cast("string")).alias("text"),
    ).persist()
    n_docs = big_d.count()
    t0 = time.time()
    edges = minhash_lsh_candidates(big_d, "doc_id", "text", num_hashes=32, bands=8)
    split = leakage_safe_split(big_d.select("doc_id"), "doc_id", edges, 0.1).persist()
    counts = {r.split: r.n for r in
              split.groupBy("split").agg(F.count("*").alias("n")).collect()}
    wall = time.time() - t0
    # distributed straddle check: every root must map to exactly one side
    straddlers = (
        split.groupBy("group_root")
        .agg(F.countDistinct("split").alias("k"))
        .where(F.col("k") > 1)
        .count()
    )
    print(f"leakage-safe split: {n_docs} docs in {wall:.1f}s, sides {counts}, "
          f"straddling components: {straddlers}")
    split.unpersist()
    big_d.unpersist()

    # --- ranking metrics at 100k queries x k=10 (synthetic rankings) ---
    from terrorblade_spark.functions.exprs import hash64

    n_q = 100_000
    base = spark.range(n_q * 10).select(
        (F.col("id") / 10).cast("long").alias("query_id"),
        (F.pmod(F.col("id"), 10) + 1).cast("int").alias("rank"),
    )
    truth = base.select("query_id", "rank",
                        (F.col("query_id") * 100 + F.col("rank")).alias("neighbor_id"))
    # results: same items, order scrambled by a seeded hash per query
    res = truth.withColumn(
        "rank",
        F.row_number().over(
            Window.partitionBy("query_id")
            .orderBy(hash64(F.col("neighbor_id").cast("string"), salt="perm"))
        ).cast("int"),
    )
    t0 = time.time()
    m = ranking_metrics(res, truth, k=10).agg(
        F.count(F.lit(1)).alias("n"),
        F.avg("recall_at_k").alias("recall"),
        F.avg("ndcg_at_k").alias("ndcg"),
    ).collect()[0]
    wall = time.time() - t0
    print(f"ranking_metrics: {m.n:,} queries scored in {wall:.1f}s "
          f"(recall {m.recall:.3f}, ndcg {m.ndcg:.3f} — same items, permuted order)")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1")
