"""Scale probe for the late-round-5 preference/balancing surface:
DPO preference-pair extraction and epoch-repetition balancing at 16x
the bench data. Results recorded in COVERAGE.md.

Usage: python tools/preference_balance_probe.py [sf_dir]
"""

from __future__ import annotations

import sys
import time

from pyspark.sql import functions as F

sys.path.insert(0, ".")

from terrorblade_spark.operators.sampling import repeat_to_balance  # noqa: E402
from terrorblade_spark.operators.sft import preference_pairs  # noqa: E402
from terrorblade_spark.session import get_spark  # noqa: E402
from terrorblade_spark.tables import load_table  # noqa: E402

COPIES = 16


def main(sf_dir: str) -> None:
    spark = get_spark("pref-balance-probe")
    reps = F.broadcast(spark.range(COPIES).withColumnRenamed("id", "rep"))

    # --- DPO extraction over 16x events (user_id shifted per replica,
    # so group count scales with the corpus; per-group size constant) ---
    e = load_table(spark, sf_dir, "events")
    big_e = e.crossJoin(reps).select(
        (F.col("event_id") + F.col("rep") * 10_000_000).alias("event_id"),
        (F.col("user_id") + F.col("rep") * 1_000_000).alias("user_id"),
        "event_type", "value", "props",
    ).persist()
    n_events = big_e.count()
    t0 = time.time()
    pairs = preference_pairs(
        big_e, ["user_id", "event_type"], "value", "event_id",
        payload_cols=["props"], margin=0.5,
    )
    n_pairs = pairs.count()
    dt = time.time() - t0
    print(f"DPO: {n_events:,} events -> {n_pairs:,} pairs in {dt:.1f}s "
          f"({n_events / dt:,.0f} events/s)")
    big_e.unpersist()

    # --- epoch balancing over 16x documents ---
    d = load_table(spark, sf_dir, "documents").select("doc_id", "lang", "text")
    big_d = d.crossJoin(reps).select(
        (F.col("doc_id") + F.col("rep") * 10_000_000).alias("doc_id"),
        "lang", "text",
    ).persist()
    n_docs = big_d.count()
    t0 = time.time()
    out = repeat_to_balance(big_d, "lang", max_epochs=4)
    n_out = out.count()
    dt = time.time() - t0
    print(f"balance: {n_docs:,} docs -> {n_out:,} epoch-rows in {dt:.1f}s "
          f"({n_docs / dt:,.0f} docs/s)")
    big_d.unpersist()

    # --- hot-prompt skew probe: one prompt with 1M candidates among
    # 10k normal groups. A window-based extraction would sort and carry
    # all 1M rows of the hot group through the shuffle; the aggregate
    # keeps constant state per group, so the hot key costs ~nothing. ---
    n_hot, n_groups = 1_000_000, 10_000
    cand = spark.range(n_hot + n_groups * 10).select(
        F.col("id").alias("cand_id"),
        F.when(F.col("id") < n_hot, F.lit(0))
        .otherwise((F.col("id") % n_groups) + 1)
        .alias("prompt"),
        (F.pmod(F.hash(F.col("id")), 1000) / 1000.0).alias("score"),
    ).persist()
    cand.count()
    t0 = time.time()
    out = preference_pairs(cand, ["prompt"], "score", "cand_id")
    n = out.count()
    dt = time.time() - t0
    print(f"skew: 1 hot prompt x {n_hot:,} cands + {n_groups:,} groups "
          f"-> {n:,} pairs in {dt:.1f}s")
    cand.unpersist()


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1")
