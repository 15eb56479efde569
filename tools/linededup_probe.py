"""Scale probe: corpus-wide keep-first line dedup at 16x bench data.

Builds an 80k-doc corpus of multi-line documents where 25% of lines
are drawn from a small shared-boilerplate pool (the web-corpus shape:
nav menus, footers, disclaimers) and the rest are unique. Measures
dedup_lines end-to-end and verifies the exact keep-first invariant:
every distinct non-blank line survives exactly once corpus-wide.

Usage: python tools/linededup_probe.py [sf_dir]
Results recorded in COVERAGE.md.
"""

from __future__ import annotations

import sys
import time

from pyspark.sql import functions as F

sys.path.insert(0, ".")

from terrorblade_spark.operators.curation import dedup_lines  # noqa: E402
from terrorblade_spark.session import get_spark  # noqa: E402
from terrorblade_spark.tables import load_table  # noqa: E402

COPIES = 16
N_BOILER = 50  # shared pool size — each ~in 2% of docs


def main(sf_dir: str) -> None:
    spark = get_spark("linededup-probe")
    reps = F.broadcast(spark.range(COPIES).withColumnRenamed("id", "rep"))
    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    # 5-line docs: unique head, boilerplate, unique body, blank, boilerplate
    big = (
        d.crossJoin(reps)
        .select(
            (F.col("doc_id") + F.col("rep") * 10_000_000).alias("doc_id"),
            F.concat_ws(
                "\n",
                F.concat(F.lit("head "), (F.col("doc_id") + F.col("rep") * 10_000_000)),
                F.concat(F.lit("NAV MENU "), (F.col("doc_id") % N_BOILER)),
                F.col("text"),
                F.lit(""),
                F.concat(F.lit("FOOTER "), ((F.col("doc_id") + 7) % N_BOILER)),
            ).alias("text"),
        )
        .persist()
    )
    n_docs = big.count()

    t0 = time.time()
    out = dedup_lines(big)
    stats = out.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("n_removed_lines").alias("removed"),
    ).collect()[0]
    dt = time.time() - t0
    print(
        f"dedup_lines: {n_docs:,} docs ({n_docs * 5:,} lines) in {dt:.1f}s "
        f"({n_docs / dt:,.0f} docs/s); {stats['removed']:,} duplicate lines removed"
    )
    assert stats["n"] == n_docs

    # exact invariant: every distinct non-blank trimmed line survives
    # exactly once corpus-wide
    survivors = (
        out.select(F.posexplode(F.split("text", "\n")).alias("p", "line"))
        .where(F.length(F.trim("line")) > 0)
        .groupBy(F.trim("line").alias("l"))
        .agg(F.count(F.lit(1)).alias("c"))
    )
    dup_survivors = survivors.where(F.col("c") > 1).count()
    n_distinct_in = (
        big.select(F.explode(F.split("text", "\n")).alias("line"))
        .where(F.length(F.trim("line")) > 0)
        .select(F.trim("line")).distinct().count()
    )
    n_survivors = survivors.count()
    print(f"survivors: {n_survivors:,} distinct lines (input distinct {n_distinct_in:,}); "
          f"multi-survivors: {dup_survivors}")
    assert dup_survivors == 0 and n_survivors == n_distinct_in
    big.unpersist()
    spark.stop()


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1")
