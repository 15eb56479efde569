"""Scale probe for the round-5 curation operators: DSIR importance
resampling over a 16x spam-polluted crawl, and SemDeDup over 16x
rotated embedding replicas with planted semantic twins. Results
recorded in COVERAGE.md.

Usage: python tools/dsir_semdedup_probe.py [sf_dir]
"""

from __future__ import annotations

import sys
import time

from pyspark.sql import functions as F

sys.path.insert(0, ".")

from terrorblade_spark.operators.dedup import semantic_dedup  # noqa: E402
from terrorblade_spark.operators.dsir import dsir_sample  # noqa: E402
from terrorblade_spark.session import get_spark  # noqa: E402
from terrorblade_spark.tables import load_table  # noqa: E402

COPIES = 16
SPAM = " buy now cheap click free prize winner offer deal sale" * 3


def probe_dsir(spark, sf_dir: str) -> None:
    """A mixed crawl: 16 replicas of the corpus, half with spam
    vocabulary injected. Target = the clean base corpus. DSIR must
    pull the sample toward the clean replicas."""
    base = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    reps = spark.range(COPIES).withColumnRenamed("id", "rep")
    raw = (
        base.crossJoin(F.broadcast(reps))
        .select(
            (F.col("doc_id") + F.col("rep") * 10_000_000).alias("doc_id"),
            F.when(
                F.col("rep") % 2 == 1,
                F.concat(F.col("text"), F.lit(SPAM), (F.col("rep")).cast("string")),
            )
            .otherwise(F.concat(F.col("text"), F.lit(" rep"), F.col("rep").cast("string")))
            .alias("text"),
            (F.col("rep") % 2 == 1).alias("is_spam"),
        )
        .persist()
    )
    n = raw.count()
    spam_frac = raw.where("is_spam").count() / n

    t0 = time.time()
    sel = dsir_sample(raw.select("doc_id", "text"), base, k=5000).persist()
    k = sel.count()
    wall = time.time() - t0
    sel_spam = sel.join(raw.select("doc_id", "is_spam"), "doc_id").where("is_spam").count()
    print(
        f"DSIR: {n} docs ({spam_frac:.2f} spam) -> k={k} in {wall:.1f}s; "
        f"selected spam fraction {sel_spam / k:.4f}"
    )
    sel.unpersist()
    raw.unpersist()


def probe_semdedup(spark, sf_dir: str) -> None:
    """16 circularly-shifted replicas of the embeddings (a shift is a
    rotation: within-replica geometry exact, cross-replica vectors
    decorrelated), then every 10th vector gets a scaled twin (cosine
    exactly 1). Recall of the planted twins is the correctness check;
    wall time at ~35k vectors is the scale number."""
    base = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    dims = len(base.first().embedding)
    reps = spark.range(COPIES).withColumnRenamed("id", "rep")
    shifted = (
        base.crossJoin(F.broadcast(reps))
        .select(
            (F.col("vec_id") + F.col("rep") * 1_000_000).alias("vec_id"),
            F.concat(
                F.slice(F.col("embedding"), (F.col("rep") % dims) + 1, dims),
                F.slice(F.col("embedding"), F.lit(1), F.col("rep") % dims),
            ).alias("embedding"),
        )
    )
    twins = shifted.where(F.col("vec_id") % 10 == 0).select(
        (F.col("vec_id") + 100_000_000).alias("vec_id"),
        F.transform(F.col("embedding"), lambda x: x * 1.01).alias("embedding"),
    )
    full = shifted.unionByName(twins).persist()
    n = full.count()
    n_twins = full.where(F.col("vec_id") >= 100_000_000).count()

    t0 = time.time()
    out = semantic_dedup(
        full,
        threshold=0.999,
        n_clusters=int(n**0.5),
        train_fraction=0.1,
    ).persist()
    n_dups = out.where("is_duplicate").count()
    wall = time.time() - t0
    pairs = out.select(
        F.col("vec_id").alias("tid"), F.col("canonical_id").alias("tc")
    ).where(F.col("tid") >= 100_000_000)
    src = out.select(F.col("vec_id").alias("sid"), F.col("canonical_id").alias("sc"))
    caught = (
        pairs.join(src, pairs.tid - 100_000_000 == src.sid)
        .where(F.col("tc") == F.col("sc"))
        .count()
    )
    print(
        f"SemDeDup: {n} vectors ({n_twins} planted twins, {int(n**0.5)} clusters) "
        f"in {wall:.1f}s; {n_dups} flagged duplicate; planted-twin recall {caught / n_twins:.3f}"
    )
    out.unpersist()
    full.unpersist()


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("dsir-semdedup-probe")
    spark.sparkContext.setLogLevel("ERROR")
    probe_dsir(spark, sf_dir)
    probe_semdedup(spark, sf_dir)


if __name__ == "__main__":
    main()
