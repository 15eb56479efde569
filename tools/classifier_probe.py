"""Quality-classifier scale probe: train + score the hashed-ngram
logistic model at 16x the bench corpus (80k real docs + 80k synthetic
junk docs = 160k rows), measuring fit wall-time, scoring throughput,
and held-out accuracy. Results recorded in COVERAGE.md.

Usage: python tools/classifier_probe.py [sf_dir]
"""

from __future__ import annotations

import sys
import time

from pyspark.sql import functions as F

sys.path.insert(0, ".")

from terrorblade_spark.operators.classifier import (  # noqa: E402
    score_quality,
    train_quality_classifier,
)
from terrorblade_spark.session import get_spark  # noqa: E402
from terrorblade_spark.tables import load_table  # noqa: E402

COPIES = 16
SPAM = "buy now cheap click free prize winner offer deal sale"


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("classifier-probe")
    base = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    n_base = base.count()

    reps = spark.range(COPIES).withColumnRenamed("id", "rep")
    good = (
        base.crossJoin(F.broadcast(reps))
        .select(
            (F.col("doc_id") + F.col("rep") * 10_000_000).alias("doc_id"),
            F.concat(F.col("text"), F.lit(" rep"), F.col("rep")).alias("text"),
            F.lit(1.0).alias("label"),
            F.col("rep"),
        )
    )
    # junk twin: same volume, spam vocabulary with per-row variation
    junk = (
        base.crossJoin(F.broadcast(reps))
        .select(
            (F.col("doc_id") + F.col("rep") * 10_000_000 + 500_000_000).alias("doc_id"),
            F.concat(
                F.lit(SPAM + " " + SPAM + " " + SPAM + " tag"),
                (F.col("doc_id") % 97).cast("string"),
            ).alias("text"),
            F.lit(0.0).alias("label"),
            F.col("rep"),
        )
    )
    full = good.unionByName(junk).persist()
    n = full.count()
    train = full.where(F.col("rep") != 0).drop("rep")
    test = full.where(F.col("rep") == 0).drop("rep")

    t0 = time.time()
    model = train_quality_classifier(train, max_iter=30)
    fit_s = time.time() - t0

    t0 = time.time()
    scored = score_quality(model, test).persist()
    n_test = scored.count()
    score_s = time.time() - t0
    correct = scored.where(
        ((F.col("quality_score") >= 0.5) & (F.col("label") == 1.0))
        | ((F.col("quality_score") < 0.5) & (F.col("label") == 0.0))
    ).count()
    print(
        f"base_docs={n_base} corpus={n} train={n - n_test} test={n_test} "
        f"fit={fit_s:.1f}s score={score_s:.1f}s "
        f"({n_test / score_s:.0f} docs/s) holdout_acc={correct / n_test:.4f}"
    )


if __name__ == "__main__":
    main()
