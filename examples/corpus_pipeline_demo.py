"""End-to-end LLM-data pipeline demo: curate -> learned quality gate ->
dedup -> sample -> chunk/pack, all as lazy Spark plans over the
documents table. Runs against the driver testdata:

    python examples/corpus_pipeline_demo.py [sf_dir]

(The reference's demo surface is examples/analyze_dialogues.py — an
interactive TUI; this engine's demo is the batch pipeline a 100 TB
training-data deployment actually runs.)
"""

from __future__ import annotations

import os
import sys

from pyspark.sql import functions as F

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from terrorblade_spark.corpus import CorpusPipeline  # noqa: E402
from terrorblade_spark.operators.classifier import train_quality_classifier  # noqa: E402
from terrorblade_spark.session import get_spark  # noqa: E402
from terrorblade_spark.tables import load_table  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("corpus-demo")
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")

    # a quick weak-supervision quality model: long docs ~ "good",
    # short docs ~ "junk" (stand-in for real labeled data)
    labeled = docs.withColumn(
        "label", (F.length("text") > 200).cast("double")
    )
    model = train_quality_classifier(labeled, n_features=1 << 14, max_iter=20)

    pipe = CorpusPipeline(spark, docs)
    curated = pipe.curate(redact=True, quality_model=model, min_words=5)
    kept = curated.where("keep")
    # line-level keep-first dedup (q103 recipe) before document dedup:
    # repeated boilerplate lines vanish, raising MinHash precision
    line_clean = pipe.dedup_lines(kept.select("doc_id", "text")).persist()
    line_clean.agg(F.sum("n_removed_lines").alias("dup_lines_removed")).show()
    deduped = pipe.dedup(line_clean.select("doc_id", "text"))

    # rebalance languages by whole-epoch repetition (q101 recipe)
    # before sequence packing, so the dominant language doesn't drown
    # the rest of the mix
    lang = load_table(spark, sf_dir, "documents").select("doc_id", "lang")
    balanced = pipe.balance(
        deduped.where(~F.col("is_duplicate")).join(lang, "doc_id"),
        group_col="lang",
    )
    balanced.groupBy("lang", "n_epochs").count().orderBy("lang").show()

    packed = pipe.chunk_and_pack(deduped, budget=512)

    # the audit row is the artifact a curation run ships
    pipe.report(curated, deduped, packed).show(truncate=False)

    # terminal stage: trainer-ready JSONL shards + manifest
    import tempfile

    out = tempfile.mkdtemp(prefix="corpus_shards_")
    manifest = pipe.export(
        deduped.where(~F.col("is_duplicate")).select("doc_id", "text"),
        f"{out}/data", n_shards=4,
    )
    print(f"exported to {out}/data:")
    manifest.orderBy("shard").show()


if __name__ == "__main__":
    main()
