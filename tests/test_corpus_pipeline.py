"""CorpusPipeline facade: the full curate -> dedup -> pack flow over
the documents table, plus the quality-canonical variant."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from terrorblade_spark.corpus import CorpusPipeline
from terrorblade_spark.tables import load_table


@pytest.fixture(scope="module")
def pipe(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    # simulated re-crawl so dedup has real work
    recrawl = docs.select((F.col("doc_id") + 1_000_000).alias("doc_id"), "text")
    return CorpusPipeline(spark, docs.unionByName(recrawl))


def test_full_flow_and_report(spark, pipe):
    curated = pipe.curate(lm_buckets=3)
    assert {"keep", "mean_nll", "ppl_bucket"} <= set(curated.columns)

    deduped = pipe.dedup(curated.where("keep"))
    packed = pipe.chunk_and_pack(deduped)
    report = pipe.report(curated, deduped, packed).first()

    assert report["n_input"] == pipe.docs.count()
    assert report["n_kept"] + report["n_rejected"] == report["n_input"]
    # every doc has a byte-identical twin -> at least half are duplicates
    assert report["dup_frac"] >= 0.5
    assert report["n_packed_bins"] > 0
    assert report["n_canonical"] > 0


def test_quality_canonical_prefers_high_score(spark, pipe):
    curated = pipe.curate(lm_buckets=0).where("keep")
    # quality = doc_id (so the RE-CRAWL copy, +1e6, must win each pair)
    scored = curated.withColumn("quality", F.col("doc_id").cast("double"))
    deduped = pipe.dedup(scored, quality_col="quality")
    canon = deduped.where(~F.col("is_duplicate"))
    # all surviving canonicals of exact twins come from the re-crawl
    twin_canon = canon.where(F.col("doc_id") >= 1_000_000).count()
    base_canon = canon.where(F.col("doc_id") < 1_000_000).count()
    assert twin_canon > 0
    assert base_canon < twin_canon


def test_materialized_sequences(spark, pipe):
    deduped = pipe.dedup()
    seqs = pipe.chunk_and_pack(deduped, materialize=True, budget=512, max_tokens=128)
    row = seqs.first()
    assert row["n_tokens"] <= 512
    assert row["text"]


def test_curate_with_boilerplate_removal(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.concat(F.col("text"), F.lit("\nSUBSCRIBE TO OUR NEWSLETTER")).alias("text")
    )
    pipe = CorpusPipeline(spark, docs)
    out = pipe.curate(boilerplate_line_df=0.1)
    # the injected banner (df = 100%) is stripped before quality rules
    assert out.where(F.col("text").contains("SUBSCRIBE")).count() == 0
    assert out.where("n_removed_lines >= 1").count() == docs.count()
