"""Model persistence: fitted artifacts (n-gram LM tables, BM25 index
relations, IVF centroids, PQ codebooks) are all plain DataFrames, so
persistence is parquet + a small JSON sidecar for scalar params. Fit
once on the corpus snapshot, score every ingest batch from the saved
model — refitting per batch is both wasted compute and a moving
target for comparability.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import SparkSession

from terrorblade_spark.operators.lm import NgramLM
from terrorblade_spark.operators.search import Bm25Index

_META = "_model_meta.json"


def _write_meta(path: str, meta: dict) -> None:
    os.makedirs(path, exist_ok=True)
    with open(os.path.join(path, _META), "w") as fh:
        json.dump(meta, fh)


def _read_meta(path: str) -> dict:
    with open(os.path.join(path, _META)) as fh:
        return json.load(fh)


def save_lm(lm: NgramLM, path: str) -> None:
    lm.unigrams.write.mode("overwrite").parquet(os.path.join(path, "unigrams"))
    lm.bigrams.write.mode("overwrite").parquet(os.path.join(path, "bigrams"))
    _write_meta(path, {"kind": "ngram_lm", "oov_logp": lm.oov_logp})


def load_lm(spark: SparkSession, path: str) -> NgramLM:
    meta = _read_meta(path)
    if meta.get("kind") != "ngram_lm":
        raise ValueError(f"{path} holds {meta.get('kind')!r}, not an ngram_lm")
    return NgramLM(
        unigrams=spark.read.parquet(os.path.join(path, "unigrams")).persist(),
        bigrams=spark.read.parquet(os.path.join(path, "bigrams")).persist(),
        oov_logp=float(meta["oov_logp"]),
    )


def save_bm25(index: Bm25Index, path: str) -> None:
    """Postings land partitioned by a term hash bucket so a query's
    handful of terms prunes to a few files (the at-rest form of the
    query-term semi-join)."""
    from pyspark.sql import functions as F

    (
        index.postings.withColumn("term_bucket", F.pmod(F.hash("term"), F.lit(64)))
        .write.mode("overwrite")
        .partitionBy("term_bucket")
        .parquet(os.path.join(path, "postings"))
    )
    index.doclen.write.mode("overwrite").parquet(os.path.join(path, "doclen"))
    index.stats.write.mode("overwrite").parquet(os.path.join(path, "stats"))
    _write_meta(path, {"kind": "bm25"})


def load_bm25(spark: SparkSession, path: str) -> Bm25Index:
    meta = _read_meta(path)
    if meta.get("kind") != "bm25":
        raise ValueError(f"{path} holds {meta.get('kind')!r}, not a bm25 index")
    return Bm25Index(
        postings=spark.read.parquet(os.path.join(path, "postings")).drop("term_bucket").persist(),
        doclen=spark.read.parquet(os.path.join(path, "doclen")).persist(),
        stats=spark.read.parquet(os.path.join(path, "stats")).persist(),
    )
