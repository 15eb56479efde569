"""BPE scale probe: word-frequency pass + merge-loop timing on the
bench corpus, then distributed encode throughput at 16x.

Usage: python tools/bpe_probe.py [sf_dir]
"""

from __future__ import annotations

import sys
import time

from pyspark.sql import functions as F

sys.path.insert(0, ".")

from terrorblade_spark.operators.bpe import bpe_encode, learn_bpe, word_frequencies  # noqa: E402
from terrorblade_spark.session import get_spark  # noqa: E402
from terrorblade_spark.tables import load_table  # noqa: E402

COPIES = 16
N_MERGES = 1000
N_MERGES_SUB = 25  # subword regime for the tiny synthetic vocab


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("bpe-probe")
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")

    t0 = time.time()
    wf = word_frequencies(docs).persist()
    n_words = wf.count()
    wf_s = time.time() - t0

    t0 = time.time()
    merges = learn_bpe(wf, N_MERGES)
    learn_s = time.time() - t0
    merges_sub = learn_bpe(wf, N_MERGES_SUB)

    reps = spark.range(COPIES).withColumnRenamed("id", "rep")
    big = docs.crossJoin(F.broadcast(reps)).select(
        (F.col("doc_id") + F.col("rep") * 10_000_000).alias("doc_id"), "text"
    )
    t0 = time.time()
    enc = bpe_encode(big, merges)
    stats = enc.agg(
        F.count(F.lit(1)).alias("docs"),
        F.sum(F.size("bpe_tokens")).alias("subword"),
        F.sum(F.size(F.split(F.col("text"), r"\s+"))).alias("ws"),
    ).first()
    enc_s = time.time() - t0
    sub = bpe_encode(big, merges_sub).agg(
        F.sum(F.size("bpe_tokens")).alias("subword"),
        F.sum(F.size(F.split(F.col("text"), r"\s+"))).alias("ws"),
    ).first()
    print(
        f"vocab_words={n_words} wf_pass={wf_s:.1f}s learn({N_MERGES} merges)={learn_s:.1f}s "
        f"encode_16x: {stats['docs']} docs in {enc_s:.1f}s ({stats['docs']/enc_s:.0f} docs/s), "
        f"inflation@{N_MERGES}={stats['subword']/stats['ws']:.2f} "
        f"inflation@{N_MERGES_SUB}={sub['subword']/sub['ws']:.2f} subword/ws-token"
    )


if __name__ == "__main__":
    main()
