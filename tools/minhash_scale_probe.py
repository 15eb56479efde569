"""Text-dedup decade probe: MinHash-LSH at 10M documents.

The committed dedup evidence (COVERAGE.md) tops out at 1M docs via the
corpus-pipeline probe; this runs the standalone text-dedup legs one
decade past that, with ANALYTIC ground truth:

- 10M base docs of ``doc_words`` words drawn (seeded, pure function of
  doc id) from a ``vocab`` word universe — random-word docs make
  cross-doc shingle collisions vanishingly rare, so every candidate
  pair the probe finds must be a planted one (measured, not assumed:
  ``alien_candidates`` is reported and must be ~0).
- ``twins`` planted near-dup pairs: twin = base with exactly ONE word
  replaced. Word-trigram shingles lose <= shingle_n positions each
  side, so true Jaccard >= (w-1-2n)/(w-1+2n) exactly — at the defaults
  (w=40, n=3) J >= 33/43 = 0.767, typically 35/41 = 0.854 (interior
  edit). The LSH banding curve then predicts per-pair candidate
  probability p(J) = 1-(1-J^r)^b; the probe compares MEASURED twin
  recall against the curve evaluated at each pair's TRUE Jaccard
  (computed exactly from the edit position), so the assertion tests
  the implementation, not the parameter choice.
- ``exact_dups`` byte-identical clones: J = 1, recall must be 1.0
  (every band collides), and `exact_dedup_groups` must find exactly
  that many groups of size 2.

Reported per leg: wall seconds, docs/s, candidate-pair volume, twin
recall vs predicted, alien-candidate count. The plan-shape contract
under test at this scale: the banded relation is 3 longs per (doc,
band) — document TEXT never shuffles — and the self-join key is
high-cardinality, so candidate volume, not corpus volume, bounds the
join output (SURVEY.md dedup row; operators/dedup.py:145).

Usage:
    python tools/minhash_scale_probe.py [--n 10000000] [--twins 200000]
        [--exact-dups 100000] [--doc-words 40] [--vocab 30000]
        [--num-hashes 16] [--bands 4] [--shingle-n 3]

Prints one JSON line; paste into COVERAGE.md and commit the log.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from pyspark.sql import functions as F  # noqa: E402

TWIN_OFF = 1_000_000_000
DUP_OFF = 2_000_000_000


def make_docs(spark, n: int, twins: int, exact_dups: int, doc_words: int, vocab: int):
    """(doc_id, text): ids < TWIN_OFF are base docs (pure function of
    id); TWIN_OFF+i is base i with word (i mod doc_words) replaced;
    DUP_OFF+i is a byte-identical clone of base i."""
    ids = (
        spark.range(n)
        .unionByName(spark.range(twins).select((F.col("id") + TWIN_OFF).alias("id")))
        .unionByName(
            spark.range(exact_dups).select((F.col("id") + DUP_OFF).alias("id"))
        )
        .repartition(int(spark.conf.get("spark.sql.shuffle.partitions")))
    )

    def gen(batches):
        import numpy as np
        import pandas as pd

        # one per-executor lookup of premade word strings (twin edits
        # use the upper half, guaranteed outside the base universe)
        lookup = np.array([f"w{w}" for w in range(2 * vocab)], dtype=object)
        for pdf in batches:
            out = []
            for i in pdf["id"].to_numpy():
                base = i % TWIN_OFF if i < DUP_OFF else i - DUP_OFF
                rng = np.random.default_rng(int(base) * 2654435761 % 2**31)
                words = rng.integers(0, vocab, size=doc_words)
                if TWIN_OFF <= i < DUP_OFF:  # one-word edit, position i mod w
                    pos = int(i - TWIN_OFF) % doc_words
                    words[pos] = vocab + (int(i) % vocab)
                out.append(" ".join(lookup[words]))
            yield pd.DataFrame({"doc_id": pdf["id"], "text": out})

    return ids.mapInPandas(gen, "doc_id long, text string")


def banding_recall(j: float, bands: int, rows: int) -> float:
    return 1.0 - (1.0 - j**rows) ** bands


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=10_000_000)
    ap.add_argument("--twins", type=int, default=200_000)
    ap.add_argument("--exact-dups", type=int, default=100_000)
    ap.add_argument("--doc-words", type=int, default=40)
    ap.add_argument("--vocab", type=int, default=30_000)
    ap.add_argument("--num-hashes", type=int, default=16)
    ap.add_argument("--bands", type=int, default=4)
    ap.add_argument("--shingle-n", type=int, default=3)
    args = ap.parse_args()

    from pyspark import StorageLevel

    from terrorblade_spark.operators.dedup import (
        exact_dedup_groups,
        minhash_lsh_candidates,
    )
    from terrorblade_spark.session import get_spark

    spark = get_spark("minhash-scale-probe")
    w, nsh = args.doc_words, args.shingle_n
    rows = args.num_hashes // args.bands

    t0 = time.time()
    docs = make_docs(
        spark, args.n, args.twins, args.exact_dups, w, args.vocab
    ).persist(StorageLevel.MEMORY_AND_DISK)
    total = docs.count()
    out: dict[str, object] = {
        "probe": "minhash_lsh_10m",
        "docs": total,
        "twins": args.twins,
        "exact_dups": args.exact_dups,
        "num_hashes": args.num_hashes,
        "bands": args.bands,
        "rows": rows,
        "gen_s": round(time.time() - t0, 1),
    }

    # --- exact dedup leg ---
    t0 = time.time()
    groups = exact_dedup_groups(docs, "doc_id", "text")
    gstats = groups.agg(
        F.count(F.lit(1)).alias("g"), F.sum("n_members").alias("m")
    ).collect()[0]
    out["exact_s"] = round(time.time() - t0, 1)
    out["exact_groups"] = int(gstats["g"] or 0)
    out["exact_members"] = int(gstats["m"] or 0)

    # --- MinHash-LSH leg ---
    t0 = time.time()
    cand = minhash_lsh_candidates(
        docs,
        "doc_id",
        "text",
        num_hashes=args.num_hashes,
        bands=args.bands,
        shingle_n=nsh,
    ).persist(StorageLevel.MEMORY_AND_DISK)
    out["cand_pairs"] = cand.count()
    lsh_elapsed = max(time.time() - t0, 1e-6)  # smoke runs can finish <0.05s
    out["lsh_s"] = round(lsh_elapsed, 1)
    out["docs_per_s"] = int(total / lsh_elapsed)

    # candidate audit: three PLANTED classes — (base, TWIN_OFF+base),
    # (base, DUP_OFF+base), and (TWIN_OFF+i, DUP_OFF+i) (the twin of
    # base i vs the byte-clone of base i is itself a near-dup at the
    # same Jaccard as class 1) — everything else is alien
    a, b = F.col("id_a"), F.col("id_b")
    twin_hits = cand.where((b - a == TWIN_OFF) & (a < args.twins)).count()
    dup_hits = cand.where((b - a == DUP_OFF) & (a < args.exact_dups)).count()
    twin_dup_hits = cand.where(
        (b - a == DUP_OFF - TWIN_OFF) & (a >= TWIN_OFF) & (a < TWIN_OFF + args.twins)
    ).count()
    out["twin_dup_hits"] = twin_dup_hits
    out["alien_candidates"] = (
        out["cand_pairs"] - twin_hits - dup_hits - twin_dup_hits
    )
    out["dup_recall"] = round(dup_hits / args.exact_dups, 4)

    # analytic twin recall: true Jaccard depends only on the edit
    # position (edge edits kill fewer shingles); average the banding
    # curve over the uniform position distribution
    shingles = w - nsh + 1
    preds = []
    for pos in range(w):
        # shingles touching word pos start at max(0, pos-n+1) .. min(pos, S-1)
        killed = min(pos, shingles - 1) - max(0, pos - nsh + 1) + 1
        inter = shingles - killed
        jac = inter / (2 * shingles - inter)
        preds.append(banding_recall(jac, args.bands, rows))
    out["twin_recall"] = round(twin_hits / args.twins, 4)
    out["twin_recall_predicted"] = round(sum(preds) / len(preds), 4)

    print(json.dumps(out), flush=True)
    assert out["dup_recall"] == 1.0, out
    assert out["exact_groups"] == args.exact_dups, out
    assert out["alien_candidates"] <= total * 1e-5, out
    # measured recall within 3 percentage points of the banding curve
    assert abs(out["twin_recall"] - out["twin_recall_predicted"]) < 0.03, out
    spark.stop()


if __name__ == "__main__":
    main()
