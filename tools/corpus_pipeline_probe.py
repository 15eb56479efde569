"""CorpusPipeline end-to-end probe at 1M docs (VERDICT r6 task 7).

The 1M SemDeDup probe (tools/semdedup_probe.py) exercises the operator
directly; this one drives the PIPELINE-level composition the facade
ships — curate -> text dedup -> dedup_semantic(assign_probes=2) ->
leakage-safe split — at 1M documents, with per-stage wall times, and
checks the two invariants the composition must preserve:

* semantic twin containment: a planted embedding twin (different TEXT,
  near-identical vector — invisible to MinHash, the reason the
  semantic stage exists) must land in its base's canonical group;
* leakage-safe split: no canonical_id straddles train/eval (the split
  keys on the dedup component, so a doc and its near-variants can
  never contaminate eval).

Corpus model: each base doc CONCATENATES two cycled source texts
chosen by independent hashes of its id — any two docs share at most
one half, so their shingle jaccard (~0.5) sits safely below the text
stage's 0.8 threshold and replicas survive as distinct content (a
suffix-only fixture collapses to n_source_texts canonicals and
starves the semantic stage — measured at 20k). Planted rows: exact
ids are byte-identical text clones (the text stage must remove them
before the semantic stage — the ordering contract); twin ids are
SEMANTIC twins — different second text half (invisible to MinHash)
but vector = base vector + small noise. Embeddings are a pure
function of doc id (clustered topic geometry, the semdedup_probe
recipe) so twins reproduce their base's vector without any
driver-side materialization.

Usage:
    python tools/corpus_pipeline_probe.py [sf_dir] [--n 1000000]
        [--twins 5000] [--exact-dups 50000] [--dim 64]
        [--n-clusters 1024] [--threshold 0.95]

Prints one JSON line; paste into COVERAGE.md.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from pyspark.sql import functions as F  # noqa: E402


def make_docs(spark, sf_dir: str, n: int, twins: int, exact_dups: int):
    """1M-doc corpus: ids 0..n-1 base (cycled real text + replica
    suffix), ids n..n+twins-1 semantic twins of bases 0..twins-1
    (DIFFERENT text), ids 2n..2n+exact_dups-1 byte-identical clones of
    bases 0..exact_dups-1."""
    from terrorblade_spark.tables import load_table

    base_txt = (
        load_table(spark, sf_dir, "documents")
        .select(F.col("doc_id").alias("__tid"), F.col("text").alias("__txt"))
    )
    n_texts = base_txt.count()

    ids = (
        spark.range(n)
        .unionByName(spark.range(n, n + twins))
        .unionByName(spark.range(2 * n, 2 * n + exact_dups))
    )
    base_id = (
        F.when(F.col("id") < n, F.col("id"))
        .when(F.col("id") < 2 * n, F.col("id") - n)
        .otherwise(F.col("id") - 2 * n)
    )
    kind = (
        F.when(F.col("id") < n, F.lit("base"))
        .when(F.col("id") < 2 * n, F.lit("twin"))
        .otherwise(F.lit("exact"))
    )
    # two independent text halves per doc: first keyed on base id, the
    # second on a multiplicative hash of it — any two docs share at
    # most one half (jaccard ~0.5 < the 0.8 text threshold). A twin's
    # second half uses a THIRD hash, so its text is equally distinct
    # from its base: only the embedding ties them together.
    # xxhash64, not modular-linear arithmetic: (base*c+k) % n collides
    # on BOTH halves whenever i = j (mod n) — the hashes must be
    # independent per half
    h1 = F.pmod(F.xxhash64(F.col("__base"), F.lit("h1")), F.lit(n_texts))
    h2 = F.pmod(F.xxhash64(F.col("__base"), F.lit("h2")), F.lit(n_texts))
    h2_twin = F.pmod(F.xxhash64(F.col("__base"), F.lit("tw")), F.lit(n_texts))
    second = F.when(F.col("__kind") == "twin", h2_twin).otherwise(h2)
    a_txt = base_txt.select(
        F.col("__tid").alias("__t1"), F.col("__txt").alias("__txt1")
    )
    b_txt = base_txt.select(
        F.col("__tid").alias("__t2"), F.col("__txt").alias("__txt2")
    )
    docs = (
        ids.select(
            F.col("id").alias("doc_id"),
            base_id.alias("__base"),
            kind.alias("__kind"),
        )
        .withColumn("__t1", h1)
        .withColumn("__t2", second)
        .join(a_txt, "__t1")
        .join(b_txt, "__t2")
        .select(
            "doc_id",
            "__base",
            "__kind",
            F.concat(F.col("__txt1"), F.lit(" "), F.col("__txt2")).alias("text"),
        )
    )
    return docs


def make_vectors(spark, n: int, twins: int, exact_dups: int, dim: int, centers: int):
    """Embedding per doc id — pure function of (base id, kind): base =
    center[base % C] + 2*noise(base); twin = base vector + 0.5*noise;
    exact clone = base vector (identical bytes, like its text)."""
    c = np.random.default_rng(11).standard_normal((centers, dim)) * 4.0
    b_centers = spark.sparkContext.broadcast(c)

    def gen(batches):
        import pandas as pd

        for pdf in batches:
            ids = pdf["id"].to_numpy()
            cc = b_centers.value
            base = np.where(ids < n, ids, np.where(ids < 2 * n, ids - n, ids - 2 * n))
            assign = base % cc.shape[0]
            noise = np.stack(
                [
                    np.random.default_rng(int(b) * 7 + 3).standard_normal(cc.shape[1])
                    for b in base
                ]
            )
            vecs = cc[assign] + 2.0 * noise
            is_twin = (ids >= n) & (ids < 2 * n)
            if is_twin.any():
                rng = np.random.default_rng(int(ids[0]) + 5)
                vecs[is_twin] += 0.5 * rng.standard_normal(
                    (int(is_twin.sum()), cc.shape[1])
                )
            yield pd.DataFrame(
                {"doc_id": ids, "embedding": [v.tolist() for v in vecs]}
            )

    ids = (
        spark.range(n)
        .unionByName(spark.range(n, n + twins))
        .unionByName(spark.range(2 * n, 2 * n + exact_dups))
    )
    return ids.repartition(64).mapInPandas(
        gen, "doc_id long, embedding array<double>"
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("sf_dir", nargs="?", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--n", type=int, default=1_000_000)
    ap.add_argument("--twins", type=int, default=5_000)
    ap.add_argument("--exact-dups", type=int, default=50_000)
    ap.add_argument("--dim", type=int, default=64)
    ap.add_argument("--centers", type=int, default=256)
    ap.add_argument("--n-clusters", type=int, default=1_024)
    ap.add_argument("--threshold", type=float, default=0.95)
    args = ap.parse_args()

    from pyspark import StorageLevel

    from terrorblade_spark.corpus import CorpusPipeline
    from terrorblade_spark.session import get_spark

    spark = get_spark("corpus-pipeline-probe")
    out: dict[str, object] = {
        "probe": "corpus_pipeline_1m",
        "n": args.n,
        "twins": args.twins,
        "exact_dups": args.exact_dups,
    }

    t0 = time.time()
    docs = make_docs(spark, args.sf_dir, args.n, args.twins, args.exact_dups).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    out["n_docs"] = docs.count()
    vectors = make_vectors(
        spark, args.n, args.twins, args.exact_dups, args.dim, args.centers
    ).persist(StorageLevel.MEMORY_AND_DISK)
    vectors.count()
    out["gen_s"] = round(time.time() - t0, 1)

    pipe = CorpusPipeline(spark, docs.select("doc_id", "text"))

    # --- stage 1: curate (rule filter + PII) ---
    t0 = time.time()
    curated = pipe.curate().persist(StorageLevel.MEMORY_AND_DISK)
    kept = curated.where("keep")
    out["curate_kept"] = kept.count()
    out["curate_s"] = round(time.time() - t0, 1)

    # --- stage 2: text near-dup (exact clones must die here) ---
    t0 = time.time()
    deduped = pipe.dedup(kept).persist(StorageLevel.MEMORY_AND_DISK)
    canon_text = deduped.where("NOT is_duplicate")
    out["text_canonicals"] = canon_text.count()
    out["dedup_s"] = round(time.time() - t0, 1)
    exact_survivors = canon_text.where(F.col("doc_id") >= 2 * args.n).count()
    out["exact_clone_survivors"] = exact_survivors  # want ~0

    # --- stage 3: semantic dedup, multi-probe ---
    t0 = time.time()
    sem = pipe.dedup_semantic(
        canon_text,
        vectors,
        threshold=args.threshold,
        n_clusters=args.n_clusters,
        assign_probes=2,
        # the 100 TB recipe (and the direct 1M semdedup probe): k-means
        # FIT is sample-sized, assignment is the only full pass — the
        # default fit-on-everything measured 655 s of the first 1M
        # pipeline run's semantic stage
        train_fraction=0.1,
    ).persist(StorageLevel.MEMORY_AND_DISK)
    out["sem_canonicals"] = sem.where("NOT is_duplicate").count()
    out["semantic_s"] = round(time.time() - t0, 1)

    # twin containment: for twin n+i and base i BOTH present at this
    # stage's input, they must share a canonical_id
    pairs = (
        sem.where((F.col("doc_id") >= args.n) & (F.col("doc_id") < 2 * args.n))
        .select((F.col("doc_id") - args.n).alias("b"), F.col("canonical_id").alias("tc"))
        .join(
            sem.where(F.col("doc_id") < args.n).select(
                F.col("doc_id").alias("b"), F.col("canonical_id").alias("bc")
            ),
            "b",
        )
        .persist()
    )
    n_pairs = pairs.count()
    hits = pairs.where(F.col("tc") == F.col("bc")).count()
    out["twin_pairs_present"] = n_pairs
    out["twin_containment"] = round(hits / max(n_pairs, 1), 4)

    # --- stage 4: leakage-safe split over the dedup component ---
    t0 = time.time()
    split = pipe.split(sem).persist(StorageLevel.MEMORY_AND_DISK)
    frac_eval = split.where("split = 'eval'").count() / split.count()
    out["split_s"] = round(time.time() - t0, 1)
    out["eval_fraction"] = round(frac_eval, 4)
    straddlers = (
        split.groupBy("canonical_id")
        .agg(F.countDistinct("split").alias("k"))
        .where(F.col("k") > 1)
        .count()
    )
    out["split_straddling_components"] = straddlers  # MUST be 0

    print(json.dumps(out))
    assert out["exact_clone_survivors"] == 0, out
    assert out["twin_containment"] >= 0.99, out
    assert straddlers == 0, out
    assert 0.02 <= frac_eval <= 0.10, out
    spark.stop()


if __name__ == "__main__":
    main()
