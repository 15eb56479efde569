"""Unit tests for dedup operators on handcrafted documents: known
duplicates, known near-duplicates, too-short docs, empty text.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from terrorblade_spark.operators.dedup import (
    exact_dedup_groups,
    hamming64,
    jaccard_pairs,
    minhash_lsh_candidates,
    minhash_signatures,
    simhash_values,
)
from terrorblade_spark.operators.textops import shingles


def _docs(spark, texts):
    return spark.createDataFrame(list(enumerate(texts)), ["doc_id", "text"])


def test_exact_dedup(spark):
    df = _docs(spark, ["aaa", "bbb", "aaa", "ccc", "aaa", "bbb"])
    groups = {r["canonical_id"]: r for r in exact_dedup_groups(df, "doc_id").collect()}
    assert set(groups) == {0, 1}
    assert groups[0]["member_ids"] == [0, 2, 4]
    assert groups[0]["n_members"] == 3
    assert groups[1]["member_ids"] == [1, 5]


def test_exact_dedup_no_dups(spark):
    df = _docs(spark, ["a", "b", "c"])
    assert exact_dedup_groups(df, "doc_id").count() == 0


def test_shingles_short_doc(spark):
    df = _docs(spark, ["one two", "one two three", "one two three four", ""])
    rows = {r["doc_id"]: r["sh"] for r in df.select("doc_id", shingles("text", 3).alias("sh")).collect()}
    assert rows[0] == []
    assert rows[1] == ["one two three"]
    assert rows[2] == ["one two three", "two three four"]
    assert rows[3] == []


def test_shingles_dedup_and_case(spark):
    df = _docs(spark, ["A b c a B C a b c"])
    rows = df.select(shingles("text", 3).alias("sh")).collect()
    # lowercased + distinct
    assert sorted(rows[0]["sh"]) == ["a b c", "b c a", "c a b"]


def test_minhash_identical_docs_same_signature(spark):
    df = _docs(spark, ["the quick brown fox jumps", "the quick brown fox jumps", "totally different words here now"])
    sigs = {r["doc_id"]: r["signature"] for r in minhash_signatures(df, "doc_id").collect()}
    assert sigs[0] == sigs[1]
    assert sigs[0] != sigs[2]
    assert len(sigs[0]) == 16


def test_minhash_short_doc_sentinel(spark):
    df = _docs(spark, ["one two"])
    sigs = minhash_signatures(df, "doc_id", num_hashes=8).collect()
    assert sigs[0]["signature"] == [-1] * 8


def test_lsh_finds_identical_pair(spark):
    df = _docs(
        spark,
        [
            "the quick brown fox jumps over the lazy dog",
            "the quick brown fox jumps over the lazy dog",
            "completely unrelated text about spark engines and parquet files",
        ],
    )
    pairs = {(r["id_a"], r["id_b"]) for r in minhash_lsh_candidates(df, "doc_id").collect()}
    assert (0, 1) in pairs
    assert all(p[0] < p[1] for p in pairs)


def test_jaccard_exact_values(spark):
    # doc0: {a b c, b c d}; doc1: {a b c, b c e} -> inter 1, union 3 -> 1/3
    df = _docs(spark, ["a b c d", "a b c e"])
    rows = jaccard_pairs(df, "doc_id", threshold=0.0).collect()
    assert len(rows) == 1
    assert rows[0]["id_a"] == 0 and rows[0]["id_b"] == 1
    assert abs(rows[0]["jaccard"] - 1 / 3) < 1e-12


def test_jaccard_threshold_filters(spark):
    df = _docs(spark, ["a b c d", "a b c e"])
    assert jaccard_pairs(df, "doc_id", threshold=0.5).count() == 0


def test_simhash_identical_and_empty(spark):
    df = _docs(spark, ["hello world foo", "hello world foo", "", "Hello WORLD foo"])
    sims = {r["doc_id"]: r["simhash"] for r in simhash_values(df, "doc_id").collect()}
    assert sims[0] == sims[1]
    assert sims[2] == 0
    assert sims[0] == sims[3]  # case-insensitive tokens
    assert sims[0] >= 0  # 48-bit stays positive


def test_hamming_near_dup_smaller_than_random(spark):
    df = _docs(
        spark,
        [
            "alpha beta gamma delta epsilon zeta eta theta",
            "alpha beta gamma delta epsilon zeta eta iota",  # 1 token differs
            "one two three four five six seven eight",
        ],
    )
    sims = {r["doc_id"]: r["simhash"] for r in simhash_values(df, "doc_id").collect()}
    pair = spark.createDataFrame([(sims[0], sims[1]), (sims[0], sims[2])], ["a", "b"])
    d01, d02 = [r["d"] for r in pair.select(hamming64(F.col("a"), F.col("b")).alias("d")).collect()]
    assert d01 < d02


def test_incremental_dedup_two_batches(spark):
    from terrorblade_spark.operators.dedup import incremental_dedup

    b1 = spark.createDataFrame(
        [(1, "alpha beta"), (2, "alpha beta"), (3, "gamma delta")],
        "doc_id long, text string",
    )
    admitted1, idx1 = incremental_dedup(b1, None)
    got1 = sorted(r["doc_id"] for r in admitted1.collect())
    assert got1 == [1, 3]  # within-batch dup collapsed, smallest id wins
    idx1 = idx1.persist()
    assert idx1.count() == 2

    # batch 2: one known doc, one new dup pair, one brand-new
    b2 = spark.createDataFrame(
        [(10, "alpha beta"), (11, "epsilon"), (12, "epsilon"), (13, "zeta")],
        "doc_id long, text string",
    )
    admitted2, idx2 = incremental_dedup(b2, idx1)
    got2 = sorted(r["doc_id"] for r in admitted2.collect())
    assert got2 == [11, 13]  # 10 already in corpus, 12 dups 11
    # running index = union
    total = idx1.unionByName(idx2).distinct().count()
    assert total == 4

    # idempotency: replaying batch 2 against the updated index admits nothing
    full_idx = idx1.unionByName(idx2)
    admitted3, _ = incremental_dedup(b2, full_idx)
    assert admitted3.count() == 0


def test_jaccard_df_cap_bounds_hot_shingle_skew(spark):
    # skew probe: one boilerplate shingle injected into 10% of docs.
    # Without a df cap the inverted index joins that shingle's bucket
    # quadratically; with the cap the hot shingle is dropped and only
    # genuine near-dup pairs survive.
    n = 100
    hot = [(i, "legal boilerplate footer " + f"unique{i} tok{i} word{i}") for i in range(10)]
    rest = [(i, f"alpha{i} beta{i} gamma{i} delta{i}") for i in range(10, n - 2)]
    neardup = [(n - 2, "real shared content sentence here"), (n - 1, "real shared content sentence here")]
    df = spark.createDataFrame(hot + rest + neardup, ["doc_id", "text"])

    uncapped = jaccard_pairs(df, "doc_id", threshold=0.0, max_shingle_df=None)
    capped = jaccard_pairs(df, "doc_id", threshold=0.0, max_shingle_df=5)
    # the hot shingle ("legal boilerplate footer") co-shingles all 10
    # injected docs -> 45 pairs uncapped; capped keeps only the true pair
    assert uncapped.count() == 45 + 1
    got = capped.collect()
    assert {(r["id_a"], r["id_b"]) for r in got} == {(n - 2, n - 1)}
    assert got[0]["jaccard"] == 1.0

    # fractional cap: 5% of 100 docs = 5 -> same result
    frac = jaccard_pairs(df, "doc_id", threshold=0.0, max_shingle_df=0.05)
    assert {(r["id_a"], r["id_b"]) for r in frac.collect()} == {(n - 2, n - 1)}

    # DEFAULT path (no arg): the cap is on by default, so the hot
    # shingle is bounded without the caller doing anything — defaults
    # are what users run (1% of 100 docs floors to the absolute df=2)
    default = jaccard_pairs(df, "doc_id", threshold=0.0)
    assert {(r["id_a"], r["id_b"]) for r in default.collect()} == {(n - 2, n - 1)}


def test_jaccard_for_pairs_matches_full_join(spark):
    from terrorblade_spark.operators.dedup import jaccard_for_pairs

    df = _docs(
        spark,
        [
            "a b c d e f",
            "a b c d e g",
            "a b c x y z",
            "totally different words entirely here now",
            "t s",  # too short to shingle
        ],
    )
    # max_shingle_df=None: jaccard_for_pairs computes exact full-set
    # Jaccard, so the corpus-wide twin must be uncapped to agree
    full = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in jaccard_pairs(df, "doc_id", threshold=0.0, max_shingle_df=None).collect()
    }
    pairs = spark.createDataFrame(
        [(0, 1), (0, 2), (0, 3), (0, 4)], ["id_a", "id_b"]
    )
    got = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in jaccard_for_pairs(df, pairs, "doc_id").collect()
    }
    # agrees with the corpus-wide join on overlapping pairs...
    assert abs(got[(0, 1)] - full[(0, 1)]) < 1e-12
    assert abs(got[(0, 2)] - full[(0, 2)]) < 1e-12
    # ...and returns 0.0 (not a dropped row) for disjoint/short pairs
    assert got[(0, 3)] == 0.0
    assert got[(0, 4)] == 0.0
    assert len(got) == 4


def test_estimated_jaccard_from_signatures(spark):
    from terrorblade_spark.operators.dedup import (
        _minhash_core,
        estimated_jaccard_for_pairs,
    )
    from pyspark.sql import functions as F

    df = _docs(
        spark,
        [
            "a b c d e f g h",
            "a b c d e f g h",          # identical -> estimate exactly 1.0
            "a b c d e f g x",          # near-dup -> high estimate
            "totally different words entirely here now friend",  # -> low
        ],
    )
    sig = _minhash_core(df, "doc_id", "text", 16, 3).select(
        F.col("doc_id").alias("doc"), F.col("signature").alias("sig")
    )
    pairs = spark.createDataFrame([(0, 1), (0, 2), (0, 3)], ["id_a", "id_b"])
    est = {
        (r["id_a"], r["id_b"]): r["jaccard_est"]
        for r in estimated_jaccard_for_pairs(sig, pairs).collect()
    }
    assert est[(0, 1)] == 1.0
    assert est[(0, 2)] > est[(0, 3)]
    assert all(0.0 <= v <= 1.0 for v in est.values())
    # estimates are multiples of 1/16 (k agreeing positions out of 16)
    assert all(abs(v * 16 - round(v * 16)) < 1e-9 for v in est.values())


def test_near_dup_components_estimate_matches_exact_on_clean_data(spark):
    from terrorblade_spark.operators.components import near_dup_components

    texts = []
    for i in range(20):
        base = f"group {i} sentence alpha{i} beta{i} gamma{i} delta{i} epsilon{i}"
        texts.append(base)
        texts.append(base)  # exact twin
    texts.append("a lone document with no duplicate partner at all zeta")
    df = _docs(spark, texts)

    est = near_dup_components(df, "doc_id", jaccard_threshold=0.8)
    exact = near_dup_components(df, "doc_id", jaccard_threshold=0.8, exact_verify=True)
    rows_est = {r["doc_id"]: r["canonical_id"] for r in est.collect()}
    rows_exact = {r["doc_id"]: r["canonical_id"] for r in exact.collect()}
    assert rows_est == rows_exact
    # 20 twin-groups collapse, the loner stays canonical
    n_canon = sum(1 for d, c in rows_est.items() if d == c)
    assert n_canon == 21


def test_canonical_text_collapses_noise_variants(spark):
    from terrorblade_spark.operators.textops import canonical_text

    df = spark.createDataFrame(
        [
            (0, "Hello   World"),
            (1, "hello world"),
            (2, "HELLO\tWORLD\n"),
            (3, "hello\x01world"),      # control char -> space
            (4, "hello worldly"),       # genuinely different
        ],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r["c"] for r in df.select("doc_id", canonical_text("text").alias("c")).collect()}
    assert rows[0] == rows[1] == rows[2] == rows[3] == "hello world"
    assert rows[4] != rows[0]


def test_signature_lsh_seam_filters_sentinels(spark):
    """Review repro: all -1 sentinel signatures (unshingleable docs)
    fed to the public signature seam must not pair with each other."""
    from terrorblade_spark.operators.dedup import lsh_candidates_from_signatures

    sig = spark.createDataFrame(
        [(1, [-1] * 8), (2, [-1] * 8), (3, [5, 6, 7, 8, 9, 10, 11, 12]),
         (4, [5, 6, 7, 8, 9, 10, 11, 12])],
        "doc long, sig array<long>",
    )
    pairs = {(r["id_a"], r["id_b"])
             for r in lsh_candidates_from_signatures(sig, bands=4, rows=2).collect()}
    assert pairs == {(3, 4)}  # sentinels never pair


def test_minhash_bands_must_divide_num_hashes(spark, sf_dir):
    import pytest as _pytest

    from terrorblade_spark.operators.dedup import minhash_lsh_candidates
    from terrorblade_spark.tables import load_table

    d = load_table(spark, sf_dir, "documents")
    with _pytest.raises(ValueError, match="must divide"):
        minhash_lsh_candidates(d, "doc_id", num_hashes=16, bands=5)
