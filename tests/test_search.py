"""BM25 ranked retrieval: DuckDB twin + plan/scale properties."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from terrorblade_spark.operators.search import bm25_index, bm25_search_text, bm25_topk
from terrorblade_spark.tables import load_table

K1, B = 1.2, 0.75


def duck_bm25(duck, query_terms: list[str], k: int) -> list[tuple[int, float]]:
    """Reference BM25 over the documents view, same tokenization
    (whitespace runs, lowercased) and same Lucene-style +1 idf."""
    terms_sql = ", ".join(f"('{t}')" for t in query_terms)
    sql = f"""
    WITH tok AS (
      SELECT doc_id AS doc, lower(t) AS term
      FROM documents,
           unnest(list_filter(regexp_split_to_array(trim(text), '\\s+'),
                              x -> x <> '')) AS u(t)
    ),
    postings AS (
      SELECT term, doc, count(*) AS tf FROM tok GROUP BY 1, 2
    ),
    doclen AS (SELECT doc, sum(tf) AS dl FROM postings GROUP BY 1),
    stats AS (SELECT count(*) AS n_docs, avg(dl) AS avgdl FROM doclen),
    q(term) AS (VALUES {terms_sql}),
    dfreq AS (
      SELECT p.term, count(*) AS df FROM postings p JOIN q USING (term) GROUP BY 1
    )
    SELECT p.doc,
           sum(ln(1 + (s.n_docs - f.df + 0.5) / (f.df + 0.5))
               * p.tf * ({K1} + 1)
               / (p.tf + {K1} * (1 - {B} + {B} * d.dl / s.avgdl))) AS score
    FROM postings p
    JOIN q USING (term)
    JOIN dfreq f USING (term)
    JOIN doclen d USING (doc)
    CROSS JOIN stats s
    GROUP BY 1
    ORDER BY score DESC, doc ASC
    LIMIT {k}
    """
    return [(int(r[0]), float(r[1])) for r in duck.execute(sql).fetchall()]


@pytest.fixture(scope="module")
def index(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    idx = bm25_index(docs, "doc_id")
    yield idx
    idx.unpersist()


def test_bm25_matches_duckdb(spark, duck, sf_dir, index):
    query = "data model the"
    got = [
        (r["doc"], r["score"])
        for r in bm25_topk(index, query, k=15, k1=K1, b=B).collect()
    ]
    want = duck_bm25(duck, sorted(set(query.split())), k=15)
    assert [d for d, _ in got] == [d for d, _ in want]
    for (_, gs), (_, ws) in zip(got, want):
        assert math.isclose(gs, ws, rel_tol=1e-9)


def test_bm25_empty_and_unknown_query(spark, index):
    assert bm25_topk(index, "").count() == 0
    assert bm25_topk(index, "zzzqqqxyzzy_not_a_word").count() == 0


def test_bm25_search_text_attaches_text(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    out = bm25_search_text(docs, "data", "doc_id", k=5)
    rows = out.collect()
    assert 0 < len(rows) <= 5
    assert {"doc", "score", "text"} <= set(out.columns)
    # every hit actually contains the term
    assert all("data" in r["text"].lower() for r in rows)


def test_bm25_topk_plan_is_topk_not_sort(spark, index):
    """The k-row cut must be TakeOrderedAndProject (per-partition heap),
    never a global Sort of all scored docs."""
    plan = bm25_topk(index, "data model", k=10)._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan


def test_bm25_scores_are_query_term_bounded(spark, index):
    """Scoring touches only postings of the query's terms: a one-term
    query scores exactly the docs containing it."""
    n_docs_with = index.postings.where(F.col("term") == "data").count()
    scored = bm25_topk(index, "data", k=1_000_000)
    assert scored.count() == n_docs_with


def test_rrf_fuse_hand_computed(spark):
    """Two 3-doc rankings with a hand-computed fusion: docs 1 and 3
    each take one 1st and one 3rd (1/61 + 1/63), which beats doc 2's
    two 2nds (2/62) by convexity of 1/x; the 1-vs-3 tie breaks by id."""
    from terrorblade_spark.operators.search import rrf_fuse

    r1 = spark.createDataFrame([(1, 9.0), (2, 5.0), (3, 1.0)], "doc long, score double")
    r2 = spark.createDataFrame([(3, 0.9), (2, 0.5), (1, 0.1)], "doc long, score double")
    got = [(r["doc"], r["rrf_score"]) for r in rrf_fuse([r1, r2], k=3).collect()]
    import math

    want = sorted(
        [
            (1, 1 / 61 + 1 / 63),
            (2, 1 / 62 + 1 / 62),
            (3, 1 / 63 + 1 / 61),
        ],
        key=lambda t: (-t[1], t[0]),
    )
    assert [d for d, _ in got] == [d for d, _ in want]
    for (_, gs), (_, ws) in zip(got, want):
        assert math.isclose(gs, ws, rel_tol=1e-12)
    assert [d for d, _ in got] == [1, 3, 2]


def test_rrf_handles_disjoint_rankings(spark):
    from terrorblade_spark.operators.search import rrf_fuse

    r1 = spark.createDataFrame([(1, 2.0)], "doc long, score double")
    r2 = spark.createDataFrame([(9, 2.0)], "doc long, score double")
    rows = rrf_fuse([r1, r2], k=10).collect()
    assert {r["doc"] for r in rows} == {1, 9}


def test_hybrid_search_runs_end_to_end(spark, sf_dir):
    from terrorblade_spark.operators.search import hybrid_search
    from terrorblade_spark.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    emb = load_table(spark, sf_dir, "embeddings")
    qvec = emb.where(F.col("vec_id") == emb.select(F.min("vec_id")).first()[0]).select(
        "embedding"
    )
    out = hybrid_search(docs, emb, "data model", qvec, k=5, fetch_k=20)
    rows = out.collect()
    assert 0 < len(rows) <= 5
    assert out.columns == ["doc", "rrf_score"]
    # fused score is bounded by the two-retriever maximum 2/(c+1)
    assert all(0 < r["rrf_score"] <= 2 / 61 for r in rows)


def test_bm25_empty_query_preserves_struct_ids(spark):
    """A blank query must return an EMPTY result with the index's own
    doc type (struct ids from the facade), not a hardcoded long."""
    docs = spark.createDataFrame(
        [((1, 10), "alpha beta"), ((1, 11), "gamma")],
        "mid struct<chat_id:long,message_id:long>, text string",
    )
    idx = bm25_index(docs, "mid", persist=False)
    out = bm25_topk(idx, "   ")
    assert out.count() == 0
    assert out.schema["doc"].dataType.simpleString().startswith("struct")


def test_hybrid_fetch_k_clamped_to_k(spark, sf_dir):
    from terrorblade_spark.operators.search import hybrid_search
    from terrorblade_spark.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    emb = load_table(spark, sf_dir, "embeddings")
    qvec = emb.limit(1).select("embedding")
    # k > fetch_k: the clamp must let up to k docs through
    out = hybrid_search(docs, emb, "data", qvec, k=30, fetch_k=5)
    assert out.count() > 5


def test_bm25_save_load_roundtrip(spark, sf_dir, index, tmp_path):
    from terrorblade_spark.operators.models import load_bm25, save_bm25

    path = str(tmp_path / "bm25_model")
    save_bm25(index, path)
    idx2 = load_bm25(spark, path)
    a = [(r["doc"], r["score"]) for r in bm25_topk(index, "data model", k=10).collect()]
    b = [(r["doc"], r["score"]) for r in bm25_topk(idx2, "data model", k=10).collect()]
    assert a == b
    idx2.unpersist()


def test_model_kind_mismatch_refused(spark, sf_dir, index, tmp_path):
    from terrorblade_spark.operators.models import load_lm, save_bm25

    path = str(tmp_path / "wrong_kind")
    save_bm25(index, path)
    with pytest.raises(ValueError, match="not an ngram_lm"):
        load_lm(spark, path)


def test_q71_index_cache_key_tracks_fixture_fingerprint(tmp_path):
    """A regenerated fixture at the SAME path must get a fresh index
    cache key (round-4 review: stale persisted BM25 served after a
    fixture rewrite)."""
    import os
    import time

    from terrorblade_spark.queries.text import _q71_index_path

    d = tmp_path / "sf"
    d.mkdir()
    doc = d / "documents.parquet"
    doc.write_bytes(b"one")
    k1 = _q71_index_path(str(d))
    k_same = _q71_index_path(str(d))
    assert k1 == k_same  # stable while the fixture is unchanged
    time.sleep(0.01)
    doc.write_bytes(b"two!")  # regenerated fixture: new size + mtime
    k2 = _q71_index_path(str(d))
    assert k2 != k1
    # directory-of-parts layout fingerprints every part file
    os.remove(doc)
    part_dir = d / "documents.parquet"
    part_dir.mkdir()
    (part_dir / "part-0.parquet").write_bytes(b"p0")
    k3 = _q71_index_path(str(d))
    (part_dir / "part-0.parquet").write_bytes(b"p0-rewritten")
    assert _q71_index_path(str(d)) != k3


# --- tfidf_keywords ----------------------------------------------------------

from terrorblade_spark.operators.search import tfidf_keywords


def _kw(df):
    out = {}
    for r in df.collect():
        out.setdefault(r["doc"], []).append((r["rank"], r["term"], r["score"]))
    return {d: [t for _, t, _ in sorted(v)] for d, v in out.items()}, {
        (r["doc"], r["term"]): r["score"] for r in df.collect()
    }


def test_tfidf_rare_term_wins(spark):
    import math

    docs = spark.createDataFrame(
        [(1, "apple apple banana"), (2, "banana cherry"), (3, "cherry banana")],
        "doc_id long, text string",
    )
    terms, scores = _kw(tfidf_keywords(docs, "doc_id", k=1))
    # doc-unique 'apple' (tf=2, df=1) beats ubiquitous 'banana'
    assert terms == {1: ["apple"], 2: ["cherry"], 3: ["cherry"]}
    assert scores[(1, "apple")] == pytest.approx(2 * (math.log(4 / 2) + 1))
    assert scores[(2, "cherry")] == pytest.approx(math.log(4 / 3) + 1)


def test_tfidf_rank_bound_and_tiebreak(spark):
    docs = spark.createDataFrame(
        [(1, "x y z w"), (2, "q")], "doc_id long, text string"
    )
    terms, _ = _kw(tfidf_keywords(docs, "doc_id", k=3))
    # all four terms of doc 1 tie on score (tf=1, df=1): term-ascending
    # tie-break keeps the first three, deterministically
    assert terms[1] == ["w", "x", "y"]
    assert terms[2] == ["q"]


def test_tfidf_lowercases_and_skips_empty(spark):
    docs = spark.createDataFrame(
        [(1, "Apple APPLE"), (2, "   "), (3, "")], "doc_id long, text string"
    )
    terms, scores = _kw(tfidf_keywords(docs, "doc_id", k=2))
    # case folds to one term; token-free docs produce no rows (and do
    # not count toward N: N=1 here, so idf = ln(2/2)+1 = 1, score = tf)
    assert terms == {1: ["apple"]}
    assert scores[(1, "apple")] == pytest.approx(2.0)


def test_spark_hash_string_matches_engine_hash(spark):
    """The driver-side Murmur3 twin must equal F.hash(string) BIT-FOR-
    BIT — persisted-index pruning depends on it: a mismatch would
    silently drop postings from serving results. Random unicode +
    length 0..20 covers the 4-byte block path, the signed-byte tail,
    and multi-byte codepoints."""
    import random
    import string as _string

    from pyspark.sql import functions as F

    from terrorblade_spark.operators.search import TERM_BUCKETS, spark_hash_string

    rng = random.Random(42)
    alphabet = _string.ascii_letters + _string.digits + "éüßАб中𝔘 .-_/"
    words = sorted(
        {"merge", "table", "hash", "a", "ab", "abc", "abcd", "abcde"}
        | {
            "".join(rng.choice(alphabet) for _ in range(rng.randint(1, 20)))
            for _ in range(300)
        }
    )
    got = {
        r["term"]: (r["h"], r["b"])
        for r in spark.createDataFrame([(w,) for w in words], "term string")
        .select(
            "term",
            F.hash("term").alias("h"),
            F.pmod(F.hash("term"), F.lit(TERM_BUCKETS)).alias("b"),
        )
        .collect()
    }
    for w in words:
        assert spark_hash_string(w) == got[w][0], w
        assert spark_hash_string(w) % TERM_BUCKETS == got[w][1], w
