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
    idx.postings.unpersist()


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
