"""Full-text ranked retrieval: BM25 over an inverted index.

The reference's search surface is vector-first (mcp/server.py
cluster_search -> embeddings); the lexical half a production corpus
needs at 100 TB is an inverted index + BM25 — the standard first-stage
retriever in hybrid (lexical + vector) search stacks and the workhorse
for corpus forensics ("which documents mention X").

Scale design:

- The index is three relations derived in ONE pass over the corpus
  (explode tokens -> one groupBy): postings (term, doc, tf), doc
  lengths, per-term document frequencies. Text never shuffles — only
  (term, doc, tf) triples do.
- ``n_docs``/``avgdl`` live in a 1-row stats relation that joins in via
  broadcast — never a driver-side ``collect`` in the query path.
- At query time the postings are filtered to the query's terms FIRST
  (a broadcast hash semi-join against a handful of literals — with the
  postings written partitioned/bucketed by term this is partition
  pruning), so every downstream join and the final top-k touch only
  candidate rows. The top-k is an ``orderBy().limit()`` —
  TakeOrderedAndProject, a per-partition heap + driver merge of k rows,
  never a full sort.
- Scoring is pure Catalyst arithmetic (log/multiply), whole-stage
  codegen, no UDFs.

BM25 (Robertson/Okapi, the +1 idf variant Lucene uses so idf is never
negative):

    idf(t)  = ln(1 + (N - df + 0.5) / (df + 0.5))
    score   = sum_t idf(t) * tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl/avgdl))
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from terrorblade_spark.functions.exprs import tokens
from terrorblade_spark.tables import spread


@dataclass(frozen=True)
class Bm25Index:
    """The three index relations. At rest these are parquet datasets —
    postings partitioned (or bucketed) by term so a query prunes to its
    terms' files; doclen bucketed by doc for the score join; stats is
    one row."""

    postings: DataFrame  # (term, doc, tf)
    doclen: DataFrame  # (doc, dl)
    stats: DataFrame  # (n_docs, avgdl) — exactly one row


def bm25_index(df: DataFrame, id_col: str, text_col: str = "text") -> Bm25Index:
    """Build the inverted index in one explode + one groupBy.

    Tokenization matches the rest of the text stack (whitespace runs,
    lowercased) so token counts agree with ``with_token_count``.
    """
    ex = spread(df.select(id_col, text_col)).select(
        F.col(id_col).alias("doc"),
        F.explode(F.transform(tokens(text_col), lambda t: F.lower(t))).alias("term"),
    )
    postings = ex.groupBy("term", "doc").agg(F.count(F.lit(1)).alias("tf"))
    # dl = total tokens per doc = sum of tfs; derived from postings so
    # the exploded relation is scanned once (Spark reuses the shuffle
    # output of the (term, doc) aggregate for both downstream groupBys)
    postings = postings.persist()
    doclen = postings.groupBy("doc").agg(F.sum("tf").alias("dl"))
    stats = doclen.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.avg("dl").alias("avgdl"),
    )
    return Bm25Index(postings=postings, doclen=doclen, stats=stats)


def _query_terms(query: str) -> list[str]:
    return sorted({t.lower() for t in query.split() if t})


def bm25_topk(
    index: Bm25Index,
    query: str,
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Top-k documents for ``query`` as (doc, score), score descending,
    ties broken by doc id ascending (deterministic).

    Plan: postings ⋉ query-terms (broadcast literals — with term-
    partitioned postings this is partition pruning) -> per-term df agg
    over the SURVIVING postings (exact: df is per corpus, so it comes
    from the index's term stats below) -> join doclen + 1-row stats
    (both broadcast-eligible) -> score -> TakeOrderedAndProject.
    """
    terms = _query_terms(query)
    if not terms:
        spark = index.postings.sparkSession
        return spark.createDataFrame([], "doc long, score double")
    spark = index.postings.sparkSession
    qterms = F.broadcast(spark.createDataFrame([(t,) for t in terms], "term string"))

    hits = index.postings.join(qterms, "term")  # only query terms survive
    # document frequency per query term — aggregated over the pruned
    # postings (df(t) = |{doc: tf>0}|), a tiny relation (≤ |terms| rows)
    dfreq = hits.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    scored = (
        hits.join(F.broadcast(dfreq), "term")
        .join(index.doclen, "doc")
        .crossJoin(F.broadcast(index.stats))
    )
    idf = F.log(
        F.lit(1.0)
        + (F.col("n_docs") - F.col("df") + F.lit(0.5)) / (F.col("df") + F.lit(0.5))
    )
    tf_part = (F.col("tf") * (k1 + 1)) / (
        F.col("tf") + F.lit(k1) * (F.lit(1 - b) + F.lit(b) * F.col("dl") / F.col("avgdl"))
    )
    return (
        scored.select("doc", (idf * tf_part).alias("term_score"))
        .groupBy("doc")
        .agg(F.sum("term_score").alias("score"))
        .orderBy(F.desc("score"), F.asc("doc"))
        .limit(k)
    )


def bm25_search_text(
    df: DataFrame,
    query: str,
    id_col: str,
    text_col: str = "text",
    k: int = 10,
) -> DataFrame:
    """One-shot convenience: build the index, run the query, attach the
    matching text — for interactive use; pipelines build the index once
    and reuse it across queries."""
    idx = bm25_index(df, id_col, text_col)
    top = bm25_topk(idx, query, k)
    return (
        top.join(df.select(F.col(id_col).alias("doc"), text_col), "doc")
        .orderBy(F.desc("score"), F.asc("doc"))
    )
