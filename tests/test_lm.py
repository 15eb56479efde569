"""n-gram LM quality scoring: DuckDB twin for the unigram path,
hand-checked bigram backoff, fluency ordering, and bucket split."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from terrorblade_spark.operators.lm import (
    fit_ngram_lm,
    perplexity_bucket,
    score_documents,
)
from terrorblade_spark.tables import load_table


@pytest.fixture(scope="module")
def lm(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    model = fit_ngram_lm(docs, vocab_size=100_000)
    yield model
    model.unpersist()


def test_unigram_scores_match_duckdb(spark, duck, sf_dir, lm):
    docs = load_table(spark, sf_dir, "documents")
    got = {
        r["doc_id"]: (r["n_scored_tokens"], r["mean_nll"])
        for r in score_documents(docs, lm, order=1).collect()
    }
    sql = """
    WITH tok AS (
      SELECT doc_id, lower(t) AS tok
      FROM documents,
           unnest(list_filter(regexp_split_to_array(trim(text), '\\s+'),
                              x -> x <> '')) AS u(t)
    ), uni AS (
      SELECT tok, count(*) AS c FROM tok GROUP BY 1
    ), total AS (SELECT sum(c) AS t FROM uni)
    SELECT doc_id, count(*) AS n,
           avg(-ln(uni.c::DOUBLE / total.t::DOUBLE)) AS mean_nll
    FROM tok JOIN uni USING (tok) CROSS JOIN total
    GROUP BY 1
    """
    want = {d: (n, m) for d, n, m in duck.execute(sql).fetchall()}
    # vocab_size=100k covers the whole sf0.001 vocabulary -> no OOV;
    # every doc with tokens must match the exact ML unigram model
    assert set(got) == set(want)
    for d in got:
        assert got[d][0] == want[d][0]
        assert math.isclose(got[d][1], want[d][1], rel_tol=1e-9)


def test_bigram_backoff_hand_case(spark):
    corpus = spark.createDataFrame(
        [(1, "a b a b"), (2, "a b c")],
        "doc_id long, text string",
    )
    model = fit_ngram_lm(corpus, vocab_size=10, bigram_vocab=10)
    # counts: a=3, b=3, c=1 (total 7); bigrams: ab=3, ba=1, bc=1
    scored = {r["doc_id"]: r for r in score_documents(corpus, model, order=2).collect()}
    # doc 2 "a b c": pos0 'a' -> unigram ln(3/7); 'b'|a -> ln(3/3)=0;
    # 'c'|b -> ln(1/3)
    want = -(math.log(3 / 7) + 0.0 + math.log(1 / 3)) / 3
    assert math.isclose(scored[2]["mean_nll"], want, rel_tol=1e-12)
    model.unpersist()


def test_fluent_text_scores_below_gibberish(spark, sf_dir, lm):
    docs = load_table(spark, sf_dir, "documents")
    sample_text = docs.select("text").first()["text"]
    probe = spark.createDataFrame(
        [(1, sample_text), (2, "zxqv wvopk jrtm qqzl xkcd vbnm")],
        "doc_id long, text string",
    )
    s = {r["doc_id"]: r["mean_nll"] for r in score_documents(probe, lm).collect()}
    assert s[1] < s[2], "in-corpus text must be more fluent than gibberish"


def test_empty_doc_scores_null_not_zero(spark, lm):
    """The documented contract: token-less docs get a NULL-scored row
    (n_scored_tokens=0), never a fake 'perfect' 0 and never a silently
    MISSING row that an inner join downstream would drop."""
    probe = spark.createDataFrame(
        [(1, "   "), (2, "the quick fox")], "doc_id long, text string"
    )
    rows = {r["doc_id"]: r for r in score_documents(probe, lm).collect()}
    assert set(rows) == {1, 2}
    assert rows[1]["mean_nll"] is None and rows[1]["n_scored_tokens"] == 0
    assert rows[2]["mean_nll"] is not None


def test_perplexity_buckets_are_balanced(spark, sf_dir, lm):
    docs = load_table(spark, sf_dir, "documents")
    scored = score_documents(docs, lm)
    b = perplexity_bucket(scored, n_buckets=3)
    counts = {r["ppl_bucket"]: r["n"] for r in b.groupBy("ppl_bucket").agg(F.count(F.lit(1)).alias("n")).collect()}
    total = sum(counts.values())
    assert set(counts) == {0, 1, 2}
    for n in counts.values():
        assert n > 0.2 * total  # roughly equal-frequency split
    # bucket 0 holds the lowest-NLL docs
    m0 = b.where("ppl_bucket = 0").agg(F.max("mean_nll")).first()[0]
    m2 = b.where("ppl_bucket = 2").agg(F.min("mean_nll")).first()[0]
    assert m0 <= m2


def test_lm_save_load_roundtrip(spark, sf_dir, lm, tmp_path):
    from terrorblade_spark.operators.models import load_lm, save_lm

    path = str(tmp_path / "lm_model")
    save_lm(lm, path)
    lm2 = load_lm(spark, path)
    docs = load_table(spark, sf_dir, "documents").limit(50)
    a = {r["doc_id"]: r["mean_nll"] for r in score_documents(docs, lm).collect()}
    b = {r["doc_id"]: r["mean_nll"] for r in score_documents(docs, lm2).collect()}
    assert a == b  # bit-identical scoring from the persisted model
    lm2.unpersist()


def test_compare_corpora_drift(spark, sf_dir, lm):
    from terrorblade_spark.operators.lm import compare_corpora

    # self-comparison: JS exactly 0, full overlap
    summary, _ = compare_corpora(lm, lm)
    r = summary.first()
    assert abs(r["js_divergence"]) < 1e-12
    assert r["n_shared"] == r["n_tokens_a"] == r["n_tokens_b"]

    # shifted corpus: every doc gets a loud new token
    docs = load_table(spark, sf_dir, "documents")
    shifted = docs.withColumn(
        "text", F.concat(F.col("text"), F.lit(" zzdriftmarker zzdriftmarker"))
    )
    lm2 = fit_ngram_lm(shifted, vocab_size=100_000)
    s2, top = compare_corpora(lm, lm2)
    r2 = s2.first()
    assert r2["js_divergence"] > 0.001
    assert r2["n_shared"] >= 0.9 * r2["n_tokens_a"]
    # the injected token is the top shift and is absent from corpus A
    t = top.first()
    assert t["tok"] == "zzdriftmarker" and t["p"] == 0.0 and t["q"] > 0
    lm2.unpersist()


def test_compare_corpora_js_hand_computed(spark):
    import math

    from terrorblade_spark.operators.lm import compare_corpora

    a = fit_ngram_lm(spark.createDataFrame([(1, "x x y")], "doc_id long, text string"))
    b = fit_ngram_lm(spark.createDataFrame([(1, "x y y")], "doc_id long, text string"))
    r = compare_corpora(a, b)[0].first()
    p, q = {"x": 2 / 3, "y": 1 / 3}, {"x": 1 / 3, "y": 2 / 3}
    js = 0.0
    for t in ("x", "y"):
        m = (p[t] + q[t]) / 2
        js += 0.5 * p[t] * math.log(p[t] / m) + 0.5 * q[t] * math.log(q[t] / m)
    assert math.isclose(r["js_divergence"], js, rel_tol=1e-12)
    a.unpersist(); b.unpersist()
