"""LDA topic modeling (operators/topics.py). LDA topic INDICES are
seed-dependent; these tests assert structure, never specific ids."""

from __future__ import annotations

from terrorblade_spark.operators.topics import assign_topics, fit_topics, topic_terms

_COOK = ["bake the flour sugar butter cake", "whisk eggs sugar cream batter",
         "oven bake butter pastry flour", "cream sugar cake frosting butter",
         "batter eggs flour oven bake"]
_CODE = ["compile the code into binary objects", "debug binary code stack trace",
         "compile objects link binary", "stack trace debug compile code",
         "binary objects code link debug"]


def _corpus(spark):
    rows = [(i, t) for i, t in enumerate(_COOK)] + [
        (100 + i, t) for i, t in enumerate(_CODE)
    ]
    return spark.createDataFrame(rows * 4, "doc_id long, text string")


def test_topics_separate_planted_vocabularies(spark):
    df = _corpus(spark)
    model = fit_topics(df, n_topics=2, max_iter=40, min_df=1.0, optimizer="em")
    got = assign_topics(df, model).collect()
    by_doc = {r["doc_id"]: r["topic"] for r in got}
    cook_topics = {by_doc[i] for i in range(len(_COOK))}
    code_topics = {by_doc[100 + i] for i in range(len(_CODE))}
    # each cohort lands in ONE topic and the cohorts differ
    assert len(cook_topics) == 1 and len(code_topics) == 1
    assert cook_topics != code_topics
    assert all(r["topic_weight"] > 0.5 for r in got)


def test_topic_terms_reflect_vocabularies(spark):
    df = _corpus(spark)
    model = fit_topics(df, n_topics=2, max_iter=40, min_df=1.0, optimizer="em")
    terms = {r["topic"]: r["terms"].split(",") for r in topic_terms(model, 5).collect()}
    assert len(terms) == 2
    # smoothing puts SOME cross-topic words in every top-5; the sharp
    # structural claim is the #1 term: one topic leads with a cooking
    # word, the other with a code word
    cook_vocab = {"flour", "sugar", "bake", "butter", "cake", "eggs",
                  "cream", "batter", "oven", "pastry", "frosting", "whisk"}
    code_vocab = {"binary", "compile", "debug", "code", "objects", "stack",
                  "trace", "link"}
    tops = [ts[0] for ts in terms.values()]
    assert sorted(t in cook_vocab for t in tops) == [False, True], tops
    assert sorted(t in code_vocab for t in tops) == [False, True], tops


def test_assign_topics_out_of_vocab_doc(spark):
    df = _corpus(spark)
    model = fit_topics(df, n_topics=2, max_iter=10, min_df=1.0)
    oov = spark.createDataFrame(
        [(999, "zzzz qqqq xxxx"), (998, None)], "doc_id long, text string"
    )
    got = {r["doc_id"]: r for r in assign_topics(oov, model).collect()}
    # OOV/NULL docs still come back with a row (uniform mixture -> some
    # topic with weight ~1/k, never a crash)
    assert set(got) == {998, 999}
    for r in got.values():
        assert r["topic"] in (-1, 0, 1)
