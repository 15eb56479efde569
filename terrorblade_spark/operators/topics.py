"""Topic modeling over the document corpus: MLlib online LDA on a
bounded hashed/count vocabulary.

Why it's here: data-mixing decisions (domain weights, dedup-by-topic,
curriculum by subject) need an unsupervised view of WHAT the corpus
contains; LDA's per-document topic mixture is the standard cheap
instrument. The reference has no topic surface — this extends the
corpus-analysis half (operators/lm.py fluency, operators/dsir.py
target matching) with composition.

Scale notes: the online (mini-batch EM) optimizer is the distributed
path — each iteration is one pass of bounded-size sufficient
statistics, never a corpus collect; the vocabulary is capped at
``vocab_size`` (corpus-size independent, the operators/lm.py top-V
rule); transform/assignment is a broadcast-matrix map job. Seeded fit
is deterministic for a fixed partitioning of the input sample.

Determinism contract: LDA inference is stochastic — topic IDENTITIES
(which index means which theme) depend on the seed. Tests therefore
assert STRUCTURE (co-clustered docs share a dominant topic, topic
terms separate planted vocabularies), never specific topic indices;
the registry exposes topics as a rows-only query (like q65's HLL
estimates, declared engine-specific).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


@dataclass
class TopicModel:
    lda_model: object          # pyspark.ml.clustering.LDAModel
    vectorizer: object         # pyspark.ml.feature.CountVectorizerModel
    n_topics: int


def _tokens(text_col: str):
    toks = F.split(F.lower(F.trim(F.col(text_col))), r"[^a-z0-9]+")
    return F.filter(toks, lambda t: F.length(t) > 1)


def fit_topics(
    df: DataFrame,
    text_col: str = "text",
    n_topics: int = 8,
    vocab_size: int = 1 << 14,
    max_iter: int = 20,
    seed: int = 7,
    min_df: float = 2.0,
    optimizer: str = "online",
) -> TopicModel:
    """Fit LDA on the corpus. The vocabulary is the top ``vocab_size``
    tokens by document frequency (bounded regardless of corpus size);
    ``min_df`` drops hapax noise. ``optimizer='online'`` (default) is
    the distributed mini-batch path for corpus scale; ``'em'`` is the
    batch path — steadier on tiny corpora (mini-batch order interacts
    with vocabulary tie order, so online runs can land in different
    optima across sessions even under a fixed seed)."""
    from pyspark.ml.clustering import LDA
    from pyspark.ml.feature import CountVectorizer

    toks = df.select(_tokens(text_col).alias("__toks")).where(
        F.size("__toks") > 0
    )
    cv = CountVectorizer(
        inputCol="__toks", outputCol="__tf", vocabSize=vocab_size, minDF=min_df
    ).fit(toks)
    tf = cv.transform(toks).select("__tf")
    lda = LDA(
        k=n_topics,
        maxIter=max_iter,
        seed=seed,
        optimizer=optimizer,
        featuresCol="__tf",
    ).fit(tf)
    return TopicModel(lda_model=lda, vectorizer=cv, n_topics=n_topics)


def assign_topics(
    df: DataFrame,
    model: TopicModel,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document topic mixture and dominant topic. Returns
    ``(id_col, topic, topic_weight)`` — dominant topic only; the full
    mixture stays internal (array cells don't hash in the gate).
    Docs with no in-vocabulary tokens get topic -1, weight 0.0."""
    # NULL text -> NULL token array NPEs the CountVectorizer UDF;
    # coalesce to empty (an empty doc gets the uniform prior mixture)
    toks = df.select(
        F.col(id_col),
        F.coalesce(
            _tokens(text_col), F.array().cast("array<string>")
        ).alias("__toks"),
    )
    tf = model.vectorizer.transform(toks)
    dist = model.lda_model.transform(tf).select(
        id_col, F.col("topicDistribution").alias("__td")
    )
    # vector -> array via the built-in converter, then argmax row-locally
    from pyspark.ml.functions import vector_to_array

    with_arr = dist.withColumn("__vec", vector_to_array("__td"))
    best = F.expr("array_position(__vec, array_max(__vec)) - 1")
    return (
        with_arr.withColumn("topic", best.cast("int"))
        .withColumn("topic_weight", F.expr("array_max(__vec)"))
        .withColumn(
            "topic",
            F.when(F.col("topic_weight") <= 0, F.lit(-1)).otherwise(F.col("topic")),
        )
        .select(id_col, "topic", "topic_weight")
    )


def topic_terms(model: TopicModel, n_terms: int = 8) -> DataFrame:
    """Top ``n_terms`` vocabulary terms per topic as
    ``(topic, terms csv, weights csv)`` — n_topics rows, the corpus
    data card's topic table."""
    vocab = model.vectorizer.vocabulary
    spark = model.lda_model.describeTopics(n_terms).sparkSession
    desc = model.lda_model.describeTopics(n_terms)
    vocab_df = F.broadcast(
        spark.createDataFrame(
            [(i, t) for i, t in enumerate(vocab)], "idx int, term string"
        )
    )
    exploded = desc.select(
        "topic", F.posexplode("termIndices").alias("pos", "idx")
    ).join(vocab_df, "idx")
    terms = exploded.groupBy("topic").agg(
        F.array_join(
            F.transform(
                F.sort_array(F.collect_list(F.struct("pos", "term"))),
                lambda s: s["term"],
            ),
            ",",
        ).alias("terms")
    )
    return terms.orderBy("topic")
