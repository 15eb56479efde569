"""Linear quality classifier over hashed word n-grams — the
fasttext-style model every production pretraining pipeline uses for
quality filtering (CCNet's wiki-vs-crawl fasttext, fineweb's edu
classifier), built from Spark MLlib primitives so BOTH phases are
distributed and JVM-side:

- featurization: tokenize -> word bigrams (``pyspark.ml.feature.NGram``)
  -> hashing trick (``HashingTF``, 2^18 buckets) — a narrow map-only
  pipeline, no vocabulary to build or broadcast, no Python in the row
  path;
- training: ``LogisticRegression`` (L-BFGS with treeAggregate partial
  gradients — the distributed twin of fasttext's SGD over a hashed
  bag-of-ngrams; same model class, same accuracy regime for
  quality-vs-junk separation);
- scoring: the fitted pipeline is a chain of JVM transformers; at
  100 TB scoring is embarrassingly parallel with zero shuffles, and the
  model itself is one dense coefficient vector of |buckets| doubles
  (~2 MB at 2^18) broadcast to executors.

The reference has no learned quality model (its quality signals are the
heuristic ratios this repo ships in operators/curation.py); this is
beyond-reference surface for the LLM-data pipeline, composing with
``gopher_quality_filter`` (heuristics first, learned model second — the
standard two-stage recipe).

No oracle row: training is iterative optimization, deliberately outside
the SQL-expressible gate (SURVEY §2 rows-only policy); correctness is
unit-gated on held-out accuracy over a synthetic separable corpus plus
a no-Python-UDF plan assertion.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FEATURE_BUCKETS = 1 << 18


def _feature_stages(text_col: str, n_features: int):
    from pyspark.ml.feature import NGram, HashingTF, SQLTransformer

    # tokenization as a SQLTransformer so the WHOLE pipeline (including
    # this step) serializes with the model — a loaded model scores raw
    # text with no Python-side preprocessing contract to keep in sync.
    # coalesce: NULL text must yield an empty token array (the JVM
    # NGram/HashingTF transformers NPE on null input), so null-text
    # rows score at the model's prior instead of killing the job
    tok = SQLTransformer(
        statement=(
            "SELECT *, filter(split(lower(coalesce(__THIS__." + text_col + ", '')), "
            "'[^\\\\p{L}\\\\p{N}]+'), x -> x != '') AS __tokens FROM __THIS__"
        )
    )
    ng = NGram(n=2, inputCol="__tokens", outputCol="__bigrams")
    cat = SQLTransformer(
        statement="SELECT *, concat(__tokens, __bigrams) AS __grams FROM __THIS__"
    )
    tf = HashingTF(inputCol="__grams", outputCol="features", numFeatures=n_features)
    return [tok, ng, cat, tf]


def train_quality_classifier(
    labeled: DataFrame,
    text_col: str = "text",
    label_col: str = "label",
    n_features: int = FEATURE_BUCKETS,
    reg_param: float = 1e-4,
    max_iter: int = 50,
):
    """Fit the hashed-ngram logistic model on (text, label∈{0,1}) rows.
    Returns a ``pyspark.ml.PipelineModel`` (save/load-able)."""
    from pyspark.ml import Pipeline
    from pyspark.ml.classification import LogisticRegression

    lr = LogisticRegression(
        featuresCol="features",
        labelCol=label_col,
        regParam=reg_param,
        maxIter=max_iter,
    )
    pipe = Pipeline(stages=[*_feature_stages(text_col, n_features), lr])
    return pipe.fit(labeled)


def score_quality(
    model,
    df: DataFrame,
    out_col: str = "quality_score",
) -> DataFrame:
    """Attach p(label=1) from a fitted quality model. The transform is
    a JVM map-only pipeline; internal feature columns are dropped."""
    from pyspark.ml.functions import vector_to_array

    scored = model.transform(df)
    return scored.withColumn(
        out_col, vector_to_array(F.col("probability"))[1]
    ).drop("__tokens", "__bigrams", "__grams", "features", "rawPrediction",
           "probability", "prediction")


def quality_filter(
    model,
    df: DataFrame,
    threshold: float = 0.5,
    out_col: str = "quality_score",
) -> DataFrame:
    """Keep rows the model scores at or above ``threshold`` — the
    second stage after the heuristic Gopher gate."""
    return score_quality(model, df, out_col).where(F.col(out_col) >= threshold)
