"""Learned quality classifier (operators/classifier.py): held-out
accuracy on a synthetic separable corpus, JVM-only scoring plan,
save/load round-trip with raw-text scoring."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from terrorblade_spark.operators.classifier import (
    quality_filter,
    score_quality,
    train_quality_classifier,
)

_GOOD = [
    "the quick brown fox jumps over the lazy dog near the river bank",
    "a clear and well formed sentence with ordinary words and structure",
    "researchers published a detailed study about language and learning",
    "she walked to the market and bought fresh bread and ripe apples",
    "the committee reviewed the proposal and approved the new budget",
    "children played in the park while parents watched from the benches",
    "the engineer explained the design in plain careful language",
    "morning light filled the quiet valley as the train moved north",
]
_BAD = [
    "click click click buy buy buy now now now cheap cheap cheap",
    "zzz qqq xxx kkk jjj vvv www lll ppp mmm nnn bbb",
    "free free free win win win prize prize prize money money money",
    "asdf asdf asdf qwer qwer qwer zxcv zxcv zxcv uiop uiop uiop",
    "subscribe subscribe like like share share follow follow now now",
    "lorem lorem lorem ipsum ipsum ipsum dolor dolor dolor sit sit",
    "aaa bbb aaa bbb aaa bbb aaa bbb aaa bbb aaa bbb",
    "hot hot hot deal deal deal sale sale sale 9999 9999 9999",
]


def _corpus(spark, texts, label, offset=0, reps=4):
    rows = []
    for r in range(reps):
        for i, t in enumerate(texts):
            # per-rep word perturbation: held-out docs (rep 3) differ
            # from every training doc but share the class's vocabulary
            rows.append((offset + r * len(texts) + i, r, f"{t} item{r}", label))
    return spark.createDataFrame(rows, "doc_id long, rep int, text string, label double")


@pytest.fixture(scope="module")
def model_and_data(spark):
    good = _corpus(spark, _GOOD, 1.0, offset=0)
    bad = _corpus(spark, _BAD, 0.0, offset=1000)
    full = good.unionByName(bad)
    train = full.where(F.col("rep") != 3).drop("rep")
    test = full.where(F.col("rep") == 3).drop("rep")
    model = train_quality_classifier(train, n_features=1 << 12, max_iter=30)
    return model, test


def test_holdout_accuracy(model_and_data):
    model, test = model_and_data
    scored = score_quality(model, test)
    n = scored.count()
    correct = scored.where(
        ((F.col("quality_score") >= 0.5) & (F.col("label") == 1.0))
        | ((F.col("quality_score") < 0.5) & (F.col("label") == 0.0))
    ).count()
    assert n > 0 and correct / n >= 0.9, (correct, n)
    # internal feature columns cleaned up
    assert set(scored.columns) == {"doc_id", "text", "label", "quality_score"}


def test_scoring_plan_is_jvm_only(model_and_data, spark):
    """The score path must stay whole-stage-codegen JVM: no BatchEvalPython
    (row-at-a-time UDF) and no Arrow eval either — the model is a chain
    of native transformers."""
    model, test = model_and_data
    plan = score_quality(model, test)._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan, plan[:1500]
    assert "ArrowEvalPython" not in plan, plan[:1500]


def test_quality_filter_threshold(model_and_data):
    model, test = model_and_data
    kept = quality_filter(model, test, threshold=0.5)
    assert kept.where(F.col("label") == 0.0).count() <= 1  # junk filtered


def test_save_load_scores_raw_text(model_and_data, spark, tmp_path):
    """The persisted model must score RAW text after reload — the
    tokenization lives inside the pipeline, so there is no Python-side
    preprocessing contract to keep in sync."""
    from pyspark.ml import PipelineModel

    model, _ = model_and_data
    path = str(tmp_path / "quality_model")
    model.write().overwrite().save(path)
    loaded = PipelineModel.load(path)
    df = spark.createDataFrame(
        [(1, "a plain well written sentence about daily life"),
         (2, "buy buy buy now now now zzz zzz zzz")],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r["quality_score"] for r in score_quality(loaded, df).collect()}
    assert got[1] > got[2]


def test_null_text_scores_instead_of_crashing(model_and_data, spark):
    """NULL text must flow through the JVM pipeline as an empty token
    array (prior-level score), not NPE the job — the heuristics-first
    stage tolerates such rows, so the model stage must too."""
    model, _ = model_and_data
    df = spark.createDataFrame(
        [(1, "a clear ordinary sentence"), (2, None)], "doc_id long, text string"
    )
    got = {r["doc_id"]: r["quality_score"] for r in score_quality(model, df).collect()}
    assert 0.0 <= got[2] <= 1.0 and got[1] > 0.5
