"""Exact-substring (repeated-window) dedup: hand-computed spans,
overlap merging, cut surgery, and the no-repeats-after-cut property."""

from __future__ import annotations

from pyspark.sql import functions as F

from terrorblade_spark.operators.substr import (
    cut_repeated_windows,
    repeated_window_spans,
)

_BOILER = "all rights reserved by the publisher and its assigns"  # 9 tokens


def _docs(spark):
    uniq1 = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    uniq2 = "one two three four five six seven eight nine ten"
    uniq3 = "red orange yellow green blue indigo violet pink brown black"
    rows = [
        (1, f"{uniq1} {_BOILER}"),
        (2, f"{_BOILER} {uniq2}"),
        (3, uniq3),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_spans_found_exactly_where_boilerplate_sits(spark):
    d = _docs(spark)
    spans = repeated_window_spans(d, window=9, min_repeats=2)
    got = {r["doc_id"]: (r["n_tokens"], [(s["start"], s["end"]) for s in r["spans"]])
           for r in spans.collect()}
    # doc 3 has no repeats; docs 1/2 share the 9-token boilerplate
    assert set(got) == {1, 2}
    assert got[1] == (19, [(10, 19)])
    assert got[2] == (19, [(0, 9)])


def test_overlapping_windows_merge_into_one_span(spark):
    # the repeated run is LONGER than the window -> consecutive window
    # hits must merge into a single span covering the whole run
    run = "w1 w2 w3 w4 w5 w6"
    d = spark.createDataFrame(
        [(1, f"{run} endx"), (2, f"starty {run}")], "doc_id long, text string"
    )
    spans = repeated_window_spans(d, window=3, min_repeats=2)
    got = {r["doc_id"]: [(s["start"], s["end"]) for s in r["spans"]] for r in spans.collect()}
    assert got[1] == [(0, 6)]
    assert got[2] == [(1, 7)]


def test_cut_removes_exactly_the_spans(spark):
    d = _docs(spark)
    spans = repeated_window_spans(d, window=9, min_repeats=2)
    cut = cut_repeated_windows(d, spans)
    got = {r["doc_id"]: r["text_dedup"] for r in cut.collect()}
    assert got[1] == "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    assert got[2] == "one two three four five six seven eight nine ten"
    assert got[3] == d.where("doc_id = 3").first()["text"]  # untouched


def test_no_repeated_windows_remain_after_cut(spark):
    d = _docs(spark)
    spans = repeated_window_spans(d, window=9, min_repeats=2)
    cut = cut_repeated_windows(d, spans).select(
        "doc_id", F.col("text_dedup").alias("text")
    )
    again = repeated_window_spans(cut, window=9, min_repeats=2)
    assert again.count() == 0


def test_within_document_repetition_detected(spark):
    run = "p q r s t"
    d = spark.createDataFrame(
        [(1, f"{run} filler1 filler2 {run}")], "doc_id long, text string"
    )
    spans = repeated_window_spans(d, window=5, min_repeats=2)
    got = [(s["start"], s["end"]) for s in spans.first()["spans"]]
    assert got == [(0, 5), (7, 12)]


def test_rolling_method_finds_identical_spans(spark):
    d = _docs(spark)
    a = repeated_window_spans(d, window=9, min_repeats=2, method="jvm")
    b = repeated_window_spans(d, window=9, min_repeats=2, method="rolling")
    fa = {r["doc_id"]: [(s["start"], s["end"]) for s in r["spans"]] for r in a.collect()}
    fb = {r["doc_id"]: [(s["start"], s["end"]) for s in r["spans"]] for r in b.collect()}
    assert fa == fb


def test_rolling_hash_no_false_positives_on_distinct_windows(spark):
    # 200 docs of distinct tokens: rolling hashes must collide nowhere
    rows = [(i, " ".join(f"t{i}_{j}" for j in range(20))) for i in range(200)]
    d = spark.createDataFrame(rows, "doc_id long, text string")
    assert repeated_window_spans(d, window=5, min_repeats=2, method="rolling").count() == 0


def test_cut_preserves_original_whitespace_of_unspanned_docs(spark):
    d = spark.createDataFrame(
        [(1, "line one\n\nline two\tend")], "doc_id long, text string"
    )
    spans = repeated_window_spans(d, window=3, min_repeats=2)  # none repeat
    out = cut_repeated_windows(d, spans).first()
    assert out["text_dedup"] == "line one\n\nline two\tend"
