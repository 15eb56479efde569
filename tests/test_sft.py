"""conversation_pairs (operators/sft.py) on the dialog shape.

The gate-scale value oracle is q88 (sessionized events); these tests
pin the SFT semantics on a hand-checkable two-person dialog.
"""

from __future__ import annotations

import pytest

from terrorblade_spark.operators.sft import conversation_pairs

_DIALOG = [
    # (chat_id, msg_id, author, text)
    (1, 1, "alice", "hi"),
    (1, 2, "bob", "hello"),
    (1, 3, "alice", "how are you?"),
    (1, 4, "bob", "fine thanks"),
    (2, 1, "carol", "solo opener"),
]


def _df(spark):
    return spark.createDataFrame(
        _DIALOG, "chat_id long, msg_id long, author string, text string"
    )


def test_pairs_format_context_and_response(spark):
    out = conversation_pairs(
        _df(spark), ["chat_id"], ["msg_id"], "author", "text", "msg_id",
        context_size=2, min_context=1,
    )
    rows = {(r.chat_id, r.msg_id): r for r in out.collect()}
    # opener has no context -> dropped; chat 2's only message too
    assert set(rows) == {(1, 2), (1, 3), (1, 4)}
    assert rows[(1, 2)].context == "alice: hi"
    assert rows[(1, 2)].response == "hello"
    assert rows[(1, 2)].response_author == "bob"
    assert rows[(1, 3)].context == "alice: hi\nbob: hello"
    # context window caps at context_size=2: msg 1 falls out for msg 4
    assert rows[(1, 4)].context == "bob: hello\nalice: how are you?"
    assert rows[(1, 4)].n_context == 2


def test_min_context_zero_keeps_openers(spark):
    out = conversation_pairs(
        _df(spark), ["chat_id"], ["msg_id"], "author", "text", "msg_id",
        context_size=2, min_context=0,
    )
    rows = {(r.chat_id, r.msg_id): r for r in out.collect()}
    assert (2, 1) in rows and rows[(2, 1)].context == ""
    assert len(rows) == 5


def test_rejects_bad_args(spark):
    d = _df(spark)
    with pytest.raises(ValueError):
        conversation_pairs(d, ["chat_id"], ["msg_id"], "author", "text", "msg_id",
                           context_size=0)
    with pytest.raises(ValueError):
        conversation_pairs(d, ["chat_id"], ["msg_id"], "author", "text", "msg_id",
                           context_size=2, min_context=3)


def test_null_author_keeps_turn_in_context(spark):
    rows = [(1, 1, None, "first"), (1, 2, "bob", "second")]
    df = spark.createDataFrame(rows, "chat_id long, msg_id long, author string, text string")
    out = conversation_pairs(
        df, ["chat_id"], ["msg_id"], "author", "text", "msg_id",
        context_size=2, min_context=1,
    ).collect()
    assert len(out) == 1
    assert out[0].context == "unknown: first"
    assert out[0].n_context == 1


# --- preference_pairs (DPO chosen/rejected extraction) -----------------------

from terrorblade_spark.operators.sft import preference_pairs  # noqa: E402

_CANDS = [
    # (prompt, cand_id, score, text)
    ("p1", 1, 0.2, "weak"),
    ("p1", 2, 0.9, "strong"),
    ("p1", 3, 0.5, "mid"),
    ("p2", 1, 0.4, "only"),          # singleton -> no pair
    ("p3", 1, 0.7, "tie-a"),
    ("p3", 2, 0.7, "tie-b"),         # exact tie -> id breaks it
    ("p4", 1, None, "unjudged"),     # null score drops the candidate
    ("p4", 2, 0.3, "judged"),
]


def _cands(spark):
    return spark.createDataFrame(
        _CANDS, "prompt string, cand_id long, score double, text string"
    )


def test_preference_extremes_and_payload(spark):
    out = preference_pairs(
        _cands(spark), ["prompt"], "score", "cand_id", payload_cols=["text"]
    )
    rows = {r.prompt: r for r in out.collect()}
    # p2 is a singleton; p4 has one scored candidate after the null drop
    assert set(rows) == {"p1", "p3"}
    p1 = rows["p1"]
    assert (p1.chosen_id, p1.chosen_text) == (2, "strong")
    assert (p1.rejected_id, p1.rejected_text) == (1, "weak")
    assert p1.n_candidates == 3
    assert p1.score_gap == pytest.approx(0.7)


def test_preference_tie_breaks_on_id(spark):
    out = preference_pairs(_cands(spark), ["prompt"], "score", "cand_id")
    p3 = {r.prompt: r for r in out.collect()}["p3"]
    # equal scores: chosen takes the larger id, rejected the smaller
    assert (p3.chosen_id, p3.rejected_id) == (2, 1)
    assert p3.score_gap == 0.0


def test_preference_margin_gates_pairs(spark):
    out = preference_pairs(
        _cands(spark), ["prompt"], "score", "cand_id", margin=0.5
    )
    assert [r.prompt for r in out.collect()] == ["p1"]  # gap 0.7 clears 0.5


def test_preference_rejects_bad_min_candidates(spark):
    with pytest.raises(ValueError):
        preference_pairs(_cands(spark), ["prompt"], "score", "cand_id",
                         min_candidates=1)
