"""BPE trainer/encoder (operators/bpe.py): merge learning vs a
brute-force recount reference, encode/training consistency, the
Spark-vs-Python tokenizer contract, and distributed encoding."""

from __future__ import annotations

from collections import Counter

from terrorblade_spark.operators.bpe import (
    END,
    bpe_encode,
    encode_word,
    learn_bpe,
    word_frequencies,
)


def _brute_learn(items, n_merges):
    """Reference implementation: recount EVERY pair each round."""
    vocab = {tuple(w) + (END,): f for w, f in items}
    merges = []
    for _ in range(n_merges):
        pairs = Counter()
        for syms, f in vocab.items():
            for p in zip(syms, syms[1:]):
                pairs[p] += f
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        joined = best[0] + best[1]
        nxt = {}
        for syms, f in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and (syms[i], syms[i + 1]) == best:
                    out.append(joined)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            nxt[tuple(out)] = nxt.get(tuple(out), 0) + f
        vocab = nxt
    return merges


_ITEMS = [
    ("low", 5), ("lower", 2), ("newest", 6), ("widest", 3),
    ("lowest", 4), ("new", 7), ("wide", 1), ("widow", 2),
]


def test_learn_matches_bruteforce_reference():
    assert learn_bpe(_ITEMS, 25) == _brute_learn(_ITEMS, 25)


def test_encode_reproduces_training_segmentation():
    """Greedy rank-ordered inference must reproduce the segmentation
    training converged to, for every training word."""
    merges = learn_bpe(_ITEMS, 12)
    ranks = {p: i for i, p in enumerate(merges)}
    # rebuild training's final state with the brute reference
    vocab = {tuple(w) + (END,): f for w, f in _ITEMS}
    for best in merges:
        joined = best[0] + best[1]
        nxt = {}
        for syms, f in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and (syms[i], syms[i + 1]) == best:
                    out.append(joined)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            nxt[tuple(out)] = nxt.get(tuple(out), 0) + f
        vocab = nxt
    trained = {"".join(s for s in syms if s != END).replace(END, ""): syms for syms in vocab}
    for w, _ in _ITEMS:
        expect = next(syms for syms in vocab if "".join(syms).replace(END, "") == w)
        assert tuple(encode_word(w, ranks)) == expect, w


def test_word_frequencies_matches_python_tokenizer(spark):
    """The Spark word pass and the Python-side encoder must agree on
    the word class (unicode letters + apostrophe)."""
    import re

    texts = ["It's a test — naïve café tests; it's 42 tests_x"]
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    got = {r["word"]: r["freq"] for r in word_frequencies(df).collect()}
    expect = Counter(re.findall(r"[\w']+", texts[0].lower(), re.UNICODE))
    assert got == dict(expect)


def test_bpe_encode_distributed_matches_driver(spark):
    merges = learn_bpe(_ITEMS, 12)
    ranks = {p: i for i, p in enumerate(merges)}
    df = spark.createDataFrame(
        [(1, "the lowest widow is new"), (2, None), (3, "newest wide lower")],
        "id long, text string",
    )
    got = {r["id"]: r["bpe_tokens"] for r in bpe_encode(df, merges).collect()}
    import re

    for rid, text in [(1, "the lowest widow is new"), (3, "newest wide lower")]:
        expect = []
        for w in re.findall(r"[\w']+", text.lower(), re.UNICODE):
            expect.extend(encode_word(w, ranks))
        assert got[rid] == expect
    assert got[2] == []
    # subword streams rejoin to the original words (END marks boundaries)
    rejoined = "".join(got[1]).replace(END, " ").strip()
    assert rejoined == "the lowest widow is new"


def test_learn_bpe_from_spark_word_frequencies(spark):
    df = spark.createDataFrame(
        [(" ".join(w for w, f in _ITEMS for _ in range(f)),)], "text string"
    )
    wf = word_frequencies(df)
    assert learn_bpe(wf, 10) == _brute_learn(_ITEMS, 10)


def test_learn_matches_bruteforce_on_random_corpora():
    """Property check: the incremental pair-count maintenance must
    track the recount-everything reference on arbitrary corpora."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    words = st.text(alphabet="abcd", min_size=1, max_size=6)
    corpora = st.lists(
        st.tuples(words, st.integers(min_value=1, max_value=9)),
        min_size=1, max_size=12, unique_by=lambda kv: kv[0],
    )

    @settings(max_examples=60, deadline=None)
    @given(corpora, st.integers(min_value=1, max_value=15))
    def check(items, n_merges):
        assert learn_bpe(items, n_merges) == _brute_learn(items, n_merges)

    check()
