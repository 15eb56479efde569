"""Byte-pair-encoding tokenizer training + distributed encoding.

Why this shape: BPE training (Sennrich et al. 2016, "Neural Machine
Translation of Rare Words with Subword Units") operates on the WORD
FREQUENCY table, not the corpus — so the 100 TB pass is exactly one
Spark job (`word_frequencies`: tokenize -> explode -> groupBy, map-side
combined, output |vocab| rows), and the merge loop runs on that compact
table driver-side, corpus-size independent. This is how production
tokenizer trainers work (a vocabulary cap bounds the loop's input; the
tail of hapax words contributes nothing to merge counts worth their
memory). Encoding is the reverse deal: the learned merge table is tiny
(n_merges rows, broadcast), the corpus is huge — `bpe_encode` applies
it distributed via an Arrow-batched pandas UDF with per-batch word
memoization (Zipf makes the hit rate ~99%).

The merge loop itself uses incremental pair-count maintenance (the
subword-nmt recipe): merging pair p only touches words containing p,
so each iteration costs O(words containing best pair), not O(vocab).

The engine's q59 token-budget query uses a REGEX approximation of
subword inflation; this module is the real trainable tokenizer the
budget pipeline would use in production. No SQL oracle (iterative
optimization, declared rows-only class per SURVEY §2 policy);
correctness is unit-gated against a brute-force recount-every-round
reference implementation.
"""

from __future__ import annotations

import re
from collections import Counter, defaultdict

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

END = "</w>"
_WORD_RE = re.compile(r"[\w']+", re.UNICODE)


def word_frequencies(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Corpus -> (word, freq): the single distributed pass. Lowercased
    word characters, the same token class the Python-side encoder
    splits on (the contract is pinned by a unit test)."""
    # (?U): Java \w is ASCII-only by default; the Python-side encoder's
    # re.UNICODE \w must see the same word class
    words = F.explode(
        F.filter(
            F.split(F.lower(F.col(text_col)), r"(?U)[^\w']+"), lambda w: w != ""
        )
    ).alias("word")
    return df.select(words).groupBy("word").agg(F.count(F.lit(1)).alias("freq"))


def _symbols(word: str) -> tuple[str, ...]:
    return tuple(word) + (END,)


def learn_bpe(
    word_freq: DataFrame | list[tuple[str, int]],
    n_merges: int,
    max_vocab_words: int = 1_000_000,
) -> list[tuple[str, str]]:
    """Learn the ordered merge list from a (word, freq) relation.

    The relation is truncated to the ``max_vocab_words`` most frequent
    words (ties broken by word) before collecting — the driver holds a
    BOUNDED table regardless of corpus size. Ties between candidate
    merges break by (count desc, pair lexicographic asc): fully
    deterministic across runs and partitionings.
    """
    if isinstance(word_freq, DataFrame):
        rows = (
            word_freq.orderBy(F.desc("freq"), F.asc("word"))
            .limit(max_vocab_words)
            .collect()
        )
        items = [(r["word"], r["freq"]) for r in rows]
    else:
        items = sorted(word_freq, key=lambda kv: (-kv[1], kv[0]))[:max_vocab_words]

    import heapq

    vocab: list[list[str]] = [list(_symbols(w)) for w, _ in items]
    freqs = [f for _, f in items]
    pair_counts: Counter = Counter()
    pair_words: defaultdict[tuple[str, str], set[int]] = defaultdict(set)
    for wi, syms in enumerate(vocab):
        for p in zip(syms, syms[1:]):
            pair_counts[p] += freqs[wi]
            pair_words[p].add(wi)

    # best-pair selection via a max-heap with LAZY invalidation: stale
    # entries (count changed since push) are discarded at pop time. A
    # full min() scan of pair_counts per merge would be O(n_merges x
    # |distinct pairs|) driver time — at the 1M-word cap that is the
    # difference between seconds and hours. Heap order (-count, pair)
    # reproduces the deterministic (count desc, pair asc) tie-break.
    heap = [(-c, p) for p, c in pair_counts.items()]
    heapq.heapify(heap)

    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        best = None
        while heap:
            negc, p = heapq.heappop(heap)
            if pair_counts.get(p) == -negc:
                best = p
                break
        if best is None:
            break
        merges.append(best)
        joined = best[0] + best[1]
        touched: set[tuple[str, str]] = set()
        # incremental update: only words containing `best` change
        for wi in list(pair_words[best]):
            syms, f = vocab[wi], freqs[wi]
            for p in zip(syms, syms[1:]):
                pair_counts[p] -= f
                touched.add(p)
                if pair_counts[p] <= 0:
                    del pair_counts[p]
                pair_words[p].discard(wi)
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and (syms[i], syms[i + 1]) == best:
                    out.append(joined)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            vocab[wi] = out
            for p in zip(out, out[1:]):
                pair_counts[p] += f
                touched.add(p)
                pair_words[p].add(wi)
        for p in touched:
            if p in pair_counts:
                heapq.heappush(heap, (-pair_counts[p], p))
    return merges


def encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Greedy lowest-rank-first merge application (the standard BPE
    inference): repeatedly merge the best-ranked adjacent pair."""
    syms = list(_symbols(word))
    while len(syms) > 1:
        best_rank, best_i = None, -1
        for i, p in enumerate(zip(syms, syms[1:])):
            r = ranks.get(p)
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_rank is None:
            break
        merged = syms[best_i] + syms[best_i + 1]
        target = (syms[best_i], syms[best_i + 1])
        # merge ALL occurrences of the chosen pair left-to-right
        out, i = [], 0
        while i < len(syms):
            if i + 1 < len(syms) and (syms[i], syms[i + 1]) == target:
                out.append(merged)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        syms = out
    return syms


def bpe_encode(
    df: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    out_col: str = "bpe_tokens",
) -> DataFrame:
    """Attach the subword token array for each row's text. Arrow-
    batched pandas UDF; the merge-rank dict rides the closure (tiny —
    n_merges entries) and a per-batch word cache exploits Zipf."""
    from pyspark.sql.functions import pandas_udf

    ranks = {p: i for i, p in enumerate(merges)}

    @pandas_udf("array<string>")
    def enc(texts: pd.Series) -> pd.Series:
        cache: dict[str, list[str]] = {}

        def one(t):
            if t is None:
                return []
            toks: list[str] = []
            for w in _WORD_RE.findall(t.lower()):
                got = cache.get(w)
                if got is None:
                    got = encode_word(w, ranks)
                    cache[w] = got
                toks.extend(got)
            return toks

        return texts.map(one)

    return df.withColumn(out_col, enc(F.col(text_col)))
