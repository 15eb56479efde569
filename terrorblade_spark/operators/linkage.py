"""Entity resolution / fuzzy record linkage: blocked edit-distance
matching between two relations.

Why it's here: corpus curation constantly reconciles near-identical
records that exact dedup can't see — author names across sources,
venue strings, scraped titles with OCR noise. The reference engine has
no linkage surface; exact/MinHash dedup (operators/dedup.py) handles
whole documents, this handles short KEY STRINGS where token shingles
are too coarse and edit distance is the right metric.

Scale design — the one rule is NEVER all-pairs:

* Candidates come from an equi-join on caller-chosen BLOCKING keys
  (nation, zip prefix, phonetic bucket, first-n chars...). Block
  population bounds the pair count the same way LSH bands bound
  MinHash candidates; an unblocked call is refused, not silently
  quadratic.
* Two prefilters run BEFORE the edit-distance kernel, both row-local
  JVM expressions: the length band (|len(a)-len(b)| <= k is a
  Levenshtein lower bound) and first-char agreement (optional).
* The kernel is Spark's built-in ``levenshtein(l, r, threshold)`` —
  banded O(k*n) with early exit, returning -1 past the threshold, so
  no candidate ever pays the full O(n^2) DP table. JVM codegen, no
  Python.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def fuzzy_match(
    left: DataFrame,
    right: DataFrame,
    text_l: str,
    text_r: str,
    blocks: Sequence[tuple[str, str]],
    max_edit: int = 2,
    same_first_char: bool = False,
    out_col: str = "edit_distance",
) -> DataFrame:
    """Candidate matches between ``left`` and ``right``: rows agreeing
    on every blocking pair in ``blocks`` whose key strings are within
    ``max_edit`` Levenshtein distance. Returns all columns of both
    sides plus ``out_col`` (the exact distance, 0..max_edit). NULL key
    strings never match.

    ``blocks`` must be non-empty — blocking is what bounds the pair
    count at corpus scale; deliberately quadratic comparisons should
    be written as an explicit crossJoin at the call site, not smuggled
    through a linkage helper.
    """
    if not blocks:
        raise ValueError(
            "fuzzy_match requires at least one blocking pair — an unblocked "
            "match is all-pairs and does not scale"
        )
    if max_edit < 0:
        raise ValueError(f"max_edit must be >= 0, got {max_edit}")
    cond = None
    for lc, rc in blocks:
        c = left[lc] == right[rc]
        cond = c if cond is None else (cond & c)
    lt, rt = left[text_l], right[text_r]
    # Levenshtein lower bound: |len(a) - len(b)| — prunes before the DP
    band = F.abs(F.length(lt) - F.length(rt)) <= max_edit
    cond = cond & band & lt.isNotNull() & rt.isNotNull()
    if same_first_char:
        cond = cond & (F.substring(lt, 1, 1) == F.substring(rt, 1, 1))
    # threshold form early-exits and returns -1 past max_edit; -1 must
    # be EXCLUDED explicitly (it would pass a naive <= max_edit check)
    dist = F.levenshtein(lt, rt, max_edit)
    return (
        left.join(right, cond)
        .withColumn(out_col, dist)
        .where(F.col(out_col) >= 0)
    )


def best_fuzzy_match(
    left: DataFrame,
    right: DataFrame,
    text_l: str,
    text_r: str,
    blocks: Sequence[tuple[str, str]],
    id_l: str,
    tiebreak_r: str,
    max_edit: int = 2,
    out_col: str = "edit_distance",
) -> DataFrame:
    """One best match per left row: minimum edit distance, ties broken
    by ``tiebreak_r`` (a unique right-side column) so the winner is
    deterministic on any partitioning. A map-side-combined min-struct
    aggregate — only one extreme per left id crosses the shuffle, the
    same skew-safe keeper shape as dedup_lines."""
    m = fuzzy_match(left, right, text_l, text_r, blocks, max_edit, out_col=out_col)
    keep = [c for c in m.columns if c != out_col]
    winner = m.groupBy(id_l).agg(
        F.min(F.struct(out_col, tiebreak_r)).alias("__w")
    )
    return (
        m.join(winner, id_l)
        .where(
            (F.col(out_col) == F.col("__w")[out_col])
            & (F.col(tiebreak_r) == F.col("__w")[tiebreak_r])
        )
        .select(*keep, out_col)
    )


def blocking_key(
    col: str | F.Column,
    kind: str = "prefix",
    n: int = 3,
) -> F.Column:
    """Standard linkage blocking keys, all row-local JVM expressions:

    * ``prefix`` — first ``n`` lowercased characters (cheap, high
      recall for typo-at-the-end data; misses leading-char typos).
    * ``soundex`` — phonetic bucket (names transcribed by ear).
    * ``token_sort`` — lowercased alphanumeric tokens, sorted and
      rejoined: word-order-insensitive ("smith, john" blocks with
      "John Smith"), the fuzzywuzzy token_sort signature.

    Blocking keys trade recall for candidate-count: a true match with
    different keys is never compared. Production linkage typically
    UNIONS candidates from 2-3 complementary keys — cheap, because
    each block join is bounded.
    """
    c = F.col(col) if isinstance(col, str) else col
    if kind == "prefix":
        return F.substring(F.lower(c), 1, n)
    if kind == "soundex":
        return F.soundex(c)
    if kind == "token_sort":
        toks = F.split(F.lower(F.trim(c)), r"[^a-z0-9]+")
        return F.array_join(
            F.sort_array(F.filter(toks, lambda t: F.length(t) > 0)), " "
        )
    raise ValueError(f"unknown blocking kind {kind!r}")
