"""Text-analysis operators for LLM-data-pipeline prep.

All are pure Catalyst expressions (split/filter/transform/aggregate
higher-order functions) — no Python UDFs, so they run inside
whole-stage codegen and scale linearly with input bytes.

Word-count semantics: whitespace-run tokenization (split on \\s+,
drop empties). The reference's SQL formula counts single-space runs
(analyze_dialogues.py:273-276); we standardize on \\s+ and mirror the
exact same regex in the DuckDB oracle (SURVEY §2.8 note).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from terrorblade_spark.functions.exprs import hash64, tokens

# tiny per-language stopword lists for the n-gram/stopword language-ID
# heuristic; deliberately small + frozen so the oracle can embed them.
STOPWORDS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and", "to", "in", "is", "it", "that", "for"),
    "de": ("der", "die", "das", "und", "ist", "ein", "zu", "mit", "von", "nicht"),
    "fr": ("le", "la", "les", "et", "un", "une", "est", "que", "pour", "dans"),
    "es": ("el", "la", "los", "las", "y", "es", "un", "una", "que", "por"),
}


def with_token_count(df: DataFrame, text_col: str = "text", out_col: str = "n_tokens") -> DataFrame:
    return df.withColumn(out_col, F.size(tokens(text_col)).cast("long"))


def word_count_expr(text_col: str = "text") -> Column:
    return F.size(tokens(text_col)).cast("long")


def stopword_ratio(text_col: str, lang: str) -> Column:
    """Fraction of tokens that are stopwords of ``lang``."""
    toks = F.transform(tokens(text_col), lambda t: F.lower(t))
    stop = F.array(*[F.lit(s) for s in STOPWORDS[lang]])
    n = F.size(toks)
    hits = F.size(F.filter(toks, lambda t: F.array_contains(stop, t)))
    return F.when(n > 0, hits.cast("double") / n.cast("double")).otherwise(F.lit(0.0))


def predict_language(df: DataFrame, text_col: str = "text", out_col: str = "pred_lang") -> DataFrame:
    """Language-ID heuristic: argmax of per-language stopword ratio,
    'und' (undetermined) when no stopwords hit. Deterministic argmax:
    score ties break to the alphabetically LAST language code
    (array_max compares (score, lang) structs lexicographically;
    element order in the array is irrelevant to it).
    """
    scored = F.array(
        *[
            F.struct(stopword_ratio(text_col, lang).alias("score"), F.lit(lang).alias("lang"))
            for lang in STOPWORDS
        ]
    )
    best = F.array_max(scored)
    return df.withColumn(
        out_col, F.when(best["score"] > 0, best["lang"]).otherwise(F.lit("und"))
    )


def quality_score(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Heuristic document quality features + composite score:
    length, token stats, punctuation/digit/uppercase ratios, mean token
    length. All integer/single-op-double arithmetic → oracle-exact.
    """
    toks = tokens(text_col)
    n_chars = F.length(F.col(text_col)).cast("long")
    n_tokens = F.size(toks).cast("long")
    n_punct = n_chars - F.length(F.regexp_replace(F.col(text_col), r"[\.,;:!\?]", "")).cast("long")
    n_digit = n_chars - F.length(F.regexp_replace(F.col(text_col), "[0-9]", "")).cast("long")
    n_upper = n_chars - F.length(F.regexp_replace(F.col(text_col), "[A-Z]", "")).cast("long")
    mean_tok_len = F.when(
        n_tokens > 0,
        F.aggregate(toks, F.lit(0).cast("long"), lambda acc, t: acc + F.length(t)).cast("double")
        / n_tokens.cast("double"),
    ).otherwise(F.lit(0.0))
    punct_ratio = F.when(n_chars > 0, n_punct.cast("double") / n_chars.cast("double")).otherwise(F.lit(0.0))
    return (
        df.withColumn("n_chars_q", n_chars)
        .withColumn("n_tokens", n_tokens)
        .withColumn("punct_ratio", punct_ratio)
        .withColumn("digit_ratio", F.when(n_chars > 0, n_digit.cast("double") / n_chars.cast("double")).otherwise(F.lit(0.0)))
        .withColumn("upper_ratio", F.when(n_chars > 0, n_upper.cast("double") / n_chars.cast("double")).otherwise(F.lit(0.0)))
        .withColumn("mean_token_len", mean_tok_len)
    )


def fingerprint(df: DataFrame, text_col: str = "text", out_col: str = "fingerprint") -> DataFrame:
    """Document fingerprint: 60-bit hash of the whitespace-normalized,
    lowercased text. Exact-dedup key that survives whitespace noise.
    """
    normalized = F.array_join(F.transform(tokens(text_col), lambda t: F.lower(t)), " ")
    return df.withColumn(out_col, hash64(normalized))


def shingles(text_col: str, n: int = 3) -> Column:
    """Distinct word-level n-gram shingles of the lowercased text.

    Built by zipping the token array with its n-1 shifted slices, so
    the token expression is only referenced per ROW. (The obvious
    `transform(sequence, i -> slice(toks, i, n))` form re-evaluates
    `toks` inside the per-index lambda — higher-order functions are
    interpreted with no subexpression elimination, which made shingling
    O(tokens^2) per doc: measured 50x slowdown.)
    Empty result for docs shorter than n tokens.
    """
    toks = F.transform(tokens(text_col), lambda t: F.lower(t))
    k = F.size(toks)
    m = F.greatest(k - (n - 1), F.lit(0))  # number of shingles
    grams = F.slice(toks, 1, m)
    for j in range(1, n):
        shifted = F.slice(toks, j + 1, m)
        grams = F.zip_with(grams, shifted, lambda g, t: F.concat_ws(" ", g, t))
    return F.when(k >= n, F.array_distinct(grams)).otherwise(
        F.array().cast("array<string>")
    )


def duck_shingles(expr: str, n: int = 3) -> str:
    """DuckDB twin of :func:`shingles` (1-based list slicing)."""
    toks = f"list_transform(list_filter(regexp_split_to_array(trim({expr}), '\\s+'), t -> t <> ''), t -> lower(t))"
    return (
        f"(CASE WHEN len({toks}) >= {n} THEN "
        f"list_distinct(list_transform(generate_series(1, len({toks}) - {n - 1}), "
        f"i -> array_to_string(list_slice({toks}, i, i + {n - 1}), ' '))) "
        f"ELSE [] END)"
    )


# GPT-style byte-pair-ish pre-tokenization pattern: contractions,
# letter runs, SINGLE digits (modern BPE vocabularies split digit runs),
# punctuation runs. Same regex dialect subset works in Java (Spark) and
# RE2 (DuckDB) — no lookarounds.
BPE_ISH_PATTERN = r"'(?:s|t|re|ve|m|ll|d)|[A-Za-z]+|[0-9]|[^\sA-Za-z0-9]+"


def bpe_ish_tokens(text_col: str) -> Column:
    """Subword-ish token list via regexp_extract_all — the cheap
    LLM-token-count estimator for corpus budgeting (whitespace tokens
    undercount ~1.3-1.5x vs BPE)."""
    return F.regexp_extract_all(F.lower(F.col(text_col)), F.lit(BPE_ISH_PATTERN), 0)


def duck_bpe_ish(expr: str) -> str:
    """DuckDB twin of :func:`bpe_ish_tokens` (pattern single-quoted)."""
    pat = BPE_ISH_PATTERN.replace("'", "''")
    return f"regexp_extract_all(lower({expr}), '{pat}')"


def canonical_text(text_col: str = "text") -> Column:
    """Canonical form for near-exact dedup: lowercase, control chars ->
    spaces, whitespace runs collapsed, trimmed. The tier between exact
    (byte-identical) and MinHash (semantic) dedup — it collapses the
    re-crawl variants that differ only in case/whitespace/linebreaks,
    which in practice are the bulk of "duplicates" a crawler emits.
    Pure JVM regex (global-by-default in Spark; the DuckDB twin passes
    the 'g' flag), no UDF. Control chars fold into the whitespace
    class so the whole canonicalization is ONE regex pass.
    """
    lowered = F.lower(F.col(text_col))
    return F.trim(F.regexp_replace(lowered, "[\\x00-\\x1f\\s]+", " "))


def duck_canonical_text(expr: str) -> str:
    """DuckDB twin of :func:`canonical_text`."""
    return (
        "trim(regexp_replace(lower(" + expr + "), "
        "'[\\x00-\\x1f\\s]+', ' ', 'g'))"
    )
