"""Corpus-curation operators: decontamination, repetition signals,
Gopher-style quality rules, PII redaction.

These are the filters a training-data pipeline runs between ingest and
packing. Hot paths are Catalyst expressions or broadcast joins — with
ONE measured exception: ``repetition_signals`` defaults to an
Arrow-batched pandas kernel, because its per-row array folds are
CodegenFallback (interpreted) expressions whose struct allocation
churn dominates at corpus scale (see the operator docstring; a pure
Catalyst ``impl="jvm"`` is kept and equivalence-gated).

Scale notes
-----------
- ``decontaminate`` assumes the eval/benchmark side is small (eval sets
  are thousands of documents); its distinct shingle set is broadcast, so
  the 100 TB train side is never shuffled — each scan task probes the
  broadcast hash table and only (doc_id, hit) pairs move.
- ``repetition_signals`` is per-row hash counting over the lines/grams
  of ONE document (linear in document length, embarrassingly parallel
  across docs; Arrow-batched by default).
- ``redact_pii`` is a constant chain of regexp_replace ops.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from terrorblade_spark.functions.exprs import tokens
from terrorblade_spark.operators.textops import shingles

# ---------------------------------------------------------------------------
# decontamination (train-vs-eval n-gram overlap; the GPT-3/PaLM method)
# ---------------------------------------------------------------------------


def decontaminate(
    train: DataFrame,
    eval_df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    max_overlap_ratio: float = 0.5,
) -> DataFrame:
    """Flag training documents that share n-gram shingles with any
    evaluation document.

    Returns ``train`` + ``n_shingles``, ``n_contaminated`` (how many of
    the doc's distinct shingles appear anywhere in the eval corpus),
    ``contamination_ratio``, and ``is_contaminated`` (ratio >
    ``max_overlap_ratio``).

    Plan shape: distinct eval shingles (small — eval sets are thousands
    of docs) are broadcast; the train side explodes to (id, shingle),
    inner-joins the broadcast set, and aggregates hit counts per id —
    a narrow map-side probe, no shuffle of document bodies. The final
    attach joins only (id, n_contaminated) back onto train.
    """
    eval_shingles = (
        eval_df.select(F.explode(shingles(text_col, n)).alias("shingle")).distinct()
    )
    train_sh = train.select(
        F.col(id_col), F.explode(shingles(text_col, n)).alias("shingle")
    )
    hits = (
        train_sh.join(F.broadcast(eval_shingles), "shingle")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_contaminated"))
    )
    out = (
        train.withColumn("n_shingles", F.size(shingles(text_col, n)).cast("long"))
        .join(hits, id_col, "left")
        .withColumn("n_contaminated", F.coalesce("n_contaminated", F.lit(0)).cast("long"))
        .withColumn(
            "contamination_ratio",
            F.when(
                F.col("n_shingles") > 0,
                F.col("n_contaminated").cast("double") / F.col("n_shingles").cast("double"),
            ).otherwise(F.lit(0.0)),
        )
        .withColumn("is_contaminated", F.col("contamination_ratio") > F.lit(max_overlap_ratio))
    )
    return out


# ---------------------------------------------------------------------------
# repetition signals (Gopher §A1.1-style)
# ---------------------------------------------------------------------------


def _lines(text_col: str) -> Column:
    return F.filter(F.split(F.col(text_col), "\n"), lambda x: F.length(F.trim(x)) > 0)


def _grams(text_col: str, n: int) -> Column:
    """Non-distinct lowercase word n-grams (shingles() dedups; counting
    repetition needs multiplicity)."""
    toks = F.transform(tokens(text_col), lambda t: F.lower(t))
    k = F.size(toks)
    m = F.greatest(k - (n - 1), F.lit(0))
    grams = F.slice(toks, 1, m)
    for j in range(1, n):
        grams = F.zip_with(grams, F.slice(toks, j + 1, m), lambda g, t: F.concat_ws(" ", g, t))
    return F.when(k >= n, grams).otherwise(F.array().cast("array<string>"))


def repetition_signals(
    df: DataFrame, text_col: str = "text", impl: str = "arrow"
) -> DataFrame:
    """Per-document repetition features:

    - ``dup_line_char_frac``: fraction of line characters sitting in
      lines that occur more than once in the document,
    - ``max_line_repeat``: occurrence count of the most repeated line,
    - ``top_bigram_char_frac``: fraction of text characters covered by
      the most frequent word 2-gram (count * gram length / n_chars).

    Everything is row-local (a pure map, no shuffle at any scale); the
    two ``impl``s compute identical values and differ only in engine:

    - ``"arrow"`` (default): one Arrow-batched pandas UDF evaluating
      all three signals in a single pass with hash counting — the
      blocked-BLAS-kernel pattern. This is the hot path ON PURPOSE,
      an exception to the stay-JVM rule earned by measurement:
      higher-order array functions are CodegenFallback in Spark —
      every fold step runs on the INTERPRETED expression path and a
      struct-accumulator step allocates a fresh named struct, so at
      1M docs the allocation churn alone saturated a 48 GB heap
      (thread dumps: ArrayAggregate.eval -> CreateNamedStruct ->
      List.map). ~doc-count x ~50 us beats that by orders of
      magnitude.
    - ``"jvm"``: pure Catalyst expressions (array_sort + one linear
      run-length fold per signal), for sessions without Python
      workers. Fine at test scale; interpreted-eval-bound at corpus
      scale.

    Engine-parity: the arrow kernel replicates the JVM semantics
    exactly (Java ``\\s`` is ASCII-only — the kernel splits on
    ``[ \\t\\n\\x0b\\f\\r]+``, trims SPACE only, compares grams by
    code point = UTF-8 byte order). Unicode case-mapping parity
    (Python ``str.lower`` vs JVM ``lower()``) is unit-gated on
    İ/ı/ß/ẞ/final-sigma/full-width/Cherokee/titlecase-digraph/astral
    adversaries plus NBSP and ideographic-space non-separators
    (tests/test_curation.py — 0 divergences measured on Java 17 /
    CPython 3.11) and oracle-gated at sf0.01 (q67/q95).
    """
    if impl == "arrow":
        return _repetition_signals_arrow(df, text_col)
    if impl == "jvm":
        return _repetition_signals_jvm(df, text_col)
    raise ValueError(f"impl must be 'arrow' or 'jvm', got {impl!r}")


def _repetition_signals_arrow(df: DataFrame, text_col: str) -> DataFrame:
    """The Arrow kernel: one pandas UDF -> struct of the three signals
    (extracted ONCE — Python UDFs are pulled into a dedicated
    ArrowEvalPython node, so the three field references share a single
    evaluation, unlike inlined Catalyst expressions)."""
    from pyspark.sql.types import (
        DoubleType,
        LongType,
        StructField,
        StructType,
    )

    out_type = StructType(
        [
            StructField("dup_line_char_frac", DoubleType()),
            StructField("max_line_repeat", LongType()),
            StructField("top_bigram_char_frac", DoubleType()),
        ]
    )

    @F.pandas_udf(out_type)
    def _signals(texts: pd.Series) -> pd.DataFrame:
        import re
        from collections import Counter

        # Java \s is ASCII-only; Python \s is Unicode — match the JVM
        ws = re.compile(r"[ \t\n\x0b\f\r]+")
        rows = []
        for s in texts:
            if s is None:
                rows.append((0.0, 0, 0.0))
                continue
            # _lines: split on \n, keep lines non-blank after
            # SPACE-only trim (F.trim semantics)
            lines = [ln for ln in s.split("\n") if ln.strip(" ")]
            line_chars = 0
            lc: Counter = Counter()
            for ln in lines:
                line_chars += len(ln)
                lc[ln] += 1
            dup = sum(len(k) * c for k, c in lc.items() if c > 1)
            mx = max(lc.values(), default=0)
            dlf = dup / line_chars if line_chars > 0 else 0.0
            # tokens(): filter(split(trim(text), \s+), != ''), lowered
            t = s.strip(" ")
            toks = [w.lower() for w in ws.split(t) if w] if t else []
            best_cov, best_gram = 0, None
            if len(toks) >= 2:
                gc: Counter = Counter()
                prev = toks[0]
                for w in toks[1:]:
                    gc[prev + " " + w] += 1
                    prev = w
                for g, c in gc.items():
                    cov = c * len(g)
                    # max by (covered, gram); str order == UTF-8 byte
                    # order, the JVM struct-max tiebreak
                    if cov > best_cov or (
                        cov == best_cov and (best_gram is None or g > best_gram)
                    ):
                        best_cov, best_gram = cov, g
            n_chars = len(s)
            tbf = (
                best_cov / n_chars
                if (n_chars > 0 and best_gram is not None)
                else 0.0
            )
            rows.append((dlf, mx, tbf))
        return pd.DataFrame(
            rows,
            columns=["dup_line_char_frac", "max_line_repeat", "top_bigram_char_frac"],
        )

    rep = _signals(F.col(text_col))
    return (
        df.withColumn("__rep", rep)
        .withColumn("dup_line_char_frac", F.col("__rep.dup_line_char_frac"))
        .withColumn("max_line_repeat", F.col("__rep.max_line_repeat"))
        .withColumn("top_bigram_char_frac", F.col("__rep.top_bigram_char_frac"))
        .drop("__rep")
    )


def _repetition_signals_jvm(df: DataFrame, text_col: str) -> DataFrame:
    """The Catalyst-expression path: array_sort + one linear
    run-length fold per signal (the original shape was a nested
    filter-inside-fold — O(n^2) per doc in LINE and WORD count; the
    1M-doc pipeline probe measured it as the dominant curate cost and
    a ``max_words``-sized doc is 10^10 comparisons). Equal-element
    runs of the sorted array give the same occurrence counts in one
    pass, value-identical.
    """
    lines = _lines(text_col)
    line_chars = F.aggregate(lines, F.lit(0).cast("long"), lambda a, x: a + F.length(x))
    # one pass over the sorted lines: runs of equal lines replace the
    # per-occurrence count(filter) scan. When a run reaches 2 both
    # occurrences' chars become duplicate chars at once (+2*len), each
    # further occurrence adds its own (+len) — total c*len per line
    # with c >= 2, exactly the old numerator. max repeat = longest run.
    line_stats = F.aggregate(
        F.array_sort(lines),
        F.struct(
            F.lit(None).cast("string").alias("prev"),
            F.lit(0).alias("run"),
            F.lit(0).cast("long").alias("dup"),
            F.lit(0).alias("mx"),
        ),
        lambda a, x: F.struct(
            x.alias("prev"),
            # NULL prev (first element) compares NULL -> otherwise(1)
            F.when(a["prev"] == x, a["run"] + 1).otherwise(F.lit(1)).alias("run"),
            (
                a["dup"]
                + F.when(
                    (a["prev"] == x) & (a["run"] == 1), 2 * F.length(x)
                )
                .when(a["prev"] == x, F.length(x))
                .otherwise(F.lit(0))
            ).cast("long").alias("dup"),
            F.greatest(
                a["mx"],
                F.when(a["prev"] == x, a["run"] + 1).otherwise(F.lit(1)),
            ).alias("mx"),
        ),
    )
    grams = _grams(text_col, 2)
    n_chars = F.length(F.col(text_col)).cast("long")
    # winner by covered chars (count * gram length) with the gram
    # string as the deterministic tiebreak — the same (covered, gram)
    # struct-max order as the old array_max over distinct grams, but
    # computed from equal-gram runs of the sorted array. Updating the
    # best at every step of a run is safe: a run's covered value only
    # grows, so the final step wins any comparison an intermediate one
    # did.
    gram_best = F.aggregate(
        F.array_sort(grams),
        F.struct(
            F.lit(None).cast("string").alias("prev"),
            F.lit(0).alias("run"),
            F.lit(0).cast("long").alias("cov"),
            F.lit(None).cast("string").alias("gram"),
        ),
        lambda a, g: F.struct(
            g.alias("prev"),
            F.when(a["prev"] == g, a["run"] + 1).otherwise(F.lit(1)).alias("run"),
            F.greatest(
                a["cov"],
                (
                    F.when(a["prev"] == g, a["run"] + 1).otherwise(F.lit(1))
                    * F.length(g)
                ).cast("long"),
            ).alias("cov"),
            F.when(
                (
                    F.when(a["prev"] == g, a["run"] + 1).otherwise(F.lit(1))
                    * F.length(g)
                ).cast("long")
                > a["cov"],
                g,
            )
            .when(
                (
                    (
                        F.when(a["prev"] == g, a["run"] + 1).otherwise(F.lit(1))
                        * F.length(g)
                    ).cast("long")
                    == a["cov"]
                )
                & (a["gram"].isNull() | (g > a["gram"])),
                g,
            )
            .otherwise(a["gram"])
            .alias("gram"),
        ),
    )
    # materialize each fold ONCE in its own projection and extract
    # fields from the materialized struct: inlining line_stats /
    # gram_best per field reference re-evaluates the interpreted
    # ArrayAggregate 2x / ~4x (CollapseProject keeps separate Projects
    # only because a multi-referenced non-cheap expression blocks the
    # collapse — the explicit staging makes that guaranteed, and the
    # plan gate below it checkable)
    return (
        df.withColumn("__rep_lines", line_stats)
        .withColumn("__rep_gram", gram_best)
        .withColumn("__rep_lc", line_chars)
        .withColumn(
            "dup_line_char_frac",
            F.when(
                F.col("__rep_lc") > 0,
                F.col("__rep_lines.dup").cast("double") / F.col("__rep_lc").cast("double"),
            ).otherwise(F.lit(0.0)),
        )
        .withColumn(
            "max_line_repeat",
            F.coalesce(F.col("__rep_lines.mx"), F.lit(0)).cast("long"),
        )
        .withColumn(
            "top_bigram_char_frac",
            F.when(
                (n_chars > 0) & F.col("__rep_gram.gram").isNotNull(),
                F.col("__rep_gram.cov").cast("double") / n_chars.cast("double"),
            ).otherwise(F.lit(0.0)),
        )
        .drop("__rep_lines", "__rep_gram", "__rep_lc")
    )


# ---------------------------------------------------------------------------
# Gopher-style quality rules
# ---------------------------------------------------------------------------


def gopher_filter(
    df: DataFrame,
    text_col: str = "text",
    min_words: int = 5,
    max_words: int = 100_000,
    min_mean_word_len: float = 2.0,
    max_mean_word_len: float = 12.0,
    max_symbol_word_ratio: float = 0.1,
    max_dup_line_char_frac: float = 0.3,
    rep_impl: str = "arrow",
) -> DataFrame:
    """Rule-based quality gate (Gopher §A1.1 shape, thresholds relaxed
    for short-text corpora): word-count band, mean-word-length band,
    symbol-to-word ratio (# and ellipsis), duplicate-line fraction.

    Adds ``quality_reasons`` (array of failed rule names, empty = keep)
    and ``keep`` — filtering is the caller's choice so rejects can be
    audited. One pass of row-local expressions; no shuffle.

    ``rep_impl`` passes through to :func:`repetition_signals`: the
    default Arrow kernel needs pandas/pyarrow Python workers at
    runtime; ``rep_impl="jvm"`` keeps the whole gate pure-Catalyst for
    sessions without them (value-identical, equivalence-gated).
    """
    # coalesce: NULL text must fail too_few_words like '' does — raw
    # NULL makes every check condition NULL, which filters to an empty
    # reasons array and silently KEEPS the junk row
    toks = tokens(F.coalesce(F.col(text_col), F.lit("")))
    n_words = F.size(toks).cast("long")
    mean_wl = F.when(
        n_words > 0,
        F.aggregate(toks, F.lit(0).cast("long"), lambda a, t: a + F.length(t)).cast("double")
        / n_words.cast("double"),
    ).otherwise(F.lit(0.0))
    n_symbols = (
        F.length(F.col(text_col))
        - F.length(F.regexp_replace(F.col(text_col), r"#|\.\.\.", ""))
    ).cast("long")
    sym_ratio = F.when(n_words > 0, n_symbols.cast("double") / n_words.cast("double")).otherwise(
        F.lit(0.0)
    )

    with_rep = repetition_signals(df, text_col, impl=rep_impl)
    checks = [
        (F.col("__n_words") < F.lit(min_words), "too_few_words"),
        (F.col("__n_words") > F.lit(max_words), "too_many_words"),
        (F.col("__mean_wl") < F.lit(min_mean_word_len), "mean_word_len_low"),
        (F.col("__mean_wl") > F.lit(max_mean_word_len), "mean_word_len_high"),
        (F.col("__sym_ratio") > F.lit(max_symbol_word_ratio), "symbol_ratio"),
        (F.col("dup_line_char_frac") > F.lit(max_dup_line_char_frac), "dup_lines"),
    ]
    reasons = F.filter(
        F.array(*[F.when(cond, F.lit(name)).otherwise(F.lit(None)) for cond, name in checks]),
        lambda x: x.isNotNull(),
    )
    return (
        with_rep.withColumn("__n_words", n_words)
        .withColumn("__mean_wl", mean_wl)
        .withColumn("__sym_ratio", sym_ratio)
        .withColumn("quality_reasons", reasons)
        .withColumn("keep", F.size(F.col("quality_reasons")) == 0)
        .drop("__n_words", "__mean_wl", "__sym_ratio")
    )


# ---------------------------------------------------------------------------
# PII redaction
# ---------------------------------------------------------------------------

# Patterns restricted to the regex subset Java and RE2 share (no
# lookarounds), so DuckDB twins can replay them verbatim.
PII_PATTERNS: tuple[tuple[str, str, str], ...] = (
    ("email", r"[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4", r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b", "<IP>"),
    ("phone", r"\+[0-9][0-9()\-\s]{6,}[0-9]", "<PHONE>"),
)


def redact_pii(df: DataFrame, text_col: str = "text", out_col: str | None = None) -> DataFrame:
    """Replace emails / IPv4s / phone numbers with typed placeholders
    and record per-kind match counts (``n_email``/``n_ipv4``/
    ``n_phone``). Patterns apply in declaration order (emails first so
    their user@host digits never half-match the phone pattern).
    Pure regexp_replace/regexp_count chain — codegen'd, no shuffle.
    """
    out_col = out_col or text_col
    redacted = F.col(text_col)
    counts = {}
    for kind, pat, token in PII_PATTERNS:
        counts[kind] = F.regexp_count(redacted, F.lit(pat)).cast("long")
        redacted = F.regexp_replace(redacted, pat, token)
    out = df
    for kind in counts:
        out = out.withColumn(f"n_{kind}", counts[kind])
    return out.withColumn(out_col, redacted)


def remove_boilerplate_lines(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_line_df: float = 0.005,
    min_line_count: int = 2,
) -> DataFrame:
    """Corpus-level boilerplate removal: drop every line that appears
    in more than ``max_line_df`` of documents (cookie banners, nav
    menus, license footers — the lines per-document filters can't see
    because they look fine in isolation). The RefinedWeb/CCNet-style
    complement to ``repetition_signals``'s within-document checks.

    Plan (the shingle-df-cap shape): explode non-blank lines with
    position -> hash each line ONCE -> document frequency per line
    hash (map-side-combined groupBy) -> hot set (bounded: at most
    total-lines/cap lines can exceed the cap, so AQE broadcasts the
    anti-join) -> reassemble surviving lines per doc in original order
    inside ONE aggregate (sort_array over (pos, line) structs — no
    window). The corpus df cap arrives as a 1-row broadcast scalar,
    not a plan literal, for the same recompile reason as
    ``jaccard_pairs``.

    Blank lines are structure, not content: they are never boilerplate
    candidates and are preserved verbatim, so paragraph breaks survive
    and a doc with no hot lines round-trips byte-identical.

    Returns all input rows with ``text`` rewritten (docs that were
    pure boilerplate keep only their blank structure) and
    ``n_removed_lines``.
    """
    from terrorblade_spark.functions.exprs import hash64

    # ALL lines, blanks included (posexplode keeps positions for the
    # ordered reassembly); blanks are exempt from hotness entirely
    ex = df.select(
        F.col(id_col), F.posexplode(F.split(F.col(text_col), "\n")).alias("pos", "line")
    ).withColumn("blank", F.length(F.trim(F.col("line"))) == 0).withColumn(
        "lh", hash64(F.trim(F.col("line")))
    )

    cap_df = df.agg(
        F.greatest(
            F.lit(float(min_line_count)),
            F.count(F.lit(1)).cast("double") * F.lit(max_line_df),
        ).alias("__cap")
    )
    # df per line hash over NON-BLANK lines: count DISTINCT docs (a
    # line repeated inside one doc is within-doc repetition, not
    # corpus boilerplate)
    hot = (
        ex.where(~F.col("blank"))
        .groupBy("lh")
        .agg(F.count_distinct(id_col).cast("double").alias("ldf"))
        .crossJoin(F.broadcast(cap_df))
        .where(F.col("ldf") > F.col("__cap"))
        .select("lh", F.lit(True).alias("hot"))
    )
    # ONE left join + ONE per-doc aggregate produces the rebuilt text
    # and both counters together — an anti-join + separate line-count
    # groupBy would rescan the exploded relation twice
    flagged = ex.join(hot, "lh", "left").withColumn(
        "drop", F.coalesce(F.col("hot"), F.lit(False)) & ~F.col("blank")
    )
    rebuilt = flagged.groupBy(id_col).agg(
        F.array_join(
            F.transform(
                F.sort_array(
                    F.collect_list(
                        F.when(~F.col("drop"), F.struct("pos", "line"))
                    )
                ),
                lambda s: s["line"],
            ),
            "\n",
        ).alias("__new_text"),
        F.sum(F.col("drop").cast("long")).alias("n_removed_lines"),
    )
    # LEFT join: a NULL-text doc explodes to zero rows and has no
    # rebuilt entry — it must still come back (all-input-rows
    # contract), with its text untouched and n_removed_lines = 0.
    return (
        df.join(rebuilt, id_col, "left")
        .withColumn(text_col, F.coalesce(F.col("__new_text"), F.col(text_col)))
        .withColumn(
            "n_removed_lines", F.coalesce(F.col("n_removed_lines"), F.lit(0).cast("long"))
        )
        .drop("__new_text")
    )


def dedup_lines(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Corpus-wide exact line dedup, keep-FIRST: every non-blank line
    keeps only its globally first occurrence (ordered by
    ``(id_col, position)``) and every later copy — in other documents
    or later in the same one — is removed. The CCNet/Dolma paragraph
    dedup step, complementary to :func:`remove_boilerplate_lines`:
    the df-cap drops only lines hot enough to clear a corpus
    threshold, while this removes EVERY repeat but preserves one
    canonical copy, so no content is lost outright.

    Plan: posexplode lines with position -> hash each trimmed line
    ONCE -> per-hash winner = ``min(struct(doc, pos))`` (a map-side
    combined aggregate: only one extreme per distinct line crosses the
    shuffle, so a line repeated in half the corpus costs its combiner
    nothing — the skew-safe alternative to a row_number window over
    the hash, which would sort the full hot group in one task) ->
    join winners back (AQE handles residual join skew) -> ordered
    NULL-skipping reassembly in ONE aggregate. Blank lines are
    structure, not content: never candidates, always preserved.

    Returns all input rows with ``text`` rewritten and
    ``n_removed_lines``. Determinism: the keeper is a total-order
    minimum, independent of partitioning.

    Reference parity: the reference dedups whole messages via DuckDB
    PK inserts (telegram_database.py:925-928); sub-document dedup has
    no reference twin — it exists for the LLM-corpus surface.
    """
    from terrorblade_spark.functions.exprs import hash64

    ex = df.select(
        F.col(id_col), F.posexplode(F.split(F.col(text_col), "\n")).alias("pos", "line")
    ).withColumn("blank", F.length(F.trim(F.col("line"))) == 0).withColumn(
        "lh", hash64(F.trim(F.col("line")))
    )
    winners = (
        ex.where(~F.col("blank"))
        .groupBy("lh")
        .agg(F.min(F.struct(id_col, "pos")).alias("__w"))
    )
    flagged = ex.join(winners, "lh", "left").withColumn(
        "drop",
        ~F.col("blank") & (F.struct(id_col, "pos") != F.col("__w")),
    )
    rebuilt = flagged.groupBy(id_col).agg(
        F.array_join(
            F.transform(
                F.sort_array(
                    F.collect_list(
                        F.when(~F.col("drop"), F.struct("pos", "line"))
                    )
                ),
                lambda s: s["line"],
            ),
            "\n",
        ).alias("__new_text"),
        F.sum(F.col("drop").cast("long")).alias("n_removed_lines"),
    )
    return (
        df.join(rebuilt, id_col, "left")
        .withColumn(text_col, F.coalesce(F.col("__new_text"), F.col(text_col)))
        .withColumn(
            "n_removed_lines", F.coalesce(F.col("n_removed_lines"), F.lit(0).cast("long"))
        )
        .drop("__new_text")
    )
