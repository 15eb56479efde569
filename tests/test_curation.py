"""Curation-operator tests: decontamination (with a DuckDB twin),
repetition signals and Gopher rules (hand-computed expectations on
crafted docs), PII redaction (engine-portable regexes).
"""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from terrorblade_spark.operators.curation import (
    PII_PATTERNS,
    decontaminate,
    gopher_filter,
    redact_pii,
    repetition_signals,
)
from terrorblade_spark.operators.textops import duck_shingles


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    from terrorblade_spark.tables import load_table

    return load_table(spark, sf_dir, "documents")


def test_decontaminate_flags_eval_overlap(spark, docs):
    # eval set = 20 real documents; those same docs in train must come
    # out fully contaminated, and the overall flag count must match a
    # DuckDB twin of the same shingle-join.
    eval_df = docs.orderBy("doc_id").limit(20).select("doc_id", "text")
    got = decontaminate(docs, eval_df, n=3, max_overlap_ratio=0.5)
    eval_ids = {r["doc_id"] for r in eval_df.select("doc_id").collect()}
    rows = got.select("doc_id", "n_shingles", "n_contaminated", "is_contaminated").collect()
    by_id = {r["doc_id"]: r for r in rows}
    assert len(rows) == docs.count()
    for i in eval_ids:
        r = by_id[i]
        if r["n_shingles"] > 0:
            assert r["n_contaminated"] == r["n_shingles"]
            assert r["is_contaminated"]
    assert 0 < sum(r["is_contaminated"] for r in rows) < len(rows)


def test_decontaminate_matches_duckdb_twin(spark, docs, duck, sf_dir):
    eval_df = docs.orderBy("doc_id").limit(20).select("doc_id", "text")
    got = {
        r["doc_id"]: r["n_contaminated"]
        for r in decontaminate(docs, eval_df, n=3).select("doc_id", "n_contaminated").collect()
    }
    sh = duck_shingles("text", 3)
    want = {
        r[0]: r[1]
        for r in duck.execute(
            f"""
            WITH eval_ids AS (SELECT doc_id FROM documents ORDER BY doc_id LIMIT 20),
            eval_sh AS (
              SELECT DISTINCT unnest({sh}) AS shingle
              FROM documents WHERE doc_id IN (SELECT doc_id FROM eval_ids)
            ),
            train_sh AS (SELECT doc_id, unnest({sh}) AS shingle FROM documents)
            SELECT d.doc_id,
                   coalesce((SELECT count(*) FROM train_sh t
                             JOIN eval_sh e USING (shingle)
                             WHERE t.doc_id = d.doc_id), 0) AS n_contaminated
            FROM documents d
            """
        ).fetchall()
    }
    assert got == want


def test_repetition_signals_hand_computed(spark):
    df = spark.createDataFrame(
        [
            # 3 lines, "dup dup" twice (14 of 21 line chars in dups);
            # bigram "dup dup" appears twice per dup line + once
            # straddling? (no straddle: grams are per full text tokens)
            (1, "dup dup\ndup dup\nunique1"),
            (2, "a b c d"),  # no repetition
            (3, ""),  # empty
        ],
        "id long, text string",
    )
    got = {r["id"]: r for r in repetition_signals(df).collect()}
    r1 = got[1]
    assert r1["dup_line_char_frac"] == pytest.approx(14 / 21)
    assert r1["max_line_repeat"] == 2
    # tokens of doc 1: [dup,dup,dup,dup,unique1] -> bigram "dup dup" x3,
    # covers 3*7=21 chars of 23 text chars
    assert r1["top_bigram_char_frac"] == pytest.approx(21 / 23)
    r2 = got[2]
    assert r2["dup_line_char_frac"] == 0.0
    assert r2["max_line_repeat"] == 1
    # "a b" once -> 3/7
    assert r2["top_bigram_char_frac"] == pytest.approx(3 / 7)
    r3 = got[3]
    assert r3["dup_line_char_frac"] == 0.0
    assert r3["max_line_repeat"] == 0
    assert r3["top_bigram_char_frac"] == 0.0


def test_gopher_filter_reasons(spark):
    df = spark.createDataFrame(
        [
            (1, "This is a perfectly reasonable sentence with enough words here."),
            (2, "short"),
            (3, "spam spam\n" * 20),
            (4, "## ## ## ## ## some words here to pass the word count rule ok"),
        ],
        "id long, text string",
    )
    got = {r["id"]: r for r in gopher_filter(df).collect()}
    assert got[1]["keep"] and got[1]["quality_reasons"] == []
    assert "too_few_words" in got[2]["quality_reasons"]
    assert "dup_lines" in got[3]["quality_reasons"]
    assert "symbol_ratio" in got[4]["quality_reasons"]
    assert not got[4]["keep"]


def test_redact_pii_and_counts(spark):
    df = spark.createDataFrame(
        [
            (1, "mail me at bob.smith+x@example.co.uk or call +1 (555) 123-4567"),
            (2, "server 10.0.0.1 and 192.168.1.255 up"),
            (3, "nothing sensitive here"),
        ],
        "id long, text string",
    )
    got = {r["id"]: r for r in redact_pii(df).collect()}
    assert got[1]["n_email"] == 1 and got[1]["n_phone"] == 1
    assert "<EMAIL>" in got[1]["text"] and "<PHONE>" in got[1]["text"]
    assert "bob" not in got[1]["text"] and "555" not in got[1]["text"]
    assert got[2]["n_ipv4"] == 2 and got[2]["text"].count("<IP>") == 2
    assert got[3]["text"] == "nothing sensitive here"
    assert got[3]["n_email"] == got[3]["n_ipv4"] == got[3]["n_phone"] == 0


def test_redact_pii_patterns_portable_to_duckdb(duck):
    # the exact patterns must behave identically under RE2 so a SQL
    # oracle can replay redaction
    text = "a@b.com and 10.0.0.1 and +1 (555) 123-4567"
    expect = {"email": 1, "ipv4": 1, "phone": 1}
    for kind, pat, _ in PII_PATTERNS:
        got = duck.execute(
            "SELECT len(regexp_extract_all(?, ?))", [text, pat]
        ).fetchone()[0]
        assert got == expect[kind], kind


def test_decontaminate_plan_broadcasts_eval_side(spark, docs):
    eval_df = docs.limit(5).select("doc_id", "text")
    plan = decontaminate(docs, eval_df)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_remove_boilerplate_lines(spark):
    from terrorblade_spark.operators.curation import remove_boilerplate_lines

    banner = "ACCEPT COOKIES TO CONTINUE"
    docs = [(i, f"unique line {i}\n{banner}\nreal content {i}") for i in range(50)]
    docs.append((99, banner))  # a doc that is pure boilerplate
    docs.append((100, "standalone doc with no banner"))
    df = spark.createDataFrame(docs, "doc_id long, text string")

    out = {r["doc_id"]: r for r in remove_boilerplate_lines(df, max_line_df=0.1).collect()}
    # the banner (df=51/52) is gone everywhere; unique lines survive
    for i in range(50):
        assert out[i]["text"] == f"unique line {i}\nreal content {i}"
        assert out[i]["n_removed_lines"] == 1
    assert out[99]["text"] == ""  # pure boilerplate -> empty
    assert out[100]["text"] == "standalone doc with no banner"
    assert out[100]["n_removed_lines"] == 0
    # row conservation
    assert len(out) == 52


def test_boilerplate_distinct_doc_frequency(spark):
    """A line repeated many times INSIDE one doc is within-doc
    repetition, not corpus boilerplate — it must survive."""
    from terrorblade_spark.operators.curation import remove_boilerplate_lines

    df = spark.createDataFrame(
        [(1, "echo\necho\necho\necho"), (2, "other text")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r["text"] for r in remove_boilerplate_lines(df, max_line_df=0.9).collect()}
    assert out[1] == "echo\necho\necho\necho"


def test_boilerplate_preserves_blank_lines_and_roundtrips(spark):
    """Docs with no hot lines must round-trip byte-identical —
    including blank lines (paragraph structure is content)."""
    from terrorblade_spark.operators.curation import remove_boilerplate_lines

    texts = ["para one\n\npara two", "a\n\n\nb", "trailing newline\n"]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    out = {r["doc_id"]: r for r in remove_boilerplate_lines(df, max_line_df=0.9).collect()}
    for i, t in enumerate(texts):
        assert out[i]["text"] == t
        assert out[i]["n_removed_lines"] == 0


def test_boilerplate_null_text_row_survives(spark):
    """A NULL-text doc explodes to zero rows — the all-input-rows
    contract still requires it back, text untouched, 0 removed."""
    from terrorblade_spark.operators.curation import remove_boilerplate_lines

    banner = "SUBSCRIBE NOW"
    rows = [(i, f"{banner}\ncontent {i}") for i in range(20)]
    rows.append((98, None))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in remove_boilerplate_lines(df, max_line_df=0.1).collect()}
    assert len(out) == 21
    assert out[98]["text"] is None
    assert out[98]["n_removed_lines"] == 0
    assert out[0]["text"] == "content 0"


def test_gopher_filter_rejects_null_text(spark):
    """Review repro: NULL text made every rule condition NULL and the
    row sailed through with keep=True; it must fail too_few_words like
    the empty string does."""
    from terrorblade_spark.operators.curation import gopher_filter

    df = spark.createDataFrame(
        [(1, None), (2, ""), (3, "a perfectly ordinary sentence of words here")],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: (r["keep"], list(r["quality_reasons"])) for r in
           gopher_filter(df).collect()}
    assert got[1][0] is False and "too_few_words" in got[1][1]
    assert got[2][0] is False
    assert got[3][0] is True


def test_dedup_lines_keep_first(spark):
    """Corpus-wide keep-first: the shared line survives only at its
    (doc_id, pos) minimum; within-doc repeats drop too."""
    from terrorblade_spark.operators.curation import dedup_lines

    docs = [
        (1, "alpha\nSHARED\nomega"),
        (2, "SHARED\nbeta\nSHARED"),   # cross-doc dup + within-doc dup
        (3, "gamma\ngamma\nSHARED"),   # within-doc dup of its own line
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = {r["doc_id"]: r for r in dedup_lines(df).collect()}
    assert out[1]["text"] == "alpha\nSHARED\nomega"
    assert out[1]["n_removed_lines"] == 0
    assert out[2]["text"] == "beta"
    assert out[2]["n_removed_lines"] == 2
    assert out[3]["text"] == "gamma"
    assert out[3]["n_removed_lines"] == 2


def test_dedup_lines_blanks_and_nulls(spark):
    """Blank lines are structure: always preserved, never keepers or
    duplicates. NULL-text rows come back untouched."""
    from terrorblade_spark.operators.curation import dedup_lines

    docs = [
        (1, "a\n\nb"),
        (2, "\n\nc"),     # leading blanks preserved verbatim
        (3, None),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = {r["doc_id"]: r for r in dedup_lines(df).collect()}
    assert out[1]["text"] == "a\n\nb"
    assert out[2]["text"] == "\n\nc"
    assert out[3]["text"] is None
    assert out[3]["n_removed_lines"] == 0
    assert all(out[i]["n_removed_lines"] == 0 for i in (1, 2))


def test_dedup_lines_hot_line_skew(spark):
    """One line in EVERY doc (the skew case): exactly one copy
    survives — in the minimum (doc_id, pos) — and the plan's keeper
    aggregate is map-side combinable (HashAggregate/SortAggregate over
    the hash, not a window sort of the full hot group)."""
    from terrorblade_spark.operators.curation import dedup_lines

    n = 200
    docs = [(i, f"unique {i}\nHOT LINE") for i in range(n)]
    docs[0] = (0, "HOT LINE\nunique 0")  # keeper: doc 0, pos 0
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = {r["doc_id"]: r for r in dedup_lines(df).collect()}
    assert out[0]["text"] == "HOT LINE\nunique 0"
    kept = [i for i, r in out.items() if "HOT LINE" in (r["text"] or "")]
    assert kept == [0]
    assert sum(r["n_removed_lines"] for r in out.values()) == n - 1
    plan = dedup_lines(df)._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan


def test_repetition_signals_jvm_impl_hand_computed(spark):
    """The Catalyst fallback path (impl='jvm') computes the same
    hand-checked values as the default Arrow kernel."""
    df = spark.createDataFrame(
        [(1, "dup dup\ndup dup\nunique1"), (2, "a b c d"), (3, "")],
        "id long, text string",
    )
    got = {r["id"]: r for r in repetition_signals(df, impl="jvm").collect()}
    assert got[1]["dup_line_char_frac"] == pytest.approx(14 / 21)
    assert got[1]["max_line_repeat"] == 2
    assert got[1]["top_bigram_char_frac"] == pytest.approx(21 / 23)
    assert got[2]["max_line_repeat"] == 1
    assert got[3]["max_line_repeat"] == 0


def test_repetition_signals_arrow_jvm_equivalence(spark):
    """Bit-for-bit engine parity between the Arrow kernel and the
    Catalyst expression path on an adversarial fixture: seeded random
    docs with forced duplicate lines, NULL/empty/blank-only text,
    Java-whitespace-class separators (\\t \\x0b \\f \\r), SPACE-only
    trim edges, case-mixing, and covered-chars ties (the struct-max
    gram tiebreak). Guards the engine-substitution risk named in the
    operator docstring.

    Round 8: non-ASCII case-mapping adversaries — Python ``str.lower``
    vs JVM ``lower()`` divergence would silently change gopher
    keep/reject decisions on non-ASCII corpora. Covers İ (U+0130 →
    i + combining dot, a LENGTHENING lowercase), dotless ı, ß/ẞ,
    final-sigma context (Σ/ς), full-width forms, combining marks,
    Cherokee case pairs (late-Unicode case additions), titlecase
    digraphs (ǅ), astral math letters, and non-ASCII whitespace
    (NBSP U+00A0, ideographic space U+3000 — NOT separators for
    either engine's ASCII-only ``\\s``)."""
    import random

    rng = random.Random(7)
    words = [
        "a", "bb", "ccc", "dd", "e", "zz", "yy", "#", "...", "Tab\there", "MiXeD",
        "İstanbul", "straße", "ΟΔΟΣ", "Ꭰꭰ", "ｗｉｄｔｈ", "café",
    ]
    docs = []
    for i in range(120):
        lines = []
        for _ in range(rng.randint(0, 10)):
            lines.append(" ".join(rng.choice(words) for _ in range(rng.randint(0, 8))))
        if lines and rng.random() < 0.7:
            lines += [rng.choice(lines)] * rng.randint(1, 3)
        docs.append((i, "\n".join(lines)))
    docs += [
        (9001, ""),
        (9002, None),
        (9003, "\n\n\n"),
        (9004, "same same same same"),
        (9005, "x\nx\nx\ny"),
        (9006, "tie aa tie bb tie aa tie bb"),
        (9007, "  leading  spaces \n\t\n  "),
        (9008, "A a A a\nA a"),
        (9009, "word\tword\x0bword\fword\rword"),
        # --- non-ASCII case-mapping / whitespace adversaries ---
        (9010, "İstanbul İSTANBUL\nİstanbul İSTANBUL"),  # U+0130 dotted I
        (9011, "STRASSE straße STRASSE straße"),         # sharp s
        (9012, "ẞHARP ẞHARP ẞHARP ẞHARP"),               # capital sharp s
        (9013, "ΟΔΟΣ οδος ΟΔΟΣ οδος"),                   # final-sigma context
        (9014, "ΣΙΓΜΑ ΣΙΓΜΑ τέλοΣ τέλοΣ"),               # sigma at word end
        (9015, "ＦＵＬＬ ｗｉｄｔｈ ＦＵＬＬ ｗｉｄｔｈ"),  # full-width forms
        (9016, "café CAFÉ café CAFÉ"),   # combining acute
        (9017, "a b a b c"),                   # NBSP inside tokens
        (9018, "x　y x　y z"),                   # ideographic space
        (9019, "Ꭰ ꭰ Ꭰ ꭰ\nᎠ ꭰ"),                          # Cherokee case pair
        (9020, "ǅungla ǆungla ǅungla ǆungla"),           # titlecase digraph
        (9021, "ıI ıI İi İi"),                           # dotless i mixes
        (9022, "𝔘𝔫𝔦 𝔘𝔫𝔦 ascii ascii"),                   # astral math letters
        (9023, "ΑΣ ΒΣ ΑΣ ΒΣ"),                           # final sigma at end
        (9024, "İ\nİ\ni̇\ni̇"),                           # dup lines, dotted I
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    cols = ["dup_line_char_frac", "max_line_repeat", "top_bigram_char_frac"]
    a = {
        r["doc_id"]: tuple(r[c] for c in cols)
        for r in repetition_signals(df, impl="arrow").select("doc_id", *cols).collect()
    }
    j = {
        r["doc_id"]: tuple(r[c] for c in cols)
        for r in repetition_signals(df, impl="jvm").select("doc_id", *cols).collect()
    }
    assert a == j


def test_repetition_signals_jvm_folds_evaluated_once(spark):
    """The jvm impl materializes each ArrayAggregate fold in its own
    projection before field extraction: inlining them per field
    reference re-evaluates the INTERPRETED (CodegenFallback) fold 2x
    (line stats) / ~4x (gram argmax). Gate: the optimized plan carries
    exactly the three folds (line chars, line stats, gram argmax) —
    a collapse regression would duplicate them."""
    df = spark.createDataFrame([(1, "a b\na b\nc")], "id long, text string")
    plan = (
        repetition_signals(df, impl="jvm")
        ._jdf.queryExecution()
        .optimizedPlan()
        .toString()
    )
    assert plan.count("aggregate(") == 3, plan
    assert plan.count("array_sort") == 2, plan


def test_gopher_filter_rep_impl_passthrough(spark):
    """gopher_filter(rep_impl='jvm') keeps the whole gate pure-Catalyst
    (no Python eval in the plan) and computes the same keep/reasons as
    the default Arrow path."""
    from terrorblade_spark.operators.curation import gopher_filter

    docs = [
        (1, "a good enough document with several plain words here"),
        (2, "dup dup\ndup dup\ndup dup\ndup dup\nunique tail line"),
        (3, "## ### #### too # symbolic # for # its # word # count"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    a = {
        r["doc_id"]: (r["keep"], tuple(r["quality_reasons"]))
        for r in gopher_filter(df).collect()
    }
    j_df = gopher_filter(df, rep_impl="jvm")
    j = {
        r["doc_id"]: (r["keep"], tuple(r["quality_reasons"]))
        for r in j_df.collect()
    }
    assert a == j
    plan = j_df._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan, plan


def test_repetition_signals_rejects_unknown_impl(spark):
    df = spark.createDataFrame([(1, "x")], "id long, text string")
    with pytest.raises(ValueError, match="impl"):
        repetition_signals(df, impl="pandas")
