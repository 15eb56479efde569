"""Deduplication query surface over the documents table (exact,
MinHash signatures, LSH candidate pairs, bounded n-gram Jaccard,
SimHash). See operators.dedup for the scale rationale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from terrorblade_spark.operators.dedup import (
    jaccard_pairs,
    minhash_lsh_candidates,
    minhash_signatures,
    simhash_values,
)
from terrorblade_spark.functions.exprs import csv_join
from terrorblade_spark.operators.textops import canonical_text, duck_canonical_text, duck_shingles
from terrorblade_spark.registry import query
from terrorblade_spark.tables import load_table

_SH = duck_shingles("text", 3)
_NUM_HASHES = 16
_BANDS = 4
_ROWS = _NUM_HASHES // _BANDS


# --- q31: exact duplicate groups (hash-groupBy) -----------------------------
# The corpus is a simulated re-crawl: documents UNION ALL the same
# documents re-ingested under offset ids. The test tables carry no
# byte-identical texts at small SF, so deduping the raw table proves
# nothing (0 groups); the re-ingest makes every doc a member of a real
# group and value-checks the hash-groupBy end to end.

_REINGEST_OFFSET = 1_000_000_000
_NOISY_OFFSET = 2_000_000_000


# the canonical-text tier (formerly q66) is unioned in under a `tier`
# column to fit the harness's 50-slot gate budget: 'exact' groups
# byte-identical re-ingests, 'canonical' additionally collapses noisy
# re-crawls (upper-cased, whitespace-mangled) that exact dedup can't see
@query(
    "q31_exact_dedup",
    oracle=f"""
    SELECT 'exact' AS tier, content_hash AS group_hash, canonical_id,
           array_to_string(member_ids, ',') AS member_ids, n_members FROM (
      SELECT ('0x' || substring(md5(text), 1, 15))::BIGINT AS content_hash,
             min(doc_id) AS canonical_id,
             array_agg(doc_id ORDER BY doc_id) AS member_ids,
             count(*) AS n_members
      FROM (
        SELECT doc_id, text FROM documents
        UNION ALL
        SELECT doc_id + {_REINGEST_OFFSET} AS doc_id, text FROM documents
      )
      GROUP BY 1
    ) WHERE n_members > 1
    UNION ALL
    SELECT 'canonical' AS tier, canon_hash AS group_hash, canonical_id,
           array_to_string(member_ids, ',') AS member_ids, n_members FROM (
      SELECT ('0x' || substring(md5({duck_canonical_text("text")}), 1, 15))::BIGINT
               AS canon_hash,
             min(doc_id) AS canonical_id,
             array_agg(doc_id ORDER BY doc_id) AS member_ids,
             count(*) AS n_members
      FROM (
        SELECT doc_id, text FROM documents
        UNION ALL
        SELECT doc_id + {_NOISY_OFFSET} AS doc_id,
               upper(text) || '   ' AS text
        FROM documents
      )
      GROUP BY 1
    ) WHERE n_members > 1
    ORDER BY tier, group_hash
    """,
)
def q31_exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    # member_ids is comma-joined: the harness cannot hash list cells
    from terrorblade_spark.functions.exprs import hash64

    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")

    # Both tiers in ONE scan -> 4-row explode -> ONE groupBy. The naive
    # shape (two unions, two aggregates, unionByName) costs two shuffles
    # and two whole-stage-codegen pipelines; measured at sf0.1 the
    # compile alone dominated (4.1 s first run vs 0.8 s warm). Here the
    # only shuffle is (tier, hash, id) — text never leaves the scan —
    # and the aggregate is a single map-side-combined groupBy, the plan
    # that holds when the corpus is 10^6x bigger than the group count.
    # exact-tier hash is computed once and reused by both exact rows;
    # the canonical tier mirrors the oracle's expressions verbatim
    # (canonical of the raw text vs. of the upper+padded re-crawl).
    # hashes are hoisted into one narrow projection (computed ONCE per
    # doc); the explode below only references plain columns, keeping the
    # generated code small (big duplicated md5/regex trees inside the
    # explode array measurably blow up Janino compile time)
    hashed = d.select(
        "doc_id",
        hash64(F.col("text")).alias("h_exact"),
        hash64(canonical_text("text")).alias("h_canon"),
        hash64(
            F.trim(
                F.regexp_replace(
                    F.lower(F.concat(F.upper("text"), F.lit("   "))),
                    "[\\x00-\\x1f\\s]+",
                    " ",
                )
            )
        ).alias("h_canon_noisy"),
    )
    rows = hashed.select(
        F.explode(
            F.array(
                F.struct(F.lit("exact").alias("tier"), F.col("h_exact").alias("group_hash"), F.col("doc_id")),
                F.struct(
                    F.lit("exact").alias("tier"),
                    F.col("h_exact").alias("group_hash"),
                    (F.col("doc_id") + F.lit(_REINGEST_OFFSET)).alias("doc_id"),
                ),
                F.struct(
                    F.lit("canonical").alias("tier"),
                    F.col("h_canon").alias("group_hash"),
                    F.col("doc_id"),
                ),
                F.struct(
                    F.lit("canonical").alias("tier"),
                    F.col("h_canon_noisy").alias("group_hash"),
                    (F.col("doc_id") + F.lit(_NOISY_OFFSET)).alias("doc_id"),
                ),
            )
        ).alias("r")
    ).select("r.*")
    return (
        rows.groupBy("tier", "group_hash")
        .agg(
            F.min("doc_id").alias("canonical_id"),
            F.sort_array(F.collect_list("doc_id")).alias("member_ids"),
            F.count(F.lit(1)).alias("n_members"),
        )
        .where(F.col("n_members") > 1)
        .select(
            "tier",
            "group_hash",
            "canonical_id",
            csv_join("member_ids").alias("member_ids"),
            "n_members",
        )
        .orderBy("tier", "group_hash")
    )


# --- q32: MinHash signatures ------------------------------------------------

def _duck_minhash() -> str:
    # universal-hash twin of operators.dedup.minhash_signatures:
    # signature[i] = min over shingles of (a_i*base + b_i) mod p with
    # base = 56-bit md5 cut mod p (identical constants, seed 42)
    from terrorblade_spark.operators.dedup import MINHASH_PRIME, minhash_params

    per_hash = ", ".join(
        f"list_min(list_transform(bs, x -> ({a} * x + {b}) % {MINHASH_PRIME}))"
        for a, b in minhash_params(_NUM_HASHES)
    )
    return (
        "(CASE WHEN len(sh) > 0 THEN "
        "(SELECT [" + per_hash + "] FROM (SELECT list_transform(sh, s -> "
        f"('0x' || substring(md5(s), 1, 14))::BIGINT % {MINHASH_PRIME}) AS bs) _mh) "
        f"ELSE [{', '.join(['-1'] * _NUM_HASHES)}] END)"
    )


@query(
    "q32_minhash_signatures",
    oracle=f"""
    WITH shingled AS (SELECT doc_id, {_SH} AS sh FROM documents)
    SELECT doc_id,
           array_to_string(list_transform({_duck_minhash()}, v -> v::VARCHAR), ',')
             AS signature
    FROM shingled
    ORDER BY doc_id
    """,
)
def q32_minhash_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    # the signature is emitted as a canonical comma-joined string: the
    # harness's row canonicalizer hashes scalar cells and cannot sort an
    # array<long> column
    d = load_table(spark, sf_dir, "documents")
    sigs = minhash_signatures(d, "doc_id", "text", _NUM_HASHES, 3)
    return sigs.select(
        "doc_id",
        F.array_join(
            F.transform("signature", lambda v: v.cast("string")), ","
        ).alias("signature"),
    ).orderBy("doc_id")


# --- q33: MinHash-LSH candidate pairs ---------------------------------------

def _duck_bands() -> str:
    """Band hashes from the minhash signature (list 'sig')."""
    bands = ", ".join(
        "{'band': %d, 'band_hash': ('0x' || substring(md5("
        "array_to_string(list_transform(list_slice(sig, %d, %d), v -> v::VARCHAR), ',')"
        "), 1, 15))::BIGINT}" % (b, b * _ROWS + 1, (b + 1) * _ROWS)
        for b in range(_BANDS)
    )
    return f"[{bands}]"


@query(
    "q33_minhash_lsh_pairs",
    oracle=f"""
    WITH shingled AS (SELECT doc_id, {_SH} AS sh FROM documents),
    sigs AS (
      SELECT doc_id, {_duck_minhash()} AS sig FROM shingled WHERE len(sh) > 0
    ), banded AS (
      SELECT doc_id, unnest({_duck_bands()}, recursive := true) FROM sigs
    )
    SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
    FROM banded a JOIN banded b ON a.band = b.band AND a.band_hash = b.band_hash
    WHERE a.doc_id < b.doc_id
    ORDER BY id_a, id_b
    """,
)
def q33_minhash_lsh_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return minhash_lsh_candidates(
        d, "doc_id", "text", num_hashes=_NUM_HASHES, bands=_BANDS, shingle_n=3
    ).orderBy("id_a", "id_b")


# --- q34: bounded n-gram Jaccard pairs --------------------------------------

# shingles in more than this fraction of docs are dropped before the
# self-join (skew guard; see operators.dedup.jaccard_pairs)
_MAX_SHINGLE_DF = 0.01


@query(
    "q34_ngram_jaccard",
    oracle=f"""
    WITH shingled AS (
      SELECT lang, source, doc_id, {_SH} AS sh FROM documents
    ), ex0 AS (
      SELECT lang, source, doc_id, unnest(sh) AS shingle
      FROM shingled WHERE len(sh) > 0
    ), cap AS (
      SELECT greatest(2, CAST(floor({_MAX_SHINGLE_DF} * count(*)) AS BIGINT)) AS v
      FROM documents
    ), ex AS (
      SELECT * FROM ex0 WHERE shingle NOT IN (
        SELECT shingle FROM ex0 GROUP BY shingle
        HAVING count(*) > (SELECT v FROM cap)
      )
    ), counts AS (
      SELECT doc_id, count(*) AS n_sh FROM ex GROUP BY doc_id
    ), inter AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_inter
      FROM ex a JOIN ex b
        ON a.lang = b.lang AND a.source = b.source AND a.shingle = b.shingle
      WHERE a.doc_id < b.doc_id
      GROUP BY 1, 2
    )
    SELECT id_a, id_b,
           n_inter::DOUBLE / (ca.n_sh + cb.n_sh - n_inter)::DOUBLE AS jaccard
    FROM inter
    JOIN counts ca ON ca.doc_id = id_a
    JOIN counts cb ON cb.doc_id = id_b
    WHERE n_inter::DOUBLE / (ca.n_sh + cb.n_sh - n_inter)::DOUBLE >= 0.2
    ORDER BY id_a, id_b
    """,
)
def q34_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return jaccard_pairs(
        d,
        "doc_id",
        "text",
        shingle_n=3,
        threshold=0.2,
        bucket_cols=["lang", "source"],
        max_shingle_df=_MAX_SHINGLE_DF,
    ).orderBy("id_a", "id_b")


# --- q35: SimHash values ----------------------------------------------------

_BITS = 48


def _duck_simhash() -> str:
    toks = "list_transform(list_filter(regexp_split_to_array(trim(text), '\\s+'), t -> t <> ''), t -> lower(t))"
    hashes = f"list_transform({toks}, t -> ('0x' || substring(md5(t), 1, 15))::BIGINT)"
    # per bit b: count of hashes with bit set vs total -> majority
    bit_terms = " + ".join(
        f"(CASE WHEN 2 * len(list_filter(hs, h -> (h >> {b}) & 1 = 1)) > len(hs)"
        f" THEN (1::BIGINT << {b}) ELSE 0 END)"
        for b in range(_BITS)
    )
    return f"(SELECT CASE WHEN len(hs) > 0 THEN {bit_terms} ELSE 0 END FROM (SELECT {hashes} AS hs) _t)"


@query(
    "q35_simhash",
    oracle=f"""
    WITH hashed AS (
      SELECT doc_id,
             list_transform(list_transform(list_filter(regexp_split_to_array(trim(text), '\\s+'), t -> t <> ''), t -> lower(t)),
                            t -> ('0x' || substring(md5(t), 1, 15))::BIGINT) AS hs
      FROM documents
    )
    SELECT doc_id,
           (CASE WHEN len(hs) > 0 THEN {" + ".join(
               f"(CASE WHEN 2 * len(list_filter(hs, h -> (h >> {b}) & 1 = 1)) > len(hs)"
               f" THEN (1::BIGINT << {b}) ELSE 0::BIGINT END)" for b in range(_BITS)
           )} ELSE 0::BIGINT END) AS simhash
    FROM hashed
    ORDER BY doc_id
    """,
)
def q35_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return simhash_values(d, "doc_id", "text", _BITS).orderBy("doc_id")


# --- q78: connected components of the near-dup graph -------------------------
# The LSH candidate pairs (q33's edge set) resolved into document
# clusters with the alternating large-star/small-star rounds
# (operators/components.py:62 — edge-only shuffles, O(log n) rounds).
# The oracle computes the same fixpoint as a DuckDB recursive
# transitive closure + min-label aggregate — exact at oracle scale,
# quadratic at real scale, which is precisely why the engine ships the
# star algorithm instead.

@query(
    "q78_neardup_components",
    oracle=f"""
    WITH RECURSIVE shingled AS (SELECT doc_id, {_SH} AS sh FROM documents),
    sigs AS (
      SELECT doc_id, {_duck_minhash()} AS sig FROM shingled WHERE len(sh) > 0
    ), banded AS (
      SELECT doc_id, unnest({_duck_bands()}, recursive := true) FROM sigs
    ), pairs AS (
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
      FROM banded a JOIN banded b ON a.band = b.band AND a.band_hash = b.band_hash
      WHERE a.doc_id < b.doc_id
    ), edges AS (
      SELECT id_a AS u, id_b AS v FROM pairs
      UNION
      SELECT id_b AS u, id_a AS v FROM pairs
    ), reach(node, r) AS (
      SELECT u, u FROM edges
      UNION
      SELECT e.u, r.r FROM edges e JOIN reach r ON e.v = r.node
    )
    SELECT node, min(r) AS component
    FROM reach GROUP BY node ORDER BY node
    """,
)
def q78_neardup_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    from terrorblade_spark.operators.components import connected_components

    d = load_table(spark, sf_dir, "documents")
    pairs = minhash_lsh_candidates(
        d, "doc_id", "text", num_hashes=_NUM_HASHES, bands=_BANDS, shingle_n=3
    )
    return connected_components(pairs, "id_a", "id_b").orderBy("node")


# --- q80: exact-substring repeated-window span detection ---------------------
# Sequence-level dedup's detection half (operators/substr.py — the
# ExactSubstr analog). Hash VALUES are engine-specific (xxhash64 vs
# md5), but the SPAN POSITIONS they induce are not: the oracle computes
# its own window hashes and merges overlapping hits with a
# gaps-and-islands window, reproducing the Spark fold's positions
# exactly. Corpus = documents + re-ingested copy (q31's pattern), so
# every >=window-token doc carries a guaranteed repeated span.

_SUBSTR_W = 12
_SUBSTR_OFFSET = 3_000_000_000


@query(
    "q80_repeated_window_spans",
    oracle=f"""
    WITH corpus AS (
      SELECT doc_id, text FROM documents
      UNION ALL
      SELECT doc_id + {_SUBSTR_OFFSET} AS doc_id, text FROM documents
    ),
    t AS (
      SELECT doc_id,
             list_filter(regexp_split_to_array(trim(text), '\\s+'), x -> x <> '') AS toks
      FROM corpus
    ),
    w AS (
      SELECT doc_id, i - 1 AS pos,
             md5(array_to_string(toks[i:i+{_SUBSTR_W - 1}], chr(1))) AS wh
      FROM t, unnest(range(1, len(toks) - {_SUBSTR_W} + 2)) AS u(i)
      WHERE len(toks) >= {_SUBSTR_W}
    ),
    hot AS (SELECT wh FROM w GROUP BY wh HAVING count(*) >= 2),
    m AS (SELECT doc_id, pos FROM w WHERE wh IN (SELECT wh FROM hot)),
    isl AS (
      SELECT doc_id, pos,
             sum(CASE WHEN prev IS NULL OR pos > prev + {_SUBSTR_W} THEN 1 ELSE 0 END)
               OVER (PARTITION BY doc_id ORDER BY pos) AS island
      FROM (
        SELECT doc_id, pos,
               lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) AS prev
        FROM m
      )
    )
    SELECT doc_id, CAST(min(pos) AS INT) AS start,
           CAST(max(pos) + {_SUBSTR_W} AS INT) AS "end"
    FROM isl GROUP BY doc_id, island
    ORDER BY doc_id, start
    """,
)
def q80_repeated_window_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    from terrorblade_spark.operators.substr import repeated_window_spans

    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    corpus = d.unionByName(
        d.select((F.col("doc_id") + F.lit(_SUBSTR_OFFSET)).alias("doc_id"), "text")
    )
    # method="rolling": the operator's O(tokens) Arrow Rabin-Karp path
    # (guide §4.2 — ONE vectorized Python crossing on a narrow column)
    # instead of the JVM per-window concat+xxhash64, which re-hashes
    # O(tokens x window) bytes through an interpreted HOF — measured
    # 8.2 s vs ~0.6 s for the hash stage at sf0.1 (and 12x at the 80k-
    # doc probe scale). Hash values only ever feed EQUALITY, so spans
    # are identical (committed probe + test_rolling_method_finds_
    # identical_spans gate exactly that).
    spans = repeated_window_spans(
        corpus, window=_SUBSTR_W, min_repeats=2, method="rolling"
    )
    return (
        spans.select("doc_id", F.explode("spans").alias("s"))
        .select(
            "doc_id",
            F.col("s.start").alias("start"),
            F.col("s.end").alias("end"),
        )
        .orderBy("doc_id", "start")
    )


# --- q87: leakage-safe train/eval split over the near-dup graph --------------
# The split that dedup exists to protect: assignment hashes the
# near-dup COMPONENT root (q78's fixpoint), so a doc and its variants
# can never straddle train/eval. Oracle = q78's recursive closure +
# the same md5 draw on the root; the only float comparison is
# hash/2^60 < 0.2, both sides bit-identical.

_Q87_EVAL = 0.2
_Q87_SEED = "q87"


@query(
    "q87_leakage_safe_split",
    oracle=f"""
    WITH RECURSIVE shingled AS (SELECT doc_id, {_SH} AS sh FROM documents),
    sigs AS (
      SELECT doc_id, {_duck_minhash()} AS sig FROM shingled WHERE len(sh) > 0
    ), banded AS (
      SELECT doc_id, unnest({_duck_bands()}, recursive := true) FROM sigs
    ), pairs AS (
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
      FROM banded a JOIN banded b ON a.band = b.band AND a.band_hash = b.band_hash
      WHERE a.doc_id < b.doc_id
    ), edges AS (
      SELECT id_a AS u, id_b AS v FROM pairs
      UNION
      SELECT id_b AS u, id_a AS v FROM pairs
    ), reach(node, r) AS (
      SELECT u, u FROM edges
      UNION
      SELECT e.u, r.r FROM edges e JOIN reach r ON e.v = r.node
    ), comp AS (
      SELECT node, min(r) AS component FROM reach GROUP BY node
    ), assigned AS (
      SELECT d.doc_id, coalesce(c.component, d.doc_id) AS group_root
      FROM documents d LEFT JOIN comp c ON d.doc_id = c.node
    )
    SELECT doc_id, group_root,
           CASE WHEN ('0x' || substring(md5('{_Q87_SEED}' || group_root::VARCHAR), 1, 15))::BIGINT
                     / 1152921504606846976.0 < {_Q87_EVAL}
                THEN 'eval' ELSE 'train' END AS split
    FROM assigned ORDER BY doc_id
    """,
)
def q87_leakage_safe_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    from terrorblade_spark.operators.sampling import leakage_safe_split

    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    pairs = minhash_lsh_candidates(
        d, "doc_id", "text", num_hashes=_NUM_HASHES, bands=_BANDS, shingle_n=3
    )
    return leakage_safe_split(
        d.select("doc_id"), "doc_id", pairs, eval_fraction=_Q87_EVAL, seed=_Q87_SEED
    ).select("doc_id", "group_root", "split").orderBy("doc_id")


# --- q93: quality-aware canonical selection (full value oracle) --------------
# canonicalize_by_score over the near-dup graph: each cluster keeps
# its LONGEST member (n_chars as the quality score, min-id among
# ties), everything else flags duplicate — the curation-pass keep
# rule, vs the min-id ingest rule q78 checks. All-integer max/min
# algebra on top of q78's recursive closure.


@query(
    "q93_quality_canonicals",
    oracle=f"""
    WITH RECURSIVE shingled AS (SELECT doc_id, {_SH} AS sh FROM documents),
    sigs AS (
      SELECT doc_id, {_duck_minhash()} AS sig FROM shingled WHERE len(sh) > 0
    ), banded AS (
      SELECT doc_id, unnest({_duck_bands()}, recursive := true) FROM sigs
    ), pairs AS (
      SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
      FROM banded a JOIN banded b ON a.band = b.band AND a.band_hash = b.band_hash
      WHERE a.doc_id < b.doc_id
    ), edges AS (
      SELECT id_a AS u, id_b AS v FROM pairs
      UNION
      SELECT id_b AS u, id_a AS v FROM pairs
    ), reach(node, r) AS (
      SELECT u, u FROM edges
      UNION
      SELECT e.u, r.r FROM edges e JOIN reach r ON e.v = r.node
    ), comp AS (
      SELECT node, min(r) AS component FROM reach GROUP BY node
    ), labeled AS (
      SELECT d.doc_id, d.n_chars, coalesce(c.component, d.doc_id) AS component
      FROM documents d LEFT JOIN comp c ON d.doc_id = c.node
    ), best AS (
      SELECT component, max(n_chars) AS best_score FROM labeled GROUP BY component
    ), canon AS (
      SELECT l.component, min(l.doc_id) AS canonical_id
      FROM labeled l JOIN best b
        ON l.component = b.component AND l.n_chars = b.best_score
      GROUP BY l.component
    )
    SELECT l.doc_id, l.component, c.canonical_id,
           l.doc_id != c.canonical_id AS is_duplicate
    FROM labeled l JOIN canon c ON l.component = c.component
    ORDER BY l.doc_id
    """,
)
def q93_quality_canonicals(spark: SparkSession, sf_dir: str) -> DataFrame:
    from terrorblade_spark.operators.components import (
        canonicalize_by_score,
        connected_components,
    )

    d = load_table(spark, sf_dir, "documents")
    pairs = minhash_lsh_candidates(
        d, "doc_id", "text", num_hashes=_NUM_HASHES, bands=_BANDS, shingle_n=3
    )
    comps = connected_components(pairs, "id_a", "id_b")
    out = canonicalize_by_score(d, comps, "doc_id", "n_chars")
    return out.select("doc_id", "component", "canonical_id", "is_duplicate").orderBy(
        "doc_id"
    )


# --- q96: incremental ingest dedup against a hash index ----------------------
# The batch twin of the streaming content-dedup gate: batch 1 builds
# the content-hash index from the corpus; batch 2 re-ingests the
# corpus with every even doc's text modified. Only genuinely-new
# content may be admitted — the modified half, one canonical (min-id)
# row per content hash. Pure md5/anti-join algebra, no floats.


@query(
    "q96_incremental_ingest_dedup",
    oracle="""
    WITH idx AS (
      SELECT DISTINCT ('0x' || substring(md5(text), 1, 15))::BIGINT AS h
      FROM documents
    ),
    b2 AS (
      SELECT doc_id + 10000000 AS doc_id,
             CASE WHEN doc_id % 2 = 0 THEN text || ' v2' ELSE text END AS text
      FROM documents
    ),
    hashed AS (
      SELECT doc_id, ('0x' || substring(md5(text), 1, 15))::BIGINT AS h FROM b2
    ),
    canon AS (SELECT h, min(doc_id) AS doc_id FROM hashed GROUP BY h)
    SELECT c.doc_id, c.h AS content_hash
    FROM canon c
    WHERE c.h NOT IN (SELECT h FROM idx)
    ORDER BY c.doc_id
    """,
)
def q96_incremental_ingest_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from terrorblade_spark.operators.dedup import incremental_dedup

    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    _, index = incremental_dedup(d, None)
    batch2 = d.select(
        (F.col("doc_id") + 10_000_000).alias("doc_id"),
        F.when(F.col("doc_id") % 2 == 0, F.concat(F.col("text"), F.lit(" v2")))
        .otherwise(F.col("text"))
        .alias("text"),
    )
    admitted, _ = incremental_dedup(batch2, index)
    return admitted.select("doc_id", "content_hash").orderBy("doc_id")
