"""Exact-substring (repeated-window) deduplication: find and cut token
spans that repeat verbatim across the corpus — the sequence-level
complement to document-level dedup (Lee et al. 2022, "Deduplicating
Training Data Makes Language Models Better", the ExactSubstr tool).

Why document-level dedup is not enough: boilerplate paragraphs, license
headers, and quoted chunks repeat across otherwise-distinct documents;
they survive MinHash/Jaccard (whole-doc similarity stays low) yet are
exactly the memorization vector sequence dedup removes.

Distributed design (the suffix-array build the paper uses is a
single-machine construction; this is the shuffle-friendly equivalent
for fixed window length):

1. tokenize once; per document, hash every length-``window`` token
   span (JVM-side ``transform`` over a position sequence + xxhash64 —
   whole-stage codegen, no Python). The hash input is the
   delimiter-joined span, so equal hashes mean equal token runs up to
   xxhash collision (~2^-64 per pair — the paper's tool accepts the
   same class of hash equality).
2. explode to (window_hash, doc, pos) — a NARROW relation; group by
   hash with a map-side-combined count and keep hashes seen >=
   ``min_repeats`` times corpus-wide. Document text never shuffles.
3. semi-join the repeated hashes back to each document's spans, merge
   overlapping/adjacent spans per document (one array fold, row-local),
   emit (doc, spans, repeated_token_frac).
4. ``cut_repeated_windows`` removes the spanned tokens and rejoins —
   token-stream surgery, like the reference tool (original inter-token
   whitespace is not preserved; downstream tokenization is the
   consumer).

Scale: two hashing paths, same spans. ``method='jvm'`` re-joins every
window (O(tokens x window) bytes hashed; zero Python). For corpus
scale, ``method='rolling'`` is the O(tokens) Arrow Rabin-Karp path —
measured 12.5 s vs 147.7 s for 80k docs at window=50, identical span
output. The shuffle either way is (hash, doc, pos) longs; a
corpus-frequent window (the dedup target itself) is a hot groupBy key
only for its COUNT — an int add — not its payload.

No SQL oracle: span surgery is not reasonably SQL-expressible (declared
rows-only class per SURVEY §2 policy); unit-gated against hand-computed
spans plus property checks (cutting all repeats leaves no repeated
window at the same length).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from terrorblade_spark.operators.textops import tokens


def _window_hashes(tok_col, window: int):
    n = F.size(tok_col)
    return F.when(
        n >= window,
        F.transform(
            F.sequence(F.lit(1), n - window + 1),
            # \x01 separator: an empty-delimiter join would alias token
            # boundaries ("ab","c" == "a","bc")
            lambda i: F.xxhash64(F.concat_ws("\x01", F.slice(tok_col, i, window))),
        ),
    ).otherwise(F.array().cast("array<bigint>"))


def _rolling_window_hashes(window: int):
    """O(tokens) polynomial rolling hash over token hashes (Rabin-Karp
    in uint64 wraparound arithmetic), Arrow-batched: the scale path.
    The JVM ``_window_hashes`` re-joins every window (O(tokens x
    window) bytes hashed — measured 148 s for 80k docs at window=50);
    this computes all window hashes from ONE prefix pass. Position
    independence comes from multiplying by the modular inverse of the
    base (odd base => invertible mod 2^64). Token hashes are memoized
    per batch (Zipf: ~99% hits). Hash VALUES differ from the JVM path —
    only equality is ever used, so the choice is semantics-free."""
    import hashlib

    import numpy as np
    from pyspark.sql.functions import pandas_udf

    B = 1099511628211  # FNV prime, odd
    BINV = pow(B, -1, 1 << 64)

    @pandas_udf("array<bigint>")
    def roll(toks: pd.Series) -> pd.Series:
        cache: dict[str, int] = {}

        def th(w: str) -> int:
            h = cache.get(w)
            if h is None:
                h = int.from_bytes(
                    hashlib.blake2b(w.encode(), digest_size=8).digest(), "little"
                )
                cache[w] = h
            return h

        def one(ts):
            if ts is None or len(ts) < window:
                return []
            n = len(ts)
            with np.errstate(over="ignore"):
                t = np.array([th(w) for w in ts], dtype=np.uint64)
                powB = np.empty(n, dtype=np.uint64)
                powB[0] = 1
                if n > 1:
                    np.cumprod(np.full(n - 1, B, dtype=np.uint64), out=powB[1:])
                a = np.cumsum(t * powB, dtype=np.uint64)  # A[i] = sum t[j] B^j
                powI = np.empty(n, dtype=np.uint64)
                powI[0] = 1
                if n > 1:
                    np.cumprod(np.full(n - 1, BINV, dtype=np.uint64), out=powI[1:])
                w_end = a[window - 1 :]
                w_start = np.concatenate(([np.uint64(0)], a[: n - window]))
                h = (w_end - w_start) * powI[: n - window + 1]
            return h.astype(np.int64).tolist()

        return toks.map(one)

    return roll


def repeated_window_spans(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    window: int = 50,
    min_repeats: int = 2,
    method: str = "jvm",
) -> DataFrame:
    """Per-document repeated spans: (id, n_tokens, spans
    array<struct<start,end>> in token positions [start, end), and
    repeated_frac — the fraction of the document's tokens covered).
    Only documents containing at least one repeated window appear.
    ``method='rolling'`` switches the window hashing to the O(tokens)
    Arrow rolling-hash path (same spans; the corpus-scale choice)."""
    if method == "rolling":
        wh = _rolling_window_hashes(window)(F.col("__toks"))
    elif method == "jvm":
        wh = None  # applied below, needs the column expression form
    else:
        raise ValueError("method must be 'jvm' or 'rolling'")
    toked = df.select(
        F.col(id_col), tokens(text_col).alias("__toks")
    )
    toked = toked.withColumn(
        "__wh",
        wh if wh is not None else _window_hashes(F.col("__toks"), window),
    )
    # n_tokens rides the exploded relation (first() per doc) so the
    # source text is scanned ONCE — no persist to manage, no re-scan
    ex = toked.select(
        id_col,
        F.size("__toks").alias("__n"),
        F.posexplode("__wh").alias("pos", "wh"),
    )
    # Round-10 reshape (guide §2.4): corpus-wide repeat counting as a
    # count-over-window partitioned by hash, replacing the old
    # groupBy(wh) + left-semi-join-back shape. That shape consumed
    # ``ex`` TWICE — and ex embeds the whole tokenize + window-hash
    # pipeline, the most expensive stage of the operator — so the
    # hashes were computed twice per run (measured: 2x 8 s of the
    # query's 15.5 s at sf0.1). Now: one compute, one shuffle by wh
    # (same hot-key profile as the join build side; WindowExec spills
    # per group, so a corpus-frequent window stays bounded).
    from pyspark.sql import Window

    marks = (
        ex.withColumn(
            "__c", F.count(F.lit(1)).over(Window.partitionBy("wh"))
        )
        .where(F.col("__c") >= min_repeats)
        .drop("__c")
    )
    # merge overlapping/adjacent [pos, pos+window) spans row-locally:
    # sorted starts fold into disjoint spans in one pass
    starts = marks.groupBy(id_col).agg(
        F.sort_array(F.collect_list("pos")).alias("ps"),
        F.first("__n").alias("n_tokens"),
    )
    # Span merge, round-10 rewrite: the old array fold rebuilt the
    # accumulator array on every step (slice + concat), i.e. O(p^2)
    # struct copies for p marked positions — a fully-boilerplate
    # document (every window hot: exactly the dedup target) makes that
    # quadratic in document length. Sorted equal-width spans merge
    # exactly when the next start p <= prev_p + window (ends are
    # monotone: last_p + window), so island BOUNDARIES are computable
    # positionally in O(p): flag indices where a new island opens, then
    # zip each boundary with the next to read off [first_p, last_p+w).
    w = F.lit(window)
    ps = F.col("ps")
    # 0-based indices i where an island starts: i == 0 or
    # ps[i] > ps[i-1] + window  (element_at is 1-based)
    bounds = F.filter(
        F.transform(ps, lambda _, i: i),
        lambda i: (i == F.lit(0))
        | (F.element_at(ps, i + 1) > F.element_at(ps, i) + w),
    )
    # pair every boundary with the next one (last pairs with size(ps));
    # the island covering [bounds[k], nxt[k]) ends at ps[nxt[k]-1]
    nxt = F.concat(
        F.slice(bounds, 2, F.greatest(F.size(bounds) - 1, F.lit(0))),
        F.array(F.size(ps)),
    )
    merged = F.zip_with(
        bounds,
        nxt,
        lambda s, e: F.struct(
            F.element_at(ps, s + 1).cast("int").alias("start"),
            (F.element_at(ps, e).cast("int") + w.cast("int")).alias("end"),
        ),
    )
    out = (
        starts.select(
            id_col,
            "n_tokens",
            merged.alias("spans"),
        )
        .withColumn(
            "repeated_frac",
            F.aggregate(
                F.col("spans"), F.lit(0), lambda a, s: a + (s["end"] - s["start"])
            ).cast("double")
            / F.col("n_tokens").cast("double"),
        )
    )
    return out


def cut_repeated_windows(
    df: DataFrame,
    spans: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    out_col: str = "text_dedup",
) -> DataFrame:
    """Remove every spanned token run and rejoin with single spaces.
    Documents without spans pass through unchanged (left join)."""
    toked = df.withColumn("__toks", tokens(text_col))
    joined = toked.join(spans.select(id_col, "spans"), id_col, "left")
    kept = F.filter(
        F.transform(
            F.col("__toks"),
            lambda t, i: F.struct(t.alias("t"), i.alias("i")),
        ),
        lambda s: ~F.coalesce(
            F.exists(
                F.col("spans"),
                lambda sp: (s["i"] >= sp["start"]) & (s["i"] < sp["end"]),
            ),
            F.lit(False),
        ),
    )
    # docs with NO spans pass through with their ORIGINAL text (the
    # token rejoin collapses whitespace, which must only happen to
    # documents that were actually cut)
    return joined.withColumn(
        out_col,
        F.when(F.col("spans").isNull(), F.col(text_col)).otherwise(
            F.array_join(F.transform(kept, lambda s: s["t"]), " ")
        ),
    ).drop("__toks", "spans")
