"""Text-embedding pandas UDF (SURVEY §2.9 E1).

The reference encodes with sentence-transformers
(TextPreprocessor.py:389-427, model :102-106). Architecture here is the
Spark-native version of the same contract:

- Arrow-batched ``pandas_udf`` (Series[str] -> Series[list[float]]):
  one Python crossing per batch, batch size controlled by
  ``spark.sql.execution.arrow.maxRecordsPerBatch`` (the analog of the
  reference's GPU batch tuning, TextPreprocessor.py:538-566);
- per-executor lazy model singleton (loaded once per Python worker,
  reused across batches — the reference's lazy model load :85-106);
- pluggable encoder: the default is a deterministic feature-hashing
  encoder (md5 token hash -> bucket, l2-normalized) so tests and
  oracles are reproducible on any machine with no model download —
  exactly the reference's own test strategy of injecting deterministic
  vectors (tests/test_vector_search.py:57-70). Pass
  ``encoder="sentence-transformers"`` for the real model (import-gated).
"""

from __future__ import annotations

import hashlib
import math

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, FloatType

_MODEL_CACHE: dict = {}


def _hash_encode_batch(texts: pd.Series, dim: int) -> pd.Series:
    """Deterministic feature hashing: token -> md5 -> (bucket, sign),
    l2-normalized. Pure numpy per Arrow batch.

    md5 runs once per DISTINCT token per batch (dict cache) and each
    token's contribution accumulates as sign*count via a Counter: both
    are exact — bucket/sign depend only on the token, and the summed
    values are small integers, so float addition is associative here
    (exact below 2^53) and the vector is bit-identical to the
    one-add-per-occurrence loop. ~3x on natural-language batches where
    token repetition is high.
    """
    import re as _re
    from collections import Counter

    # ASCII \s+, matching exprs.tokens()'s Java regex and the DuckDB
    # twin: Python str.split() additionally splits on Unicode spaces
    # (NBSP etc.), which would silently de-sync the vectors from the
    # oracle and from every tokens()-based operator
    _ws = _re.compile(r"\s+", _re.ASCII)
    cache: dict = {}
    out = []
    for t in texts:
        vec = np.zeros(dim, dtype=np.float64)
        if t:
            for tok, c in Counter(_ws.split(t.lower())).items():
                if not tok:
                    continue
                bs = cache.get(tok)
                if bs is None:
                    h = int.from_bytes(
                        hashlib.md5(tok.encode("utf-8")).digest()[:8], "big"
                    )
                    bs = (h % dim, 1.0 if (h >> 63) & 1 == 0 else -1.0)
                    cache[tok] = bs
                vec[bs[0]] += bs[1] * c
        n = math.sqrt(float(np.dot(vec, vec)))
        if n > 0:
            vec /= n
        out.append(vec.astype(np.float32).tolist())
    return pd.Series(out)


def duck_hash_vec(text_expr: str, dim: int) -> str:
    """DuckDB twin of ``_hash_encode_batch`` up to the final l2 scale:
    the UN-normalized bucket-sum vector as list<double>. Cosine and
    sign/zero patterns are scale-invariant, so oracles built on this
    expression validate the whole tokenize → md5 → bucket/sign →
    accumulate path with integer-exact arithmetic (the '0x'||md5-cut
    idiom matches Python's ``int.from_bytes(md5(tok)[:8], 'big')``
    bit-for-bit — verified in tests/test_semantic_ops.py)."""
    toks = (
        f"list_transform(list_filter(regexp_split_to_array(trim({text_expr}), '\\s+'), "
        "t -> t <> ''), t -> lower(t))"
    )
    hs = f"list_transform({toks}, t -> ('0x' || substring(md5(t), 1, 16))::UBIGINT)"
    return (
        f"(SELECT list_transform(range(0, {dim}), i -> CAST("
        f"len(list_filter(hs, h -> h % {dim} = i AND (h >> 63) & 1 = 0)) - "
        f"len(list_filter(hs, h -> h % {dim} = i AND (h >> 63) & 1 = 1)) AS DOUBLE)) "
        f"FROM (SELECT {hs} AS hs) _hv)"
    )


def duck_hash_vec_unit(text_expr: str, dim: int) -> str:
    """DuckDB twin of ``_hash_encode_batch`` INCLUDING the l2 normalize
    and the float32 quantization: ``CAST(x / sqrt(dot) AS FLOAT)`` is
    bit-for-bit numpy's ``(vec / n).astype(float32)`` (both are IEEE
    round-to-nearest on exact integer-derived doubles), so cosines and
    threshold compares computed from this match the Spark side's
    float32 arrays exactly — no quantization flips at thresholds."""
    rv = duck_hash_vec(text_expr, dim)
    return (
        "(SELECT CASE WHEN list_dot_product(rv, rv) > 0 "
        "THEN list_transform(rv, x -> CAST(x / sqrt(list_dot_product(rv, rv)) AS FLOAT)::DOUBLE) "
        f"ELSE rv END FROM (SELECT {rv} AS rv) _uv)"
    )


def _st_model(model_name: str):
    key = ("st", model_name)
    if key not in _MODEL_CACHE:
        from sentence_transformers import SentenceTransformer  # import-gated

        _MODEL_CACHE[key] = SentenceTransformer(model_name)
    return _MODEL_CACHE[key]


def embed_text(
    dim: int = 64,
    encoder: str = "hash",
    model_name: str = "paraphrase-multilingual-mpnet-base-v2",
) -> Column:
    """Build the embedding pandas UDF. Usage:
    ``df.withColumn("embeddings", embed_text(64)(F.col("text")))``.
    """
    if encoder == "hash":

        @F.pandas_udf(ArrayType(FloatType()))
        def _embed(texts: pd.Series) -> pd.Series:
            return _hash_encode_batch(texts.fillna(""), dim)

        return _embed
    if encoder == "sentence-transformers":

        @F.pandas_udf(ArrayType(FloatType()))
        def _embed_st(texts: pd.Series) -> pd.Series:
            model = _st_model(model_name)
            vecs = model.encode(
                texts.fillna("").tolist(),
                normalize_embeddings=True,
                show_progress_bar=False,
            )
            return pd.Series([v.astype(np.float32).tolist() for v in vecs])

        return _embed_st
    raise ValueError(f"unknown encoder {encoder!r}")
