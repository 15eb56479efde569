"""Multimodal (image/audio/video) column support.

The reference stores file attachments as names only (`files_{phone}`,
dtypes.py:143-159) — a 100 TB training-data pipeline needs the payloads
themselves. Design:

- media are **opaque ``binary`` columns with a typed metadata struct**
  (kind, width/height/sample_rate/duration_ms/codec). Parquet stores
  binary natively; predicate pushdown on the metadata struct prunes
  scans without touching payload bytes (column pruning keeps the
  `content` column unread for metadata-only queries).
- decode / feature-extract / resize / frame-sample run as
  **Arrow-batched ``mapInPandas``** transforms: one Python crossing per
  batch, payload bytes move via Arrow buffers (zero-copy), output
  schemas declared up front. At cluster scale each task handles one
  parquet row-group, so memory is bounded by
  ``spark.sql.files.maxPartitionBytes``, not file count.
- the actual codec work (PIL/librosa/ffmpeg) is NOT in this container:
  each op takes a ``decoder`` — the default ``"fake"`` decoder derives
  deterministic pixels/samples from the payload hash (tests + oracle
  reproducible anywhere); ``decoder="real"`` import-gates the library
  and raises ``NotImplementedError`` with install guidance when absent.
  The Spark-side plumbing (schema, batching, partitioning) is identical
  for both, so swapping in the real decoder changes no plan shape.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_META = StructType(
    [
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("sample_rate", IntegerType()),
        StructField("duration_ms", LongType()),
        StructField("codec", StringType()),
    ]
)

MEDIA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("kind", StringType(), False),  # image | audio | video
        StructField("content", BinaryType()),
        StructField("meta", MEDIA_META),
    ]
)

_KINDS = ("image", "audio", "video")


def media_from_documents(documents: DataFrame) -> DataFrame:
    """Derive a deterministic media table from the documents table
    (the container ships no real media): content = UTF-8 payload bytes,
    kind round-robins by doc_id, metadata derived arithmetically.

    This is the test/demo source; production replaces it with
    ``spark.read.format("binaryFile")`` or a parquet landing zone with
    the same MEDIA schema.
    """
    kind = F.element_at(
        F.array(*[F.lit(k) for k in _KINDS]), (F.col("doc_id") % 3 + 1).cast("int")
    )
    meta = F.struct(
        F.when(kind == "image", (F.col("doc_id") % 640 + 16).cast("int")).alias("width"),
        F.when(kind == "image", (F.col("doc_id") % 480 + 16).cast("int")).alias("height"),
        F.when(kind == "audio", F.lit(16000).cast("int")).alias("sample_rate"),
        F.when(kind != "image", (F.col("n_chars") * 10).cast("long")).alias("duration_ms"),
        F.lit(None).cast("string").alias("codec"),
    )
    return documents.select(
        F.col("doc_id").alias("media_id"),
        kind.alias("kind"),
        F.encode(F.col("text"), "UTF-8").alias("content"),
        meta.alias("meta"),
    )


def _decode_seed(content: bytes) -> int:
    """The deterministic decode seed: first 4 bytes of md5(payload),
    big-endian — DuckDB twin ``('0x' || substring(md5(t),1,8))::BIGINT``."""
    return int.from_bytes(hashlib.md5(content or b"").digest()[:4], "big")


DECODED_SCHEMA = (
    "media_id long, width int, height int, decode_seed long, mean_px double, std_px double"
)


def decode_images(df: DataFrame, decoder: str = "fake") -> DataFrame:
    """Decode image payloads -> per-image stats (the decode step of a
    filter-by-quality training pipeline). mapInPandas: schema out is
    declared; batches bounded by Arrow maxRecordsPerBatch. The emitted
    ``decode_seed`` is the md5-derived seed the fake decoder draws its
    pixels from — SQL-reproducible, so the whole mapInPandas path sits
    under the oracle gate (q51) even though the pixel stats themselves
    are RNG-derived (unit-tested instead)."""
    if decoder == "real":  # pragma: no cover - lib not in container
        try:
            import PIL  # noqa: F401
        except ImportError as e:
            raise NotImplementedError(
                "real image decode requires Pillow; container ships none — "
                "use decoder='fake' (deterministic) or install Pillow"
            ) from e

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            n = len(pdf)
            ws = pdf["width"].fillna(16).astype("int64").to_numpy()
            hs = pdf["height"].fillna(16).astype("int64").to_numpy()
            seeds = np.fromiter(
                (_decode_seed(c) for c in pdf["content"]), dtype=np.int64, count=n
            )
            means = np.empty(n, dtype=np.float64)
            stds = np.empty(n, dtype=np.float64)
            # RNG draw is inherently per-row (per-seed); everything else
            # is columnar numpy — no iterrows/Series-per-row overhead
            for j in range(n):
                px = np.random.default_rng(int(seeds[j])).integers(
                    0, 256, size=(int(hs[j]), int(ws[j])), dtype=np.uint8
                )
                means[j] = px.mean()
                stds[j] = px.std()
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].to_numpy(),
                    "width": ws.astype("int32"),
                    "height": hs.astype("int32"),
                    "decode_seed": seeds,
                    "mean_px": means,
                    "std_px": stds,
                }
            )

    imgs = df.where(F.col("kind") == "image").select(
        "media_id",
        F.col("meta.width").alias("width"),
        F.col("meta.height").alias("height"),
        "content",
    )
    return imgs.mapInPandas(run, DECODED_SCHEMA)


def extract_features(df: DataFrame, dim: int = 32, decoder: str = "fake") -> DataFrame:
    """Binary payload -> fixed-dim float feature vector (the embed step
    for image/audio dedup + ANN). Fake featurizer: feature-hashing of
    the payload bytes (md5 token -> bucket/sign, l2-normalized — the
    same encoder as functions.embed), so near-identical payloads get
    near vectors AND DuckDB reproduces the math (duck_hash_vec). Real
    path would load a vision/audio model per executor (same singleton
    pattern as functions.embed)."""
    if decoder == "real":  # pragma: no cover
        raise NotImplementedError(
            "real feature extraction needs a vision/audio model; "
            "use decoder='fake' in this environment"
        )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from terrorblade_spark.functions.embed import _hash_encode_batch

        for pdf in batches:
            texts = pd.Series(
                [(c or b"").decode("utf-8", errors="replace") for c in pdf["content"]]
            )
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].to_numpy(),
                    "kind": pdf["kind"].to_numpy(),
                    "features": _hash_encode_batch(texts, dim),
                }
            )

    return df.select("media_id", "kind", "content").mapInPandas(
        run, "media_id long, kind string, features array<float>"
    )


def sample_frames(df: DataFrame, every_ms: int = 1000, decoder: str = "fake") -> DataFrame:
    """Video payload -> one row per sampled frame timestamp (the
    frame-sampling step before per-frame featurization). Fake decoder
    emits frame offsets from metadata duration; real path would be
    ffmpeg/pyav behind the same mapInPandas signature."""
    if decoder == "real":  # pragma: no cover
        raise NotImplementedError(
            "real frame sampling needs pyav/ffmpeg; use decoder='fake'"
        )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, offs, fps = [], [], []
            # columnar zip (no iterrows); md5-per-frame is the payload
            for mid, dur, content in zip(
                pdf["media_id"].to_numpy(), pdf["duration_ms"], pdf["content"]
            ):
                c = content or b""
                for off in range(0, int(dur or 0), every_ms):
                    ids.append(mid)
                    offs.append(off)
                    fps.append(
                        int.from_bytes(
                            hashlib.md5(c + off.to_bytes(8, "big")).digest()[:4],
                            "big",
                        )
                    )
            yield pd.DataFrame(
                {"media_id": ids, "frame_ms": offs, "frame_fingerprint": fps},
                columns=["media_id", "frame_ms", "frame_fingerprint"],
            )

    vids = df.where(F.col("kind") == "video").select(
        "media_id", F.col("meta.duration_ms").alias("duration_ms"), "content"
    )
    return vids.mapInPandas(
        run, "media_id long, frame_ms long, frame_fingerprint long"
    )


def media_fingerprint(content: Column) -> Column:
    """JVM-side exact-dup key for binary payloads (no Python): md5 hex.
    DuckDB twin: ``md5(content)``."""
    return F.md5(content)
