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
    real = decoder == "real"
    if real:
        try:
            import PIL  # noqa: F401
        except ImportError as e:
            raise NotImplementedError(
                "real image decode requires Pillow; container ships none — "
                "use decoder='fake' (deterministic) or install Pillow"
            ) from e

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        if real:  # executor-side import, gated above on the driver
            import io

            from PIL import Image
        for pdf in batches:
            n = len(pdf)
            # >=1 clamp (same corrupt-metadata guard as resize_images):
            # width 0 yields NaN stats, negative kills the task
            ws = np.maximum(pdf["width"].fillna(16).astype("int64").to_numpy(), 1)
            hs = np.maximum(pdf["height"].fillna(16).astype("int64").to_numpy(), 1)
            seeds = np.fromiter(
                (_decode_seed(c) for c in pdf["content"]), dtype=np.int64, count=n
            )
            means = np.empty(n, dtype=np.float64)
            stds = np.empty(n, dtype=np.float64)
            if real:
                # true codec pass: pixel stats from the DECODED payload
                # (grayscale plane, the same shape the fake path draws);
                # metadata width/height are overridden by the real ones
                for j, content in enumerate(pdf["content"]):
                    img = Image.open(io.BytesIO(content)).convert("L")
                    px = np.asarray(img, dtype=np.uint8)
                    hs[j], ws[j] = px.shape
                    means[j] = px.mean()
                    stds[j] = px.std()
            else:
                # RNG draw is inherently per-row (per-seed); everything
                # else is columnar numpy — no iterrows/Series-per-row
                # overhead
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

    # NOT spread (guide §2.7 considered and rejected, round 10): the
    # cached hash encoder runs ~0.15 s serial on the sf0.1 corpus, and
    # a round-robin spread would shuffle the PAYLOAD BYTES — measured
    # flat-to-slower locally and the wrong shape everywhere else.
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
            # fillna BEFORE int(): Arrow gives nullable longs as float64
            # with NaN, and NaN is truthy — int(nan or 0) raises. Clamp
            # negatives (corrupt metadata) to 0 = no frames.
            durs = pdf["duration_ms"].fillna(0).clip(lower=0).astype("int64").to_numpy()
            for mid, dur, content in zip(
                pdf["media_id"].to_numpy(), durs, pdf["content"]
            ):
                c = content or b""
                for off in range(0, int(dur), every_ms):
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


def _phash_pixels(px: "np.ndarray", hash_size: int = 8) -> int:
    """Perceptual hash of a grayscale pixel array: 2-D DCT-II (exact
    basis-matrix form — no scipy), keep the top-left hash_size^2
    low-frequency block minus the DC term, threshold at the median.
    Pure function: unit-testable without Spark, and robust to the
    small pixel perturbations that re-encoding introduces (the classic
    pHash property)."""
    px = px.astype(np.float64)
    n, m = px.shape

    def dct_mat(k: int) -> np.ndarray:
        i = np.arange(k)
        return np.cos(np.pi * (2 * i[None, :] + 1) * i[:, None] / (2 * k))

    freq = dct_mat(n) @ px @ dct_mat(m).T
    block = freq[:hash_size, :hash_size].flatten()[1:]  # drop DC
    med = np.median(block)
    bits = block > med
    out = 0
    for b in bits:
        out = (out << 1) | int(b)
    return out


def perceptual_hash(df: DataFrame, decoder: str = "fake", hash_size: int = 8) -> DataFrame:
    """Image payload -> 63-bit perceptual hash (media_id, phash): the
    image analog of SimHash for near-dup dedup. Fake decoder draws the
    pixel field from the payload's md5 seed at a fixed 32x32 (identical
    payloads -> identical hashes; the DCT path itself is exercised by
    the pure-function unit tests with controlled noise). Real decoder
    (import-gated Pillow) decodes + grayscales + resizes to the same
    32x32 plane, then runs the IDENTICAL DCT path — same schema, same
    plan shape, and perturbation-tolerant the way pHash is supposed to
    be (the import-gated test feeds real PNG bytes)."""
    real = decoder == "real"
    if real:
        try:
            import PIL  # noqa: F401
        except ImportError as e:
            raise NotImplementedError(
                "real perceptual hashing requires Pillow; use decoder='fake'"
            ) from e
    if not 2 <= hash_size <= 8:
        # hash_size^2 - 1 bits must fit the declared 64-bit column
        raise ValueError("hash_size must be in [2, 8] for the long phash column")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        if real:  # executor-side import, gated above on the driver
            import io

            from PIL import Image
        for pdf in batches:
            n = len(pdf)
            hashes = np.empty(n, dtype=np.int64)
            if real:
                for j, content in enumerate(pdf["content"]):
                    img = Image.open(io.BytesIO(content)).convert("L").resize((32, 32))
                    hashes[j] = _phash_pixels(
                        np.asarray(img, dtype=np.uint8), hash_size
                    )
            else:
                seeds = np.fromiter(
                    (_decode_seed(c) for c in pdf["content"]), dtype=np.int64, count=n
                )
                for j in range(n):
                    px = np.random.default_rng(int(seeds[j])).integers(
                        0, 256, size=(32, 32), dtype=np.uint8
                    )
                    hashes[j] = _phash_pixels(px, hash_size)
            yield pd.DataFrame({"media_id": pdf["media_id"].to_numpy(), "phash": hashes})

    imgs = df.where(F.col("kind") == "image").select("media_id", "content")
    return imgs.mapInPandas(run, "media_id long, phash long")


def phash_candidates(hashes: DataFrame, max_hamming: int = 3) -> DataFrame:
    """Near-dup image pairs by perceptual hash: (id_a, id_b, hamming)
    with hamming <= max_hamming.

    NEVER all-pairs: the 64-bit hash splits into max_hamming+1 chunks —
    by pigeonhole, any pair within max_hamming agrees on at least one
    WHOLE chunk — so candidates come from equi-joins on (chunk_idx,
    chunk_value) and only candidates pay the exact popcount. The same
    multi-index trick SimHash dedup uses; bucket sizes follow chunk
    collisions, not corpus size."""
    from terrorblade_spark.operators.dedup import hamming64

    n_chunks = max_hamming + 1
    bits = 64 // n_chunks
    chunks = F.array(
        *[
            F.struct(
                F.lit(i).alias("ci"),
                F.shiftright(F.col("phash"), i * bits)
                .bitwiseAND(F.lit((1 << bits) - 1))
                .alias("cv"),
            )
            for i in range(n_chunks)
        ]
    )
    banded = hashes.select(
        F.col("media_id").alias("doc"), F.col("phash").alias("h"),
        F.explode(chunks).alias("c"),
    ).select("doc", "h", F.col("c.ci").alias("ci"), F.col("c.cv").alias("cv"))
    # Round-10 reshape (guide §2.4/§3.5, the q33/q52 recipe): group by
    # chunk bucket and expand member pairs row-locally instead of
    # self-joining the banded relation, which consumed the pHash
    # pipeline (and, upstream, the image-decode mapInPandas) twice.
    # sort_array orders by the leading struct field (doc), so expanded
    # pairs are already doc_a < doc_b. Round-11 population cap (guide
    # §2.5): a hot chunk bucket (one near-constant image region)
    # collects as bounded rank-chunks in bucket_pair_rows instead of
    # one unbounded collect_list row; pair set identical either way.
    from terrorblade_spark.operators.bucketpairs import bucket_pair_rows

    pairs = bucket_pair_rows(
        banded.select("ci", "cv", F.struct("doc", "h").alias("m")),
        ["ci", "cv"], "m", max_bucket_population=65_536,
        # ONE execution of the pHash pipeline (and the image-decode
        # mapInPandas upstream of it) across the cap's consumer
        # branches — AQE stage reuse is unreliable across them (see
        # bucketpairs.py)
        materialize=True,
    )
    return (
        pairs
        # strict < matches the old join's a.doc < b.doc exactly:
        # duplicate ids in the input (adjacent after sort) must not
        # pair with themselves (the q33 reshape precedent)
        .where(F.col("a.doc") < F.col("b.doc"))
        .select(
            F.col("a.doc").alias("id_a"),
            F.col("b.doc").alias("id_b"),
            hamming64(F.col("a.h"), F.col("b.h")).alias("hamming"),
        )
        .where(F.col("hamming") <= max_hamming)
        .distinct()
    )


def resize_images(
    df: DataFrame, target_w: int = 64, target_h: int = 64, decoder: str = "fake"
) -> DataFrame:
    """Image payload -> fixed-size grayscale pixel buffer (the resize
    step before batch featurization; training pipelines normalize all
    images to one shape so downstream tensors stack). The RESAMPLING
    math is real (vectorized nearest-neighbor index mapping over the
    pixel array — the same code path a real decode would feed); only
    the codec decode is the deterministic fake. Emits the resized
    buffer as binary plus its stats, one row per image.
    """
    if decoder == "real":  # pragma: no cover - lib not in container
        raise NotImplementedError("real resize requires Pillow; use decoder='fake'")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            n = len(pdf)
            # clamp to >=1: fillna only covers nulls, and a 0-sized
            # dimension (corrupt metadata) would index an empty axis
            # and fail the whole task for one bad row
            ws = np.maximum(pdf["width"].fillna(16).astype("int64").to_numpy(), 1)
            hs = np.maximum(pdf["height"].fillna(16).astype("int64").to_numpy(), 1)
            seeds = np.fromiter(
                (_decode_seed(c) for c in pdf["content"]), dtype=np.int64, count=n
            )
            bufs, means = [], np.empty(n, dtype=np.float64)
            for j in range(n):
                src = np.random.default_rng(int(seeds[j])).integers(
                    0, 256, size=(int(hs[j]), int(ws[j])), dtype=np.uint8
                )
                yi = np.clip(
                    np.round(np.linspace(0, src.shape[0] - 1, target_h)).astype(int),
                    0, src.shape[0] - 1,
                )
                xi = np.clip(
                    np.round(np.linspace(0, src.shape[1] - 1, target_w)).astype(int),
                    0, src.shape[1] - 1,
                )
                resized = src[np.ix_(yi, xi)]
                bufs.append(resized.tobytes())
                means[j] = resized.mean()
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].to_numpy(),
                    "width": np.full(n, target_w, dtype="int32"),
                    "height": np.full(n, target_h, dtype="int32"),
                    "pixels": bufs,
                    "mean_px": means,
                }
            )

    imgs = df.where(F.col("kind") == "image").select(
        "media_id",
        F.col("meta.width").alias("width"),
        F.col("meta.height").alias("height"),
        "content",
    )
    return imgs.mapInPandas(
        run, "media_id long, width int, height int, pixels binary, mean_px double"
    )


def decode_audio(df: DataFrame, decoder: str = "fake", max_samples: int = 480_000) -> DataFrame:
    """Audio payload -> per-clip signal stats (media_id, sample_rate,
    n_samples, rms, peak): the decode/inspect step for loudness-based
    quality filtering. Fake decoder draws PCM from the payload's md5
    seed at the clip's declared sample rate and duration (capped at
    ``max_samples`` so one long clip cannot blow task memory — a real
    ffmpeg path would stream-chunk the same way)."""
    if decoder == "real":  # pragma: no cover - lib not in container
        raise NotImplementedError("real audio decode requires ffmpeg; use decoder='fake'")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            n = len(pdf)
            srs = pdf["sample_rate"].fillna(16000).astype("int64").to_numpy()
            durs = pdf["duration_ms"].fillna(0).astype("int64").to_numpy()
            seeds = np.fromiter(
                (_decode_seed(c) for c in pdf["content"]), dtype=np.int64, count=n
            )
            # clip below at 0: negative duration_ms (corrupt metadata)
            # would request a negative-size RNG draw and kill the task
            counts = np.clip(srs * durs // 1000, 0, max_samples).astype("int64")
            rms = np.empty(n, dtype=np.float64)
            peak = np.empty(n, dtype=np.float64)
            for j in range(n):
                m = int(counts[j])
                if m == 0:
                    # empty/zero-duration clips are SILENT, not one
                    # fabricated sample: loudness filters must see 0
                    rms[j] = 0.0
                    peak[j] = 0.0
                    continue
                pcm = np.random.default_rng(int(seeds[j])).uniform(-1.0, 1.0, size=m)
                rms[j] = float(np.sqrt(np.mean(pcm * pcm)))
                peak[j] = float(np.abs(pcm).max())
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].to_numpy(),
                    "sample_rate": srs.astype("int32"),
                    "n_samples": counts,
                    "rms": rms,
                    "peak": peak,
                }
            )

    auds = df.where(F.col("kind") == "audio").select(
        "media_id",
        F.col("meta.sample_rate").alias("sample_rate"),
        F.col("meta.duration_ms").alias("duration_ms"),
        "content",
    )
    return auds.mapInPandas(
        run, "media_id long, sample_rate int, n_samples long, rms double, peak double"
    )
