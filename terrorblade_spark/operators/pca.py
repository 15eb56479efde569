"""PCA / whitening / random projection over embedding columns — the
dimensionality-reduction stage of the vector scale path.

Reference parity: the reference stores fixed 768-d sentence-transformer
embeddings and hands ANN to DuckDB VSS (vector_store.py:150-152 sizes
the HNSW index at rows x 768 x 4 B x 1.5 — ~4 GB for its own 929k-row
corpus). At billions of rows that memory wall is the problem, and the
standard public answer (FAISS preprocessing practice) is a linear
projection in front of the index: PCA to cut dimensions that carry no
variance, optional whitening so each kept dimension contributes equally
to the metric, or a seeded Johnson-Lindenstrauss random projection when
even one moments pass over the corpus is too expensive.

Design — the same distributed-stats / driver-solve / broadcast-model
split as ``vector.ivf_build``:

- **Moments are ONE Arrow pass.** ``mapInPandas`` accumulates per-
  PARTITION partials (n, sum, Gram = X^T X) with BLAS and emits a
  single row per partition — d + d^2 doubles, regardless of partition
  row count. Emitting per-partition (not per-batch) keeps the partial
  relation at #partitions rows; a bounded-fan-in merge stage
  (``applyInPandas`` over ``part_id % fanin``) caps what the driver
  ever collects. BLAS on Arrow batches is the measured justified-
  Python case for dense linear algebra in this repo (~0.01 us/element
  vs ~7 us for a JVM HOF fold — see operators/dedup.py
  _cluster_edges_blas).
- **The eigensolve is driver-side numpy** on the d x d covariance —
  corpus-size-independent metadata, exactly like ivf_build's k-means
  centers. Components get a deterministic sign convention (largest-
  magnitude loading positive) so fits are reproducible artifacts.
- **Transform is a broadcast closure**: y = x @ proj + offset folds the
  centering (and whitening scale) into one (d x k) matrix and one k
  offset, applied as a blocked BLAS matmul in an Arrow pandas UDF.
- ``embedding_moments`` is the JVM/decimal twin of the partials'
  diagonal (posexplode + order-independent decimal sums) — it exists
  so the distributed moment math has a FULL DuckDB value oracle
  (q83_embedding_moments); the Arrow path is unit-tested against it
  and against numpy.

Scale notes: the Gram partial is d^2 doubles per partition —
``_MAX_DIM`` (2048 -> 32 MB/row) guards the Arrow row size; past that,
project first (``random_projection`` needs no fit) or fit on a sample.
All determinism is modulo float addition order WITHIN the fixed
partition/merge tree; repeated runs over the same partitioning are
bit-identical.
"""

from __future__ import annotations

import hashlib
import math
from dataclasses import dataclass

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from terrorblade_spark.functions.exprs import dec_sum

_MAX_DIM = 2048
_MOMENT_SCHEMA = "part_id long, n long, s array<double>, g array<double>"


@dataclass(frozen=True)
class PCAModel:
    """Fitted PCA: ``components`` rows are unit eigenvectors of the
    covariance, descending eigenvalue order; ``eigenvalues`` are the
    per-component variances; ``total_variance`` the covariance trace
    (so explained-variance ratios don't need the dropped tail)."""

    mean: tuple[float, ...]
    components: tuple[tuple[float, ...], ...]  # (k, d)
    eigenvalues: tuple[float, ...]  # (k,)
    n: int
    total_variance: float

    @property
    def k(self) -> int:
        return len(self.components)

    @property
    def dim(self) -> int:
        return len(self.mean)

    def explained_variance_ratio(self) -> tuple[float, ...]:
        t = self.total_variance
        return tuple((v / t) if t > 0 else 0.0 for v in self.eigenvalues)


def _moment_partials(df: DataFrame, vec_col: str) -> DataFrame:
    """One row per non-empty partition: (part_id, n, sum, flattened
    Gram). Null vectors are skipped; inconsistent dims raise."""
    import numpy as np
    import pandas as pd

    def gen(batches):
        from pyspark import TaskContext

        ctx = TaskContext.get()
        pid = ctx.partitionId() if ctx is not None else 0
        n = 0
        s = g = None
        for pdf in batches:
            col = pdf[vec_col].dropna()
            if not len(col):
                continue
            x = np.stack(col.to_numpy()).astype("float64", copy=False)
            d = x.shape[1]
            if d > _MAX_DIM:
                raise ValueError(
                    f"vector dim {d} exceeds _MAX_DIM={_MAX_DIM}: the Gram "
                    f"partial would be {d}^2 doubles per partition — "
                    "random_projection first, or fit on a lower-dim view"
                )
            if s is None:
                s = np.zeros(d)
                g = np.zeros((d, d))
            elif d != s.shape[0]:
                raise ValueError(
                    f"inconsistent vector dims in {vec_col!r}: {s.shape[0]} vs {d}"
                )
            n += x.shape[0]
            s += x.sum(axis=0)
            g += x.T @ x
        if n:
            yield pd.DataFrame(
                {"part_id": [pid], "n": [n], "s": [s.tolist()], "g": [g.ravel().tolist()]}
            )

    return df.select(vec_col).mapInPandas(gen, _MOMENT_SCHEMA)


def _merge_rows(pdf):
    """Sum a frame of partial rows in sorted part_id order (one
    deterministic reduction for both the tree stage and the driver)."""
    import numpy as np
    import pandas as pd

    # true part_ids are unique, so this sort fixes the float addition
    # order regardless of shuffle arrival order (bit-determinism)
    pdf = pdf.sort_values("part_id")
    s = np.zeros(len(pdf["s"].iloc[0]))
    g = np.zeros(len(pdf["g"].iloc[0]))
    for row_s, row_g in zip(pdf["s"], pdf["g"]):
        s += np.asarray(row_s)
        g += np.asarray(row_g)
    return pd.DataFrame(
        {
            "part_id": [int(pdf["part_id"].iloc[0])],
            "n": [int(pdf["n"].sum())],
            "s": [s.tolist()],
            "g": [g.ravel().tolist()],
        }
    )


def fit_moments(
    df: DataFrame, vec_col: str = "embedding", fanin: int = 64
):
    """Distributed (n, sum, Gram) in one pass. Returns
    ``(n, mean, cov)`` as python/numpy values. When the partial
    relation exceeds ``fanin`` rows an intermediate ``applyInPandas``
    merge stage bounds the driver collect at ``fanin`` rows."""
    import numpy as np

    partials = _moment_partials(df, vec_col).persist()
    try:
        p = partials.count()
        if p == 0:
            raise ValueError(f"no non-null vectors in {vec_col!r}")
        merged = partials
        if p > fanin:
            # group on a DERIVED bucket and keep the true part_id:
            # overwriting part_id would make _merge_rows' sort key
            # constant within each group, leaving the within-group
            # float addition order to shuffle arrival — bit-level
            # nondeterminism across runs of the same input
            merged = (
                partials.withColumn("__bucket", F.pmod("part_id", F.lit(fanin)))
                .groupBy("__bucket")
                .applyInPandas(lambda pdf: _merge_rows(pdf.drop(columns="__bucket")),
                               _MOMENT_SCHEMA)
            )
        rows = sorted(merged.collect(), key=lambda r: r.part_id)
    finally:
        partials.unpersist()
    n = sum(r.n for r in rows)
    s = np.zeros(len(rows[0].s))
    g = np.zeros((len(rows[0].s), len(rows[0].s)))
    for r in rows:
        s += np.asarray(r.s)
        g += np.asarray(r.g).reshape(g.shape)
    mean = s / n
    cov = g / n - np.outer(mean, mean)
    cov = (cov + cov.T) / 2.0  # symmetrize float residue for eigh
    return n, mean, cov


def pca_fit(
    df: DataFrame, vec_col: str = "embedding", k: int = 16, fanin: int = 64
) -> PCAModel:
    """Fit a k-component PCA (population covariance) over a vector
    column. One distributed pass (see ``fit_moments``); the d x d
    eigensolve is driver-side numpy. Components carry a deterministic
    sign (largest-|loading| entry positive) and descend by variance."""
    import numpy as np

    n, mean, cov = fit_moments(df, vec_col, fanin=fanin)
    d = mean.shape[0]
    if not (1 <= k <= d):
        raise ValueError(f"k must be in [1, {d}], got {k}")
    evals, evecs = np.linalg.eigh(cov)  # ascending
    order = np.argsort(evals)[::-1][:k]
    comps = evecs[:, order].T  # (k, d)
    for i in range(comps.shape[0]):
        j = int(np.argmax(np.abs(comps[i])))
        if comps[i, j] < 0:
            comps[i] = -comps[i]
    lam = np.clip(evals[order], 0.0, None)
    return PCAModel(
        mean=tuple(float(v) for v in mean),
        components=tuple(tuple(float(v) for v in row) for row in comps),
        eigenvalues=tuple(float(v) for v in lam),
        n=int(n),
        total_variance=float(np.clip(np.trace(cov), 0.0, None)),
    )


def _project_udf(proj, offset):
    """Arrow pandas UDF computing y = x @ proj + offset (blocked BLAS)."""
    import numpy as np

    proj = np.asarray(proj, dtype="float64")
    offset = np.asarray(offset, dtype="float64")

    @F.pandas_udf("array<double>")
    def project(col: pd.Series) -> pd.Series:
        if not len(col):
            return pd.Series([], dtype="object")
        mask = col.notna()
        out = pd.Series([None] * len(col), index=col.index, dtype="object")
        if mask.any():
            x = np.stack(col[mask].to_numpy()).astype("float64", copy=False)
            y = x @ proj + offset
            out.loc[mask] = pd.Series(list(y), index=col.index[mask])
        return out

    return project


def pca_transform(
    df: DataFrame,
    model: PCAModel,
    vec_col: str = "embedding",
    out_col: str = "pca",
    whiten: bool = False,
    eps: float = 1e-12,
) -> DataFrame:
    """Project ``vec_col`` onto the model's components:
    y = (x - mean) @ W^T, optionally whitened (each component divided
    by its standard deviation, so the output covariance is ~identity).
    Centering and whitening fold into ONE (d x k) matrix and one
    k-offset broadcast inside the UDF closure — a single BLAS matmul
    per Arrow batch, null rows pass through as null."""
    import numpy as np

    w = np.asarray(model.components, dtype="float64")  # (k, d)
    if whiten:
        scale = 1.0 / np.sqrt(np.maximum(np.asarray(model.eigenvalues), eps))
        w = w * scale[:, None]
    proj = w.T  # (d, k)
    offset = -np.asarray(model.mean, dtype="float64") @ proj
    return df.withColumn(out_col, _project_udf(proj, offset)(F.col(vec_col)))


def pca_reconstruct(
    df: DataFrame,
    model: PCAModel,
    in_col: str = "pca",
    out_col: str = "reconstructed",
) -> DataFrame:
    """Map k-dim PCA coordinates back to the original space:
    x_hat = y @ W + mean — the decompression half of PCA-as-storage
    (keep k coords per vector, reconstruct on read; error is exactly
    the dropped eigenvalues' variance). Only valid for NON-whitened
    transforms. Same broadcast BLAS UDF as the forward map."""
    import numpy as np

    w = np.asarray(model.components, dtype="float64")  # (k, d)
    return df.withColumn(
        out_col, _project_udf(w, np.asarray(model.mean, dtype="float64"))(F.col(in_col))
    )


def random_projection(
    df: DataFrame,
    out_dim: int,
    vec_col: str = "embedding",
    out_col: str = "rp",
    seed: str = "jl-v1",
    in_dim: int | None = None,
) -> DataFrame:
    """Seeded Johnson-Lindenstrauss Gaussian projection
    y = x @ R / sqrt(out_dim), R_ij ~ N(0,1) from a deterministic
    generator keyed on md5(``seed``) — no fit pass, distances preserved
    within the JL bound in expectation. The go-to when even one
    moments pass is too expensive, or as the pre-step that brings d
    under ``pca_fit``'s Gram guard. ``in_dim`` skips the one-row dim
    peek when the caller knows it."""
    import numpy as np

    if out_dim < 1:
        raise ValueError(f"out_dim must be >= 1, got {out_dim}")
    if in_dim is None:
        row = df.select(F.size(vec_col).alias("d")).where(F.col(vec_col).isNotNull()).first()
        if row is None:
            raise ValueError(f"no non-null vectors in {vec_col!r}")
        in_dim = int(row.d)
    rng = np.random.default_rng(
        int.from_bytes(hashlib.md5(seed.encode()).digest()[:8], "big")
    )
    r = rng.standard_normal((in_dim, out_dim)) / math.sqrt(out_dim)
    offset = np.zeros(out_dim)
    return df.withColumn(out_col, _project_udf(r, offset)(F.col(vec_col)))


def embedding_moments(df: DataFrame, vec_col: str = "embedding") -> DataFrame:
    """Per-dimension count / mean / population variance of a vector
    column — the JVM/decimal twin of the Arrow moment partials'
    diagonal, built for bit-exact cross-engine comparison: posexplode
    keeps everything in whole-stage codegen, and the sums are
    order-independent decimals (functions/exprs.dec_sum) so Spark and
    DuckDB agree bit-for-bit; the variance is then two single double
    ops (msq - mean*mean) on identical inputs. Value-oracled end to
    end as q83_embedding_moments."""
    ex = df.select(F.posexplode(vec_col).alias("dim", "v")).select(
        "dim", F.col("v").cast("double").alias("v")
    )
    n = F.count(F.lit(1))
    agg = ex.groupBy("dim").agg(
        n.alias("n_vectors"),
        (dec_sum("v", 12) / n).alias("mean"),
        (dec_sum(F.col("v") * F.col("v"), 12) / n).alias("mean_sq"),
    )
    return agg.select(
        "dim",
        "n_vectors",
        "mean",
        (F.col("mean_sq") - F.col("mean") * F.col("mean")).alias("variance"),
    )


def balanced_components(model: PCAModel, m: int) -> PCAModel:
    """Reorder a full-rank PCA's components round-robin across ``m``
    groups (component i -> position based on i mod m) — the cheap OPQ
    decomposition for product quantization: subspace s of a
    contiguous-split PQ then sees components s, s+m, s+2m, ..., a MIX
    of high- and low-variance directions.

    Why this exists as API: plain PCA rotation before PQ is a measured
    FOOTGUN — it concentrates all variance into the first subspaces,
    the rest quantize noise, ADC distances collapse into ties
    (tools/opq_probe.py: recall@10 0.34 raw -> 0.01 PCA-sorted ->
    0.42 balanced at the same code budget). Use
    ``pca_transform(df, balanced_components(pca_fit(df, k=d), m))``
    in front of ``pq_build(..., m=m)``; requires k % m == 0."""
    if not 1 <= m <= model.k:
        raise ValueError(f"m must be in [1, {model.k}], got {m}")
    if model.k % m:
        raise ValueError(
            f"k={model.k} not divisible by m={m}: contiguous PQ subspaces "
            "would be unequal — fit with a divisible k or pad the split"
        )
    per = model.k // m
    perm = [s + j * m for s in range(m) for j in range(per)]
    return PCAModel(
        mean=model.mean,
        components=tuple(model.components[i] for i in perm),
        eigenvalues=tuple(model.eigenvalues[i] for i in perm),
        n=model.n,
        total_variance=model.total_variance,
    )
