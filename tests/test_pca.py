"""PCA / whitening / random projection (operators/pca.py).

The fit is validated against an exact numpy reference on the same
data; the Arrow moment partials are cross-checked against the
decimal-exact JVM twin (embedding_moments — itself value-oracled as
q83); the merge tree is checked for partitioning invariance.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from terrorblade_spark.operators.pca import (
    PCAModel,
    embedding_moments,
    fit_moments,
    pca_fit,
    pca_transform,
    random_projection,
)


def _mat(seed: int = 7, n: int = 400, d: int = 8, rank: int | None = None):
    rng = np.random.default_rng(seed)
    if rank is None:
        x = rng.standard_normal((n, d)) * rng.uniform(0.5, 3.0, size=d)
        return x + rng.uniform(-2, 2, size=d)
    basis = rng.standard_normal((rank, d))
    return rng.standard_normal((n, rank)) @ basis + rng.uniform(-1, 1, size=d)


def _df(spark, x, parts: int = 8):
    rows = [(i, [float(v) for v in row]) for i, row in enumerate(x)]
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>").repartition(
        parts, "vec_id"
    )


def test_fit_moments_matches_numpy(spark):
    x = _mat()
    n, mean, cov = fit_moments(_df(spark, x), "embedding")
    assert n == len(x)
    np.testing.assert_allclose(mean, x.mean(axis=0), atol=1e-9)
    np.testing.assert_allclose(cov, np.cov(x, rowvar=False, bias=True), atol=1e-9)


def test_fit_moments_merge_tree_is_partitioning_invariant(spark):
    x = _mat(seed=11)
    _, m1, c1 = fit_moments(_df(spark, x, parts=1), "embedding")
    # 50 partitions > fanin=8 forces the applyInPandas merge stage
    _, m2, c2 = fit_moments(_df(spark, x, parts=50), "embedding", fanin=8)
    np.testing.assert_allclose(m1, m2, atol=1e-9)
    np.testing.assert_allclose(c1, c2, atol=1e-9)


def test_pca_fit_matches_numpy_eig(spark):
    x = _mat(seed=3)
    model = pca_fit(_df(spark, x), "embedding", k=8)
    cov = np.cov(x, rowvar=False, bias=True)
    evals, evecs = np.linalg.eigh(cov)
    order = np.argsort(evals)[::-1]
    np.testing.assert_allclose(model.eigenvalues, evals[order], atol=1e-9)
    np.testing.assert_allclose(model.total_variance, np.trace(cov), atol=1e-9)
    for i, row in enumerate(np.asarray(model.components)):
        ref = evecs[:, order[i]]
        j = int(np.argmax(np.abs(ref)))
        if ref[j] < 0:
            ref = -ref
        np.testing.assert_allclose(row, ref, atol=1e-8)
        # sign convention: largest-|loading| entry positive
        assert row[int(np.argmax(np.abs(row)))] > 0


def test_pca_low_rank_data_concentrates_variance(spark):
    x = _mat(seed=5, d=10, rank=2)
    model = pca_fit(_df(spark, x), "embedding", k=10)
    ratios = model.explained_variance_ratio()
    assert sum(ratios[:2]) > 0.999
    assert ratios == tuple(sorted(ratios, reverse=True))


def test_pca_transform_matches_numpy_and_passes_nulls(spark):
    x = _mat(seed=9, n=60)
    model = pca_fit(_df(spark, x), "embedding", k=3)
    df = _df(spark, x).unionByName(
        _df(spark, x).sparkSession.createDataFrame(
            [(10_000, None)], "vec_id long, embedding array<double>"
        )
    )
    got = {r.vec_id: r.pca for r in pca_transform(df, model, "embedding").collect()}
    w = np.asarray(model.components)
    want = (x - np.asarray(model.mean)) @ w.T
    for i in range(len(x)):
        np.testing.assert_allclose(got[i], want[i], atol=1e-9)
    assert got[10_000] is None


def test_pca_whiten_gives_identity_covariance(spark):
    x = _mat(seed=13)
    model = pca_fit(_df(spark, x), "embedding", k=8)
    y = pca_transform(_df(spark, x), model, "embedding", whiten=True)
    mat = np.stack([r.pca for r in y.orderBy("vec_id").collect()])
    np.testing.assert_allclose(
        np.cov(mat, rowvar=False, bias=True), np.eye(8), atol=1e-6
    )


def test_embedding_moments_agrees_with_arrow_partials(spark):
    x = _mat(seed=17)
    df = _df(spark, x)
    n, mean, cov = fit_moments(df, "embedding")
    rows = embedding_moments(df, "embedding").orderBy("dim").collect()
    assert [r.dim for r in rows] == list(range(x.shape[1]))
    for r in rows:
        assert r.n_vectors == n
        np.testing.assert_allclose(r.mean, mean[r.dim], atol=1e-9)
        np.testing.assert_allclose(r.variance, cov[r.dim, r.dim], atol=1e-9)


def test_random_projection_deterministic_and_jl(spark):
    x = _mat(seed=21, n=80, d=32)
    df = _df(spark, x)
    a = {r.vec_id: r.rp for r in random_projection(df, 16, "embedding").collect()}
    b = {r.vec_id: r.rp for r in random_projection(df, 16, "embedding").collect()}
    assert a == b
    c = {r.vec_id: r.rp for r in random_projection(df, 16, "embedding", seed="other").collect()}
    assert a[0] != c[0]
    # JL: pairwise squared distances preserved in expectation (loose bound)
    y = np.stack([a[i] for i in range(len(x))])
    rng = np.random.default_rng(0)
    idx = rng.integers(0, len(x), size=(200, 2))
    dx = np.sum((x[idx[:, 0]] - x[idx[:, 1]]) ** 2, axis=1)
    dy = np.sum((y[idx[:, 0]] - y[idx[:, 1]]) ** 2, axis=1)
    keep = dx > 1e-9
    ratio = dy[keep] / dx[keep]
    assert 0.8 < np.median(ratio) < 1.25


def test_pca_fit_rejects_bad_args(spark):
    x = _mat(seed=1, n=20, d=4)
    with pytest.raises(ValueError):
        pca_fit(_df(spark, x), "embedding", k=0)
    with pytest.raises(ValueError):
        pca_fit(_df(spark, x), "embedding", k=5)
    empty = spark.createDataFrame([], "vec_id long, embedding array<double>")
    with pytest.raises(ValueError):
        fit_moments(empty, "embedding")


def test_pca_model_roundtrips_as_plain_data():
    m = PCAModel(
        mean=(0.0, 1.0),
        components=((1.0, 0.0),),
        eigenvalues=(2.0,),
        n=10,
        total_variance=3.0,
    )
    assert m.k == 1 and m.dim == 2
    assert m.explained_variance_ratio() == (2.0 / 3.0,)


def test_pca_model_save_load_roundtrip(spark, tmp_path):
    from terrorblade_spark.operators.models import load_pca, save_pca

    x = _mat(seed=23, n=50, d=6)
    model = pca_fit(_df(spark, x), "embedding", k=4)
    save_pca(spark, model, str(tmp_path / "pca"))
    back = load_pca(spark, str(tmp_path / "pca"))
    # bit-exact roundtrip: parquet doubles + repr-exact JSON floats
    assert back == model

    with pytest.raises(ValueError):
        from terrorblade_spark.operators.models import load_bm25

        load_bm25(spark, str(tmp_path / "pca"))


def test_pca_reconstruct_roundtrip_and_error(spark):
    from terrorblade_spark.operators.pca import pca_reconstruct

    x = _mat(seed=29, n=80, d=6)
    # k = d: lossless roundtrip
    full = pca_fit(_df(spark, x), "embedding", k=6)
    y = pca_transform(_df(spark, x), full, "embedding")
    back = pca_reconstruct(y, full, "pca")
    got = {r.vec_id: np.asarray(r.reconstructed) for r in back.collect()}
    for i in range(len(x)):
        np.testing.assert_allclose(got[i], x[i], atol=1e-9)
    # k < d: mean squared reconstruction error == sum of dropped eigenvalues
    part = pca_fit(_df(spark, x), "embedding", k=2)
    y2 = pca_transform(_df(spark, x), part, "embedding")
    got2 = {r.vec_id: np.asarray(r.reconstructed)
            for r in pca_reconstruct(y2, part, "pca").collect()}
    mse = np.mean([np.sum((got2[i] - x[i]) ** 2) for i in range(len(x))])
    dropped = full.total_variance - sum(part.eigenvalues)
    np.testing.assert_allclose(mse, dropped, rtol=1e-9)


def test_balanced_components_round_robin():
    m = PCAModel(
        mean=(0.0,) * 4,
        components=tuple((float(i),) * 4 for i in range(4)),
        eigenvalues=(4.0, 3.0, 2.0, 1.0),
        n=10,
        total_variance=10.0,
    )
    from terrorblade_spark.operators.pca import balanced_components

    b = balanced_components(m, 2)
    # subspace 0 gets components 0, 2; subspace 1 gets 1, 3
    assert b.eigenvalues == (4.0, 2.0, 3.0, 1.0)
    assert [row[0] for row in b.components] == [0.0, 2.0, 1.0, 3.0]
    assert b.total_variance == m.total_variance
    with pytest.raises(ValueError):
        balanced_components(m, 3)  # 4 % 3 != 0
    with pytest.raises(ValueError):
        balanced_components(m, 5)


def test_fit_moments_merge_tree_is_bit_deterministic(spark):
    # same data, same partitioning, merge path forced twice: the
    # (bucket-grouped, true-part_id-sorted) reduction must be
    # BIT-identical across runs, not just allclose
    x = _mat(seed=31)
    a = fit_moments(_df(spark, x, parts=40), "embedding", fanin=8)
    b = fit_moments(_df(spark, x, parts=40), "embedding", fanin=8)
    assert a[0] == b[0]
    assert (a[1] == b[1]).all()
    assert (a[2] == b[2]).all()
