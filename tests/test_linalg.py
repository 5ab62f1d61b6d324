"""Exact moment sums + driver-side PCA over embedding columns."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from eventkit_spark.llm.linalg import embed_moment_sums, embed_pca


def _synth(spark, n=400, dim=8, seed=3):
    """Correlated Gaussian-ish data with a dominant known direction."""
    rng = np.random.RandomState(seed)
    main = np.zeros(dim)
    main[0], main[1] = 3.0, 4.0  # dominant direction (0.6, 0.8, 0...)
    x = rng.randn(n, 1) * main[None, :] + 0.1 * rng.randn(n, dim)
    rows = [(i, [float(v) for v in x[i]]) for i in range(n)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    return df.repartition(5), x


def test_moment_sums_exact_vs_numpy(spark):
    df, x = _synth(spark)
    got = {(r["i"], r["j"]): r["val"]
           for r in embed_moment_sums(df, dim=8, scale=1000).collect()}
    xi = np.floor(x.astype(np.float32).astype(np.float64) * 1000).astype(np.int64)
    m = xi.T @ xi
    for i in range(8):
        for j in range(i, 8):
            assert got[(i, j)] == m[i, j], (i, j)
        assert got[(i, -1)] == xi[:, i].sum()
    assert got[(-1, -1)] == len(x)


def test_pca_recovers_dominant_direction(spark):
    df, x = _synth(spark)
    proj, comps, eigvals = embed_pca(df, k=3, dim=8, scale=1000)
    # eigenvalues sorted descending, dominant one far ahead
    assert eigvals[0] > eigvals[1] >= eigvals[2] >= 0
    assert eigvals[0] > 20 * eigvals[1]
    # top component aligns with (0.6, 0.8, 0, ...) up to tolerance
    want = np.zeros(8)
    want[0], want[1] = 0.6, 0.8
    assert abs(abs(np.dot(comps[0], want)) - 1.0) < 0.01
    # orthonormal basis
    g = comps @ comps.T
    assert np.allclose(g, np.eye(3), atol=1e-9)
    # sign convention: largest-|coord| entry positive -> deterministic
    for r in comps:
        assert r[int(np.argmax(np.abs(r)))] > 0
    # projected variance matches eigenvalue order; pc1 carries ~all of it
    pcs = np.array([row["pc"] for row in proj.orderBy("vec_id").collect()])
    v = pcs.var(axis=0, ddof=1)
    assert v[0] > 20 * v[1]
    # projection reproduces dot(comp, x - mu) (spot-check row 0)
    xf = x.astype(np.float32).astype(np.float64)
    mu = np.floor(xf * 1000).astype(np.int64).sum(axis=0) / len(x) / 1000
    want0 = comps @ (xf[0] - mu)
    assert np.allclose(pcs[0], want0, atol=1e-6)


def test_standardize_zscores(spark):
    from eventkit_spark.llm.linalg import embed_standardize

    df, x = _synth(spark, n=300, dim=8)
    # make dim 7 constant -> zero variance must yield 0.0, not NaN
    const = df.select(
        "vec_id",
        F.concat(
            F.slice(F.col("embedding"), 1, 7),
            F.array(F.lit(2.5).cast("float")),
        ).alias("embedding"),
    )
    out = embed_standardize(const, dim=8, scale=1000)
    z = np.array([r["z"] for r in out.orderBy("vec_id").collect()])
    # standardized dims: mean ~0 within the documented floor-bias
    # bound 0.5/(scale*sd) (sd ~0.1 here -> 5e-3), std ~1
    assert np.all(np.abs(z[:, :7].mean(axis=0)) < 8e-3)
    assert np.all(np.abs(z[:, :7].std(axis=0, ddof=1) - 1.0) < 5e-3)
    assert np.all(z[:, 7] == 0.0)
    # tighter scale -> tighter centering (the documented knob)
    out2 = embed_standardize(const, dim=8, scale=100000)
    z2 = np.array([r["z"] for r in out2.orderBy("vec_id").collect()])
    assert np.all(np.abs(z2[:, :7].mean(axis=0)) < 2e-4)


def test_pca_validates_k(spark):
    df, _ = _synth(spark, n=20)
    with pytest.raises(ValueError):
        embed_pca(df, k=0, dim=8)
    with pytest.raises(ValueError):
        embed_pca(df.limit(1), k=2, dim=8)
