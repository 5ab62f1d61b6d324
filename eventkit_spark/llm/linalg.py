"""Distributed linear algebra over embedding columns: exact second-
moment sums and PCA (whitening before SemDeDup / ANN is a standard
corpus-pipeline stage; Halko et al. 2011 for the general randomized
family — here d is small, so the EXACT covariance path wins).

Scale shape — the only one that works at 100 TB for tall-skinny X
(n rows, d <= a few hundred dims):

- each partition computes its d x d ``X^T X`` partial with ONE numpy
  matmul (Arrow batches, no per-row Python), plus the column-sum
  vector and row count;
- partials are plain sums -> one kilobyte-sized aggregate merges them
  (the classic "covariance is a mergeable summary" fact);
- the eigendecomposition of a d x d matrix is driver-side numpy
  (microseconds) — distributing it would be theater.

Exactness: vectors enter as fixed-point integers (floor(x * scale) —
the ``cluster.py`` replay trick), so every partial and every merged
sum is an exact int64 and the DuckDB oracle replays the whole moment
table value-for-value. Only the final eigen step is float, and it is
unit-tested (orthonormality, variance ordering, reconstruction),
never oracle-compared.

Overflow: |x_int| <= scale, so a cell sum is bounded by scale^2 * n —
at scale 1000 that allows n up to ~9e12 rows before int64 saturates;
raise ``scale`` only with that budget in mind.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

__all__ = ["embed_moment_sums", "embed_pca", "embed_standardize"]


def _moment_kernel(dim: int, scale: int):
    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        m = np.zeros((dim, dim), dtype=np.int64)
        s = np.zeros(dim, dtype=np.int64)
        n = 0
        for pdf in batches:
            x = np.stack(pdf["__v"].to_numpy())
            xi = np.floor(x.astype(np.float64) * scale).astype(np.int64)
            m += xi.T @ xi
            s += xi.sum(axis=0)
            n += xi.shape[0]
        if n == 0:
            return
        iu, ju = np.triu_indices(dim)
        out_i = np.concatenate([iu, np.arange(dim), [-1]])
        out_j = np.concatenate([ju, np.full(dim, -1), [-1]])
        out_v = np.concatenate([m[iu, ju], s, [n]])
        yield pd.DataFrame({"i": out_i, "j": out_j, "val": out_v})

    return kernel


def embed_moment_sums(
    emb: DataFrame,
    vec_col: str = "embedding",
    dim: int = 64,
    scale: int = 1000,
) -> DataFrame:
    """Exact integer second-moment table of the fixed-point vectors:

    - ``(i, j, val)`` with ``0 <= i <= j < dim``: sum of x_i * x_j
      (upper triangle of X^T X),
    - ``(i, -1, val)``: per-dimension sum,
    - ``(-1, -1, val)``: row count.

    One scan, one numpy matmul per Arrow partition, one merging
    aggregate over d(d+1)/2 + d + 1 rows. Covariance and PCA derive
    from these sums; the sums themselves are the oracle-checked
    contract (bit-identical in any engine at the same scale).
    """
    src = emb.select(F.col(vec_col).alias("__v")).filter(
        F.col("__v").isNotNull()
    )
    parts = src.mapInPandas(
        _moment_kernel(dim, scale), schema="i int, j int, val long"
    )
    return parts.groupBy("i", "j").agg(F.sum("val").alias("val"))


def embed_pca(
    emb: DataFrame,
    k: int = 8,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    dim: int = 64,
    scale: int = 1000,
    whiten: bool = False,
) -> tuple[DataFrame, np.ndarray, np.ndarray]:
    """PCA projection of an embedding column: returns
    ``(projected, components, eigvals)`` where ``projected`` is
    ``(id, pc array<double>)`` (k dims), ``components`` is the k x d
    eigenbasis and ``eigvals`` the top-k covariance eigenvalues.

    The covariance matrix comes from ONE ``embed_moment_sums`` pass
    (exact integers), the eigendecomposition is driver-side
    ``numpy.linalg.eigh`` (d x d), and the projection is a broadcast
    matrix literal folded into a Column expression — a second scan,
    zero joins, zero extra exchanges. Deterministic up to eigenvector
    SIGN (resolved by forcing the largest-|coord| entry positive), so
    results are reproducible run-to-run; cross-engine contracts pin
    the moment sums, unit tests pin the eigen step.
    """
    if not 1 <= k <= dim:
        raise ValueError(f"need 1 <= k <= dim, got k={k}")
    rows = embed_moment_sums(emb, vec_col, dim, scale).collect()
    m = np.zeros((dim, dim), dtype=np.float64)
    s = np.zeros(dim, dtype=np.float64)
    n = 0
    for r in rows:
        i, j, v = r["i"], r["j"], r["val"]
        if i == -1:
            n = v
        elif j == -1:
            s[i] = v
        else:
            m[i, j] = v
            m[j, i] = v
    if n < 2:
        raise ValueError("embed_pca needs at least 2 vectors")
    mu = s / n
    cov = (m - np.outer(mu, s)) / (n - 1)
    vals, vecs = np.linalg.eigh(cov)  # ascending
    order = np.argsort(vals)[::-1][:k]
    eigvals = vals[order]
    comps = vecs[:, order].T  # k x d
    # sign convention: largest-|coordinate| entry of each component > 0
    for r_ in range(k):
        jmax = int(np.argmax(np.abs(comps[r_])))
        if comps[r_, jmax] < 0:
            comps[r_] = -comps[r_]
    proj = comps / np.sqrt(np.maximum(eigvals, 1e-30))[:, None] if whiten else comps
    centered = F.transform(
        F.col(vec_col),
        lambda x: x.cast("double"),
    )
    # fold the k x d matrix into k dot-product Column expressions over
    # the ORIGINAL-unit vector: dot(comp, x) - dot(comp, mu/scale)
    # (mu is in integer units; the offset converts it back)
    pcs = []
    mu_orig = mu / scale
    for r_ in range(k):
        dot = F.aggregate(
            F.zip_with(
                centered,
                F.array(*[F.lit(float(c)) for c in proj[r_]]),
                lambda x, c: c * x,
            ),
            F.lit(0.0),
            lambda acc, t: acc + t,
        )
        pcs.append(dot - F.lit(float(np.dot(proj[r_], mu_orig))))
    projected = emb.select(
        F.col(id_col), F.array(*pcs).alias("pc")
    )
    return projected, comps, eigvals


def embed_standardize(
    emb: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    dim: int = 64,
    scale: int = 1000,
    round_to: int = 6,
) -> DataFrame:
    """Per-dimension z-score of an embedding column — the
    standardization pass before PCA/ANN when dimensions carry
    different scales. ONE moment-sums pass computes mean/std per
    dimension (exact integer sums), then a broadcast-literal
    projection standardizes in a second scan: zero joins, zero extra
    exchanges.

    Cross-engine determinism: mu = s/n and sd = sqrt((ss - s*s/n) /
    (n-1)) / scale are evaluated with the SAME IEEE double operations
    in the same order on both sides (the integer sums are < 2^53 at
    any n below ~9e9 rows x scale 1000, so every int->double
    conversion is exact); the z values are rounded to ``round_to``.
    Zero-variance dimensions standardize to 0.0 rather than NaN.

    Quantization contract: floor(x * scale) biases the estimated mean
    by up to ``+0.5/scale`` in original units, so ``mean(z)`` sits
    within ``0.5 / (scale * sd)`` of zero — at the default scale that
    is half a percent of a standard deviation even for sd = 0.1
    dimensions. Raise ``scale`` for tighter centering.
    """
    rows = embed_moment_sums(emb, vec_col, dim, scale).collect()
    s = [0] * dim
    ss = [0] * dim
    n = 0
    for r in rows:
        i, j, v = r["i"], r["j"], r["val"]
        if i == -1:
            n = v
        elif j == -1:
            s[i] = v
        elif i == j:
            ss[i] = v
    if n < 2:
        raise ValueError("embed_standardize needs at least 2 vectors")
    import math

    mus, sds = [], []
    for i in range(dim):
        # operation ORDER mirrors the SQL oracle exactly: (s/n)/scale,
        # sqrt((ss - s*s/n)/(n-1))/scale — IEEE-identical in any engine
        # while the integer sums stay below 2^53 (math.sqrt, not **0.5:
        # pow(x, .5) is not guaranteed correctly rounded)
        mu = float(s[i]) / n / scale
        num = float(ss[i]) - float(s[i]) * float(s[i]) / n
        sd = math.sqrt(num / (n - 1)) / scale if num > 0 else 0.0
        mus.append(mu)
        sds.append(sd)
    x = F.transform(F.col(vec_col), lambda v: v.cast("double"))
    centered = F.zip_with(
        x, F.array(*[F.lit(m) for m in mus]), lambda a, b: a - b
    )
    z = F.zip_with(
        centered,
        F.array(*[F.lit(d) for d in sds]),
        lambda a, d: F.when(d > 0, F.round(a / d, round_to)).otherwise(
            F.lit(0.0)
        ),
    )
    return emb.select(F.col(id_col), z.alias("z"))
