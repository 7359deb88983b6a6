"""PCA over the embedding table: fit from exact-integer covariance
moments, project distributed — the dimensionality-reduction stage the
``embedding_covariance`` query preps for.

Fit/transform split mirrors the engine's other trainers (kmeans_fit,
fit_linear_hour_dow): the DATA-side work is one covariance pass
(``covariance_moments_vectorized`` — Arrow-batched integer BLAS, one
dim²-keyed shuffle); the eigendecomposition then runs driver-side on
the collected dim×dim matrix, which is the MODEL, not the data (64×64
doubles = 32 KB — same rationale as collecting k-means centroids or
linear coefficients). Components broadcast back as plan literals, so
projection is pure JVM column arithmetic over ``F.aggregate`` — no
Python in the per-row path, no shuffle.

Eigendecomposition of a symmetric matrix is not SQL-expressible, so
PCA has no DuckDB oracle; correctness comes from differential tests
against numpy on the same data (components orthonormal, explained
variance sorted and summing to total variance, projection equal to
numpy's, reconstruction error shrinking as rank grows) —
tests/test_operators.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pca_fit(emb: DataFrame, dim: int, rank: int, vec_col: str = "embedding"):
    """One covariance pass + tiny driver-side eigh. Returns
    (components [rank x dim] as a python list-of-lists, mean [dim],
    explained_var [rank]) — the model artifact (KBs)."""
    import numpy as np

    from bigdatasmallprice_spark.operators.similarity import (
        covariance_moments_vectorized,
    )

    m = covariance_moments_vectorized(emb, vec_col=vec_col).collect()
    n = sx = None
    sums = np.zeros(dim)
    gram = np.zeros((dim, dim))
    for r in m:
        if r.i == -1 and r.j == -1:
            n = float(r.val)
        elif r.j == -1:
            sums[r.i] = float(r.val)
        else:
            gram[r.i][r.j] = gram[r.j][r.i] = float(r.val)
    assert n and n >= 2, "need at least 2 vectors"
    mean = sums / n / 1e6
    cov = gram / n / 1e12 - np.outer(mean, mean)
    w, v = np.linalg.eigh(cov)  # ascending
    order = np.argsort(w)[::-1][:rank]
    comps = v[:, order].T  # rank x dim
    # sign convention: make each component's largest-|x| entry positive
    for c in comps:
        j = int(np.argmax(np.abs(c)))
        if c[j] < 0:
            c *= -1
    return comps.tolist(), mean.tolist(), w[order].tolist()


def pca_project(
    emb: DataFrame,
    components: list[list[float]],
    mean: list[float],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Distributed projection: scores[r] = (x - mean) · comp_r, as pure
    Column arithmetic (components/mean are plan literals — broadcast by
    construction). Output: (id, scores array<double>)."""
    centered = F.zip_with(
        F.col(vec_col).cast("array<double>"),
        F.array(*[F.lit(float(x)) for x in mean]),
        lambda a, b: a - b,
    )
    scores = F.array(
        *[
            F.aggregate(
                F.zip_with(
                    centered,
                    F.array(*[F.lit(float(x)) for x in comp]),
                    lambda a, b: a * b,
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
            for comp in components
        ]
    )
    return emb.select(F.col(id_col), scores.alias("scores"))
