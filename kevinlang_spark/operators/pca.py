"""Distributed PCA (top principal component) over an embedding column.

The 100 TB shape: the ONLY corpus-scale work is one pass computing the
d-dim mean and the d×d covariance numerator.  Covariance partials are
accumulated per Arrow batch with a numpy outer product inside
``mapInPandas`` — each batch emits d² partial-sum rows, so the shuffle
is (batches × d²) metadata rows with map-side combine, never N·d²
exploded rows (a pure-Catalyst double-posexplode would be a 4096×
row expansion for d=64 in the scan stage).  The d×d matrix is then
metadata — power iteration runs driver-side on ≤ a few KB, the same
FAISS-style split as the IVF coarse quantizer (similarity.py).

Determinism: fixed iteration count from a fixed start vector, and the
component sign is canonicalized (the largest-|loading| dim — ties to
the smallest index — is made positive), so the result is
engine-reproducible and the DuckDB oracle can replay the identical
unrolled iterations.
"""

from __future__ import annotations

import math
from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _cov_partials_schema() -> T.StructType:
    return T.StructType(
        [
            T.StructField("i", T.IntegerType(), False),
            T.StructField("j", T.IntegerType(), False),
            T.StructField("sxx", T.DoubleType(), False),
        ]
    )


def _cov_rows_one_pass(df: DataFrame, vec_col: str, dim: int) -> "list[list[float]]":
    """Covariance matrix collected in ONE corpus pass (r12 optimization
    round): the mapInPandas partials emit the per-dim sums and the row
    count alongside the outer-product partials (tagged ``i = -1`` rows),
    so the mean never needs :func:`covariance_matrix`'s second full scan
    of the vector column.  The d² + d + 1 combined rows shuffle with
    map-side combine exactly like before; the n/mu/cov assembly runs
    driver-side with the IDENTICAL IEEE op order the Catalyst expression
    used (``sxx/n − mu_i·mu_j`` with ``mu_k = s_k/n``).  Returns the d×d
    cov matrix, or ``None`` when no row carries a ``dim``-dim vector
    (callers keep their existing empty-input errors)."""
    import numpy as np

    clean = df.where(
        F.col(vec_col).isNotNull() & (F.size(vec_col) == dim)
    ).select(F.col(vec_col).cast("array<double>").alias("v"))

    def partials(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        acc = np.zeros((dim, dim), dtype=np.float64)
        s = np.zeros(dim, dtype=np.float64)
        n = 0
        for b in batches:
            if not len(b):
                continue
            x = np.stack(b["v"].to_numpy())  # (n, d) float64
            acc += x.T @ x
            s += x.sum(axis=0)
            n += len(x)
        if n:
            ii, jj = np.meshgrid(range(dim), range(dim), indexing="ij")
            yield pd.DataFrame(
                {
                    "i": np.concatenate(
                        [ii.ravel(), np.full(dim + 1, -1, dtype=np.int64)]
                    ),
                    "j": np.concatenate(
                        [jj.ravel(), np.arange(dim), [-1]]
                    ),
                    "sxx": np.concatenate([acc.ravel(), s, [float(n)]]),
                }
            )

    rows = (
        clean.mapInPandas(partials, schema=_cov_partials_schema())
        .groupBy("i", "j")
        .agg(F.sum("sxx").alias("sxx"))
        .collect()
    )
    if not rows:
        return None
    n = 0.0
    s = [0.0] * dim
    sxx = [[0.0] * dim for _ in range(dim)]
    for r in rows:
        if r["i"] == -1:
            if r["j"] == -1:
                n = r["sxx"]
            else:
                s[r["j"]] = r["sxx"]
        else:
            sxx[r["i"]][r["j"]] = r["sxx"]
    mu = [sk / n for sk in s]
    return [
        [sxx[i][j] / n - mu[i] * mu[j] for j in range(dim)] for i in range(dim)
    ]


def covariance_matrix(df: DataFrame, vec_col: str, dim: int) -> DataFrame:
    """Population covariance of a fixed-``dim`` vector column as a
    (i, j, cov) DataFrame — one corpus pass, (batches × d²) shuffle
    rows.  Rows with NULL or wrong-length vectors are dropped."""
    import numpy as np

    clean = df.where(
        F.col(vec_col).isNotNull() & (F.size(vec_col) == dim)
    ).select(F.col(vec_col).cast("array<double>").alias("v"))

    def partials(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        acc = np.zeros((dim, dim), dtype=np.float64)
        seen = False
        for b in batches:
            if not len(b):
                continue
            x = np.stack(b["v"].to_numpy())  # (n, d) float64
            acc += x.T @ x
            seen = True
        if seen:
            ii, jj = np.meshgrid(range(dim), range(dim), indexing="ij")
            yield pd.DataFrame(
                {"i": ii.ravel(), "j": jj.ravel(), "sxx": acc.ravel()}
            )

    sxx = clean.mapInPandas(partials, schema=_cov_partials_schema()).groupBy(
        "i", "j"
    ).agg(F.sum("sxx").alias("sxx"))

    n_mu = clean.select(
        F.count("*").alias("n"),
        *[F.sum(F.col("v")[k]).alias(f"s{k}") for k in range(dim)],
    )
    mu = n_mu.select(
        "n",
        F.array(*[F.col(f"s{k}") / F.col("n") for k in range(dim)]).alias("mu"),
    )
    return sxx.crossJoin(F.broadcast(mu)).select(
        "i",
        "j",
        (
            F.col("sxx") / F.col("n")
            - F.col("mu")[F.col("i")] * F.col("mu")[F.col("j")]
        ).alias("cov"),
    )


def pca_top_component(
    df: DataFrame,
    vec_col: str = "embedding",
    dim: int = 64,
    iterations: int = 12,
) -> DataFrame:
    """Top principal component by power iteration: distributed
    mean/covariance (see :func:`covariance_matrix`), then ``iterations``
    deterministic matvec+normalize steps on the collected d×d matrix
    (metadata-scale, like the IVF centroid step).  Start vector is the
    uniform unit vector; sign is canonicalized on the largest-|loading|
    dim (ties → smallest index).

    Returns ``dim`` rows (dim, loading, explained_var_ratio) where the
    ratio is the Rayleigh quotient over the covariance trace — the
    fraction of embedding variance the first component explains (the
    anisotropy diagnostic for embedding spaces)."""
    if iterations < 1:
        raise ValueError(f"iterations must be >= 1 (got {iterations})")
    # one-pass covariance (r12): sums + count ride the same partials,
    # deleting the second full scan the old covariance_matrix collect paid
    cov = _cov_rows_one_pass(df, vec_col, dim)
    if cov is None:
        raise ValueError(f"pca_top_component: no rows with {dim}-dim vectors")

    v = [1.0 / math.sqrt(dim)] * dim
    for _ in range(iterations):
        w = [sum(cov[i][j] * v[j] for j in range(dim)) for i in range(dim)]
        norm = math.sqrt(sum(x * x for x in w))
        if norm == 0.0:  # degenerate all-constant input: keep v
            break
        v = [x / norm for x in w]

    w = [sum(cov[i][j] * v[j] for j in range(dim)) for i in range(dim)]
    lam = sum(v[i] * w[i] for i in range(dim))
    trace = sum(cov[i][i] for i in range(dim))
    pivot = max(range(dim), key=lambda i: (abs(v[i]), -i))
    if v[pivot] < 0:
        v = [-x for x in v]
    ratio = lam / trace if trace else 0.0

    spark = df.sparkSession
    out = spark.createDataFrame(
        [(i, v[i], ratio) for i in range(dim)],
        "dim int, loading double, explained_var_ratio double",
    )
    return out.select(
        "dim",
        F.round("loading", 6).alias("loading"),
        F.round("explained_var_ratio", 6).alias("explained_var_ratio"),
    )


def pca_top_components(
    df: DataFrame,
    vec_col: str = "embedding",
    dim: int = 64,
    n_components: int = 2,
    iterations: int = 12,
) -> DataFrame:
    """Top-``n_components`` principal components by power iteration
    with Hotelling deflation: after extracting component v with
    eigenvalue λ, iterate on C′ = C − λ·vvᵀ for the next one — the
    textbook sequential-eigenpair method, exactly reproducible because
    every step is the same fixed-iteration recurrence as
    :func:`pca_top_component`.

    The distributed work is still the ONE covariance pass; deflation
    happens on the driver-side d×d matrix (metadata).  Returns
    n_components × dim rows (component, dim, loading,
    explained_var_ratio) — ratios are per-component λ_k over the
    ORIGINAL trace, so summing them reads cumulative explained
    variance.  Signs canonicalize per component (largest-|loading|
    dim positive, ties to smallest index)."""
    if n_components < 1 or n_components > dim:
        raise ValueError(
            f"n_components must be in [1, {dim}] (got {n_components})"
        )
    if iterations < 1:
        raise ValueError(f"iterations must be >= 1 (got {iterations})")
    # one-pass covariance (r12): see pca_top_component
    cov = _cov_rows_one_pass(df, vec_col, dim)
    if cov is None:
        raise ValueError(f"pca_top_components: no rows with {dim}-dim vectors")
    trace = sum(cov[i][i] for i in range(dim))

    out_rows = []
    for comp in range(n_components):
        v = [1.0 / math.sqrt(dim)] * dim
        for _ in range(iterations):
            w = [sum(cov[i][j] * v[j] for j in range(dim)) for i in range(dim)]
            norm = math.sqrt(sum(x * x for x in w))
            if norm == 0.0:
                break
            v = [x / norm for x in w]
        w = [sum(cov[i][j] * v[j] for j in range(dim)) for i in range(dim)]
        lam = sum(v[i] * w[i] for i in range(dim))
        # deflate BEFORE sign-flipping (vvᵀ is sign-invariant anyway)
        for i in range(dim):
            for j in range(dim):
                cov[i][j] -= lam * v[i] * v[j]
        pivot = max(range(dim), key=lambda i: (abs(v[i]), -i))
        sv = [-x for x in v] if v[pivot] < 0 else v
        ratio = lam / trace if trace else 0.0
        out_rows.extend(
            (comp, i, sv[i], ratio) for i in range(dim)
        )

    spark = df.sparkSession
    out = spark.createDataFrame(
        out_rows, "component int, dim int, loading double, explained_var_ratio double"
    )
    return out.select(
        "component",
        "dim",
        F.round("loading", 6).alias("loading"),
        F.round("explained_var_ratio", 6).alias("explained_var_ratio"),
    )
