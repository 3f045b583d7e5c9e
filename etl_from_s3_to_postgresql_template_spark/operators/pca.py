"""Distributed PCA over an ``array<float>`` embedding column.

North-star extension E2/E1 support: PCA whitening / dimensionality
reduction is the standard preprocessing step in front of ANN indexes and
semantic dedup (OPQ/PCA rotation before PQ — Ge et al. 2013; SemDeDup
uses L2-normalized reduced vectors). The fit follows the engine's
fitted-artifact split (operators/similarity.py::fit_ivf_centroids is the
precedent): ONE bounded distributed pass produces the tiny sufficient
statistic (n, sum, Gram — d and d^2 floats per partition), the
eigendecomposition happens driver-side on the d x d covariance (numpy,
O(d^3) on 64-dim is microseconds), and projection is a pure broadcast
linear map — no shuffle anywhere, corpus never leaves its partitions.

At 100 TB: the mapInPandas pass emits ONE (n, sum, gram) row per Arrow
batch (~bounded by d^2 * 8 bytes ~ 32 KB at d=64), so the driver combine
sees #batches rows, not #vectors — the same cost model as a treeAggregate.
Determinism: partial sums are float64 and the combine order follows the
collected row order, so fit results are deterministic for a fixed layout;
cross-engine bit-parity is NOT claimed for the fit (eigh has no SQL twin)
— the oracle-paired covariance entry (plans/llm_ops7.py) pins the shared
sufficient statistic exactly, and tests pin fit-vs-numpy equality.
"""

from __future__ import annotations

from collections.abc import Iterator
from dataclasses import dataclass

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "PcaModel",
    "gram_moments",
    "gram_moments_int",
    "fit_pca",
    "project_pca",
]


@dataclass
class PcaModel:
    """Fitted artifact: persist/broadcast these plain lists, never refit
    per query (the fit_ivf_centroids contract)."""

    mean: list[float]
    components: list[list[float]]  # q rows of d loadings, orthonormal
    explained_variance: list[float]  # descending eigenvalues

    @property
    def dim(self) -> int:
        return len(self.mean)

    @property
    def q(self) -> int:
        return len(self.components)


def gram_moments(df: DataFrame, vec_col: str = "embedding") -> DataFrame:
    """One distributed pass -> per-batch sufficient statistics
    ``(n, s, g)`` with ``s = sum(x)`` (d floats) and ``g = sum(x x^T)``
    flattened row-major (d^2 floats). Arrow-batched numpy; zero shuffle."""

    def partials(it: Iterator) -> Iterator:
        import pandas as pd

        for pdf in it:
            vecs = pdf[vec_col].to_numpy()
            if len(vecs) == 0:
                continue
            x = np.stack([np.asarray(v, dtype=np.float64) for v in vecs])
            yield pd.DataFrame(
                {
                    "n": [np.int64(x.shape[0])],
                    "s": [x.sum(axis=0).tolist()],
                    "g": [(x.T @ x).ravel().tolist()],
                }
            )

    return df.select(vec_col).mapInPandas(
        partials, schema="n long, s array<double>, g array<double>"
    )


def gram_moments_int(
    df: DataFrame, vec_col: str = "embedding", unit: int = 1_000_000_000
) -> DataFrame:
    """Integer-exact variant of :func:`gram_moments` for cross-engine
    hash parity: every element contribution is quantized to integer units
    BEFORE summation — ``floor(v_i * v_j * unit + 0.5)`` for the Gram
    terms and ``floor(v_i * unit + 0.5)`` for the first moments — and the
    per-batch partials are int64 sums of those integers. Integer addition
    is associative and commutative, so the global combine is
    order-independent and any engine applying the identical per-element
    formula (one IEEE-754 multiply, one multiply by ``unit``, one add of
    0.5, one floor — all deterministic) reproduces the sums bit-exactly.
    This is what lets the zero-shuffle production kernel be oracle-paired
    against a DuckDB HUGEINT query instead of being rows-only.

    Same cost model as :func:`gram_moments`: one mapInPandas pass, one
    ``(n, s[d], p[d*d])`` row per Arrow batch, zero shuffle. Row chunks
    are sized so the d x d x chunk float64 temporary stays ~32 MB."""
    u = float(unit)

    def partials(it: Iterator) -> Iterator:
        import pandas as pd

        for pdf in it:
            vecs = pdf[vec_col].to_numpy()
            if len(vecs) == 0:
                continue
            x = np.stack([np.asarray(v, dtype=np.float64) for v in vecs])
            m, d = x.shape
            p = np.zeros((d, d), dtype=np.int64)
            s = np.zeros(d, dtype=np.int64)
            step = max(1, (1 << 22) // (d * d))
            for lo in range(0, m, step):
                ch = x[lo : lo + step]
                prod = ch[:, :, None] * ch[:, None, :]
                p += np.floor(prod * u + 0.5).astype(np.int64).sum(axis=0)
                s += np.floor(ch * u + 0.5).astype(np.int64).sum(axis=0)
            yield pd.DataFrame(
                {"n": [int(m)], "s": [s.tolist()], "p": [p.ravel().tolist()]}
            )

    return df.select(vec_col).mapInPandas(
        partials, schema="n long, s array<long>, p array<long>"
    )


def fit_pca(df: DataFrame, vec_col: str = "embedding", q: int = 8) -> PcaModel:
    """Combine the batch partials driver-side, eigendecompose the sample
    covariance (ddof=1), return the top-``q`` components.

    Sign convention (so the fit is unique despite eigh's sign freedom):
    each component is flipped so its largest-|loading| entry is positive,
    ties broken by the lowest index."""
    rows = gram_moments(df, vec_col).collect()
    if not rows:
        raise ValueError("fit_pca: empty input")
    d = len(rows[0]["s"])
    n = 0
    s = np.zeros(d)
    g = np.zeros((d, d))
    for r in rows:
        n += r["n"]
        s += np.asarray(r["s"])
        g += np.asarray(r["g"]).reshape(d, d)
    if n < 2:
        raise ValueError("fit_pca: need >= 2 vectors")
    mu = s / n
    cov = (g - np.outer(s, s) / n) / (n - 1)
    evals, evecs = np.linalg.eigh(cov)  # ascending
    order = np.argsort(evals)[::-1][:q]
    comps = evecs[:, order].T.copy()
    for r in range(comps.shape[0]):
        j = int(np.argmax(np.abs(comps[r])))
        if comps[r, j] < 0:
            comps[r] = -comps[r]
    return PcaModel(
        mean=mu.tolist(),
        components=comps.tolist(),
        explained_variance=[float(evals[i]) for i in order],
    )


def project_pca(
    df: DataFrame,
    model: PcaModel,
    vec_col: str = "embedding",
    out_col: str = "pc",
) -> DataFrame:
    """Project ``vec_col`` onto the fitted components: ``(x - mu) @ C^T``.

    Pure broadcast linear map as JVM Column expressions (q sequential-fold
    dot products per row; d*q multiply-adds inside whole-stage codegen) —
    deterministic, no Python in the hot path, no shuffle."""
    from etl_from_s3_to_postgresql_template_spark.functions.vectors import (
        as_double_vec,
        dot_col,
    )

    v = as_double_vec(F.col(vec_col))
    mu = F.array(*[F.lit(float(m)) for m in model.mean])
    centered = F.zip_with(v, mu, lambda x, m: x - m)
    projs = [
        dot_col(centered, F.array(*[F.lit(float(c)) for c in comp]))
        for comp in model.components
    ]
    return df.withColumn(out_col, F.array(*projs))
