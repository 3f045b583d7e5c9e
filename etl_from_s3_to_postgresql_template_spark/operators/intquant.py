"""Vectorized int8 quantization, coarse-quantizer assignment, PQ encode,
and BIGINT pair dots — the Arrow/numpy hot path behind every
integer-exact embedding operator.

Why this exists (measured, round 4): the expression-tree form of these
kernels (``F.transform`` / ``F.zip_with`` / ``F.aggregate``) is correct
and reads like the oracle SQL, but Catalyst higher-order functions have
NO whole-stage codegen — every element operation is an interpreted
``eval`` with boxed arithmetic (jstack shows ``ZipWith.eval`` /
``ArrayAggregate.eval`` frames at 100% CPU). At fixture scale (500-5000
vectors) that is invisible; at 200k x 64-dim x 16 centroids the
quantize+assign stage alone became the bottleneck of the 100x docs
sweep. The same arithmetic as numpy matmuls over Arrow batches is
100x+ faster and BIT-IDENTICAL:

- integer ops (dots, norms, centroid distances) are exact in int64 —
  no representation question at all;
- the one float step (127/max_abs scaling) applies the same IEEE-754
  double operations in the same order as the Column expression did
  (divide once per row, multiply per element, add 0.5, floor), and
  IEEE doubles have no execution-order freedom for a fixed op sequence;
- ties in centroid argmin / list ordering break by lowest index via
  ``np.argsort(kind="stable")`` — the same (d2, lid) lexicographic
  order as ``array_sort`` over structs and DuckDB ``list_sort``.

Every consumer query's DuckDB oracle is unchanged and still hash-exact
(the oracle replicates the math, not the implementation) — that is the
regression proof for the equivalence claims above.

Scale contract: quantize/assign/encode are one pass, O(n * dim * k)
integer work with NO shuffle (mapInPandas over the scan); callers pick
``centroids`` — the static seeded artifact for oracle-checked entries,
``fit_ivf_centroids`` output with k ~ n/target_cell for production, so
within-cell pair work stays O(n * cell), never O(n^2).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import LongType

__all__ = [
    "int8_centroids",
    "quantize_int8",
    "pq_encode",
    "dot_long",
    "make_adc_udf",
    "cell_pair_max_cos",
    "cogroup_pair_scores",
]


def make_adc_udf(codebooks: list[list[list[int]]]):
    """ADC (asymmetric distance computation) scorer: given the query's
    int8 vector and a corpus row's PQ codes, returns
    ``sum_m <q_m, C_m[codes_m]>`` — exact BIGINT, vectorized as M gathers
    per Arrow batch. The corpus side of the scoring join carries ONLY the
    codes (M bytes per vector); codewords come from the closed-over
    codebook constant."""
    CB = np.asarray(codebooks, dtype=np.int64)  # (M, K, dsub)
    M, _, dsub = CB.shape

    @pandas_udf(LongType())
    def adc(qq: pd.Series, codes: pd.Series) -> pd.Series:
        Q = np.vstack(qq.to_numpy()).astype(np.int64, copy=False)
        Cd = np.vstack(codes.to_numpy())
        total = np.zeros(len(Q), dtype=np.int64)
        for m in range(M):
            sub = Q[:, m * dsub : (m + 1) * dsub]
            cw = CB[m][Cd[:, m]]  # (n, dsub) codeword gather
            total += np.einsum("ij,ij->i", sub, cw)
        return pd.Series(total)

    return adc


def int8_centroids(n_lists: int = 16, dim: int = 64, seed: int = 7) -> list[list[int]]:
    """Seeded INTEGER centroids in the int8 range (generalized from the
    leakage scan's quantizer): BIGINT distance arithmetic, so any SQL
    oracle can replicate assignment bit-for-bit. Production swaps in
    fitted centroids (operators/similarity.py::fit_ivf_centroids, rounded
    to ints) with k ~ n/target_cell; assignment cost and join shape are
    unchanged."""
    rng = np.random.default_rng(seed)
    return [[int(x) for x in row] for row in rng.integers(-127, 128, size=(n_lists, dim))]


# DataType instance, not a DDL string: string return types parse via the
# active SparkContext, which would make importing this module require a
# live session.
@pandas_udf(LongType())
def dot_long(a: pd.Series, b: pd.Series) -> pd.Series:
    """Exact BIGINT dot product of two array<long> columns, vectorized
    (einsum over the Arrow batch). Replaces the interpreted
    zip_with+aggregate fold on pair-scoring hot paths; integer arithmetic
    means the replacement is exact by construction."""
    A = np.vstack(a.to_numpy()).astype(np.int64, copy=False)
    B = np.vstack(b.to_numpy()).astype(np.int64, copy=False)
    return pd.Series(np.einsum("ij,ij->i", A, B))


def quantize_int8(
    df: DataFrame,
    centroids: list[list[int]] | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_keep: int = 8,
) -> DataFrame:
    """Symmetric int8 quantization of a float vector column, one
    mapInPandas pass: emits ``(id, max_abs double, q array<long>,
    nrm long[, lids array<int>])``.

    ``q[i] = floor(v[i] * (127/max_abs) + 0.5)`` — the identical IEEE
    double sequence as the Column-expression form (and the oracles'
    ``list_transform``). Rows with ``max_abs <= 0`` are dropped (both
    engines).

    Malformed-input caveat (where the expression-form equivalence ends):
    the numpy ``max_abs > 0`` mask also drops rows whose vector contains
    NaN (numpy: ``NaN > 0`` is False), while the Column form would KEEP
    them (Spark's NaN ordering treats NaN as greater than any number) and
    emit NaN-poisoned codes downstream — dropping is the safer behavior,
    but it is a divergence; and ``np.vstack`` raises on ragged batches
    (vectors of unequal length) that the per-row expression form would
    have tolerated. The equivalence claim therefore holds for well-formed
    input: finite values, uniform dimensionality — which both the fixture
    embeddings and any sane production embedding table satisfy; validate
    upstream if the source can produce either defect. With ``centroids``,
    ``lids`` is the nearest-``n_keep``
    centroid index list sorted by (squared distance, index) — ``lids[0]``
    is the assignment, a prefix is the n-probe set; integer-valued d2 via
    ``|q|^2 - 2 q.C^T + |C|^2`` as one matmul. ``n_keep`` bounds the
    emitted list (and the Arrow transfer) at any k — the kept prefix is
    identical to the full stable sort's (see the composite-key comment
    below)."""
    C = np.asarray(centroids, dtype=np.int64) if centroids is not None else None
    cc = (C * C).sum(axis=1) if C is not None else None
    kk = len(C) if C is not None else 0
    n_keep = min(n_keep, kk) if kk else 0
    out_schema = f"{id_col} long, max_abs double, q array<long>, nrm long" + (
        ", lids array<int>" if C is not None else ""
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if not len(pdf):
                continue
            E = np.vstack(
                [np.asarray(e, dtype=np.float64) for e in pdf[vec_col].to_numpy()]
            )
            max_abs = np.abs(E).max(axis=1)
            mask = max_abs > 0
            if not mask.any():
                continue
            E, max_abs = E[mask], max_abs[mask]
            scale = 127.0 / max_abs  # one divide per row, as in the expression form
            Q = np.floor(E * scale[:, None] + 0.5).astype(np.int64)
            nrm = np.einsum("ij,ij->i", Q, Q)
            cols = {
                id_col: pdf[id_col].to_numpy()[mask],
                "max_abs": max_abs,
                "q": list(Q),
                "nrm": nrm,
            }
            if C is not None:
                # centroids truncate to the data dimensionality: the static
                # artifact is 64-dim, but planted unit fixtures use shorter
                # vectors — a prefix of a seeded random centroid is itself a
                # seeded random centroid, and assignment stays deterministic
                Ct, cct = (
                    (C, cc)
                    if C.shape[1] == Q.shape[1]
                    else (C[:, : Q.shape[1]], (C[:, : Q.shape[1]] ** 2).sum(axis=1))
                )
                # the matmul runs in float64 deliberately: numpy int64
                # matmul has no BLAS path (measured ~60x slower at k=2048),
                # and every value here is an integer < 2^22 — far inside
                # float64's 2^53 exact range, so the products, sums, and
                # the (d2, lid) order are bit-identical to int arithmetic
                d2 = (
                    nrm[:, None].astype(np.float64)
                    - 2.0 * (Q.astype(np.float64) @ Ct.T.astype(np.float64))
                    + cct[None, :].astype(np.float64)
                )
                # composite key d2*k + lid: unique integer per (row, lid),
                # exact in float64 (< 2^36 at k=4096), ordered exactly as
                # (d2, lid). Successive argmin+mask extracts the n_keep
                # smallest in order — n_keep fast O(n*k) scans; the obvious
                # np.argpartition(axis=1) is ~15x slower here (row-wise
                # introselect over wide arrays, measured 57s vs <4s at
                # 200k x 2048).
                comp = d2 * np.float64(kk) + np.arange(kk, dtype=np.float64)[None, :]
                n_rows = comp.shape[0]
                lids = np.empty((n_rows, n_keep), dtype=np.int32)
                rows = np.arange(n_rows)
                for j in range(n_keep):
                    m = comp.argmin(axis=1)
                    lids[:, j] = m
                    if j + 1 < n_keep:
                        comp[rows, m] = np.inf
                cols["lids"] = list(lids)
            yield pd.DataFrame(cols)

    return df.select(id_col, vec_col).mapInPandas(batches, out_schema)


def pq_encode(
    quantized: DataFrame,
    codebooks: list[list[list[int]]],
    id_col: str = "vec_id",
) -> DataFrame:
    """Product-quantization encode over the int8 ``q`` column: per
    subspace m, ``codes[m] = argmin_k |q_m - C_m[k]|^2`` (ties -> lowest
    k), plus ``recon`` — the concatenated selected codewords, so callers
    score ADC as one plain dot: ``<q_query, recon> = sum_m <q_m, C_m[c_m]>``.
    One mapInPandas pass, M matmuls per batch."""
    CB = np.asarray(codebooks, dtype=np.int64)  # (M, K, dsub)
    M, K, dsub = CB.shape
    ccs = (CB * CB).sum(axis=2)  # (M, K)

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if not len(pdf):
                continue
            Q = np.vstack(pdf["q"].to_numpy()).astype(np.int64, copy=False)
            n = len(Q)
            codes = np.empty((n, M), dtype=np.int32)
            recon = np.empty((n, M * dsub), dtype=np.int64)
            for m in range(M):
                sub = Q[:, m * dsub : (m + 1) * dsub].astype(np.float64)
                # cc - 2<sub,c> preserves the argmin (|sub|^2 constant per
                # row); float64 matmul for the BLAS path — integer values
                # < 2^21, exact (see quantize_int8)
                d2 = ccs[m][None, :].astype(np.float64) - 2.0 * (sub @ CB[m].T.astype(np.float64))
                k = d2.argmin(axis=1)  # first minimum = lowest k on ties
                codes[:, m] = k
                recon[:, m * dsub : (m + 1) * dsub] = CB[m][k]
            yield pd.DataFrame(
                {id_col: pdf[id_col].to_numpy(), "codes": list(codes), "recon": list(recon)}
            )

    return quantized.select(id_col, "q").mapInPandas(
        batches, f"{id_col} long, codes array<int>, recon array<long>"
    )


def cell_pair_max_cos(
    cells: DataFrame,
    cell_col: str = "cluster_id",
    id_col: str = "vec_id",
    q_col: str = "q",
    nrm_col: str = "nrm",
    block_rows: int = 2048,
) -> DataFrame:
    """Per-cell "max cosine against any LOWER-id cell-mate", one grouped
    Arrow pass — the SemDeDup pair term without materializing pairs.

    The join form (lo x hi on the cell key, dot per pair, groupBy max)
    is correct but ships BOTH int8 vectors through the shuffle once per
    CANDIDATE PAIR: at the scale contract (cell ~ target size c, n/c
    cells) that is ~n*c/2 pair rows x ~1 kB — measured 798 s executor
    time at 200k vectors, k=1600 (SCALING.md round 5). Here each vector
    crosses the wire ONCE (shuffle on the cell key), and the pair term
    runs as a blocked float64 gemm inside the group: O(c^2) arithmetic —
    same as the join's pair count — at memory O(c * block_rows).

    Bit-identical to the join form: the gemm sums 64 products of ints
    <= 127^2, partial sums < 2^21 — exact in float64 in any order; the
    denominator multiplies the two BIGINT norms in float64 first
    (products < 2^41, exact) and takes ONE sqrt, the identical IEEE op
    sequence as ``sqrt((lo_nrm * hi_nrm) cast double)``; max over the
    same value set is the same value. (Oracles unchanged and re-green is
    the regression proof, as with every kernel in this module.)

    applyInPandas loads one whole cell per task invocation — cell size
    is bounded by the caller's cap-and-report contract (max_cell_size),
    exactly the bound the pair join needed anyway to avoid the c^2
    blow-up. Rows only for vectors that HAVE a lower-id mate; callers
    left-join and coalesce, as with the join form."""

    def one_cell(pdf: pd.DataFrame) -> pd.DataFrame:
        n = len(pdf)
        if n < 2:
            return pd.DataFrame(
                {id_col: pd.Series([], dtype="int64"), "max_cos": pd.Series([], dtype="float64")}
            )
        pdf = pdf.sort_values(id_col, ignore_index=True)
        Q = np.vstack(pdf[q_col].to_numpy()).astype(np.float64)
        nrm = pdf[nrm_col].to_numpy().astype(np.float64)
        ids = pdf[id_col].to_numpy()
        best = np.full(n, -np.inf)
        for s in range(1, n, block_rows):
            e = min(s + block_rows, n)
            dots = Q[s:e] @ Q[:e].T  # (e-s, e): exact integer values
            denom = np.sqrt(nrm[s:e, None] * nrm[None, :e])
            cos = dots / denom
            # keep only strictly-lower ids: column j vs global row s+r
            cos[np.arange(e)[None, :] >= np.arange(s, e)[:, None]] = -np.inf
            best[s:e] = cos.max(axis=1)
        has_mate = best > -np.inf
        return pd.DataFrame({id_col: ids[has_mate], "max_cos": best[has_mate]})

    return cells.select(cell_col, id_col, q_col, nrm_col).groupBy(cell_col).applyInPandas(
        one_cell, f"{id_col} long, max_cos double"
    )


def cogroup_pair_scores(
    left: DataFrame,
    right: DataFrame,
    key_col: str,
    left_id: str,
    right_id: str,
    min_cos: float,
    q_cols: tuple[str, str] = ("qh", "qt"),
    nrm_cols: tuple[str, str] = ("nh", "nt"),
    block_rows: int = 2048,
) -> DataFrame:
    """Blocked cross-scoring of two frames cogrouped on a blocking key
    (IVF list, LSH bucket): emits ``(left_id, right_id, int_dot, cos)``
    for every within-key pair with ``cos >= min_cos`` — the candidate
    join + rescore without shipping vectors once per pair. Same
    exactness argument as cell_pair_max_cos: int dots exact in the
    float64 gemm, one sqrt over the float64 norm product, unrounded
    threshold compare on both engines."""

    ql, qr = q_cols
    nl, nr = nrm_cols

    def one_key(lpdf: pd.DataFrame, rpdf: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(
            {
                left_id: pd.Series([], dtype="int64"),
                right_id: pd.Series([], dtype="int64"),
                "int_dot": pd.Series([], dtype="int64"),
                "cos": pd.Series([], dtype="float64"),
            }
        )
        if not len(lpdf) or not len(rpdf):
            return empty
        QL = np.vstack(lpdf[ql].to_numpy()).astype(np.float64)
        QR = np.vstack(rpdf[qr].to_numpy()).astype(np.float64)
        NL = lpdf[nl].to_numpy().astype(np.float64)
        NR = rpdf[nr].to_numpy().astype(np.float64)
        lids_, rids_ = lpdf[left_id].to_numpy(), rpdf[right_id].to_numpy()
        frames = []
        for s in range(0, len(QL), block_rows):
            e = min(s + block_rows, len(QL))
            dots = QL[s:e] @ QR.T
            cos = dots / np.sqrt(NL[s:e, None] * NR[None, :])
            li, ri = np.nonzero(cos >= min_cos)
            if len(li):
                frames.append(
                    pd.DataFrame(
                        {
                            left_id: lids_[s + li],
                            right_id: rids_[ri],
                            "int_dot": dots[li, ri].astype(np.int64),
                            "cos": cos[li, ri],
                        }
                    )
                )
        return pd.concat(frames, ignore_index=True) if frames else empty

    return left.groupBy(key_col).cogroup(right.groupBy(key_col)).applyInPandas(
        one_key, f"{left_id} long, {right_id} long, int_dot long, cos double"
    )
