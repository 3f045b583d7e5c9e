"""Arrow-kernel twins of the sequential-fold vector expressions in
:mod:`..functions.vectors` — bit-exact by construction, pinned by tests.

The fold expressions (``F.aggregate`` / ``zip_with``) are the repo's
cross-engine exactness contract for cosine scores: a sequential left fold
over double-cast floats reproduces DuckDB's ``list_dot_product`` bit for
bit, so threshold decisions cannot diverge.  But Spark executes those
higher-order functions INTERPRETED (no whole-stage codegen), which made
them the dominant per-row constant of ``similarity_range_query``'s exact
verify (142 s executor time at 500k docs, SCALING.md round-7
decomposition).  This module re-expresses the same folds as vectorized
Arrow kernels with the margin-kernel discipline (functions/text.py
``_make_margin_udf``): every double add happens in the SAME IEEE order as
the expression form — a column sweep adds element ``j`` of every row on
iteration ``j`` — so results are bit-identical, not merely close.

Why a separate module instead of extending vectors.py: plan verified
status is fingerprinted over module+dependency text
(plans/provenance.py), and vectors.py is a dependency of already
driver-verified plans (multimodal_ops).  Adding kernels HERE lets the
range-query plan adopt them without re-queueing unrelated verified
entries for driver re-ratification.

IEEE bit-exactness argument, step by step (same as the margin kernel):
- float32 -> float64 cast is exact (every float32 is a float64);
- ``a64[j] * b64[j]`` is one IEEE double multiply — identical on JVM and
  numpy;
- the fold ``((0.0 + p0) + p1) + ...`` is replicated by initializing an
  accumulator to 0.0 and adding the j-th product column per iteration —
  same adds, same order;
- ``sqrt`` is correctly rounded in both (java.lang.Math.sqrt / np.sqrt);
- the final ``dot / (norm_a * norm_b)`` is one multiply and one divide,
  both exact IEEE ops.

Null semantics: the expression form yields NULL for a NULL array or
length-mismatched pair (zip_with pads with NULL); the kernels mirror
that.  NULL *elements* inside an array are out of contract (the
embeddings tables have none): the expression would yield NULL, the
kernel yields NaN.

NaN at the Arrow boundary (ADVICE r8, medium): the kernels COMPUTE NaN
for zero-norm / zero-dim rows — the IEEE 0/0 the DuckDB oracle also
computes (``list_dot_product`` twins divide through; DuckDB keeps NaN
and treats it as the largest double, so ``NaN >= tau`` retains the
row).  But Spark's pandas_udf serializer (pa.Array.from_pandas,
from-pandas semantics) masks float64 NaN to SQL NULL on the way back to
the JVM, so left alone a zero-norm row silently flips to NULL semantics
and filters drop it.  NOTE the expression twin is NOT the arbiter here:
Spark's non-ANSI ``Divide`` returns NULL on a zero divisor even for
doubles (verified: ``lit(0.0)/lit(0.0)`` is NULL, not NaN), so the
interpreted fold expressions ALSO dropped zero-norm rows — a
pre-existing, fixture-invisible divergence from the oracle that the
ADVICE finding surfaced.  The contract is IEEE/oracle semantics, and
the Column wrappers below RESTORE NaN JVM-side: a kernel NULL on a
well-formed input (non-null array / matching lengths — recomputed as
cheap codegen predicates) can only be a masked NaN, so ``coalesce(
kernel, when(well_formed, NaN))`` is exact — genuine input NULLs stay
NULL, masked NaNs come back.  Plans must call :func:`fold_cosine_col` /
:func:`cell_best_cos` rather than the raw udfs; the full-plan zero-norm
path (candidate AND query side) is session-tested in
tests/test_foldvec.py.

Partial-NaN impossibility (ADVICE r8, low): inside ``make_cell_best_udf``
a NaN cosine never updates the running best, which would diverge from
``array_max`` (NaN sorts largest) if only SOME centroids produced NaN.
For float32 inputs that cannot happen: |x_j| <= 3.4e38 so each product
<= 1.2e77 and a 64-term sum <= 7.5e78 — far below the 1.8e308 float64
overflow, so no inf and no inf/inf NaN.  The only NaN source is 0/0,
i.e. a zero-norm x, which makes EVERY centroid cosine NaN at once; the
all-NaN branch reproduces array_max's choice (largest cell index, NaN
cos) exactly.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    IntegerType,
    StructField,
    StructType,
)

__all__ = [
    "cell_best_cos",
    "fold_cosine_col",
    "make_fold_cosine_udf",
    "make_cell_best_udf",
    "make_lsh_sketch_udf",
    "make_ivf_lists_udf",
]

_NAN = float("nan")


def _seq_fold_matrix(p: np.ndarray) -> np.ndarray:
    """Sequential left fold along axis 1: ``((0.0 + p[:,0]) + p[:,1]) + ...``
    — one vectorized add per column, so the per-row add ORDER is exactly
    the expression fold's while the work is batch-vectorized."""
    acc = np.zeros(p.shape[0])
    for j in range(p.shape[1]):
        acc = acc + p[:, j]
    return acc


def make_fold_cosine_udf():
    """pandas_udf twin of ``cosine_col(as_double_vec(a), as_double_vec(b))``:
    ``fold(a*b) / (sqrt(fold(a*a)) * sqrt(fold(b*b)))`` with the identical
    IEEE add order (parity-pinned in tests/test_foldvec.py).  NULL for a
    NULL array or a length mismatch, like the zip_with form."""

    @pandas_udf(DoubleType())
    def fold_cosine(a: pd.Series, b: pd.Series) -> pd.Series:
        n = len(a)
        out = np.full(n, np.nan)
        bad = np.zeros(n, dtype=bool)
        la = np.empty(n, dtype=np.int64)
        lb = np.empty(n, dtype=np.int64)
        av = a.to_numpy()
        bv = b.to_numpy()
        for i in range(n):
            if av[i] is None or bv[i] is None:
                bad[i] = True
                la[i] = lb[i] = -1
            else:
                la[i] = len(av[i])
                lb[i] = len(bv[i])
        bad |= la != lb
        # group rows by dimension so each group folds as one matrix sweep
        for d in np.unique(la[~bad]):
            idx = np.nonzero(~bad & (la == d))[0]
            if d == 0:
                out[idx] = np.nan  # 0/(0*0) = NaN in both engines
                continue
            am = np.stack([np.asarray(av[i], dtype=np.float64) for i in idx])
            bm = np.stack([np.asarray(bv[i], dtype=np.float64) for i in idx])
            dot = _seq_fold_matrix(am * bm)
            na = np.sqrt(_seq_fold_matrix(am * am))
            nb = np.sqrt(_seq_fold_matrix(bm * bm))
            with np.errstate(divide="ignore", invalid="ignore"):
                out[idx] = dot / (na * nb)
        res = pd.Series(out)
        res[bad] = None
        return res

    return fold_cosine


def fold_cosine_col(a: Column | str, b: Column | str) -> Column:
    """Column form of the fold-cosine kernel (what plans call), with the
    Arrow NaN->NULL masking undone JVM-side: the kernel yields NULL for
    a null/length-mismatched input OR a masked NaN (zero-norm/zero-dim
    row); the two are separated by re-testing well-formedness as codegen
    predicates.  Bit-identical to the expression twin ``cosine_col(
    as_double_vec(a), as_double_vec(b))`` wherever the twin is defined;
    on zero-norm/zero-dim rows this column is NaN (IEEE 0/0 — what the
    DuckDB oracle computes) where the twin is NULL (Spark's non-ANSI
    divide-by-zero) — see the module docstring."""
    ca = F.col(a) if isinstance(a, str) else a
    cb = F.col(b) if isinstance(b, str) else b
    raw = make_fold_cosine_udf()(ca, cb)
    well_formed = ca.isNotNull() & cb.isNotNull() & (F.size(ca) == F.size(cb))
    return F.coalesce(raw, F.when(well_formed, F.lit(_NAN)))


def cell_best_cos(cb: Column) -> Column:
    """Restore the ``cos`` field of a :func:`make_cell_best_udf` output
    struct: the kernel emits (cell, NaN) for a zero-norm vector, Arrow
    masks the NaN to NULL, and a struct with a non-null ``cell`` but a
    NULL ``cos`` can ONLY be that masked NaN (ill-formed inputs null
    both fields).  Callers must treat the restored NaN as "angle
    unknown" and keep the row on the conservative side of any prune
    (similarity_range_query maps it to theta = pi)."""
    return F.coalesce(cb["cos"], F.when(cb["cell"].isNotNull(), F.lit(_NAN)))


def make_lsh_sketch_udf(planes: Sequence[Sequence[float]]):
    """pandas_udf twin of the sign-LSH sketch expression
    (operators/similarity.py::_sketch_col) PLUS the row's hoisted norm:
    per row x, ``bit_k = int(fold(x * p_k) > 0)`` for every hyperplane
    and ``nrm = sqrt(fold(x * x))`` — each fold a column sweep in the
    exact IEEE add order of the expression form (module docstring), so
    bits and norm are bit-identical to ``(dot_col(as_double_vec(x), p_k)
    > 0).cast("int")`` / ``norm_col(as_double_vec(x))``.

    Why a kernel and not the expression (r13, measured): 16 planes x 64
    dims as Column arithmetic is ~6k py4j calls per plan build (2.5 s of
    the old 3.3 s per bench pass was plan construction) and an
    interpreted zip_with+aggregate pair per plane per row at execution;
    one Arrow batch computes all 16 folds vectorized. Null mirror: a
    NULL array or a width other than the planes' yields NULL bits and a
    NULL norm — exactly the expression twin (zip_with length padding
    nulls the fold). NaN cannot reach a bit decision for float32 inputs
    (the partial-NaN impossibility note above), and numpy and Spark
    agree NaN > 0 is false regardless."""
    P = np.asarray([[float(x) for x in p] for p in planes], dtype=np.float64)
    n_planes, dim = P.shape

    @pandas_udf(
        StructType(
            [
                StructField("sk", ArrayType(IntegerType())),
                StructField("nrm", DoubleType()),
            ]
        )
    )
    def sketch(xs: pd.Series) -> pd.DataFrame:
        n = len(xs)
        xv = xs.to_numpy()
        ok = np.fromiter(
            (xv[i] is not None and len(xv[i]) == dim for i in range(n)),
            dtype=bool,
            count=n,
        )
        sk_out: list = [None] * n
        nrm_out = np.full(n, np.nan)
        idx = np.nonzero(ok)[0]
        if len(idx):
            xm = np.stack([np.asarray(xv[i], dtype=np.float64) for i in idx])
            bits = np.empty((len(idx), n_planes), dtype=np.int32)
            for k in range(n_planes):
                bits[:, k] = (_seq_fold_matrix(xm * P[k]) > 0).astype(np.int32)
            nrm_out[idx] = np.sqrt(_seq_fold_matrix(xm * xm))
            for j, i in enumerate(idx):
                sk_out[i] = bits[j].tolist()
        df = pd.DataFrame({"sk": sk_out, "nrm": nrm_out})
        df.loc[~ok, "nrm"] = None
        return df

    return sketch


def make_ivf_lists_udf(centroids: Sequence[Sequence[float]]):
    """pandas_udf twin of the IVF coarse-assignment expression
    (operators/similarity.py::ivf_topk's ``nearest_lists``) PLUS the
    row's hoisted norm: per row x, ``d2_i = fold((x - c_i) * (x - c_i))``
    against every centroid — the exact products and add order of the
    zip_with-subtract / dot_col twin — and the full centroid index list
    sorted by ``(d2, list_id)`` ascending, which is precisely
    ``array_sort`` over (d2, list_id) structs (a STABLE argsort on d2
    breaks ties to the smaller index). Callers slice the first
    ``n_probe`` / first 1 entries JVM-side. Norm as in
    :func:`make_lsh_sketch_udf`.

    Null mirror: the expression twin gives every centroid a NULL d2 for
    a NULL/width-mismatched row, and array_sort on all-equal keys falls
    through to list_id — i.e. the identity order — so the kernel emits
    ``[0..L-1]`` with a NULL norm for such rows (fixture-unreachable;
    pinned here so the swap is a pure substitution)."""
    C = np.asarray([[float(x) for x in c] for c in centroids], dtype=np.float64)
    n_lists, dim = C.shape

    @pandas_udf(
        StructType(
            [
                StructField("lists", ArrayType(IntegerType())),
                StructField("nrm", DoubleType()),
            ]
        )
    )
    def nearest(xs: pd.Series) -> pd.DataFrame:
        n = len(xs)
        xv = xs.to_numpy()
        ok = np.fromiter(
            (xv[i] is not None and len(xv[i]) == dim for i in range(n)),
            dtype=bool,
            count=n,
        )
        ident = list(range(n_lists))
        lists_out: list = [ident] * n
        nrm_out = np.full(n, np.nan)
        idx = np.nonzero(ok)[0]
        if len(idx):
            xm = np.stack([np.asarray(xv[i], dtype=np.float64) for i in idx])
            d2 = np.empty((len(idx), n_lists))
            for i in range(n_lists):
                diff = xm - C[i]
                d2[:, i] = _seq_fold_matrix(diff * diff)
            order = np.argsort(d2, axis=1, kind="stable")
            nrm_out[idx] = np.sqrt(_seq_fold_matrix(xm * xm))
            for j, i in enumerate(idx):
                lists_out[i] = order[j].tolist()
        df = pd.DataFrame({"lists": lists_out, "nrm": nrm_out})
        df.loc[~ok, "nrm"] = None
        return df

    return nearest


def make_cell_best_udf(unit_centroids: Sequence[Sequence[float]]):
    """pandas_udf twin of the range-query assignment expression: for each
    vector x, ``cos_i = fold(x * u_i) / sqrt(fold(x * x))`` against every
    unit centroid, returning struct(cell, cos) of the ``array_max`` best —
    ties on cos break to the LARGER cell index, exactly like array_max
    over (cos, cell) structs.  The cos field is bit-exact (pure fold
    arithmetic, no transcendentals); callers keep acos/clamp JVM-side so
    the downstream theta is computed by the same java.lang.Math as the
    expression form.

    Zero-norm vectors give cos = NaN against every centroid (and ONLY
    zero-norm vectors — see the partial-NaN impossibility note in the
    module docstring); the kernel assigns them the largest cell index
    (the array_max tie rule) and computes NaN for cos, but the Arrow
    return boundary masks that NaN to NULL — callers MUST read the cos
    field through :func:`cell_best_cos`, which restores the NaN, and
    then handle it conservatively (the cell choice is meaningless for a
    zero-norm vector; only never-pruning it is correct)."""
    u = np.asarray([[float(x) for x in c] for c in unit_centroids], dtype=np.float64)
    n_cells, dim = u.shape

    @pandas_udf(
        StructType(
            [
                StructField("cell", IntegerType()),
                StructField("cos", DoubleType()),
            ]
        )
    )
    def cell_best(xs: pd.Series) -> pd.DataFrame:
        n = len(xs)
        cells = np.zeros(n, dtype=np.int32)
        best = np.full(n, np.nan)
        xv = xs.to_numpy()
        ok = np.fromiter(
            (xv[i] is not None and len(xv[i]) == dim for i in range(n)),
            dtype=bool,
            count=n,
        )
        idx = np.nonzero(ok)[0]
        if len(idx):
            xm = np.stack([np.asarray(xv[i], dtype=np.float64) for i in idx])
            xn = np.sqrt(_seq_fold_matrix(xm * xm))
            bcos = np.full(len(idx), -np.inf)
            bcell = np.zeros(len(idx), dtype=np.int32)
            with np.errstate(divide="ignore", invalid="ignore"):
                for i in range(n_cells):
                    ci = _seq_fold_matrix(xm * u[i]) / xn
                    upd = ci >= bcos  # >= : later (larger) cell wins ties
                    bcos[upd] = ci[upd]
                    bcell[upd] = i
            # all-NaN rows never update: array_max picks the largest cell
            nanrow = np.isinf(bcos) & (bcos < 0)
            bcos[nanrow] = np.nan
            bcell[nanrow] = n_cells - 1
            best[idx] = bcos
            cells[idx] = bcell
        df = pd.DataFrame({"cell": cells, "cos": best})
        df.loc[~ok, "cell"] = None
        df.loc[~ok, "cos"] = None
        return df

    return cell_best
