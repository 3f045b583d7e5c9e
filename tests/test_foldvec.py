"""Bit-exactness parity for the fold-vector Arrow kernels
(functions/foldvec.py) against the expression semantics they replace.

Two layers, matching the repo's kernel discipline:

1. Spark-free hypothesis fuzz: each kernel's inner pandas function runs
   directly against a pure-Python reference implementing the expression
   fold literally (Python floats ARE IEEE doubles; a left-fold loop is
   the exact F.aggregate order).  struct.pack("d", ...) comparison — bit
   equality, not tolerance.
2. A Spark session test on the real sf0.001 embeddings: kernel column vs
   the functions/vectors.py expression column, bit-compared row by row,
   plus a plan assertion that similarity_range_query's result is
   unchanged by the kernelization (same rows as the pre-kernel
   brute-force semantics — the oracle IS brute force).
"""

from __future__ import annotations

import math
import struct

import numpy as np
import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from etl_from_s3_to_postgresql_template_spark.functions.foldvec import (
    make_cell_best_udf,
    make_fold_cosine_udf,
)

# finite float32 values spanning magnitudes (incl. zero and negatives)
_f32 = st.floats(
    min_value=-1e4,
    max_value=1e4,
    allow_nan=False,
    allow_infinity=False,
    width=32,
)


def _vec(dim):
    return st.lists(_f32, min_size=dim, max_size=dim).map(
        lambda xs: np.asarray(xs, dtype=np.float32)
    )


def _ref_dot(a, b) -> float:
    acc = 0.0  # F.aggregate(zip_with(a,b,*), 0.0, acc+x): sequential left fold
    for x, y in zip(a, b):
        acc = acc + float(x) * float(y)
    return acc


def _ref_cosine(a, b) -> float:
    num = np.float64(_ref_dot(a, b))
    den = np.float64(math.sqrt(_ref_dot(a, a))) * np.float64(math.sqrt(_ref_dot(b, b)))
    with np.errstate(divide="ignore", invalid="ignore"):
        return float(num / den)  # IEEE division (0/0 = NaN), like both engines


def _bits(x: float) -> bytes:
    return struct.pack("d", float(x))


@settings(max_examples=200, deadline=None)
@given(st.integers(1, 9), st.data())
def test_fold_cosine_kernel_bitwise(dim, data):
    n = data.draw(st.integers(1, 6))
    avs = [data.draw(_vec(dim)) for _ in range(n)]
    bvs = [data.draw(_vec(dim)) for _ in range(n)]
    got = make_fold_cosine_udf().func(pd.Series(avs), pd.Series(bvs))
    for i in range(n):
        ref = _ref_cosine(avs[i], bvs[i])
        g = got.iloc[i]
        if math.isnan(ref):
            assert math.isnan(g), (avs[i], bvs[i], g)
        else:
            assert _bits(g) == _bits(ref), (avs[i], bvs[i], g, ref)


def test_fold_cosine_kernel_null_and_mismatch():
    f = make_fold_cosine_udf().func
    a = pd.Series([None, np.asarray([1.0, 2.0], np.float32), np.asarray([1.0], np.float32)])
    b = pd.Series(
        [np.asarray([1.0], np.float32), np.asarray([1.0], np.float32), None]
    )
    got = f(a, b)
    assert got.isna().all()  # NULL array / length mismatch -> NULL, like zip_with


def test_fold_cosine_zero_vector_is_nan_both_sides():
    z = np.zeros(4, dtype=np.float32)
    v = np.asarray([1.0, 2.0, 3.0, 4.0], np.float32)
    got = make_fold_cosine_udf().func(pd.Series([z]), pd.Series([v]))
    assert math.isnan(got.iloc[0])  # 0.0/(0.0*norm) = NaN in IEEE on both engines


def _ref_cell_best(x, unit):
    """array_max over (cos, cell) structs: lexicographic max, so equal
    cos breaks to the LARGER cell index.  None for a zero-norm row (all
    cos NaN; array_max then picks the largest cell)."""
    xn = math.sqrt(_ref_dot(x, x))
    if xn == 0.0:
        return None
    best_i, best_c = 0, _ref_dot(x, unit[0]) / xn
    for i in range(1, len(unit)):
        c = _ref_dot(x, unit[i]) / xn
        if c >= best_c:
            best_i, best_c = i, c
    return best_i, best_c


@settings(max_examples=150, deadline=None)
@given(st.integers(2, 8), st.integers(2, 6), st.data())
def test_cell_best_kernel_bitwise(dim, n_cells, data):
    unit = [
        [float(v) for v in data.draw(_vec(dim))] for _ in range(n_cells)
    ]
    xs = [data.draw(_vec(dim)) for _ in range(data.draw(st.integers(1, 5)))]
    got = make_cell_best_udf(unit).func(pd.Series(xs))
    for i, x in enumerate(xs):
        ref = _ref_cell_best(x, unit)
        if ref is None:
            # zero-norm row: all cos NaN; array_max picks the largest cell
            assert int(got["cell"].iloc[i]) == n_cells - 1
            assert math.isnan(got["cos"].iloc[i])
        else:
            assert int(got["cell"].iloc[i]) == ref[0], (x, unit)
            assert _bits(got["cos"].iloc[i]) == _bits(ref[1]), (x, unit)


def test_fold_cosine_matches_expression_on_real_embeddings(spark):
    """JVM cross-check on real data: kernel column vs the interpreted
    fold expression (functions/vectors.py), bit-for-bit over every pair
    of consecutive sf0.001 embeddings."""
    from pyspark.sql import functions as F

    from etl_from_s3_to_postgresql_template_spark.functions.foldvec import (
        fold_cosine_col,
    )
    from etl_from_s3_to_postgresql_template_spark.functions.vectors import (
        as_double_vec,
        cosine_col,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    a = emb.alias("a")
    b = emb.withColumn("vec_id", F.col("vec_id") - 1).alias("b")
    pairs = a.join(b, "vec_id").select(
        F.col("a.embedding").alias("qv"), F.col("b.embedding").alias("nv")
    )
    rows = pairs.select(
        fold_cosine_col("qv", "nv").alias("k"),
        cosine_col(as_double_vec(F.col("qv")), as_double_vec(F.col("nv"))).alias("e"),
    ).collect()
    assert len(rows) > 100
    for r in rows:
        assert _bits(r["k"]) == _bits(r["e"])


def test_fold_cosine_nan_restored_through_arrow_boundary(spark):
    """ADVICE r8 (medium): the kernel computes NaN for zero-norm rows but
    Spark's Arrow serializer masks float NaN to SQL NULL — fold_cosine_col
    must restore it JVM-side so filters see NaN (kept: NaN >= tau, the
    DuckDB oracle's IEEE semantics), while genuine input NULLs stay NULL.
    This runs through a REAL session (the boundary the pure-Python fuzz
    layer cannot exercise).  NB the expression twin is NOT the arbiter on
    zero-norm rows: Spark's non-ANSI divide yields NULL (not NaN) on a
    zero divisor, so the twin diverges from the oracle there — asserted
    below so the divergence stays documented."""
    from pyspark.sql import functions as F

    from etl_from_s3_to_postgresql_template_spark.functions.foldvec import (
        fold_cosine_col,
    )
    from etl_from_s3_to_postgresql_template_spark.functions.vectors import (
        as_double_vec,
        cosine_col,
    )

    rows = [
        ([0.0, 0.0, 0.0], [1.0, 2.0, 3.0]),   # zero-norm -> kernel NaN
        ([1.0, 2.0, 3.0], [1.0, 2.0, 3.0]),   # ordinary -> finite
        (None, [1.0, 2.0, 3.0]),              # NULL array -> NULL
        ([1.0, 2.0], [1.0, 2.0, 3.0]),        # length mismatch -> NULL
        ([], []),                             # zero-dim -> 0/0 = kernel NaN
    ]
    df = spark.createDataFrame(rows, "a array<float>, b array<float>")
    got = df.select(
        fold_cosine_col("a", "b").alias("k"),
        cosine_col(as_double_vec(F.col("a")), as_double_vec(F.col("b"))).alias("e"),
        F.col("k").isNull().alias("k_null"),
        F.isnan(F.coalesce(F.col("k"), F.lit(0.0))).alias("k_nan"),
    ).collect()
    # kernel: NULL only for ill-formed input; NaN restored through Arrow
    assert [r["k_null"] for r in got] == [False, False, True, True, False]
    assert [r["k_nan"] for r in got] == [True, False, False, False, True]
    # bit-parity with the expression twin wherever the twin is defined
    for r in got:
        if r["e"] is not None:
            assert _bits(r["k"]) == _bits(r["e"]), r
    # the documented twin divergence: Spark divide-by-zero -> NULL on the
    # zero-norm and zero-dim rows (the kernel's NaN is the oracle's value)
    assert got[0]["e"] is None and got[4]["e"] is None
    assert got[1]["e"] is not None


def test_range_query_zero_norm_vector_full_plan(spark, tmp_path):
    """A planted zero-norm embedding through the FULL similarity_range_query
    plan: under the NaN contract (Spark and DuckDB both treat NaN as the
    largest double, so NaN >= tau keeps the row) the zero vector must
    appear as a match with NaN cosine for every query — the pre-fix kernel
    path silently dropped it (NaN masked to NULL at the Arrow boundary)."""
    import numpy as np
    from pyspark.sql import functions as F

    from etl_from_s3_to_postgresql_template_spark.plans import QUERIES

    rng = np.random.default_rng(23)
    base = rng.standard_normal(64)
    vecs = [base + rng.standard_normal(64) * 0.05 for _ in range(30)]
    vecs.append(np.zeros(64))  # vec_id 30: the planted zero-norm candidate
    sf = str(tmp_path)
    spark.createDataFrame(
        [(i, [float(x) for x in v], i % 3) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<float>, label int",
    ).write.parquet(f"{sf}/embeddings.parquet")

    out = QUERIES["similarity_range_query"](spark, sf)
    rows = out.withColumn("is_nan", F.isnan("cosine")).collect()
    nan_pairs = {(r["q_id"], r["n_id"]) for r in rows if r["is_nan"]}
    # every query (vec_id < 16) matches the zero vector, cosine NaN
    assert nan_pairs == {(q, 30) for q in range(16)}
    # and the finite part still equals brute force over the real vectors
    x = np.stack([np.asarray(v, dtype=np.float32).astype(np.float64) for v in vecs[:30]])
    xn = x / np.linalg.norm(x, axis=1, keepdims=True)
    sims = xn @ xn.T
    brute = {
        (q, n)
        for q in range(16)
        for n in range(30)
        if q != n and sims[q, n] >= 0.3
    }
    finite_pairs = {(r["q_id"], r["n_id"]) for r in rows if not r["is_nan"]}
    assert finite_pairs == brute and len(brute) > 0
