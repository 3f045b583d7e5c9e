"""Property-based checks (SURVEY §5.2-4): engine semantics == pandas ground
truth under randomized inputs. Small example counts — each example spins
Spark jobs."""

from __future__ import annotations

import pandas as pd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from etl_from_s3_to_postgresql_template_spark.operators.cleanse import union_by_name

_spark = None


def _get_spark():
    global _spark
    if _spark is None:
        from etl_from_s3_to_postgresql_template_spark.session import get_spark

        _spark = get_spark("pytest", master="local[4]", shuffle_partitions=4)
    return _spark


cols = st.lists(st.sampled_from(["a", "b", "c", "d"]), min_size=1, max_size=4, unique=True)


@st.composite
def frame(draw):
    cs = draw(cols)
    n = draw(st.integers(1, 5))
    data = {
        c: draw(st.lists(st.integers(-5, 5), min_size=n, max_size=n)) for c in cs
    }
    return pd.DataFrame(data)


@given(frames=st.lists(frame(), min_size=1, max_size=3))
@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
def test_union_by_name_matches_pandas_concat(frames):
    spark = _get_spark()
    expected = pd.concat(frames, ignore_index=True, sort=False)
    got = union_by_name([spark.createDataFrame(f) for f in frames]).toPandas()
    assert list(got.columns) == list(expected.columns)
    assert len(got) == len(expected)
    # compare as multisets of rows (Spark row order is partition-dependent)
    key = lambda df: sorted(
        tuple(-999 if pd.isna(v) else int(v) for v in row) for row in df.itertuples(index=False)
    )
    assert key(got) == key(expected)


@given(rows=st.lists(st.tuples(st.integers(0, 3), st.integers(0, 3)), min_size=1, max_size=12))
@settings(max_examples=12, deadline=None, suppress_health_check=list(HealthCheck))
def test_duplicate_count_matches_pandas(rows):
    spark = _get_spark()
    from etl_from_s3_to_postgresql_template_spark.operators.cleanse import duplicate_count

    pdf = pd.DataFrame(rows, columns=["x", "y"])
    assert duplicate_count(spark.createDataFrame(pdf)) == int(pdf.duplicated().sum())


# ---- round-3 wave-2 properties (pure python / DuckDB — no Spark jobs) ----


def _morton_ref(x: int, y: int, bits: int) -> int:
    z = 0
    for i in range(bits):
        z |= ((x >> i) & 1) << (2 * i)
        z |= ((y >> i) & 1) << (2 * i + 1)
    return z


@given(
    x=st.integers(0, 511),
    y=st.integers(0, 511),
)
@settings(max_examples=60, deadline=None, suppress_health_check=list(HealthCheck))
def test_morton_sql_matches_reference(x, y):
    """The generated 36-term interleave expression (both engine spellings)
    equals the bit-twiddling reference implementation."""
    import duckdb

    from etl_from_s3_to_postgresql_template_spark.plans.llm_ops4 import _morton_terms

    expr = _morton_terms(str(x), str(y), 9, spark_side=False)
    got = duckdb.sql(f"SELECT {expr}").fetchone()[0]
    assert got == _morton_ref(x, y, 9)


@given(
    stream=st.lists(st.integers(0, 30), min_size=1, max_size=400),
    n_parts=st.integers(1, 5),
    k=st.integers(2, 10),
)
@settings(max_examples=60, deadline=None, suppress_health_check=list(HealthCheck))
def test_misra_gries_partitioned_superset_guarantee(stream, n_parts, k):
    """Union of per-partition MG(k) candidate keys contains every item
    with global frequency > n/k, for any partitioning of the stream."""
    from collections import Counter

    from etl_from_s3_to_postgresql_template_spark.plans.llm_ops4 import _mg_fold

    # deterministic round-robin partitioning (any split works for the claim)
    parts = [stream[i::n_parts] for i in range(n_parts)]
    candidates = set()
    for p in parts:
        candidates |= set(_mg_fold({}, p, k))
    n = len(stream)
    heavy = {t for t, c in Counter(stream).items() if c > n / k}
    assert heavy <= candidates
