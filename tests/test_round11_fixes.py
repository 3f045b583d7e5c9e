"""Round-11 sanctioned defect batch — regression pins.

1. text_tokenizer_fertility int64 premultiply overflow (VERDICT r10 weak
   #1): ``1000000 * n_chars div n_unicode_tokens`` wrapped silently on
   BOTH engines past ~9.2e12 chars per language — below the module's own
   100 TB claim — so the oracle pairing stayed green while the answer was
   wrong at scale. Now the staged quotient+remainder decomposition
   (``_ratio_micro_tf``) on both sides.
2. corpus_mixture_doremi e-step / MW-update / renorm overflow (ADVICE
   r10): ``excess_micro * 500000`` wrapped for degenerate domains with
   chars/token > ~1.8e7; the renorm ``u * (k * 1e6)`` relied on a
   comment-only K bound. Now staged decompositions everywhere a product
   could form, and the one residual runtime product (u*k) fails loudly
   via raise_error/error instead of wrapping.
3. core_ops2._fixture_dir swallowed ANY os.rename OSError as "concurrent
   winner" and returned a non-existent path (ADVICE r10); now re-raises
   when the target is still missing.
"""

from __future__ import annotations

import os

import pytest

from etl_from_s3_to_postgresql_template_spark.plans.llm_ops11 import _ratio_micro_tf
from etl_from_s3_to_postgresql_template_spark.plans.llm_ops12 import (
    _mul_div_staged,
    _ratio_micro,
)

BIGMAX = 9_223_372_036_854_775_807


# ---------------------------------------------------------------------------
# 1. tokenizer-fertility ratio decomposition
# ---------------------------------------------------------------------------

_TF_NAIVE = "(1000000 * c) div t"


def test_fertility_ratio_identity_in_range(spark):
    """Value-identical to the naive premultiply wherever the naive form
    does not overflow (Spark's own div/% semantics, not a Python model)."""
    rows = [
        (c, t)
        for c in [0, 1, 7, 999_999, 10**12, 9_223_372_036_854]
        for t in [1, 2, 3, 97, 10**9]
        if 1_000_000 * c <= BIGMAX
    ]
    df = spark.createDataFrame(rows, "c long, t long")
    decomp = _ratio_micro_tf("c", "t", "div")
    bad = df.selectExpr(f"{_TF_NAIVE} AS naive", f"{decomp} AS decomp").filter(
        "naive <> decomp"
    )
    assert bad.count() == 0


def test_fertility_ratio_exact_past_naive_overflow(spark):
    """c = 2.5e13 chars in one language (the 100 TB headline scale): the
    naive premultiply wraps int64; the decomposed form returns the true
    quotient — on Spark AND on DuckDB with '//'."""
    import duckdb

    c, t = 25_000_000_000_000, 7_000_000_000_000
    df = spark.createDataFrame([(c, t)], "c long, t long")
    decomp = _ratio_micro_tf("c", "t", "div")
    naive, got = df.selectExpr(f"{_TF_NAIVE} AS n", f"{decomp} AS d").first()
    true = 1_000_000 * c // t
    assert got == true
    assert naive != true  # the defect this pin guards against
    (duck,) = duckdb.sql(
        f"SELECT {_ratio_micro_tf('c', 't', '//')} FROM (SELECT {c}::BIGINT c, {t}::BIGINT t)"
    ).fetchone()
    assert duck == true


def test_fertility_query_end_to_end_planted(spark, tmp_path):
    """End-to-end: a planted corpus where per-language totals are small
    (exactness unchanged) still matches the DuckDB oracle hash-exactly
    after the decomposition."""
    import duckdb

    from etl_from_s3_to_postgresql_template_spark.plans import ORACLE, QUERIES

    sf = str(tmp_path)
    rows = [
        (0, "hello world", "en", "web", 11),
        (1, "foo bar baz", "en", "web", 11),
        (2, "一二三 mixed", "zh", "web", 9),
        (3, None, "xx", "web", 0),
    ]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.parquet(f"{sf}/documents.parquet")
    got = [tuple(r) for r in QUERIES["text_tokenizer_fertility"](spark, sf).collect()]
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf}/documents.parquet/*.parquet')"
    )
    want = [tuple(r) for r in con.execute(ORACLE["text_tokenizer_fertility"]).fetchall()]
    assert got == want


# ---------------------------------------------------------------------------
# 2. doremi staged forms
# ---------------------------------------------------------------------------


def test_doremi_estep_identity_and_overflow(spark):
    """(x * 500000) div m: staged form matches naive in range and stays
    exact where the naive premultiply wraps (|x| > ~1.8e13)."""
    staged = _mul_div_staged("x", 1000, 500, "m", "div")
    in_range = [
        (x, m)
        for x in [0, 1, -1, 999_999, -999_999, 10**12, -(10**12)]
        for m in [1, 3, 10**6, 10**12]
    ]
    df = spark.createDataFrame(in_range, "x long, m long")
    bad = df.selectExpr(f"(x * 500000) div m AS naive", f"{staged} AS s").filter(
        "naive <> s"
    )
    assert bad.count() == 0
    # past naive overflow: x = 9e16 (chars/token ~ 9e10 micro-excess)
    x, m = 90_000_000_000_000_000, 90_000_000_000_000_000
    df1 = spark.createDataFrame([(x, m)], "x long, m long")
    (got,) = df1.selectExpr(f"{staged} AS s").first()
    assert got == x * 500_000 // m  # == 500000
    (neg,) = spark.createDataFrame([(-x, m)], "x long, m long").selectExpr(
        f"{staged} AS s"
    ).first()
    assert neg == -500_000  # truncation toward zero on the negative side


def test_doremi_mw_update_identity_and_overflow(spark):
    """(w * (1e6+e)) div 1e6 staged over w = q*1e6 + r: identical in
    range, exact for w far past the naive wrap point."""
    expr = (
        "(w div 1000000) * (1000000 + e)"
        " + ((w % 1000000) * (1000000 + e)) div 1000000"
    )
    rows = [
        (w, e)
        for w in [0, 1, 999_999, 1_000_000, 123_456_789_012]
        for e in [-500_000, -1, 0, 1, 500_000]
    ]
    df = spark.createDataFrame(rows, "w long, e long")
    bad = df.selectExpr(
        "(w * (1000000 + e)) div 1000000 AS naive", f"{expr} AS s"
    ).filter("naive <> s")
    assert bad.count() == 0
    w, e = 50_000_000_000_000_000, 500_000  # naive product = 7.5e22, wraps
    (got,) = spark.createDataFrame([(w, e)], "w long, e long").selectExpr(
        f"{expr} AS s"
    ).first()
    assert got == w * (1_000_000 + e) // 1_000_000


def test_doremi_renorm_staged_identity_and_guard(spark):
    """(u * k * 1e6) div s with the 1e6 staged: identical to the naive
    form in range; the residual u*k product raises loudly (not wraps)
    when it would exceed int64."""
    staged = _mul_div_staged("u * k", 1000, 1000, "s", "div")
    rows = [
        (u, k, s)
        for u in [1, 1_000_000, 1_500_000, 77_000_000]
        for k in [1, 7, 97]
        for s in [1_000_000, 7_333_333, 145_000_000]
    ]
    df = spark.createDataFrame(rows, "u long, k long, s long")
    bad = df.selectExpr(
        "(u * (k * 1000000)) div s AS naive", f"{staged} AS st"
    ).filter("naive <> st")
    assert bad.count() == 0
    # exact where the naive k*1e6 premultiply wraps: u*k fits, u*k*1e6 not
    u, k, s = 10**12, 10**5, 10**11
    (got,) = spark.createDataFrame([(u, k, s)], "u long, k long, s long").selectExpr(
        f"{staged} AS st"
    ).first()
    assert got == u * k * 1_000_000 // s
    # the loud guard: u*k itself would overflow
    guard = (
        "CASE WHEN u > 9223372036854775807 div (k * 1000)"
        " THEN CAST(raise_error('doremi renorm u*k would overflow int64') AS BIGINT)"
        f" ELSE {staged} END"
    )
    df_bad = spark.createDataFrame(
        [(10**16, 10**5, 10**11)], "u long, k long, s long"
    )
    with pytest.raises(Exception, match="would overflow int64"):
        df_bad.selectExpr(f"{guard} AS w").collect()


def test_doremi_query_unchanged_at_fixture_scale(spark):
    """The registered query still hash-matches its oracle on the sf0.001
    fixture (the decomposition is value-exact in the non-overflow regime)."""
    import duckdb

    from etl_from_s3_to_postgresql_template_spark.plans import ORACLE, QUERIES

    sf = "/root/testdata/sf0.001"
    got = [tuple(r) for r in QUERIES["corpus_mixture_doremi"](spark, sf).collect()]
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf}/documents.parquet')"
    )
    want = [tuple(r) for r in con.execute(ORACLE["corpus_mixture_doremi"]).fetchall()]
    assert got == want


def _trunc_div(a: int, b: int) -> int:
    """Truncating division (Spark div / DuckDB // semantics), which
    Python's floor // differs from on negatives."""
    q = abs(a) // abs(b)
    return q if (a >= 0) == (b >= 0) else -q


def test_mul_div_staged_random_batch_matches_bigint_truth(spark):
    """500 seeded-random (x, t) pairs spanning the full int64 magnitude
    range, positive and negative x: the staged form must equal Python's
    unbounded-precision truncating (x*f1*f2)/t on Spark AND DuckDB
    wherever the staged preconditions hold."""
    import random

    import duckdb

    rng = random.Random(11)
    f1, f2 = 1000, 500
    rows = []
    while len(rows) < 500:
        x = rng.randrange(-(2**62), 2**62)
        t = rng.randrange(1, 2**53)  # t*f1 < 2^63 precondition
        if abs(_trunc_div(x, t)) * f1 * f2 < 2**63:  # quotient-stage bound
            rows.append((x, t))
    truth = {(x, t): _trunc_div(x * f1 * f2, t) for x, t in rows}
    staged = _mul_div_staged("x", f1, f2, "t", "div")
    df = spark.createDataFrame(rows, "x long, t long")
    got = df.selectExpr("x", "t", f"{staged} AS s").collect()
    assert all(r.s == truth[(r.x, r.t)] for r in got)
    staged_dd = _mul_div_staged("x", f1, f2, "t", "//")
    con = duckdb.connect()
    con.execute("CREATE TABLE v (x BIGINT, t BIGINT)")
    con.executemany("INSERT INTO v VALUES (?, ?)", rows)
    for x, t, s in con.execute(f"SELECT x, t, {staged_dd} FROM v").fetchall():
        assert s == truth[(x, t)]


# ---------------------------------------------------------------------------
# 3. _fixture_dir rename failure surfaces
# ---------------------------------------------------------------------------


def test_fixture_dir_reraises_rename_failure(spark, tmp_path, monkeypatch):
    """A rename that fails with the target still missing (cross-device
    /tmp, permissions) must surface, not return a phantom path."""
    from etl_from_s3_to_postgresql_template_spark.plans import core_ops2

    sf = str(tmp_path)
    spark.createDataFrame(
        [(i, f"N{i}", i % 3) for i in range(6)],
        "n_nationkey long, n_name string, n_regionkey long",
    ).write.parquet(f"{sf}/nation.parquet")

    def boom(src, dst):
        raise OSError(18, "Invalid cross-device link")

    monkeypatch.setattr(core_ops2.os, "rename", boom)
    with pytest.raises(OSError, match="cross-device"):
        core_ops2._fixture_dir(spark, sf)
