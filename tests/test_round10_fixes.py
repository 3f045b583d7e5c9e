"""Round-10 ADVICE defect batch, pinned with planted fixtures:

1. embedding_decontaminate_eval zero-norm guard — before the fix, a
   zero vector gave cos = 0/0 = NaN on Spark (NaN >= tau is TRUE) but
   NULL on DuckDB (ignored), so the engines diverged the moment a real
   corpus contained an all-zero embedding. Both sides now exclude
   zero-norm vectors before any cosine.
2. corpus_mixture_unimax share_micro overflow — ((budget-prefix)*1e6)
   wrapped int64 past ~9.2e12 tokens. The decomposed quotient+remainder
   form is value-exact and overflow-free for any int64 budget.
3. docstream declared-schema assertion — a renamed/retyped documents
   column used to stream as silent NULLs; now it raises before the
   query starts.
"""

from __future__ import annotations

import duckdb
import pytest

from etl_from_s3_to_postgresql_template_spark.plans import ORACLE, QUERIES


def _planted_emb(spark, tmp_path, vecs):
    sf = str(tmp_path)
    rows = [(i, [float(x) for x in v], 0) for i, v in vecs]
    spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    ).write.parquet(f"{sf}/embeddings.parquet")
    return sf


def _oracle(sf, name, table="documents"):
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW {table} AS SELECT * FROM "
        f"read_parquet('{sf}/{table}.parquet/*.parquet')"
    )
    return con.execute(ORACLE[name]).fetchall()


# ---------------------------------------------------------------------------
# 1. zero-norm guard
# ---------------------------------------------------------------------------


def test_decontaminate_eval_zero_norm_corpus_vector_excluded(spark, tmp_path):
    """Corpus vec 1 is all-zero: it must not appear in the output at all
    (not as contaminated-by-NaN, not as a NULL row), and the remaining
    rows must still hash-match the oracle."""
    sf = _planted_emb(
        spark,
        tmp_path,
        [
            (0, [1.0, 0.0]),
            (1, [0.0, 0.0]),  # zero-norm corpus vector
            (2, [0.9, 0.09]),
            (3, [1.0, 0.0]),  # holdout (3 % 10 == 3)
        ],
    )
    got = [tuple(r) for r in QUERIES["embedding_decontaminate_eval"](spark, sf).collect()]
    want = [tuple(r) for r in _oracle(sf, "embedding_decontaminate_eval", "embeddings")]
    assert got == want
    assert [r[0] for r in got] == [0, 2]  # vec 1 excluded on both engines


def test_decontaminate_eval_zero_norm_holdout_vector_excluded(spark, tmp_path):
    """Holdout vec 13 is all-zero: with it excluded the only live holdout
    is vec 3, so vec 0 still scores exactly one hit; engines agree."""
    sf = _planted_emb(
        spark,
        tmp_path,
        [
            (0, [1.0, 0.0]),
            (3, [1.0, 0.0]),  # live holdout
            (13, [0.0, 0.0]),  # zero-norm holdout
        ],
    )
    got = [tuple(r) for r in QUERIES["embedding_decontaminate_eval"](spark, sf).collect()]
    want = [tuple(r) for r in _oracle(sf, "embedding_decontaminate_eval", "embeddings")]
    assert got == want
    assert len(got) == 1 and got[0][0] == 0 and got[0][1] == 1


def test_decontaminate_eval_all_holdout_zero_yields_empty(spark, tmp_path):
    sf = _planted_emb(spark, tmp_path, [(0, [1.0, 0.0]), (3, [0.0, 0.0])])
    got = QUERIES["embedding_decontaminate_eval"](spark, sf).collect()
    want = _oracle(sf, "embedding_decontaminate_eval", "embeddings")
    assert got == [] and want == []


# ---------------------------------------------------------------------------
# 2. share_micro decomposition
# ---------------------------------------------------------------------------

_NAIVE = "((budget - prefix) * 1000000) div slots"
_DECOMP = (
    "((budget - prefix) div slots) * 1000000"
    " + (((budget - prefix) % slots) * 1000000) div slots"
)


def test_share_micro_decomposition_identity_in_range(spark):
    """Value-identical to the naive form wherever the naive form does
    not overflow (Spark's own div/% semantics, not a Python model)."""
    rows = [
        (b, p, s)
        for b in [0, 1, 7, 999_999, 10**12, 9_223_372_036_854]
        for p in [0, 1, b // 3, b]
        for s in [1, 2, 3, 97]
        if b - p >= 0 and (b - p) <= 9_223_372_036_854  # naive stays in int64
    ]
    df = spark.createDataFrame(rows, "budget long, prefix long, slots long")
    bad = df.selectExpr(f"{_NAIVE} AS naive", f"{_DECOMP} AS decomp").filter(
        "naive <> decomp"
    )
    assert bad.count() == 0


def test_share_micro_decomposed_exact_past_naive_overflow(spark):
    """budget = 2.5e13 tokens (the 100 TB headline scale): the naive form
    wraps int64; the decomposed form returns the true quotient."""
    budget, prefix, slots = 25_000_000_000_000, 1_000_000_000_000, 7
    df = spark.createDataFrame([(budget, prefix, slots)], "budget long, prefix long, slots long")
    naive, decomp = df.selectExpr(f"{_NAIVE} AS n", f"{_DECOMP} AS d").first()
    true = (budget - prefix) * 1_000_000 // slots
    assert decomp == true
    assert naive != true  # the defect this pin guards against


# ---------------------------------------------------------------------------
# 3. docstream schema drift
# ---------------------------------------------------------------------------


def test_docstream_schema_drift_raises(spark, tmp_path):
    from etl_from_s3_to_postgresql_template_spark.streaming.docstream import (
        stream_documents,
    )

    sf = str(tmp_path)
    spark.createDataFrame(
        [(0, "t", "en", "s", 1)],
        "doc_id long, body string, lang string, source string, n_chars long",
    ).write.parquet(f"{sf}/documents.parquet")
    with pytest.raises(ValueError, match="schema drift"):
        stream_documents(spark, sf)


def test_docstream_matching_schema_still_streams(spark, tmp_path):
    from etl_from_s3_to_postgresql_template_spark.streaming.docstream import (
        stream_documents,
    )

    sf = str(tmp_path)
    spark.createDataFrame(
        [(0, "t", "en", "s", 1)],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.parquet(f"{sf}/documents.parquet")
    assert stream_documents(spark, sf).isStreaming


def test_docstream_reordered_columns_accepted(spark, tmp_path):
    """The parquet streaming source resolves columns BY NAME, so a
    reordered-but-identical physical layout is not drift (review r10)."""
    from etl_from_s3_to_postgresql_template_spark.streaming.docstream import (
        stream_documents,
    )

    sf = str(tmp_path)
    spark.createDataFrame(
        [("t", 0, "en", 1, "s")],
        "text string, doc_id long, lang string, n_chars long, source string",
    ).write.parquet(f"{sf}/documents.parquet")
    assert stream_documents(spark, sf).isStreaming
