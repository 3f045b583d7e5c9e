"""Planted-case semantics for the corpus-preparation operators
(operators/corpus.py); the registry queries are hash-checked against
DuckDB separately by tools/check_correctness.py."""

from __future__ import annotations

from etl_from_s3_to_postgresql_template_spark.operators.corpus import (
    benchmark_flag_col,
    decontaminate,
    pack_sequences,
    stratified_sample,
)

import pyspark.sql.functions as F


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string, lang string, source string")


def _bench_ids(spark, ids):
    df = spark.range(0, max(ids) + 1).select(F.col("id").alias("doc_id"))
    return {
        r.doc_id
        for r in df.where(benchmark_flag_col("doc_id")).collect()
        if r.doc_id in ids
    }


def test_decontaminate_flags_exact_8gram_overlap(spark):
    # Find one real benchmark id and one train id under the md5 split.
    ids = set(range(40))
    bench = sorted(_bench_ids(spark, ids))
    train = sorted(ids - set(bench))
    assert bench and len(train) >= 2
    phrase = "a b c d e f g h"  # exactly 8 tokens
    rows = [
        (bench[0], f"{phrase} tail tokens here", "en", "s"),
        (train[0], f"prefix words {phrase}", "en", "s"),  # contaminated
        (train[1], "completely different eight token run one two three", "en", "s"),
    ]
    out = decontaminate(_docs(spark, rows), n=8).collect()
    assert [r.doc_id for r in out] == [train[0]]
    assert out[0].n_shared == 1


def test_decontaminate_short_docs_match_whole_text(spark):
    ids = set(range(40))
    bench = sorted(_bench_ids(spark, ids))
    train = sorted(ids - set(bench))
    rows = [
        (bench[0], "tiny doc", "en", "s"),  # <8 tokens -> single whole-text shingle
        (train[0], "tiny doc", "en", "s"),
        (train[1], "tiny dog", "en", "s"),
    ]
    out = decontaminate(_docs(spark, rows), n=8).collect()
    assert [r.doc_id for r in out] == [train[0]]


def test_stratified_sample_exact_k_and_deterministic(spark):
    rows = [(i, "x", "en" if i % 2 else "fr", f"src{i % 3}") for i in range(60)]
    df = _docs(spark, rows)
    a = stratified_sample(df, ["lang", "source"], k=3).collect()
    b = stratified_sample(df.repartition(7), ["lang", "source"], k=3).collect()
    assert a == b  # partitioning-independent
    per = {}
    for r in a:
        per.setdefault((r.lang, r.source), []).append(r.rk)
    assert all(sorted(v) == [1, 2, 3] for v in per.values())
    assert len(per) == 6


def test_pack_sequences_chunk_boundaries(spark):
    # All docs forced into known buckets; capacity 5, token counts 3 each:
    # start offsets 0,3,6,9 -> seq ids 0,0,1,1.
    rows = [(i, "t t t", "en", "s") for i in range(16)]
    out = pack_sequences(_docs(spark, rows), capacity=5).collect()
    by_bucket = {}
    for r in out:
        by_bucket.setdefault(r.bucket, []).append(r)
    total_docs = sum(r.n_docs for r in out)
    total_toks = sum(r.total_tokens for r in out)
    assert total_docs == 16 and total_toks == 48
    for bucket, chunks in by_bucket.items():
        n = sum(c.n_docs for c in chunks)
        # per-bucket chunking: doc j (0-based) starts at 3j -> seq floor(3j/5)
        expect = {}
        for j in range(n):
            expect[3 * j // 5] = expect.get(3 * j // 5, 0) + 1
        assert {c.seq_id: c.n_docs for c in chunks} == expect


def test_prepare_corpus_end_to_end(spark):
    from etl_from_s3_to_postgresql_template_spark.corpus_pipeline import (
        annotate_corpus,
        corpus_funnel_stats,
        prepare_corpus,
    )
    from etl_from_s3_to_postgresql_template_spark.sources.registry import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    clean, packed = prepare_corpus(docs)
    stats = corpus_funnel_stats(annotate_corpus(docs))

    # Funnel is monotone and consistent with the clean output.
    assert stats.input_docs >= stats.after_quality >= stats.after_dedup >= stats.after_decontam
    assert stats.after_decontam == stats.train_docs + stats.holdout_docs
    assert clean.count() == stats.after_decontam
    assert stats.train_docs > 0 and stats.holdout_docs > 0

    # No benchmark docs (md5 first hex 0/1) survive into the clean pool.
    from etl_from_s3_to_postgresql_template_spark.operators.corpus import benchmark_flag_col

    assert clean.where(benchmark_flag_col("doc_id")).count() == 0

    # Packed chunks account for every train token exactly once.
    from etl_from_s3_to_postgresql_template_spark.functions.text import token_count_col
    import pyspark.sql.functions as F

    train_tokens = (
        clean.where(F.col("split") == "train")
        .agg(F.sum(token_count_col("text").cast("long")))
        .collect()[0][0]
    )
    packed_tokens = packed.agg(F.sum("total_tokens")).collect()[0][0]
    assert packed_tokens == train_tokens
