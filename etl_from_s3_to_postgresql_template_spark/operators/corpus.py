"""Corpus-preparation operators for training-data pipelines: benchmark
decontamination, deterministic stratified sampling, and sequence packing.

These are the north-star "what a 100 TB pretraining pipeline needs" ops
(the reference — see SURVEY.md §2.5 note, etl_pipeline.py:348-429 — stops at
merge/dedup/load, so this whole family is extension surface). Everything
here is deterministic by construction: membership and ordering decisions
key off md5 of stable ids, never off run order, partitioning, or RNG state,
so results are reproducible across engines and cluster sizes — the property
that makes a data pipeline auditable.

Scale notes
-----------
- Decontamination is a semi-join of corpus n-grams against a benchmark
  n-gram set. The benchmark side is orders of magnitude smaller (contest
  sets are thousands of docs; the corpus is billions), so the benchmark
  n-gram set is broadcast and the corpus side never shuffles.
- Stratified sampling is one shuffle on the stratum key; the per-stratum
  ROW_NUMBER window never materializes more than a partition's rows. For
  very hot strata, pre-filtering by an md5-prefix cut (keep ~2k/stratum)
  before the exact window bounds the sort.
- Sequence packing needs a total order WITHIN a packing unit only. A
  global cumulative sum would serialize; instead docs hash into md5
  buckets and packing is per-bucket — embarrassingly parallel, one
  shuffle, and the bucket count scales with the cluster.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from etl_from_s3_to_postgresql_template_spark.functions.text import (
    shingles_col,
    token_count_col,
    tokens_col,
)

__all__ = [
    "md5_prefix_col",
    "benchmark_flag_col",
    "decontaminate",
    "stratified_sample",
    "pack_sequences",
]


def md5_prefix_col(key: Column | str, n_chars: int = 1) -> Column:
    """First ``n_chars`` hex chars of md5 of the key rendered as a string.
    md5, not xxhash64: the DuckDB oracle must compute the identical value
    (DuckDB lacks xxhash64), and md5-of-decimal-string is engine-neutral."""
    c = F.col(key) if isinstance(key, str) else key
    return F.substring(F.md5(c.cast("string")), 1, n_chars)


def benchmark_flag_col(key: Column | str) -> Column:
    """Deterministic ~1/8 'benchmark' membership: md5 first hex char in
    {0,1}. Same convention as the train/holdout splitter
    (plans/query_pack_ext.py::split_train_holdout) so the two partitions
    compose."""
    return md5_prefix_col(key).isin("0", "1")


def hashed_shingles_col(text_col: Column | str, n: int) -> Column:
    """64-bit hash per token n-gram WITHOUT materializing the n-gram
    strings: each token hashes once (xxhash64, JVM-side), then the n-gram
    hash is the polynomial combination sum_j h[i+j] * P^j over shifted
    slices of the token-hash array — pure long multiply-adds (Java
    wraparound is the modulus), no string concatenation or re-hashing of
    ~50-char grams. Same equivalence classes as hashing the joined gram
    string (token sequences map 1:1 to space-joined strings), collisions
    at the 64-bit birthday bound. Docs shorter than ``n`` tokens fall back
    to one whole-text hash (Horner fold), mirroring ``shingles_col``'s
    whole-doc shingle — a <n-token doc can never equal an n-token gram,
    so the two constructions never cross-match semantically."""
    toks = tokens_col(text_col)
    h = F.transform(toks, lambda t: F.xxhash64(t))
    size = F.size(toks)
    m = F.greatest(size - (n - 1), F.lit(1))

    def signed64(x: int) -> int:
        x %= 1 << 64
        return x - (1 << 64) if x >= 1 << 63 else x

    P = 1099511628211  # FNV-1a prime (odd => multiplication is invertible mod 2^64)
    acc = F.slice(h, 1, m)
    for j in range(1, n):
        pj = F.lit(signed64(P**j))
        acc = F.zip_with(acc, F.slice(h, j + 1, m), lambda a, b: a + b * pj)
    whole = F.aggregate(h, F.lit(0).cast("long"), lambda a, x: a * F.lit(P) + x)
    return F.when(size >= n, acc).otherwise(F.array(whole))


def decontaminate(docs: DataFrame, n: int = 8, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Benchmark decontamination by token n-gram overlap: flag every
    training doc that shares at least one ``n``-gram with any benchmark
    doc, with the count of distinct shared n-grams as evidence.

    Returns (doc_id, n_shared) for contaminated TRAIN docs only, ordered
    by doc_id. Benchmark membership is ``benchmark_flag_col`` — in a real
    pipeline the benchmark set is a separate table; membership here is a
    deterministic split of one table so the DuckDB oracle can reproduce it.

    Physical shape: corpus n-grams explode once, then immediately collapse
    to an 8-byte xxhash64 — every downstream movement (the broadcast set,
    the join keys, the count-distinct state) carries longs, not ~50-char
    strings, an ~6x cut in bytes moved. The benchmark hash set (distinct,
    small) broadcasts; the probe side joins without a shuffle, then
    aggregates per doc. The explode multiplies rows by ~tokens-per-doc —
    at 100 TB that is the dominant cost, and it is linear, map-side, and
    never wider than (doc_id, hash). A 64-bit collision would need ~2^32
    distinct benchmark n-grams to become likely (birthday bound) — far
    beyond any benchmark suite; results are exact in practice.
    """
    is_bench = benchmark_flag_col(id_col)
    grams = docs.select(
        F.col(id_col),
        is_bench.alias("is_bench"),
        F.explode(hashed_shingles_col(text_col, n)).alias("g"),
    )
    bench_grams = grams.where(F.col("is_bench")).select("g").distinct()
    return (
        grams.where(~F.col("is_bench"))
        .join(F.broadcast(bench_grams), "g")
        .groupBy(id_col)
        .agg(F.count_distinct("g").alias("n_shared"))
        .orderBy(id_col)
    )


def stratified_sample(docs: DataFrame, strata: list[str], k: int, id_col: str = "doc_id") -> DataFrame:
    """Deterministic stratified sample: the first ``k`` docs per stratum in
    md5-of-id order. Equivalent to a uniform random sample per stratum
    (md5 is uniform) but stable across runs, engines, and corpus
    re-partitionings — re-running the pipeline reselects the SAME docs,
    and adding new docs can only displace, never reshuffle, the order.

    Returns (id, *strata, rk) with rk in [1, k], ordered by strata then rk.
    """
    w = Window.partitionBy(*strata).orderBy(md5_prefix_col(id_col, 32), id_col)
    return (
        docs.select(id_col, *strata)
        .withColumn("rk", F.row_number().over(w).cast("long"))
        .where(F.col("rk") <= k)
        .orderBy(*strata, "rk")
    )


def pack_sequences(
    docs: DataFrame,
    capacity: int,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Sequence packing for LLM training: concatenate docs (in doc-id
    order) into a token stream and cut it into fixed-``capacity`` chunks;
    each doc belongs to the chunk where it STARTS. Packing is per
    md5-bucket (16 buckets on the id's first md5 hex char), because a
    single global running sum would serialize the corpus through one
    task — per-bucket streams are the parallel unit, matching how packed
    shards are written in practice (one output shard per bucket).

    Returns per-chunk stats (bucket, seq_id, n_docs, total_tokens) —
    exact integers only, so the DuckDB twin hash-matches.
    """
    w = Window.partitionBy("bucket").orderBy(id_col)
    d = docs.select(
        F.col(id_col),
        md5_prefix_col(id_col).alias("bucket"),
        token_count_col(text_col).alias("n_tokens"),
    )
    start_off = (F.sum("n_tokens").over(w) - F.col("n_tokens")).alias("start_off")
    return (
        d.withColumn("start_off", start_off)
        .withColumn("seq_id", F.floor(F.col("start_off") / capacity).cast("long"))
        .groupBy("bucket", "seq_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").cast("long").alias("total_tokens"),
        )
        .orderBy("bucket", "seq_id")
    )
