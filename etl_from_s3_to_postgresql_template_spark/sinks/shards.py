"""Training-shard writer: deterministic, balanced, resumable corpus layout.

The last step of a corpus pipeline is not a query — it is a LAYOUT: N
shard directories a data-parallel trainer maps one-to-one onto workers,
each holding files small enough to stream and stable enough to resume
from. Requirements, in order:

- **Deterministic assignment**: a document's shard depends only on its id
  (32-bit md5-prefix hash mod N — the same engine-neutral rule
  corpus_shard_balance audits), never on partitioning accidents, so two
  runs over the same corpus produce byte-identical shard membership and a
  crashed epoch can be resumed against a re-written corpus.
- **Deterministic file content**: rows are range-sorted within a shard
  before writing, so file k of shard s has the same rows every run.
- **Bounded files**: ``maxRecordsPerFile`` caps file size (the trainer's
  streaming-read unit); one shard = one output task prevents the
  thousand-tiny-files failure mode (sinks/compact.py).

Scale shape: one narrow projection + one shuffle on (shard_id) — the same
cost as any groupBy over the corpus. At 100 TB, bump n_shards to the
trainer's world size and maxRecordsPerFile to the file-size target; the
plan is unchanged.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = [
    "ShardReport",
    "shard_hash_col",
    "shard_assignment_col",
    "write_corpus_shards",
    "read_shard",
]


def shard_hash_col(id_col: str):
    """Deterministic engine-neutral 32-bit content hash: the first 8 md5
    nibbles of the id folded as ``h = h*16 + nibble`` (= the hex prefix
    read as an integer). Pure md5+substring+instr arithmetic, so any SQL
    engine reproduces it bit-for-bit; 32 bits of entropy keeps
    ``h % n_shards`` uniform for ANY shard count (a single nibble would
    leave shards >16 permanently empty and non-divisors of 16 skewed)."""
    h = F.lit(0).cast("long")
    for i in range(1, 9):
        nib = (
            F.expr(
                f"instr('0123456789abcdef', substring(md5(cast({id_col} as string)), {i}, 1))"
            )
            - 1
        ).cast("long")
        h = h * 16 + nib
    return h


def shard_assignment_col(id_col: str, n_shards: int):
    """Deterministic shard id: ``shard_hash_col(id) % n_shards`` —
    identical to corpus_shard_balance's audit rule (plans/llm_ops4.py),
    so the audit query predicts this writer's layout exactly, for any
    ``n_shards`` (not just divisors of 16)."""
    return shard_hash_col(id_col) % n_shards


@dataclass
class ShardReport:
    n_shards: int
    rows_total: int
    rows_per_shard: dict[int, int]


def write_corpus_shards(
    df: DataFrame,
    out_dir: str,
    id_col: str = "doc_id",
    n_shards: int = 8,
    max_records_per_file: int = 100_000,
) -> ShardReport:
    """Write ``df`` as ``out_dir/shard_id=K/`` parquet, one directory per
    training shard. Overwrite-idempotent (static overwrite of the whole
    layout — a shard layout is versioned as a unit, never patched in
    place). Returns per-shard row counts read back from the written files,
    so the report reflects what is actually on disk."""
    from etl_from_s3_to_postgresql_template_spark.sinks.rowgroups import bounded

    spark = df.sparkSession
    sharded = df.withColumn("shard_id", shard_assignment_col(id_col, n_shards))
    (
        bounded(  # explicit row-group bound: sinks/rowgroups.py invariant
            sharded
            # one shuffle: co-locate each shard, then sort so file contents
            # are a pure function of the data (resume-stable layout)
            .repartition(n_shards, "shard_id")
            .sortWithinPartitions("shard_id", id_col)
            .write.mode("overwrite")
        )
        .option("maxRecordsPerFile", max_records_per_file)
        .partitionBy("shard_id")
        .parquet(out_dir)
    )
    counts = {
        r["shard_id"]: r["n"]
        for r in spark.read.parquet(out_dir)
        .groupBy("shard_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    return ShardReport(
        n_shards=n_shards,
        rows_total=sum(counts.values()),
        rows_per_shard={int(k): int(v) for k, v in counts.items()},
    )


def read_shard(spark: SparkSession, out_dir: str, shard_id: int) -> DataFrame:
    """One worker's view: partition pruning makes this an O(shard) read —
    the scan touches only ``shard_id=K/`` (asserted in tests)."""
    return spark.read.parquet(out_dir).where(F.col("shard_id") == shard_id)
