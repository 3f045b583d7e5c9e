"""Training-shard writer: deterministic layout, balance, pruned reads."""

from __future__ import annotations

import glob

from pyspark.sql import functions as F

from etl_from_s3_to_postgresql_template_spark.sinks.shards import (
    read_shard,
    shard_assignment_col,
    write_corpus_shards,
)
from etl_from_s3_to_postgresql_template_spark.sources.registry import load_table

SF = "/root/testdata/sf0.001"


def test_shard_writer_layout_and_counts(spark, tmp_path):
    docs = load_table(spark, SF, "documents")
    out = str(tmp_path / "shards")
    rep = write_corpus_shards(docs, out, n_shards=8, max_records_per_file=50)
    assert rep.rows_total == docs.count()
    assert set(rep.rows_per_shard) == set(range(8))  # every shard nonempty
    # directory layout is one dir per shard
    dirs = sorted(glob.glob(f"{out}/shard_id=*"))
    assert len(dirs) == 8
    # maxRecordsPerFile held: no file exceeds the cap
    for d in dirs:
        for f in glob.glob(f"{d}/*.parquet"):
            n = spark.read.parquet(f).count()
            assert n <= 50


def test_shard_assignment_matches_balance_audit(spark):
    """The writer's assignment rule and corpus_shard_balance's audit rule
    must agree doc-for-doc — the audit predicts the layout. The audit
    formula is written out independently here (hex-prefix-as-integer via
    positional nibble arithmetic, the same text as the DuckDB oracle)."""
    docs = load_table(spark, SF, "documents")
    ours = docs.select(
        "doc_id", shard_assignment_col("doc_id", 8).alias("shard_id")
    )
    terms = " + ".join(
        f"cast(instr('0123456789abcdef', substring(md5(cast(doc_id as string)), {i}, 1))"
        f" - 1 as bigint) * {16 ** (8 - i)}L"
        for i in range(1, 9)
    )
    audit = docs.select(
        "doc_id", (F.expr(terms).cast("long") % 8).alias("shard_id")
    )
    assert ours.exceptAll(audit).count() == 0 and audit.exceptAll(ours).count() == 0


def test_shard_assignment_uniform_beyond_16(spark, tmp_path):
    """32-bit hash keeps every shard populated for n_shards > 16 and for
    non-divisors of 16 — the single-nibble rule this replaced left shards
    17..31 permanently empty and n_shards=5 systematically imbalanced."""
    docs = load_table(spark, SF, "documents")
    for n in (5, 32):
        counts = (
            docs.select(shard_assignment_col("doc_id", n).alias("s"))
            .groupBy("s")
            .count()
            .collect()
        )
        got = {r["s"]: r["count"] for r in counts}
        assert set(got) == set(range(n)), f"empty shards at n_shards={n}"
        # no shard grossly over-represented (single-nibble n=5 gave 4/16 = 0.25)
        total = sum(got.values())
        assert max(got.values()) / total < 2.5 / n


def test_shard_writer_is_run_deterministic(spark, tmp_path):
    """Two runs over the same corpus produce identical shard membership
    and identical per-file row sets (resume-stability contract)."""
    docs = load_table(spark, SF, "documents")
    out1, out2 = str(tmp_path / "a"), str(tmp_path / "b")
    write_corpus_shards(docs, out1, n_shards=4, max_records_per_file=100)
    write_corpus_shards(docs, out2, n_shards=4, max_records_per_file=100)
    a = spark.read.parquet(out1).select("doc_id", "shard_id")
    b = spark.read.parquet(out2).select("doc_id", "shard_id")
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_read_shard_prunes_partitions(spark, tmp_path):
    docs = load_table(spark, SF, "documents")
    out = str(tmp_path / "shards")
    write_corpus_shards(docs, out, n_shards=4)
    one = read_shard(spark, out, 2)
    plan = one._jdf.queryExecution().executedPlan().toString()
    # partition filter reached the scan: only shard_id=2 files are touched
    assert "PartitionFilters" in plan and "shard_id" in plan
    expected = (
        docs.withColumn("s", shard_assignment_col("doc_id", 4)).where(F.col("s") == 2).count()
    )
    assert one.count() == expected
