"""Row-group bounds as a writer-side invariant (sinks/rowgroups.py).

The r5 layout lesson: a one-row-group parquet file scans as ONE task no
matter how Spark splits byte ranges. These tests prove (a) the explicit
``parquet.block.size`` option actually reaches Spark's parquet writer and
splits output into multiple row groups above the bound, and (b) the
read-side audit catches the hazard class on externally-written files.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq
from pyspark.sql import functions as F

from etl_from_s3_to_postgresql_template_spark.sinks.rowgroups import (
    audit_rowgroup_bounds,
    bounded,
)


def test_bounded_option_reaches_writer_multiple_row_groups(spark, tmp_path):
    """~3 MB of rows written with a 64 KiB block bound must come out as
    MANY row groups per file — proving option("parquet.block.size") is
    honored per-write, which is what makes bounded() an invariant and not
    a comment."""
    out = str(tmp_path / "bounded")
    df = spark.range(100_000).select(
        "id", F.concat(F.lit("x" * 64), F.col("id").cast("string")).alias("pad")
    )
    bounded(df.coalesce(1).write.mode("overwrite"), block_bytes=64 * 1024).parquet(out)
    audit = audit_rowgroup_bounds(out, max_rowgroup_bytes=64 * 1024 * 4)
    assert audit.n_files >= 1
    assert audit.n_row_groups > audit.n_files  # multi-row-group output
    assert audit.oversized_single_rg_files == []


def test_audit_flags_single_rowgroup_hazard(tmp_path):
    """A pyarrow-written single-row-group file above the bound (exactly
    the r4 fixture defect) must be flagged; the same data written with
    bounded row groups must pass."""
    # distinct values: identical strings dictionary-encode to a few KB
    # even uncompressed, which would dodge the size threshold
    table = pa.table({"v": [f"y{i:06d}" * 30 for i in range(5_000)]})
    one_rg = str(tmp_path / "one_rg.parquet")
    many_rg = str(tmp_path / "many_rg.parquet")
    pq.write_table(table, one_rg, row_group_size=1_000_000, compression="none")
    pq.write_table(table, many_rg, row_group_size=500, compression="none")

    bad = audit_rowgroup_bounds(one_rg, max_rowgroup_bytes=100 * 1024)
    assert bad.oversized_single_rg_files == [one_rg]
    good = audit_rowgroup_bounds(many_rg, max_rowgroup_bytes=100 * 1024)
    assert good.oversized_single_rg_files == [] and good.n_row_groups > 1


def test_engine_writers_pass_audit(spark, tmp_path):
    """The three engine parquet writers (shards, compaction, day sink) run
    through bounded() — their output must carry no oversized single-row-
    group file at the default bound."""
    from etl_from_s3_to_postgresql_template_spark.sinks.base import ParquetSink
    from etl_from_s3_to_postgresql_template_spark.sinks.compact import compact_parquet
    from etl_from_s3_to_postgresql_template_spark.sinks.shards import write_corpus_shards

    df = spark.range(5_000).select(
        F.col("id").alias("doc_id"), F.col("id").cast("string").alias("text")
    )
    shard_dir = str(tmp_path / "shards")
    write_corpus_shards(df, shard_dir, n_shards=4)
    assert audit_rowgroup_bounds(shard_dir).oversized_single_rg_files == []

    day_base = str(tmp_path / "lake")
    ParquetSink(day_base).write_day(df, "2024-01-01")
    assert audit_rowgroup_bounds(f"{day_base}/merged").oversized_single_rg_files == []

    frag = str(tmp_path / "frag")
    df.repartition(16).write.parquet(frag)
    compact_parquet(spark, frag, target_file_bytes=1 << 30)
    assert audit_rowgroup_bounds(frag).oversized_single_rg_files == []
