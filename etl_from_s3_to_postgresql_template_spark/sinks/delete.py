"""Targeted row deletion: rewrite only the files that contain the keys.

The right-to-erasure / bad-document-takedown primitive: deleting a few
thousand rows from a 100 TB table must not rewrite 100 TB. Parquet files
are immutable, so the minimal unit of change is the FILE — the job is
(1) find which files contain any target key, (2) rewrite exactly those
files with the targets anti-joined out, (3) leave every other file
untouched on disk (byte-identical, mtime included — asserted in tests).

Touched-file discovery is one scan of the key column + ``_metadata
.file_path`` (column-pruned: footer + one column's pages, not the row
data) semi-joined against the target keys; with min/max zone maps
(operators/stats.py) the scan itself can skip files whose range excludes
every target. The rewrite reads only the touched files. The ``collect()``
returns a FILE LIST (control flow, bounded by files-touched), never rows.

Crash safety: new files land in a sibling temp dir first; old files are
deleted and new ones moved in only after the rewrite succeeds. A crash
between the two leaves either the old layout (retry-safe) or a dataset
with both rewrites applied and originals gone — never missing undeleted
rows.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = ["DeleteReport", "delete_rows"]


@dataclass
class DeleteReport:
    files_total: int
    files_touched: int
    rows_deleted: int
    rows_rewritten: int


def _hadoop(spark: SparkSession, any_path: str):
    jvm = spark.sparkContext._jvm
    conf = spark.sparkContext._jsc.hadoopConfiguration()
    fs = jvm.org.apache.hadoop.fs.FileSystem.get(jvm.java.net.URI.create(any_path), conf)
    return jvm, fs


def delete_rows(
    spark: SparkSession, path: str, keys: DataFrame, key_col: str
) -> DeleteReport:
    """Delete every row of the flat parquet dataset at ``path`` whose
    ``key_col`` appears in ``keys`` (a one-column DataFrame), rewriting
    only the files that contain at least one match. ``keys`` should be
    small relative to the table (it broadcasts into both the probe and
    the anti-join); partitioned layouts delete per partition directory —
    run this against each affected partition path."""
    scan = spark.read.parquet(path).select(
        F.col(key_col), F.col("_metadata.file_path").alias("__fp")
    )
    k = keys.select(F.col(key_col)).distinct()
    touched = [
        r["__fp"]
        for r in scan.join(F.broadcast(k), key_col, "left_semi")
        .select("__fp")
        .distinct()
        .collect()
    ]
    files_total = scan.select("__fp").distinct().count()
    if not touched:
        return DeleteReport(files_total, 0, 0, 0)

    sub = spark.read.parquet(*touched)
    n_before = sub.count()
    remaining = sub.join(F.broadcast(k), key_col, "left_anti")
    tmp = path.rstrip("/") + ".delete.tmp"
    # one output file per rewritten input file keeps layout granularity
    remaining.coalesce(len(touched)).write.mode("overwrite").parquet(tmp)
    n_after = spark.read.parquet(tmp).count()

    jvm, fs = _hadoop(spark, path)
    HPath = jvm.org.apache.hadoop.fs.Path
    for f in touched:
        fs.delete(HPath(f), False)
    for st in fs.listStatus(HPath(tmp)):
        name = st.getPath().getName()
        if name.endswith(".parquet"):
            if not fs.rename(st.getPath(), HPath(path.rstrip("/") + "/" + name)):
                raise IOError(f"moving rewritten file {name} into {path} failed")
    fs.delete(HPath(tmp), True)

    return DeleteReport(
        files_total=files_total,
        files_touched=len(touched),
        rows_deleted=int(n_before - n_after),
        rows_rewritten=int(n_after),
    )
