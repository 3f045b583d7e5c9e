"""Key-based MERGE (upsert/delete) for plain-parquet tables.

Plain parquet has no MERGE INTO — that is a table-format feature (Delta /
Iceberg / Hudi). A reference user running incremental dimension loads
still needs the semantic, so this implements the classic
rewrite-on-merge: full-outer join target with updates on the key, apply
upsert/delete rules, write to a temp dir, swap atomically (same
safe-swap discipline as sinks/compact.py — a failed merge never destroys
the target).

Scale honesty, stated plainly: this rewrites the WHOLE target per merge —
O(|target|) I/O regardless of |updates|. That is the correct baseline for
dimension-sized tables (what MERGE is for in an ETL like the reference's).
For fact-sized targets the right tool is a real table format with
file-level pruning, or day-partition overwrite (pipeline.py) when updates
align with partitions. The join itself is key-partitioned; with updates
small (the normal case) it broadcasts and the target never shuffles.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = ["MergeReport", "merge_upsert"]


@dataclass
class MergeReport:
    rows_before: int
    rows_after: int
    inserted: int
    updated: int
    deleted: int


def merge_upsert(
    spark: SparkSession,
    target_path: str,
    updates: DataFrame,
    key: str,
    delete_col: str | None = None,
) -> MergeReport:
    """MERGE ``updates`` into the parquet table at ``target_path`` on
    ``key``: matched rows take the update's values, unmatched update rows
    insert, and (if ``delete_col`` names a boolean column) matched rows
    with it true are removed. Updates must be unique per key (enforced —
    duplicate update keys make the merge non-deterministic, so they fail
    fast rather than pick silently).

    One full-outer join on the key; the counters come from the same plan
    via conditional aggregates (one pass, not four count() jobs)."""
    target = spark.read.parquet(target_path)
    dup = updates.groupBy(key).count().where("count > 1").limit(1).count()
    if dup:
        raise ValueError("updates contain duplicate keys; merge would be non-deterministic")

    data_cols = [c for c in target.columns if c != key]
    u_cols = [c for c in updates.columns if c != key and c != delete_col]
    if set(u_cols) != set(data_cols):
        raise ValueError(f"update columns {sorted(u_cols)} != target columns {sorted(data_cols)}")

    t = target.alias("t")
    u = updates.alias("u")
    joined = t.join(u, F.col(f"t.{key}") == F.col(f"u.{key}"), "full_outer")
    has_t = F.col(f"t.{key}").isNotNull()
    has_u = F.col(f"u.{key}").isNotNull()
    is_delete = (
        (has_t & has_u & F.coalesce(F.col(f"u.{delete_col}"), F.lit(False)))
        if delete_col
        else F.lit(False)
    )
    merged = joined.where(~is_delete).select(
        F.coalesce(F.col(f"t.{key}"), F.col(f"u.{key}")).alias(key),
        *[
            F.when(has_u, F.col(f"u.{c}")).otherwise(F.col(f"t.{c}")).alias(c)
            for c in data_cols
        ],
    )
    stats = joined.agg(
        F.sum(has_t.cast("long")).alias("before"),
        F.sum((has_u & ~has_t).cast("long")).alias("inserted"),
        F.sum((has_u & has_t & ~is_delete).cast("long")).alias("updated"),
        F.sum(is_delete.cast("long")).alias("deleted"),
    ).collect()[0]

    tmp = target_path.rstrip("/") + ".merge.tmp"
    merged.write.mode("overwrite").parquet(tmp)
    jvm = spark.sparkContext._jvm
    conf = spark.sparkContext._jsc.hadoopConfiguration()
    fs = jvm.org.apache.hadoop.fs.FileSystem.get(jvm.java.net.URI.create(tmp), conf)
    Path = jvm.org.apache.hadoop.fs.Path
    bak = target_path.rstrip("/") + ".merge.bak"
    fs.rename(Path(target_path), Path(bak))
    if not fs.rename(Path(tmp), Path(target_path)):
        fs.rename(Path(bak), Path(target_path))
        raise IOError(f"merge swap failed for {target_path}")
    fs.delete(Path(bak), True)

    before = int(stats["before"] or 0)
    ins, upd, dele = (int(stats[k] or 0) for k in ("inserted", "updated", "deleted"))
    return MergeReport(
        rows_before=before,
        rows_after=before + ins - dele,
        inserted=ins,
        updated=upd,
        deleted=dele,
    )
