"""Row-group bounds as a writer-side invariant.

The round-5 layout lesson (SCALING.md): a parquet file written as ONE row
group scans as ONE task no matter how Spark splits byte ranges — readers
only start at row-group boundaries — so a single unbounded writer can
silently serialize every downstream scan (the r4 500k-doc corpus ran
1 task / 31 idle until regenerated). The engine's own writers therefore
set ``parquet.block.size`` EXPLICITLY instead of trusting the session or
cluster default: a cluster-level override (or a future default change)
can't reintroduce unbounded row groups through these paths.

128 MiB matches ``spark.sql.files.maxPartitionBytes``' default so one
read split maps to about one row group — the standard alignment; smaller
values buy scan parallelism on small-file layouts at a small metadata
and compression cost.

``audit_rowgroup_bounds`` is the matching read-side check for parquet
produced OUTSIDE these writers (fixture generators, upstream dumps): it
reads footers only and reports files whose single-row-group size exceeds
the bound. For corpus-scale audits use the distributed footer reader
(operators/stats.py::parquet_rowgroup_stats); this one is a driver-side
convenience for tests and small layouts.
"""

from __future__ import annotations

import os
from dataclasses import dataclass

from pyspark.sql.readwriter import DataFrameWriter

__all__ = [
    "PARQUET_BLOCK_BYTES",
    "bounded",
    "audit_rowgroup_bounds",
    "RowGroupAudit",
]

#: explicit row-group byte bound applied by every engine writer.
PARQUET_BLOCK_BYTES = 128 * 1024 * 1024


def bounded(writer: DataFrameWriter, block_bytes: int = PARQUET_BLOCK_BYTES) -> DataFrameWriter:
    """Apply the engine's explicit row-group bound to a parquet writer.

    ``parquet.block.size`` is honored per-write by Spark's parquet data
    source; routing every engine write through this helper is what makes
    the bound an invariant rather than a convention."""
    return writer.option("parquet.block.size", str(block_bytes))


@dataclass
class RowGroupAudit:
    n_files: int
    n_row_groups: int
    #: files with exactly one row group whose compressed size exceeds the
    #: bound — the scans-as-one-task hazard class.
    oversized_single_rg_files: list[str]


def audit_rowgroup_bounds(
    path: str, max_rowgroup_bytes: int = PARQUET_BLOCK_BYTES
) -> RowGroupAudit:
    """Footer-only audit of a local parquet layout: flag files that are a
    single row group larger than ``max_rowgroup_bytes``."""
    import pyarrow.parquet as pq

    files: list[str] = []
    if os.path.isdir(path):
        for root, _dirs, names in os.walk(path):
            files += [
                os.path.join(root, n)
                for n in names
                if n.endswith(".parquet") and not n.startswith((".", "_"))
            ]
    else:
        files = [path]
    n_rg = 0
    bad: list[str] = []
    for f in sorted(files):
        md = pq.ParquetFile(f).metadata
        n_rg += md.num_row_groups
        if md.num_row_groups == 1:
            # parquet.block.size bounds the UNCOMPRESSED buffered row-group
            # size — a well-compressing 1 GB-of-text group can be 100 MB on
            # disk yet still scans as one task, so judge the uncompressed
            # total (rg.total_byte_size); check compressed too so a
            # truncated/odd footer reporting 0 uncompressed still flags
            rg = md.row_group(0)
            uncompressed = rg.total_byte_size
            compressed = sum(
                rg.column(c).total_compressed_size for c in range(rg.num_columns)
            )
            if max(uncompressed, compressed) > max_rowgroup_bytes:
                bad.append(f)
    return RowGroupAudit(len(files), n_rg, bad)
