"""Targeted delete: only touched files rewritten, untouched files byte-stable."""

from __future__ import annotations

import glob
import os

from pyspark.sql import functions as F

from etl_from_s3_to_postgresql_template_spark.sinks.delete import delete_rows
from etl_from_s3_to_postgresql_template_spark.sources.registry import load_table

SF = "/root/testdata/sf0.001"


def _lay_out(spark, tmp_path, n_files=8):
    """events laid out range-partitioned on event_id so target keys
    concentrate in few files (zone-map-friendly layout)."""
    out = str(tmp_path / "tbl")
    ev = load_table(spark, SF, "events")
    ev.repartitionByRange(n_files, "event_id").sortWithinPartitions("event_id").write.parquet(out)
    return out, ev


def _stat_files(out):
    return {
        p: (os.path.getsize(p), os.path.getmtime(p))
        for p in glob.glob(f"{out}/*.parquet")
    }


def test_delete_removes_targets_and_keeps_everything_else(spark, tmp_path):
    out, ev = _lay_out(spark, tmp_path)
    targets = [5, 6, 7, 8, 9, 10]
    keys = spark.createDataFrame([(t,) for t in targets], "event_id long")
    rep = delete_rows(spark, out, keys, "event_id")
    assert rep.rows_deleted == len(targets)
    back = spark.read.parquet(out)
    assert back.where(F.col("event_id").isin(targets)).count() == 0
    # survivors identical to an anti-join of the original
    want = ev.join(keys, "event_id", "left_anti")
    assert back.count() == want.count()
    assert back.exceptAll(want).count() == 0 and want.exceptAll(back).count() == 0


def test_delete_rewrites_only_touched_files(spark, tmp_path):
    out, ev = _lay_out(spark, tmp_path, n_files=8)
    before = _stat_files(out)
    # contiguous low ids -> land in the first range partition(s) only
    keys = spark.createDataFrame([(i,) for i in range(1, 20)], "event_id long")
    rep = delete_rows(spark, out, keys, "event_id")
    assert 1 <= rep.files_touched <= 2 < rep.files_total
    after = _stat_files(out)
    untouched = set(before) & set(after)
    # untouched files are the SAME files: same size, same mtime
    assert len(untouched) == rep.files_total - rep.files_touched
    for p in untouched:
        assert before[p] == after[p]


def test_delete_with_no_matches_is_a_noop(spark, tmp_path):
    out, _ = _lay_out(spark, tmp_path)
    before = _stat_files(out)
    keys = spark.createDataFrame([(10_000_000,)], "event_id long")
    rep = delete_rows(spark, out, keys, "event_id")
    assert rep.files_touched == 0 and rep.rows_deleted == 0
    assert _stat_files(out) == before
