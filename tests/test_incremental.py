"""Incremental view maintenance (sinks/incremental.py): day-by-day folds
must equal a full recompute, and replaying an applied day must be a no-op."""

from __future__ import annotations

import os
import tempfile

import pytest
from pyspark.sql import functions as F

from etl_from_s3_to_postgresql_template_spark.sinks.incremental import (
    RollupSpec,
    apply_delta,
    read_rollup,
)
from etl_from_s3_to_postgresql_template_spark.sources.registry import load_table

SF = "/root/testdata/sf0.001"

SPEC = RollupSpec(
    keys=["day", "event_type"],
    sums=["n_events", "sum_value"],
    mins=["first_ts"],
    maxs=["last_ts"],
)


def _daily(events):
    return events.select(
        F.date_trunc("day", "ts").alias("day"),
        "event_type",
        F.lit(1).cast("long").alias("n_events"),
        F.col("value").cast("decimal(18,6)").alias("sum_value"),
        F.col("ts").alias("first_ts"),
        F.col("ts").alias("last_ts"),
    )


def _sorted_rows(df):
    return sorted(map(tuple, df.collect()))


@pytest.fixture()
def rollup_dir():
    with tempfile.TemporaryDirectory() as d:
        yield os.path.join(d, "rollup")


def test_incremental_folds_equal_full_recompute(spark, rollup_dir):
    events = load_table(spark, SF, "events")
    days = [r[0] for r in events.select(F.date_trunc("day", "ts").alias("d")).distinct().orderBy("d").collect()][:4]
    for d in days:
        delta = _daily(events.where(F.date_trunc("day", "ts") == F.lit(d)))
        assert apply_delta(spark, rollup_dir, delta, SPEC, token=str(d)) is True

    full = SPEC.combine(
        _daily(events.where(F.date_trunc("day", "ts").isin([F.lit(d) for d in days])))
    )
    got = read_rollup(spark, rollup_dir)
    assert sorted(got.columns) == sorted(full.columns)
    assert _sorted_rows(got.select(*sorted(got.columns))) == _sorted_rows(
        full.select(*sorted(full.columns))
    )


def test_replay_is_noop(spark, rollup_dir):
    events = load_table(spark, SF, "events")
    d = events.select(F.date_trunc("day", "ts").alias("d")).agg(F.min("d")).collect()[0][0]
    delta = _daily(events.where(F.date_trunc("day", "ts") == F.lit(d)))
    assert apply_delta(spark, rollup_dir, delta, SPEC, token=str(d)) is True
    before = _sorted_rows(read_rollup(spark, rollup_dir))
    # retried orchestrator step: same token, same (or even different) data
    assert apply_delta(spark, rollup_dir, delta, SPEC, token=str(d)) is False
    assert _sorted_rows(read_rollup(spark, rollup_dir)) == before


def test_out_of_order_days_commute(spark, rollup_dir):
    events = load_table(spark, SF, "events")
    days = [r[0] for r in events.select(F.date_trunc("day", "ts").alias("d")).distinct().orderBy("d").collect()][:3]
    for d in reversed(days):  # apply newest-first
        delta = _daily(events.where(F.date_trunc("day", "ts") == F.lit(d)))
        apply_delta(spark, rollup_dir, delta, SPEC, token=str(d))
    full = SPEC.combine(
        _daily(events.where(F.date_trunc("day", "ts").isin([F.lit(d) for d in days])))
    )
    got = read_rollup(spark, rollup_dir)
    assert _sorted_rows(got.select(*sorted(got.columns))) == _sorted_rows(
        full.select(*sorted(full.columns))
    )


def _prepare(df):
    return df.select(
        F.date_trunc("day", "ts").alias("day"),
        "event_type",
        F.lit(1).cast("long").alias("n_events"),
        F.col("value").cast("decimal(18,6)").alias("sum_value"),
        F.col("ts").alias("first_ts"),
        F.col("ts").alias("last_ts"),
    )


def test_streaming_rollup_maintenance_exactly_once(spark, tmp_path):
    """Streaming materialized-view maintenance: stream the events fixture
    through foreach_batch_rollup; the rollup must equal the batch
    recompute, and replaying the whole stream with a FRESH checkpoint
    (every batch re-delivered — the worst-case at-least-once scenario)
    must change nothing, because batch_id tokens hit the ledger."""
    from etl_from_s3_to_postgresql_template_spark.streaming.sink import (
        run_events_stream_to_rollup,
    )

    rollup = str(tmp_path / "rollup")
    events = load_table(spark, SF, "events")
    run_events_stream_to_rollup(
        spark, SF, rollup, str(tmp_path / "ckpt1"), SPEC, prepare=_prepare
    )
    full = SPEC.combine(_prepare(events))
    got = read_rollup(spark, rollup)
    assert _sorted_rows(got.select(*sorted(got.columns))) == _sorted_rows(
        full.select(*sorted(full.columns))
    )

    # full replay: fresh checkpoint -> same batch_ids re-delivered
    run_events_stream_to_rollup(
        spark, SF, rollup, str(tmp_path / "ckpt2"), SPEC, prepare=_prepare
    )
    got2 = read_rollup(spark, rollup)
    assert _sorted_rows(got2.select(*sorted(got2.columns))) == _sorted_rows(
        full.select(*sorted(full.columns))
    )


def test_crash_between_swap_renames_recovers(spark, rollup_dir):
    """Crash-safety: simulate dying after the backup rename but before the
    tmp rename (the window the review flagged). The next apply_delta must
    restore the backup, see the token in the restored ledger, and no-op —
    history is never lost and never double-counted."""
    import os
    import shutil

    events = load_table(spark, SF, "events")
    d = events.select(F.date_trunc("day", "ts").alias("d")).agg(F.min("d")).collect()[0][0]
    delta = _daily(events.where(F.date_trunc("day", "ts") == F.lit(d)))
    assert apply_delta(spark, rollup_dir, delta, SPEC, token=str(d)) is True
    before = _sorted_rows(read_rollup(spark, rollup_dir))

    # simulate the mid-swap crash state: live dir moved to .bak, no live dir
    shutil.move(rollup_dir, rollup_dir + ".inc.bak")
    assert not os.path.exists(rollup_dir)

    # retry of the SAME token: recovery restores, ledger no-ops the fold
    assert apply_delta(spark, rollup_dir, delta, SPEC, token=str(d)) is False
    assert _sorted_rows(read_rollup(spark, rollup_dir)) == before


def test_first_application_crash_before_ledger_cannot_double_count(spark, rollup_dir):
    """The data and its token commit in ONE rename, so the old failure
    mode (data written, ledger append lost, retry double-counts) is
    structurally impossible: re-applying the same token after a completed
    fold is always a no-op, and the fold result equals one application."""
    events = load_table(spark, SF, "events")
    d = events.select(F.date_trunc("day", "ts").alias("d")).agg(F.min("d")).collect()[0][0]
    delta = _daily(events.where(F.date_trunc("day", "ts") == F.lit(d)))
    apply_delta(spark, rollup_dir, delta, SPEC, token=str(d))
    once = _sorted_rows(read_rollup(spark, rollup_dir))
    for _ in range(3):
        assert apply_delta(spark, rollup_dir, delta, SPEC, token=str(d)) is False
    assert _sorted_rows(read_rollup(spark, rollup_dir)) == once
