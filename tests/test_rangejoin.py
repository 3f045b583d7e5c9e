"""Banded interval join: equivalence vs the naive non-equi join, band-edge
cases, and the plan property that justifies its existence (equi-join on the
band id, not a nested loop)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from etl_from_s3_to_postgresql_template_spark.operators.rangejoin import interval_join


def _ts(h, m=0, s=0, us=0):
    return dt.datetime(2024, 1, 1, h, m, s, us)


def _frames(spark):
    points = spark.createDataFrame(
        [
            (1, _ts(0, 0, 0)),          # exactly at interval start -> in
            (2, _ts(1, 59, 59, 999999)),  # just inside half-open end
            (3, _ts(2, 0, 0)),          # exactly at end -> OUT (half-open)
            (4, _ts(3, 0, 0, 1)),       # band edge + 1us, inside iv B
            (5, _ts(23, 59, 59)),       # in no interval
        ],
        "pid int, ts timestamp",
    )
    intervals = spark.createDataFrame(
        [
            ("A", _ts(0), _ts(2)),      # spans 3 one-hour bands (0,1,2)
            ("B", _ts(3), _ts(4)),
            ("C", _ts(1), _ts(4)),      # overlaps A and B -> pid 2,4 match twice
        ],
        "iv string, start_ts timestamp, end_ts timestamp",
    )
    return points, intervals


def test_matches_naive_nonequi_join(spark):
    points, intervals = _frames(spark)
    banded = interval_join(points, intervals, "ts", "start_ts", "end_ts", 3600)
    naive = points.join(
        intervals,
        (points.ts >= intervals.start_ts) & (points.ts < intervals.end_ts),
    )
    got = sorted((r.pid, r.iv) for r in banded.collect())
    want = sorted((r.pid, r.iv) for r in naive.collect())
    assert got == want
    assert got == [(1, "A"), (2, "A"), (2, "C"), (3, "C"), (4, "B"), (4, "C")]


def test_band_width_does_not_change_results(spark):
    points, intervals = _frames(spark)
    by_width = {
        w: sorted(
            (r.pid, r.iv)
            for r in interval_join(
                points, intervals, "ts", "start_ts", "end_ts", w
            ).collect()
        )
        for w in (60, 3600, 86400)
    }
    assert by_width[60] == by_width[3600] == by_width[86400]


def test_left_semi_mode(spark):
    points, intervals = _frames(spark)
    got = sorted(
        r.pid
        for r in interval_join(
            points, intervals, "ts", "start_ts", "end_ts", 3600, how="left_semi"
        ).collect()
    )
    assert got == [1, 2, 3, 4]  # pid 5 in no interval; no duplicates


def test_plan_is_equi_join_not_nested_loop(spark):
    # The whole point: two large sides must compile to a hash/merge join
    # keyed on the band, never BroadcastNestedLoopJoin / CartesianProduct.
    points, intervals = _frames(spark)
    plan = interval_join(
        points.hint("merge"), intervals, "ts", "start_ts", "end_ts", 3600
    )._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert ("SortMergeJoin" in plan) or ("ShuffledHashJoin" in plan)


def test_auto_band_seconds_tracks_median_interval(spark):
    from etl_from_s3_to_postgresql_template_spark.operators.rangejoin import (
        auto_band_seconds,
    )

    points, intervals = _frames(spark)
    # fixture intervals are hours-scale; the auto width must land on the
    # median length, floored at 60 s
    w = auto_band_seconds(intervals, "start_ts", "end_ts")
    lengths = sorted(
        (r.end_ts - r.start_ts).total_seconds() for r in intervals.collect()
    )
    assert w == max(60, int(lengths[len(lengths) // 2]))
    # band_seconds=None (auto) returns the same rows as any explicit width
    auto = sorted(
        (r.pid, r.iv)
        for r in interval_join(points, intervals, "ts", "start_ts", "end_ts").collect()
    )
    explicit = sorted(
        (r.pid, r.iv)
        for r in interval_join(
            points, intervals, "ts", "start_ts", "end_ts", 3600
        ).collect()
    )
    assert auto == explicit
