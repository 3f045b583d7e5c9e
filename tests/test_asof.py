"""As-of join vs pandas merge_asof ground truth."""

from __future__ import annotations

import datetime as dt

import pandas as pd
from pyspark.sql import Row

from etl_from_s3_to_postgresql_template_spark.operators.asof import asof_join, asof_join_grouped


def _ts(s):
    return dt.datetime.fromisoformat(s)


LEFT = [
    Row(lid=1, key=1, lts=_ts("2024-01-01 10:00:00")),
    Row(lid=2, key=1, lts=_ts("2024-01-01 12:00:00")),
    Row(lid=3, key=2, lts=_ts("2024-01-01 09:00:00")),
    Row(lid=4, key=3, lts=_ts("2024-01-01 09:00:00")),  # key with no right rows
]
RIGHT = [
    Row(rid=10, rkey=1, rts=_ts("2024-01-01 09:30:00")),
    Row(rid=11, rkey=1, rts=_ts("2024-01-01 11:30:00")),
    Row(rid=12, rkey=2, rts=_ts("2024-01-01 10:00:00")),  # after left -> no match
]


def test_asof_join_window_strategy(spark):
    left = spark.createDataFrame(LEFT)
    right = spark.createDataFrame(RIGHT)
    out = asof_join(
        left, right, left_on="lts", right_on="rts",
        left_by="key", right_by="rkey", right_tiebreak="rid", left_id="lid",
    )
    by = {r["lid"]: r for r in out.collect()}
    assert by[1]["rid"] == 10
    assert by[2]["rid"] == 11
    assert by[3]["rid"] is None  # right row is after left ts
    assert by[4]["rid"] is None  # no right rows for key


def test_asof_join_grouped_matches_window_strategy(spark):
    left = spark.createDataFrame(LEFT).withColumnRenamed("key", "k")
    right = spark.createDataFrame(RIGHT).withColumnRenamed("rkey", "k")
    out = asof_join_grouped(left, right, left_on="lts", right_on="rts", by="k")
    by_lid = {r["lid"]: r["rid"] for r in out.collect()}
    assert by_lid == {1: 10, 2: 11, 3: None, 4: None}


def test_asof_join_matches_pandas(spark):
    lpdf = pd.DataFrame([r.asDict() for r in LEFT]).sort_values("lts")
    rpdf = pd.DataFrame([r.asDict() for r in RIGHT]).sort_values("rts")
    expected = pd.merge_asof(
        lpdf, rpdf, left_on="lts", right_on="rts", left_by="key", right_by="rkey"
    ).set_index("lid")["rid"]
    out = asof_join(
        spark.createDataFrame(LEFT), spark.createDataFrame(RIGHT),
        left_on="lts", right_on="rts", left_by="key", right_by="rkey",
        right_tiebreak="rid", left_id="lid",
    )
    got = {r["lid"]: r["rid"] for r in out.collect()}
    for lid, want in expected.items():
        assert got[lid] == (None if pd.isna(want) else want)


def test_asof_join_forward_matches_pandas(spark):
    lpdf = pd.DataFrame([r.asDict() for r in LEFT]).sort_values("lts")
    rpdf = pd.DataFrame([r.asDict() for r in RIGHT]).sort_values("rts")
    expected = pd.merge_asof(
        lpdf, rpdf, left_on="lts", right_on="rts", left_by="key", right_by="rkey",
        direction="forward",
    ).set_index("lid")["rid"]
    out = asof_join(
        spark.createDataFrame(LEFT), spark.createDataFrame(RIGHT),
        left_on="lts", right_on="rts", left_by="key", right_by="rkey",
        right_tiebreak="rid", left_id="lid", direction="forward",
    )
    got = {r["lid"]: r["rid"] for r in out.collect()}
    for lid, want in expected.items():
        assert got[lid] == (None if pd.isna(want) else want)


def test_asof_join_nearest_matches_pandas(spark):
    lpdf = pd.DataFrame([r.asDict() for r in LEFT]).sort_values("lts")
    rpdf = pd.DataFrame([r.asDict() for r in RIGHT]).sort_values("rts")
    expected = pd.merge_asof(
        lpdf, rpdf, left_on="lts", right_on="rts", left_by="key", right_by="rkey",
        direction="nearest",
    ).set_index("lid")["rid"]
    out = asof_join(
        spark.createDataFrame(LEFT), spark.createDataFrame(RIGHT),
        left_on="lts", right_on="rts", left_by="key", right_by="rkey",
        right_tiebreak="rid", left_id="lid", direction="nearest",
    )
    got = {r["lid"]: r["rid"] for r in out.collect()}
    for lid, want in expected.items():
        assert got[lid] == (None if pd.isna(want) else want)


def test_asof_join_forward_equals_grouped_forward(spark):
    left = spark.createDataFrame(LEFT).withColumnRenamed("key", "k")
    right = spark.createDataFrame(RIGHT).withColumnRenamed("rkey", "k")
    grouped = asof_join_grouped(
        left, right, left_on="lts", right_on="rts", by="k", direction="forward"
    )
    by_lid = {r["lid"]: r["rid"] for r in grouped.collect()}
    window = asof_join(
        spark.createDataFrame(LEFT), spark.createDataFrame(RIGHT),
        left_on="lts", right_on="rts", left_by="key", right_by="rkey",
        right_tiebreak="rid", left_id="lid", direction="forward",
    )
    assert by_lid == {r["lid"]: r["rid"] for r in window.collect()}


def test_asof_join_rejects_unknown_direction(spark):
    import pytest

    with pytest.raises(ValueError, match="direction"):
        asof_join(
            spark.createDataFrame(LEFT), spark.createDataFrame(RIGHT),
            left_on="lts", right_on="rts", direction="sideways",
        )
