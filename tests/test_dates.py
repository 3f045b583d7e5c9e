"""Table-driven tests for the filename-date extraction cascade.

Mirrors the reference's semantics (etl_pipeline.py:27-213): README example
filenames (README.md:85-92), precedence shadowing, invalid-date skip, and
the date_range no-'date' quirk.
"""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from etl_from_s3_to_postgresql_template_spark.functions.dates import (
    CUSTOM_PATTERNS,
    extract_all_dates_col,
    extract_date_col,
    extract_date_range_col,
    extract_date_str_col,
    extract_datetime_col,
)

# (filename, expected string-mode, expected datetime-mode)
CASES = [
    # README.md:85-92 examples
    ("data_2025-02-03T030000_export.csv.gz", "2025-02-03", dt.datetime(2025, 2, 3, 3, 0, 0)),
    ("sales_2025-02-03.csv", "2025-02-03", dt.datetime(2025, 2, 3)),
    ("backup_02-03-2025_120000.sql", "2025-02-03", dt.datetime(2025, 2, 3, 12, 0, 0)),
    ("report_20250203.xlsx", "2025-02-03", dt.datetime(2025, 2, 3)),
    ("logs_2025_02_03.txt", "2025-02-03", dt.datetime(2025, 2, 3)),
    ("analytics.2025.02.03.json", "2025-02-03", dt.datetime(2025, 2, 3)),
    # iso_datetime_full
    ("x_2025-02-03T03:00:00.csv", "2025-02-03", dt.datetime(2025, 2, 3, 3, 0, 0)),
    # us_date without time
    ("f_02-03-2025.csv", "2025-02-03", dt.datetime(2025, 2, 3)),
    # year_month: string mode is 'YYYY-MM' (reference parity), date = first of month
    ("monthly_2025-02.csv", "2025-02", dt.datetime(2025, 2, 1)),
    # unix timestamp (UTC): 1706918400 = 2024-02-03 00:00:00 UTC
    ("timestamp_1706918400.csv", "2024-02-03", dt.datetime(2024, 2, 3, 0, 0, 0)),
    # date_range contains an iso_date -> iso_date wins (reference precedence)
    ("span_2025-02-03_to_2025-02-10.csv", "2025-02-03", dt.datetime(2025, 2, 3)),
    # no date at all
    ("notes.txt", None, None),
    # invalid iso date (month 13) -> strptime-raise equivalent -> skipped;
    # no other pattern matches
    ("bad_2025-13-45.csv", None, None),
    # compact_date candidate '17069184' is invalid (month 91) -> skipped,
    # unix_timestamp matches later in the cascade
    ("timestamp_1706918400", "2024-02-03", dt.datetime(2024, 2, 3)),
    # precedence: iso_datetime_compact shadows iso_date
    ("a_2025-02-03T030000_and_2025-09-09.csv", "2025-02-03", dt.datetime(2025, 2, 3, 3, 0)),
]


def test_extraction_cascade(spark):
    df = spark.createDataFrame([Row(fn=fn) for fn, _, _ in CASES])
    out = (
        df.select(
            "fn",
            extract_date_str_col("fn").alias("s"),
            extract_datetime_col("fn").alias("ts"),
        )
        .collect()
    )
    got = {r["fn"]: (r["s"], r["ts"]) for r in out}
    for fn, want_s, want_ts in CASES:
        assert got[fn][0] == want_s, f"{fn}: string mode {got[fn][0]!r} != {want_s!r}"
        assert got[fn][1] == want_ts, f"{fn}: datetime mode {got[fn][1]!r} != {want_ts!r}"


def test_date_mode_returns_date_type(spark):
    df = spark.createDataFrame([Row(fn="sales_2025-02-03.csv")])
    r = df.select(extract_date_col("fn").alias("d")).collect()[0]
    assert r["d"] == dt.date(2025, 2, 3)


def test_all_dates_struct(spark):
    df = spark.createDataFrame([Row(fn="span_2025-02-03_to_2025-02-10.csv")])
    r = df.select(extract_all_dates_col("fn").alias("all")).collect()[0]["all"]
    assert r["iso_date"] == "2025-02-03"
    assert r["date_range"] is None  # date_range stores no 'date' (reference parity)
    assert r["compact_date"] is None


def test_date_range_struct(spark):
    df = spark.createDataFrame([Row(fn="span_2025-02-03_to_2025-02-10.csv"), Row(fn="plain.csv")])
    rows = df.select("fn", extract_date_range_col("fn").alias("r")).collect()
    by = {r["fn"]: r["r"] for r in rows}
    assert by["span_2025-02-03_to_2025-02-10.csv"]["start_date"] == dt.date(2025, 2, 3)
    assert by["span_2025-02-03_to_2025-02-10.csv"]["end_date"] == dt.date(2025, 2, 10)
    assert by["plain.csv"]["start_date"] is None


def test_custom_patterns(spark):
    df = spark.createDataFrame(
        [
            Row(fn="sales_2025-02-03_daily.csv"),
            Row(fn="app_20250203_031500.log"),
            Row(fn="backup_2025_02_03_12_00_00.sql"),
        ]
    )
    rows = df.select("fn", extract_datetime_col("fn", CUSTOM_PATTERNS).alias("ts")).collect()
    by = {r["fn"]: r["ts"] for r in rows}
    assert by["sales_2025-02-03_daily.csv"] == dt.datetime(2025, 2, 3)
    assert by["app_20250203_031500.log"] == dt.datetime(2025, 2, 3, 3, 15, 0)
    assert by["backup_2025_02_03_12_00_00.sql"] == dt.datetime(2025, 2, 3)


def test_invalid_time_component_skipped(spark):
    # 256161 is an invalid HHmmss -> iso_datetime_compact must be skipped,
    # iso_date (same text) still matches.
    df = spark.createDataFrame([Row(fn="x_2025-02-03T256161.csv")])
    r = df.select(extract_date_str_col("fn").alias("s")).collect()[0]
    assert r["s"] == "2025-02-03"
