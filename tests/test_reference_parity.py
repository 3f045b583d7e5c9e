"""Behavioral parity with the reference's date extraction.

``fixtures_reference_dates.json`` was produced by RUNNING the reference's
``extract_date_from_filename`` (under UTC) over a 446-case battery —
every pattern family, invalid dates/times, ambiguous and no-date names —
and baking its outputs as data. Our Column cascade must reproduce every
case in both string and datetime modes.
"""

from __future__ import annotations

import datetime as dt
import json
import os

from pyspark.sql import Row

from etl_from_s3_to_postgresql_template_spark.functions.dates import (
    extract_date_str_col,
    extract_datetime_col,
)

FIXTURE = os.path.join(os.path.dirname(__file__), "fixtures_reference_dates.json")


def test_cascade_matches_reference_on_battery(spark):
    cases = json.load(open(FIXTURE))
    df = spark.createDataFrame([Row(fn=c["filename"]) for c in cases])
    got = {
        r["fn"]: (r["s"], r["ts"])
        for r in df.select(
            "fn",
            extract_date_str_col("fn").alias("s"),
            extract_datetime_col("fn").alias("ts"),
        ).collect()
    }
    mismatches = []
    for c in cases:
        want_s = c["string"]
        want_ts = dt.datetime.fromisoformat(c["datetime"]) if c["datetime"] else None
        gs, gts = got[c["filename"]]
        if gs != want_s or gts != want_ts:
            mismatches.append((c["filename"], (gs, gts), (want_s, want_ts)))
    assert not mismatches, f"{len(mismatches)} mismatches, first 5: {mismatches[:5]}"
