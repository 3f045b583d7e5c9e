"""Watermark late-data semantics: append-mode windows drop events that
arrive after the watermark has passed their window."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F


def _write_events(path, rows, spark):
    spark.createDataFrame(rows, "event_id long, ts timestamp, value double").write.mode(
        "append"
    ).parquet(path)


def test_append_mode_drops_late_events(spark, tmp_path):
    src = str(tmp_path / "stream_src")
    ckpt = str(tmp_path / "ckpt")
    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)

    # batch 1: events up to 01:30 -> watermark advances to 01:20 (10 min lag)
    _write_events(src, [(1, t0 + dt.timedelta(minutes=5), 1.0),
                        (2, t0 + dt.timedelta(minutes=90), 1.0)], spark)

    stream = (
        spark.readStream.schema("event_id long, ts timestamp, value double")
        .parquet(src)
        .withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "1 hour").alias("w"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.date_format("w.start", "HH:mm").alias("w_start"), "n")
    )

    out = str(tmp_path / "out")

    def run_pass():
        q = (
            stream.writeStream.outputMode("append")
            .format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    run_pass()

    # batch 2: a LATE event for the already-closed 00:00 window, plus a
    # fresh one; resume from the same checkpoint
    _write_events(src, [(3, t0 + dt.timedelta(minutes=10), 1.0),
                        (4, t0 + dt.timedelta(minutes=150), 1.0)], spark)
    run_pass()

    emitted = {}
    for r in spark.read.parquet(out).collect():
        emitted[r["w_start"]] = emitted.get(r["w_start"], 0) + r["n"]
    # the 00:00 window was finalized with ONLY event 1 — the late event 3
    # (ts 00:10, behind the 01:20 watermark) was dropped, not double-counted
    assert emitted.get("00:00") == 1
