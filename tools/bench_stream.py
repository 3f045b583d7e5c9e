"""Streaming scale evidence: sustained throughput + state-store growth.

The batch side has 10x/100x sweeps (bench_scale.py, bench_docs_dedup.py);
this is the streaming counterpart. It drives the engine's canonical
unbounded ingest shape — deterministic rate source behind the events
contract (streaming/ingest.py::stream_events_rate) -> watermarked
tumbling-window aggregate -> foreachBatch parquet sink — at two volumes
and reports, per volume:

- sustained rows/s (total input rows / total trigger-execution time,
  excluding the first warm-up batch: JIT + state-store init);
- state rows per batch (stateOperators.numRowsTotal): with a watermark,
  open windows are BOUNDED (windows close as event time advances and the
  watermark evicts them), so this must PLATEAU, not grow — the number
  that decides whether a stream survives week-long uptime;
- state memory at the plateau.

Backpressure note: the rate-micro-batch source delivers exactly
rowsPerBatch per trigger, so "volume" here is batch size, not arrival
pressure. On the Kafka path the same experiment is bounded by
maxOffsetsPerTrigger — set it to (target batch seconds) x (measured
rows/s from this tool) so trigger time stays under the trigger interval;
AQE-style runtime re-planning does not exist in micro-batch sinks, the
cap IS the backpressure mechanism.

Usage: python tools/bench_stream.py [small_rows_per_batch] [factor] [n_batches]
Prints one JSON line per volume plus a summary ratio line.
"""

from __future__ import annotations

import json
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from etl_from_s3_to_postgresql_template_spark.session import get_spark
from etl_from_s3_to_postgresql_template_spark.streaming.ingest import stream_events_rate


def run_volume(spark, rows_per_batch: int, n_batches: int) -> dict:
    events = stream_events_rate(spark, rows_per_batch=rows_per_batch)
    agg = (
        events.withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "5 minutes").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("total_value"))
    )
    sink_dir = tempfile.mkdtemp(prefix="bench_stream_")
    ckpt = tempfile.mkdtemp(prefix="bench_stream_ckpt_")

    def land(batch_df, batch_id):
        (
            batch_df.select(
                F.col("w.start").alias("w_start"), "event_type", "n", "total_value"
            ).write.mode("append").parquet(sink_dir)
        )

    q = (
        agg.writeStream.outputMode("update")
        .foreachBatch(land)
        .option("checkpointLocation", ckpt)
        .trigger(processingTime="0 seconds")
        .start()
    )
    seen = 0
    t0 = time.time()
    while seen < n_batches and time.time() - t0 < 600:
        time.sleep(0.5)
        seen = len([p for p in q.recentProgress if p["numInputRows"] > 0])
    progress = [p for p in q.recentProgress if p["numInputRows"] > 0][:n_batches]
    q.stop()

    rows = sum(p["numInputRows"] for p in progress[1:])
    exec_ms = sum(p["durationMs"]["triggerExecution"] for p in progress[1:])
    state_rows = [p["stateOperators"][0]["numRowsTotal"] for p in progress]
    state_mem = progress[-1]["stateOperators"][0]["memoryUsedBytes"]
    return {
        "rows_per_batch": rows_per_batch,
        "batches_measured": len(progress) - 1,
        "rows_per_sec": round(rows / (exec_ms / 1000.0)),
        "state_rows_per_batch": state_rows,
        "state_rows_final": state_rows[-1],
        "state_plateaued": len(set(state_rows[len(state_rows) // 2 :])) <= 2,
        "state_memory_bytes": state_mem,
    }


def main() -> None:
    small = int(sys.argv[1]) if len(sys.argv) > 1 else 50_000
    factor = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    n_batches = int(sys.argv[3]) if len(sys.argv) > 3 else 12
    spark = get_spark("bench-stream")
    out = {}
    for label, v in (("small", small), ("big", small * factor)):
        out[label] = run_volume(spark, v, n_batches)
        print(json.dumps({label: out[label]}), flush=True)
    ratio = round(out["small"]["rows_per_sec"] / out["big"]["rows_per_sec"], 3)
    print(
        json.dumps(
            {
                "volume_factor": factor,
                "throughput_small_over_big": ratio,
                "note": "ratio < 1 means bigger batches amortize per-trigger overhead",
            }
        ),
        flush=True,
    )


if __name__ == "__main__":
    main()
