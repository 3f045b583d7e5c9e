"""Measure full process_day ingest throughput (BASELINE.md rows).

Reproduces the workload behind the BASELINE.md ingest head-to-head: one
synthetic day of 40 CSV/CSV.gz files, 1M rows total, full process_day
(LIST -> filename-date prune -> scan -> clean/union/epoch->ts/metadata ->
empty-column drop -> exact dedup -> day-partitioned parquet + audit row),
local[32]. Runs BOTH schema modes so the inference tax is a measurement:

- inferred: per-header-group inferSchema pass (reference parity)
- explicit: PipelineConfig.schema StructType (production mode)

Usage: python tools/bench_ingest.py [n_rows] [n_files]
Prints one JSON line per mode.
"""

from __future__ import annotations

import gzip
import json
import shutil
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import types as T

from etl_from_s3_to_postgresql_template_spark.pipeline import PipelineConfig, process_day
from etl_from_s3_to_postgresql_template_spark.session import get_spark
from etl_from_s3_to_postgresql_template_spark.sinks import ParquetSink

HEADER = "id,store_id,amount,category,event_epoch"


def make_day(src: str, n_rows: int, n_files: int) -> None:
    rows_per_file = n_rows // n_files
    for f in range(n_files):
        name = f"{src}/data_2025-02-03_part{f:03d}.csv" + (".gz" if f % 4 == 0 else "")
        base = f * rows_per_file
        lines = [HEADER]
        lines += [
            f"{base + i},{(base + i) % 1000},{((base + i) % 9973) / 100.0},cat_{(base + i) % 17},{1738540800 + (base + i) % 86400}"
            for i in range(rows_per_file)
        ]
        body = "\n".join(lines) + "\n"
        if name.endswith(".gz"):
            with gzip.open(name, "wt") as fh:
                fh.write(body)
        else:
            with open(name, "w") as fh:
                fh.write(body)


EXPLICIT = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("store_id", T.LongType()),
        T.StructField("amount", T.DoubleType()),
        T.StructField("category", T.StringType()),
        T.StructField("event_epoch", T.LongType()),
    ]
)


def main() -> None:
    n_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    n_files = int(sys.argv[2]) if len(sys.argv) > 2 else 40
    spark = get_spark("bench-ingest")
    src = tempfile.mkdtemp(prefix="bench_ingest_src_")
    make_day(src, n_rows, n_files)
    try:
        # Untimed warmup pass (same protocol as bench.py): the first
        # process_day on a cold JVM measures codegen/classloading, not the
        # pipeline — a long-running cluster job sees the steady state.
        warm = tempfile.mkdtemp(prefix="bench_ingest_warm_")
        process_day(
            spark,
            PipelineConfig(source_dir=src, epoch_columns=("event_epoch",)),
            "2025-02-03",
            ParquetSink(warm),
        )
        shutil.rmtree(warm, ignore_errors=True)
        for mode, schema in (("inferred", None), ("explicit", EXPLICIT)):
            cfg = PipelineConfig(
                source_dir=src, epoch_columns=("event_epoch",), schema=schema
            )
            walls = []
            for _ in range(3):
                lake = tempfile.mkdtemp(prefix=f"bench_ingest_lake_{mode}_")
                t0 = time.perf_counter()
                res = process_day(spark, cfg, "2025-02-03", ParquetSink(lake))
                walls.append(time.perf_counter() - t0)
                assert res.ok and res.total_rows == n_rows, res
                shutil.rmtree(lake, ignore_errors=True)
            wall = min(walls)  # best-of-3: least co-tenant noise
            print(
                json.dumps(
                    {
                        "metric": f"ingest_rows_per_s_{mode}",
                        "value": round(n_rows / wall),
                        "unit": "rows/s",
                        "rows": n_rows,
                        "files": n_files,
                        "wall_s": round(wall, 2),
                        "walls": [round(w, 2) for w in walls],
                    }
                )
            )
    finally:
        shutil.rmtree(src, ignore_errors=True)


if __name__ == "__main__":
    main()
