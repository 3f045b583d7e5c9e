"""Measure JDBC sink throughput against embedded Derby (BASELINE.md row).

The reference's only published performance number is its PostgreSQL sink
throughput (~250 rows/s, ETL.png). This benchmark turns our JDBC write path
from projection into measurement: a 1M-row day-shaped DataFrame (the shape
process_day hands to Sink.write_day: mixed long/double/string + provenance
+ metadata columns) written through sinks/base.JdbcSink into an embedded
Derby database on local disk.

Derby is slower than PostgreSQL (embedded, single JVM, no
reWriteBatchedInserts) — treat the number as a conservative floor for the
write path mechanics, not a PG projection.

Usage: python tools/bench_jdbc.py [n_rows]
Prints one JSON line: {"metric": "jdbc_sink_rows_per_s", ...}
"""

from __future__ import annotations

import json
import shutil
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from etl_from_s3_to_postgresql_template_spark.session import get_spark
from etl_from_s3_to_postgresql_template_spark.sinks.base import JdbcSink, jdbc_target_from_env


def day_shaped_df(spark, n_rows: int):
    """The frame process_day produces: data columns + provenance + audit
    metadata, built distributed (range -> projections, no driver data)."""
    return (
        spark.range(0, n_rows, 1, 32)
        .select(
            F.col("id"),
            (F.col("id") % 1000).alias("store_id"),
            (F.rand(42) * 100).alias("amount"),
            F.concat(F.lit("cat_"), (F.col("id") % 17).cast("string")).alias("category"),
            F.timestamp_seconds(F.lit(1738540800) + F.col("id") % 86400).alias("event_time"),
            F.concat(F.lit("data_2025-02-03_part"), (F.col("id") % 8).cast("string"), F.lit(".csv")).alias(
                "source_file"
            ),
            F.current_timestamp().alias("processed_date"),
            F.lit("2025-02-03").cast("timestamp").alias("source_date"),
            F.lit(8).alias("files_merged_count"),
        )
    )


def main() -> None:
    n_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    spark = get_spark("bench-jdbc")
    tmp = tempfile.mkdtemp(prefix="bench_derby_")
    # JDBC_URL env (+JDBC_USER/JDBC_PASSWORD) retargets this benchmark at a
    # real PostgreSQL unmodified; default stays embedded Derby.
    url, props = jdbc_target_from_env(f"jdbc:derby:{tmp}/db;create=true")
    sink = JdbcSink(url=url, table_name="bench_day", properties=props)
    df = day_shaped_df(spark, n_rows)
    df.count()  # materialize plan & warm codegen outside the timed region

    t0 = time.perf_counter()
    sink.write_day(df, "2025-02-03")
    wall = time.perf_counter() - t0

    reader = spark.read.format("jdbc").option("url", url).option("dbtable", "bench_day")
    for k, v in props.items():
        reader = reader.option(k, v)
    back = reader.load().count()
    assert back == n_rows, (back, n_rows)
    shutil.rmtree(tmp, ignore_errors=True)
    print(
        json.dumps(
            {
                "metric": "jdbc_sink_rows_per_s",
                "value": round(n_rows / wall),
                "unit": "rows/s",
                "rows": n_rows,
                "wall_s": round(wall, 2),
                "db": "embedded-derby",
                "batchsize": sink.batchsize,
                "num_partitions": sink.num_partitions,
            }
        )
    )


if __name__ == "__main__":
    main()
