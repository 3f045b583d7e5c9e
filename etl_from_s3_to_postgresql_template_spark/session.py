"""SparkSession factory with engine defaults.

Config derives from reference behavior (SURVEY.md §4.4):

- UTC session timezone — the reference pins UTC when parsing CLI dates
  (reference etl_pipeline.py:682,690), and the DuckDB oracle compares
  timestamps as UTC-naive.
- ANSI mode off — preserves the reference's coerce-to-null semantics for
  bad casts (reference etl_pipeline.py:438, ``errors='coerce'``).
- AQE on — runtime coalescing, skew-join splitting, broadcast demotion;
  this is the knob that lets the same plans survive a 100x scale-up.
- Dynamic partition overwrite — day-level idempotent re-runs (the
  reference append-only double-loads on re-run; we fix rather than copy).

At 100 TB the same session settings hold except ``shuffle.partitions``
(driven by AQE's advisory partition size) and executor sizing, which are
cluster-submit concerns, not code concerns.
"""

from __future__ import annotations

import os
from collections.abc import Mapping

from pyspark.sql import SparkSession

__all__ = ["get_spark", "s3a_conf"]


def s3a_conf(env: Mapping[str, str] | None = None) -> dict[str, str]:
    """Env-driven S3A endpoint seam, mirroring the ``JDBC_URL`` seam in
    sinks/base.py: point ``S3_ENDPOINT_URL`` at a MinIO-style object store
    and every ``s3a://`` read/write in the engine (ingest listing, parquet
    scans, sinks) runs against it UNMODIFIED — the container has no S3, so
    this is how the real S3A code path gets exercised. Uses the standard
    public names: ``S3_ENDPOINT_URL``, ``AWS_ACCESS_KEY_ID``,
    ``AWS_SECRET_ACCESS_KEY``; ``S3_PATH_STYLE_ACCESS`` defaults to true
    (MinIO's addressing) once an endpoint is set. Without
    ``S3_ENDPOINT_URL`` the dict is empty and AWS-default resolution
    (instance profile, region endpoints) applies untouched."""
    e = os.environ if env is None else env
    endpoint = e.get("S3_ENDPOINT_URL")
    if not endpoint:
        return {}
    conf = {
        "spark.hadoop.fs.s3a.endpoint": endpoint,
        "spark.hadoop.fs.s3a.path.style.access": e.get("S3_PATH_STYLE_ACCESS", "true"),
        "spark.hadoop.fs.s3a.connection.ssl.enabled": str(
            endpoint.startswith("https")
        ).lower(),
    }
    if e.get("AWS_ACCESS_KEY_ID"):
        conf["spark.hadoop.fs.s3a.access.key"] = e["AWS_ACCESS_KEY_ID"]
    if e.get("AWS_SECRET_ACCESS_KEY"):
        conf["spark.hadoop.fs.s3a.secret.key"] = e["AWS_SECRET_ACCESS_KEY"]
    return conf


def get_spark(
    app_name: str = "etl_from_s3_to_postgresql_template_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession with engine defaults.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` for local testing;
    on a real cluster, pass ``None`` with a cluster-configured
    ``spark-submit`` and the builder respects the submitted master.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    if master is None:
        master = os.environ.get("SPARK_MASTER", f"local[{cpus}]")
    if shuffle_partitions is None:
        shuffle_partitions = int(cpus)

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.ansi.enabled", "false")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.sources.partitionOverwriteMode", "dynamic")
        .config("spark.sql.parquet.aggregatePushdown", "true")
        # Fixture events.parquet stores TIMESTAMP(NANOS), which Spark's
        # vectorized reader rejects; read as long nanos and convert at the
        # source (sources/registry.py) — micro-truncation matches how
        # micro-resolution engines (and DuckDB) read the same file.
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "48g"))
    )
    for k, v in s3a_conf().items():
        builder = builder.config(k, v)
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
