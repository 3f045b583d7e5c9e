"""Fixture-table registry: the TPC-H-ish star schema + extension tables.

One parquet file per table (TESTDATA.md). Columnar scans with pushdown and
pruning come free from the parquet source; at 100 TB these would be
partitioned/bucketed table paths instead of single files, and nothing here
changes except the path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

TABLES: tuple[str, ...] = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


_EVENTS_SCHEMA_CACHE: dict[str, T.StructType] = {}


def events_physical_schema(spark: SparkSession, sf_dir: str) -> T.StructType:
    """The physical schema of events.parquet, probed via a batch read.

    The generator has shipped ts as TIMESTAMP(NANOS) (read as long under
    nanosAsLong) and as TIMESTAMP(MICROS, isAdjustedToUTC=false) (read as
    TIMESTAMP_NTZ) at different times; streaming readers must declare the
    physical type, so probe once per sf_dir instead of hard-coding.
    """
    if sf_dir not in _EVENTS_SCHEMA_CACHE:
        # events.parquet may store TIMESTAMP(NANOS), which Spark's reader
        # rejects outright. Set the legacy conf on WHATEVER session we're
        # given (the driver harness builds its own, without our session.py
        # defaults — runtime-settable, so this is safe) and read nanos as
        # long.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        _EVENTS_SCHEMA_CACHE[sf_dir] = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    return _EVENTS_SCHEMA_CACHE[sf_dir]


def normalize_events_ts(df: DataFrame, for_streaming: bool = False) -> DataFrame:
    """Normalize events.ts off its physical type — ONE place for the
    branching so batch and streaming readers can't drift.

    nanos-as-long -> truncate to micros (identical to how DuckDB reads it).
    NTZ files: batch keeps TIMESTAMP_NTZ (what the driver oracle compared
    green in round 1); streaming casts to TIMESTAMP because event-time ops
    (watermark/window) require it — value-identical under the engine's
    pinned UTC session TZ.
    """
    if isinstance(df.schema["ts"].dataType, T.LongType):
        return df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    if for_streaming:
        return df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events":
        df = normalize_events_ts(df)
    return df


def load_tables(spark: SparkSession, sf_dir: str, *names: str) -> tuple[DataFrame, ...]:
    return tuple(load_table(spark, sf_dir, n) for n in (names or TABLES))


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every fixture table as a temp view for spark.sql queries."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
