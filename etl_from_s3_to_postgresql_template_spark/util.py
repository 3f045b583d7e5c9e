"""Small shared utilities with no operator semantics of their own."""

from __future__ import annotations

from pyspark.sql import DataFrame

__all__ = ["spread_partitions"]


def spread_partitions(df: DataFrame) -> DataFrame:
    """Ensure ``df`` has at least ``defaultParallelism`` partitions.

    CPU-bound per-row transforms (shingle hashing, pandas UDF signatures)
    inherit the source's split count; a table that happens to live in one
    parquet file would otherwise run them in ONE task — measured 4x the
    whole-query wall time for MinHash at sf0.1. On a cluster reading a
    many-split table this is a no-op (partitions >= parallelism already),
    so it costs nothing at scale and removes the file-layout dependence
    locally. Round-robin repartition: no key, no skew.
    """
    parallelism = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < parallelism:
        return df.repartition(parallelism)
    return df
