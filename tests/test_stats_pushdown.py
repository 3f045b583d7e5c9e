"""Footer-stats aggregate pushdown (operators/stats.py): the plan must be
answered from parquet metadata, match a full-scan recompute exactly, and
never leak the V2-source conf into the session."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_from_s3_to_postgresql_template_spark.operators.stats import footer_stats

SF = "/root/testdata/sf0.001"


def test_pushed_stats_match_full_scan(spark):
    row = footer_stats(
        spark, f"{SF}/orders.parquet", ["o_orderkey", "o_custkey"], require_pushed=True
    )
    full = (
        spark.read.parquet(f"{SF}/orders.parquet")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min("o_orderkey").alias("min_o_orderkey"),
            F.max("o_orderkey").alias("max_o_orderkey"),
            F.min("o_custkey").alias("min_o_custkey"),
            F.max("o_custkey").alias("max_o_custkey"),
        )
        .collect()[0]
    )
    assert row.asDict() == full.asDict()


def test_conf_scope_restored(spark):
    before_v1 = spark.conf.get("spark.sql.sources.useV1SourceList", None)
    before_push = spark.conf.get("spark.sql.parquet.aggregatePushdown", None)
    footer_stats(spark, f"{SF}/customer.parquet", ["c_custkey"], require_pushed=True)
    assert spark.conf.get("spark.sql.sources.useV1SourceList", None) == before_v1
    assert spark.conf.get("spark.sql.parquet.aggregatePushdown", None) == before_push
    # V1 source still in effect for normal reads (FileScan, not BatchScan)
    plan = (
        spark.read.parquet(f"{SF}/customer.parquet")
        ._jdf.queryExecution()
        .explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("simple")
        )
    )
    assert "FileScan" in plan


def test_rowgroup_stats_match_duckdb_metadata(spark):
    """The executor-side pyarrow footer read must agree with DuckDB's
    parquet_metadata() on every (row_group, column) stat — the oracle
    pairing for scan_rowgroup_stats, run here because the driver's oracle
    contract can't pass file paths into SQL."""
    import duckdb

    from etl_from_s3_to_postgresql_template_spark.operators.stats import (
        parquet_rowgroup_stats,
    )

    paths = [f"{SF}/orders.parquet", f"{SF}/customer.parquet"]
    got = sorted(map(tuple, parquet_rowgroup_stats(spark, paths).collect()))
    want = sorted(
        map(
            tuple,
            duckdb.sql(
                f"""SELECT file_name, CAST(row_group_id AS BIGINT), path_in_schema,
                           CAST(num_values AS BIGINT),
                           stats_min_value, stats_max_value
                    FROM parquet_metadata(['{paths[0]}', '{paths[1]}'])"""
            ).fetchall(),
        )
    )
    assert got == want


def test_python_datasource_partition_planning(spark):
    """The custom Python source must split into the requested number of
    independent partitions (no single-task read) and respect options."""
    from etl_from_s3_to_postgresql_template_spark.sources.pyds import (
        SyntheticEventsDataSource,
    )

    try:
        spark.dataSource.register(SyntheticEventsDataSource)
    except Exception:
        pass
    df = (
        spark.read.format("synthetic_events")
        .option("n_rows", 1000)
        .option("partitions", 4)
        .load()
    )
    assert df.rdd.getNumPartitions() == 4
    assert df.count() == 1000
    assert df.select("event_id").distinct().count() == 1000  # disjoint slices
