"""Bucketed co-located join: pre-bucketed tables join with ZERO exchange.

This is the 100 TB fact-to-fact join strategy (SCALING.md): pay the shuffle
once at write time, then every subsequent join on the bucket key is
shuffle-free. Demonstrated end-to-end against a session-local warehouse.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_from_s3_to_postgresql_template_spark.sources.registry import load_table

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def bucketed(spark):
    # warehouse.dir is a static conf — bucketed tables land in the default
    # ./spark-warehouse (gitignored); dropped after the module.
    li = load_table(spark, SF, "lineitem").select("l_orderkey", "l_quantity", "l_extendedprice")
    o = load_table(spark, SF, "orders").select("o_orderkey", "o_custkey", "o_totalprice")
    spark.sql("DROP TABLE IF EXISTS li_bucketed")
    spark.sql("DROP TABLE IF EXISTS o_bucketed")
    li.write.bucketBy(8, "l_orderkey").sortBy("l_orderkey").saveAsTable("li_bucketed")
    o.write.bucketBy(8, "o_orderkey").sortBy("o_orderkey").saveAsTable("o_bucketed")
    yield spark
    spark.sql("DROP TABLE IF EXISTS li_bucketed")
    spark.sql("DROP TABLE IF EXISTS o_bucketed")


def test_bucketed_join_has_no_shuffle(bucketed):
    spark = bucketed
    # at fixture scale AQE would broadcast (bypassing buckets); disable it
    # so the plan shows what happens when BOTH sides are too big to ship —
    # the exact situation bucketing exists for
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = spark.table("li_bucketed").join(
            spark.table("o_bucketed"), F.col("l_orderkey") == F.col("o_orderkey")
        )
        plan = j._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
        )
        assert "SortMergeJoin" in plan
        assert "Bucketed: true" in plan  # both scans read bucket layout
        # no repartition of either side before the join
        assert "Exchange hashpartitioning(l_orderkey" not in plan
        assert "Exchange hashpartitioning(o_orderkey" not in plan
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")


def test_bucketed_join_results_match_plain(bucketed):
    spark = bucketed
    li = load_table(spark, SF, "lineitem")
    o = load_table(spark, SF, "orders")
    want = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum(F.col("l_quantity").cast("decimal(18,6)")), 2).alias("q"))
        .collect()[0]
    )
    got = (
        spark.table("li_bucketed")
        .join(spark.table("o_bucketed"), F.col("l_orderkey") == F.col("o_orderkey"))
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum(F.col("l_quantity").cast("decimal(18,6)")), 2).alias("q"))
        .collect()[0]
    )
    assert (got["n"], got["q"]) == (want["n"], want["q"])
