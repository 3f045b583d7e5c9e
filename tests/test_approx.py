"""Approximate-aggregate error bounds vs exact (sketches aren't oracle-hashable)."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_from_s3_to_postgresql_template_spark.plans import QUERIES
from etl_from_s3_to_postgresql_template_spark.sources.registry import load_table

SF = "/root/testdata/sf0.001"


def test_approx_sketches_within_tolerance(spark):
    approx = {r["l_returnflag"]: r for r in QUERIES["agg_approx_sketches"](spark, SF).collect()}
    li = load_table(spark, SF, "lineitem")
    exact = {
        r["l_returnflag"]: r
        for r in li.groupBy("l_returnflag")
        .agg(
            F.countDistinct("l_orderkey").alias("orders"),
            F.expr("percentile(l_extendedprice, 0.5)").alias("median_price"),
        )
        .collect()
    }
    for k, e in exact.items():
        a = approx[k]
        assert abs(a["approx_orders"] - e["orders"]) / e["orders"] < 0.05
        assert abs(a["approx_median_price"] - e["median_price"]) / e["median_price"] < 0.05
