"""SQL frontend: the engine's tables work through plain ``spark.sql`` too —
register_views + an ANSI query must equal the DataFrame-API plan. A user of
the reference switching to this engine can bring raw SQL, not just the
Python API."""

from __future__ import annotations

from etl_from_s3_to_postgresql_template_spark.plans import QUERIES
from etl_from_s3_to_postgresql_template_spark.sources.registry import register_views

SF = "/root/testdata/sf0.001"


def test_spark_sql_q1_equals_dataframe_q1(spark):
    register_views(spark, SF)
    got = spark.sql(
        """
        SELECT l_returnflag, l_linestatus,
               CAST(ROUND(SUM(CAST(l_quantity AS DECIMAL(18,6))), 2) AS DOUBLE) AS sum_qty,
               COUNT(*) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
        GROUP BY l_returnflag, l_linestatus
        ORDER BY l_returnflag, l_linestatus
        """
    ).collect()
    want = {
        (r["l_returnflag"], r["l_linestatus"]): (r["sum_qty"], r["count_order"])
        for r in QUERIES["q1_pricing_summary"](spark, SF).collect()
    }
    assert got
    for r in got:
        w = want[(r["l_returnflag"], r["l_linestatus"])]
        assert (r["sum_qty"], r["count_order"]) == w


def test_spark_sql_join_over_views(spark):
    register_views(spark, SF)
    rows = spark.sql(
        """
        SELECT r.r_name, COUNT(*) AS n_nations
        FROM nation n JOIN region r ON n.n_regionkey = r.r_regionkey
        GROUP BY r.r_name ORDER BY r.r_name
        """
    ).collect()
    assert len(rows) == 5
    assert sum(r["n_nations"] for r in rows) == 25
