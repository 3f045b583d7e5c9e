"""Round-3 (second wave) additions: physical-layout analytics and the
remaining window-function surface.

Theme: at 100 TB the dominant cost is the SCAN, and the two levers a lake
engine has are (a) file-level zone maps (min/max skipping) and (b)
multi-dimensional clustering (Z-order) so those zone maps stay tight on
more than one column. Neither needs a new execution primitive — both are
plain aggregations over a layout key — so they are expressed as ordinary
DataFrame plans with DuckDB oracle twins, and the "skip estimate" output
is the number a table-maintenance job would use to decide whether a
rewrite pays for itself.

All arithmetic here is integer or DECIMAL-accumulated (plans/money.py
discipline), so every query is cross-engine hash-exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from etl_from_s3_to_postgresql_template_spark.plans.money import _dsum
from etl_from_s3_to_postgresql_template_spark.plans.registry import query
from etl_from_s3_to_postgresql_template_spark.sources.registry import load_table

__all__ = [
    "window_rank_suite",
    "events_tiered_rollup",
    "events_zone_map_skip",
    "events_zorder_layout",
]


@query(
    "window_rank_suite",
    oracle="""
    SELECT o_orderkey, o_orderpriority,
           percent_rank() OVER w AS pct_rank,
           cume_dist() OVER w AS cume,
           nth_value(o_totalprice, 2) OVER w AS second_price,
           CAST(ntile(4) OVER w AS INTEGER) AS quartile
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1995-01-01'
      AND o_orderdate < TIMESTAMP '1995-04-01'
    WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice, o_orderkey)
    ORDER BY o_orderpriority, o_totalprice, o_orderkey
    """,
)
def window_rank_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.8 completion: the rank-family window functions not yet covered by
    the registry (percent_rank / cume_dist / nth_value / ntile in one
    window). Ordering includes the unique o_orderkey so every function is
    deterministic; percent_rank and cume_dist are exact rationals evaluated
    with one double division in both engines, so the hashes match without
    rounding. One shuffle on the partition key — Catalyst evaluates all
    four functions in a single Window physical node (one sort, one pass)."""
    orders = load_table(spark, sf_dir, "orders")
    w = W.partitionBy("o_orderpriority").orderBy("o_totalprice", "o_orderkey")
    return (
        orders.where(
            (F.col("o_orderdate") >= F.lit("1995-01-01").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("1995-04-01").cast("timestamp"))
        )
        .select(
            "o_orderkey",
            "o_orderpriority",
            F.percent_rank().over(w).alias("pct_rank"),
            F.cume_dist().over(w).alias("cume"),
            F.nth_value("o_totalprice", 2).over(w).alias("second_price"),
            F.ntile(4).over(w).alias("quartile"),
        )
        .orderBy("o_orderpriority", "pct_rank", "o_orderkey")
    )


@query(
    "events_tiered_rollup",
    oracle="""
    WITH cutoff AS (
      SELECT date_trunc('day', MAX(ts)) - INTERVAL 6 DAY AS recent_start FROM events
    ),
    hourly AS (
      SELECT 'hour' AS granularity, date_trunc('hour', e.ts) AS bucket_ts,
             COUNT(*) AS n_events, COUNT(DISTINCT e.user_id) AS n_users,
             CAST(ROUND(SUM(CAST(e."value" AS DECIMAL(18,6))), 2) AS DOUBLE) AS sum_value
      FROM events e, cutoff c
      WHERE e.ts >= c.recent_start
      GROUP BY bucket_ts
    ),
    daily AS (
      SELECT 'day' AS granularity, date_trunc('day', e.ts) AS bucket_ts,
             COUNT(*) AS n_events, COUNT(DISTINCT e.user_id) AS n_users,
             CAST(ROUND(SUM(CAST(e."value" AS DECIMAL(18,6))), 2) AS DOUBLE) AS sum_value
      FROM events e, cutoff c
      WHERE e.ts < c.recent_start
      GROUP BY bucket_ts
    )
    SELECT * FROM hourly UNION ALL SELECT * FROM daily
    ORDER BY granularity, bucket_ts
    """,
)
def events_tiered_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retention-policy rollup (hypertable-style continuous aggregate):
    the trailing 7 days keep hourly resolution, everything older is
    downsampled to daily — the standard storage/latency trade for a
    metrics lake. The cutoff is a 1-row aggregate cross-joined in
    (broadcast by AQE; the one case the no-hint discipline allows), then
    each tier is a single partial-agg shuffle over its slice; the two
    tiers read disjoint row sets so total scan cost equals one pass.
    Value sums are DECIMAL-accumulated for cross-engine exactness."""
    events = load_table(spark, sf_dir, "events")
    cutoff = events.agg(
        (F.date_trunc("day", F.max("ts")) - F.expr("INTERVAL 6 DAYS")).alias("recent_start")
    )
    with_cut = events.crossJoin(cutoff)

    def tier(df: DataFrame, granularity: str, trunc: str) -> DataFrame:
        return df.groupBy(F.date_trunc(trunc, "ts").alias("bucket_ts")).agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
            _dsum(F.col("value")).alias("sum_value"),
        ).select(F.lit(granularity).alias("granularity"), "*")

    hourly = tier(with_cut.where(F.col("ts") >= F.col("recent_start")), "hour", "hour")
    daily = tier(with_cut.where(F.col("ts") < F.col("recent_start")), "day", "day")
    return hourly.unionByName(daily).orderBy("granularity", "bucket_ts")


@query(
    "events_zone_map_skip",
    oracle="""
    WITH zones AS (
      SELECT CAST(event_id // 500 AS BIGINT) AS zone_id,
             MIN(ts) AS min_ts, MAX(ts) AS max_ts, COUNT(*) AS n_rows
      FROM events GROUP BY zone_id
    )
    SELECT zone_id, min_ts, max_ts, n_rows,
           NOT (min_ts < TIMESTAMP '2024-01-16'
                AND max_ts >= TIMESTAMP '2024-01-15') AS skippable
    FROM zones ORDER BY zone_id
    """,
)
def events_zone_map_skip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-level zone maps (data skipping): per 500-row zone (standing in
    for a parquet row-group/file), the min/max timestamp plus whether a
    `ts on 2024-01-15` predicate could skip the zone entirely. This is the
    statistic a 100 TB lake lives on — the maintenance job compares
    skippable-fraction before/after a layout rewrite (see
    events_zorder_layout) and the planner uses the same interval test the
    parquet reader applies to row-group stats. One partial-agg shuffle on
    the zone key; no data rows leave the executors."""
    events = load_table(spark, sf_dir, "events")
    lo = F.lit("2024-01-15").cast("timestamp")
    hi = F.lit("2024-01-16").cast("timestamp")
    return (
        events.groupBy((F.col("event_id") / 500).cast("long").alias("zone_id"))
        .agg(
            F.min("ts").alias("min_ts"),
            F.max("ts").alias("max_ts"),
            F.count(F.lit(1)).alias("n_rows"),
        )
        .select(
            "zone_id",
            "min_ts",
            "max_ts",
            "n_rows",
            (~((F.col("min_ts") < hi) & (F.col("max_ts") >= lo))).alias("skippable"),
        )
        .orderBy("zone_id")
    )


def _morton_terms(x: str, y: str, bits: int, spark_side: bool) -> str:
    """Emit the 2*bits-term bit-interleave sum for Morton (Z-order) codes.

    Generated as explicit text for each engine so both compute the same
    pure-integer expression: Spark via shiftright/shiftleft/& , DuckDB via
    its >> << & operators. No floats anywhere -> hash-exact."""
    terms = []
    for i in range(bits):
        if spark_side:
            terms.append(f"shiftleft(shiftright({x}, {i}) & 1, {2 * i})")
            terms.append(f"shiftleft(shiftright({y}, {i}) & 1, {2 * i + 1})")
        else:
            terms.append(f"((({x} >> {i}) & 1) << {2 * i})")
            terms.append(f"((({y} >> {i}) & 1) << {2 * i + 1})")
    return " + ".join(terms)


_ZORDER_ORACLE = f"""
    WITH keyed AS (
      SELECT event_id, user_id AS x,
             CAST(floor("value" / 2.0) AS BIGINT) AS y
      FROM events
    ), coded AS (
      SELECT event_id, x, y,
             CAST({_morton_terms('x', 'y', 9, spark_side=False)} AS BIGINT) AS zval
      FROM keyed
    ), bucketed AS (
      SELECT x, y, CAST(ntile(16) OVER (ORDER BY zval, event_id) AS BIGINT) AS zbucket
      FROM coded
    )
    SELECT zbucket, COUNT(*) AS n_rows,
           MIN(x) AS min_x, MAX(x) AS max_x, MIN(y) AS min_y, MAX(y) AS max_y,
           CAST((MAX(x) - MIN(x) + 1) * (MAX(y) - MIN(y) + 1) AS BIGINT) AS bbox_area
    FROM bucketed GROUP BY zbucket ORDER BY zbucket
"""


@query("events_zorder_layout", oracle=_ZORDER_ORACLE)
def events_zorder_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order (Morton) clustering for multi-column data skipping: interleave
    the bits of (user_id, value-band), sort into 16 equal buckets (stand-ins
    for output files), and report each bucket's bounding box. The payoff at
    100 TB: a 1-D sort gives tight zone maps on ONE column; Z-order keeps
    BOTH per-file min/max ranges narrow, so predicates on either column
    skip files (bbox_area is the figure of merit vs a linear layout).

    The Morton code is a generated 36-term integer expression (9 bits/dim:
    user_id <= 149, value/2 <= 245) — pure BIGINT ops, hash-exact vs the
    oracle. ntile's global sort is the same sort the layout rewrite itself
    needs (sinks/compact.py sort_by), so the plan cost IS the rewrite cost;
    the single-partition window is acceptable because ntile assigns file
    boundaries — production would use repartitionByRange on zval (same
    ordering, distributed) as compact.py does."""
    events = load_table(spark, sf_dir, "events")
    keyed = events.select(
        "event_id",
        F.col("user_id").alias("x"),
        F.floor(F.col("value") / 2.0).cast("long").alias("y"),
    )
    coded = keyed.withColumn(
        "zval", F.expr(_morton_terms("x", "y", 9, spark_side=True)).cast("long")
    )
    zbucket = F.ntile(16).over(W.orderBy("zval", "event_id")).cast("long")
    return (
        coded.select("x", "y", zbucket.alias("zbucket"))
        .groupBy("zbucket")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min("x").alias("min_x"),
            F.max("x").alias("max_x"),
            F.min("y").alias("min_y"),
            F.max("y").alias("max_y"),
        )
        .withColumn(
            "bbox_area",
            ((F.col("max_x") - F.col("min_x") + 1) * (F.col("max_y") - F.col("min_y") + 1)).cast(
                "long"
            ),
        )
        .orderBy("zbucket")
    )
