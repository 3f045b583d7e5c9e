"""Round-2 analytics additions: the remaining ``merge_asof`` direction
surface (forward / nearest) and two classic segmentation primitives
(equi-depth histograms, RFM customer segmentation).

Registered after llm_ops2 and before the round-1-proven packs — see
plans/__init__.py for the verification-order rationale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_from_s3_to_postgresql_template_spark.plans.registry import query
from etl_from_s3_to_postgresql_template_spark.sources.registry import load_table

__all__ = [
    "join_asof_forward",
    "join_asof_nearest",
    "events_value_histogram_equidepth",
    "customer_rfm_segments",
]


@query(
    "join_asof_forward",
    oracle="""
    WITH p AS (SELECT * FROM events WHERE event_type = 'purchase'),
         e AS (SELECT * FROM events WHERE event_type = 'error'),
         j AS (
           SELECT p.event_id, e.ts AS error_ts,
                  ROW_NUMBER() OVER (PARTITION BY p.event_id ORDER BY e.ts ASC, e.event_id DESC) AS rn
           FROM p JOIN e ON p.user_id = e.user_id AND e.ts >= p.ts
         )
    SELECT p.event_id, p.user_id,
           strftime(p.ts, '%Y-%m-%d %H:%M:%S.%f') AS ts,
           strftime(j.error_ts, '%Y-%m-%d %H:%M:%S.%f') AS next_error_ts
    FROM p LEFT JOIN (SELECT event_id, error_ts FROM j WHERE rn = 1) j USING (event_id)
    """,
)
def join_asof_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forward as-of join: for each purchase, the EARLIEST error at-or-after
    it for the same user — "what broke next" (the incident-attribution
    twin of the backward join_asof). Same window composition, reversed
    predicate and ordering (operators/asof.py, direction='forward')."""
    from etl_from_s3_to_postgresql_template_spark.operators.asof import asof_join

    ev = load_table(spark, sf_dir, "events")
    p = ev.filter(F.col("event_type") == "purchase").select("event_id", "user_id", "ts")
    e = ev.filter(F.col("event_type") == "error").select(
        F.col("event_id").alias("error_event_id"),
        F.col("user_id").alias("e_user_id"),
        F.col("ts").alias("error_ts"),
    )
    out = asof_join(
        p,
        e,
        left_on="ts",
        right_on="error_ts",
        left_by="user_id",
        right_by="e_user_id",
        right_tiebreak="error_event_id",
        left_id="event_id",
        direction="forward",
    )
    return out.select(
        "event_id",
        "user_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("ts"),
        F.date_format("error_ts", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("next_error_ts"),
    )


@query(
    "join_asof_nearest",
    oracle="""
    WITH p AS (SELECT * FROM events WHERE event_type = 'purchase'),
         e AS (SELECT * FROM events WHERE event_type = 'error'),
         j AS (
           SELECT p.event_id, e.ts AS error_ts,
                  ROW_NUMBER() OVER (
                    PARTITION BY p.event_id
                    ORDER BY abs(epoch(e.ts) - epoch(p.ts)), e.ts ASC, e.event_id DESC
                  ) AS rn
           FROM p JOIN e ON p.user_id = e.user_id
                        AND e.ts >= p.ts - INTERVAL 1 HOUR
                        AND e.ts <= p.ts + INTERVAL 1 HOUR
         )
    SELECT p.event_id, p.user_id,
           strftime(p.ts, '%Y-%m-%d %H:%M:%S.%f') AS ts,
           strftime(j.error_ts, '%Y-%m-%d %H:%M:%S.%f') AS nearest_error_ts
    FROM p LEFT JOIN (SELECT event_id, error_ts FROM j WHERE rn = 1) j USING (event_id)
    """,
)
def join_asof_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest as-of join with a 1-hour tolerance: each purchase matched to
    the temporally CLOSEST error on either side (equidistant ties break
    toward the earlier error, deterministically). The tolerance is
    mandatory thinking at scale — nearest without a bound is a per-key
    cross join; with it, the fan-out is the tolerance window."""
    from etl_from_s3_to_postgresql_template_spark.operators.asof import asof_join

    ev = load_table(spark, sf_dir, "events")
    p = ev.filter(F.col("event_type") == "purchase").select("event_id", "user_id", "ts")
    e = ev.filter(F.col("event_type") == "error").select(
        F.col("event_id").alias("error_event_id"),
        F.col("user_id").alias("e_user_id"),
        F.col("ts").alias("error_ts"),
    )
    out = asof_join(
        p,
        e,
        left_on="ts",
        right_on="error_ts",
        left_by="user_id",
        right_by="e_user_id",
        tolerance=F.expr("INTERVAL 1 HOUR"),
        right_tiebreak="error_event_id",
        left_id="event_id",
        direction="nearest",
    )
    return out.select(
        "event_id",
        "user_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("ts"),
        F.date_format("error_ts", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("nearest_error_ts"),
    )


@query(
    "events_value_histogram_equidepth",
    oracle="""
    WITH b AS (
      SELECT value, NTILE(10) OVER (ORDER BY value, event_id) AS bucket
      FROM events
    )
    SELECT CAST(bucket AS BIGINT) AS bucket,
           CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(MIN(value), 4) AS lo,
           ROUND(MAX(value), 4) AS hi
    FROM b GROUP BY bucket ORDER BY bucket
    """,
)
def events_value_histogram_equidepth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-DEPTH histogram (the profiling twin of the existing equal-WIDTH
    events_value_histogram): 10 buckets of equal row count via ntile with a
    full tie-break, reporting each bucket's bounds. The global-order window
    is the textbook single-task trap; at scale this swaps to
    approx_percentile cut points + a bucket join — the exact ntile stays
    the oracle tier."""
    from pyspark.sql import Window as W

    ev = load_table(spark, sf_dir, "events")
    w = W.orderBy("value", "event_id")
    return (
        ev.select("value", F.ntile(10).over(w).alias("bucket"))
        .groupBy(F.col("bucket").cast("long").alias("bucket"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.min("value"), 4).alias("lo"),
            F.round(F.max("value"), 4).alias("hi"),
        )
        .orderBy("bucket")
    )


@query(
    "customer_rfm_segments",
    oracle="""
    WITH base AS (
      SELECT o_custkey,
             MAX(o_orderdate) AS last_order,
             CAST(COUNT(*) AS BIGINT) AS frequency,
             SUM(CAST(o_totalprice AS DECIMAL(18,6))) AS monetary
      FROM orders GROUP BY o_custkey
    ), scored AS (
      SELECT o_custkey, frequency,
             NTILE(5) OVER (ORDER BY last_order, o_custkey) AS r_score,
             NTILE(5) OVER (ORDER BY frequency, o_custkey) AS f_score,
             NTILE(5) OVER (ORDER BY monetary, o_custkey) AS m_score
      FROM base
    )
    SELECT CAST(r_score AS BIGINT) AS r_score,
           CAST(f_score AS BIGINT) AS f_score,
           CAST(m_score AS BIGINT) AS m_score,
           CAST(COUNT(*) AS BIGINT) AS n_customers
    FROM scored
    GROUP BY r_score, f_score, m_score
    ORDER BY r_score, f_score, m_score
    """,
)
def customer_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM segmentation: recency/frequency/monetary quintiles per customer
    (full tie-breaks; monetary accumulates in exact decimal) aggregated to
    segment counts. ntile's global windows are the oracle tier; the scale
    tier replaces them with approx_percentile quintile cuts, same
    downstream segment join."""
    from pyspark.sql import Window as W

    o = load_table(spark, sf_dir, "orders")
    base = o.groupBy("o_custkey").agg(
        F.max("o_orderdate").alias("last_order"),
        F.count(F.lit(1)).alias("frequency"),
        F.sum(F.col("o_totalprice").cast("decimal(18,6)")).alias("monetary"),
    )
    scored = base.select(
        "o_custkey",
        F.ntile(5).over(W.orderBy("last_order", "o_custkey")).alias("r_score"),
        F.ntile(5).over(W.orderBy("frequency", "o_custkey")).alias("f_score"),
        F.ntile(5).over(W.orderBy("monetary", "o_custkey")).alias("m_score"),
    )
    return (
        scored.groupBy(
            F.col("r_score").cast("long").alias("r_score"),
            F.col("f_score").cast("long").alias("f_score"),
            F.col("m_score").cast("long").alias("m_score"),
        )
        .agg(F.count(F.lit(1)).alias("n_customers"))
        .orderBy("r_score", "f_score", "m_score")
    )
