"""Query pack extensions: outer-join distributions, top-k revenue, window
analytics, cube grouping, set ops, nested semi-joins (SURVEY §2.5/2.8/2.9).

Same discipline as query_pack.py: DECIMAL(18,6) money accumulators on both
engines, date outputs as strings, every ranking tie-broken on a key, and
plans declared so Catalyst picks broadcast vs shuffle (the only hints are
for the always-tiny dims).

Scale notes per query live in the docstrings; none of these introduce a
shuffle beyond what the declared grouping/join keys require.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from etl_from_s3_to_postgresql_template_spark.plans.money import _dec, _dsum
from etl_from_s3_to_postgresql_template_spark.plans.registry import query
from etl_from_s3_to_postgresql_template_spark.sources.registry import load_table


@query(
    "q13_customer_distribution",
    oracle="""
    SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist
    FROM (
      SELECT c_custkey, CAST(COUNT(o_orderkey) AS BIGINT) AS c_count
      FROM customer LEFT OUTER JOIN orders ON c_custkey = o_custkey
      GROUP BY c_custkey
    )
    GROUP BY c_count
    ORDER BY custdist DESC, c_count DESC
    """,
)
def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: orders-per-customer histogram including the
    zero-order customers (the LEFT OUTER + COUNT(col) null-skip is the
    point). Two shuffles, both on low-cardinality keys; the second agg's
    input is already customer-sized."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left_outer")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return (
        per_cust.groupBy("c_count")
        .agg(F.count(F.lit(1)).alias("custdist"))
        .orderBy(F.desc("custdist"), F.desc("c_count"))
    )


@query(
    "window_analytics_lag_lead",
    oracle="""
    SELECT o_custkey, o_orderkey,
           strftime(o_orderdate, '%Y-%m-%d') AS orderdate,
           o_totalprice,
           lag(o_totalprice) OVER w AS prev_price,
           lead(o_totalprice) OVER w AS next_price,
           CAST(ntile(4) OVER w AS BIGINT) AS quartile,
           ROUND(percent_rank() OVER w, 6) AS pr
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    """,
)
def window_analytics_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window-analytics family over each customer's order sequence:
    lag/lead, ntile, percent_rank in ONE window spec — one shuffle on
    o_custkey, one sort, all four functions evaluated in a single Window
    operator. Ordering is tie-broken (date, orderkey) so frames are
    deterministic."""
    o = load_table(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
        "o_totalprice",
        F.lag("o_totalprice").over(w).alias("prev_price"),
        F.lead("o_totalprice").over(w).alias("next_price"),
        F.ntile(4).over(w).cast("long").alias("quartile"),
        F.round(F.percent_rank().over(w), 6).alias("pr"),
    )


@query(
    "agg_cube_orders",
    oracle="""
    SELECT coalesce(o_orderstatus, '(all)') AS status,
           coalesce(o_orderpriority, '(all)') AS priority,
           CAST(GROUPING(o_orderstatus) * 2 + GROUPING(o_orderpriority) AS BIGINT) AS gid,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,6))), 2) AS DOUBLE) AS total
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
)
def agg_cube_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over (status, priority): all four grouping sets in one pass —
    Spark expands the cube map-side, so the input scans ONCE and the
    shuffle carries each row's grouping-set replicas. grouping_id
    disambiguates real NULLs from subtotal rows (coalesced to '(all)')."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.cube("o_orderstatus", "o_orderpriority")
        .agg(
            F.grouping_id().cast("long").alias("gid"),
            F.count(F.lit(1)).alias("n"),
            _dsum(F.col("o_totalprice")).alias("total"),
        )
        .select(
            F.coalesce("o_orderstatus", F.lit("(all)")).alias("status"),
            F.coalesce("o_orderpriority", F.lit("(all)")).alias("priority"),
            "gid",
            "n",
            "total",
        )
    )


@query(
    "set_ops_segments",
    oracle="""
    SELECT 'both' AS tag, c_custkey FROM (
      SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
      INTERSECT
      SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
    )
    UNION ALL
    SELECT 'building_only' AS tag, c_custkey FROM (
      SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
      EXCEPT
      SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT'
    )
    """,
)
def set_ops_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT / EXCEPT surfaced as DataFrame set ops: BUILDING-segment
    customers split by whether they ever placed an urgent order. Catalyst
    rewrites both to semi/anti joins on c_custkey — same physical shape as
    the EXISTS formulations, distinct-deduped per SQL set semantics."""
    building = (
        load_table(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment") == "BUILDING")
        .select("c_custkey")
    )
    urgent = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .select(F.col("o_custkey").alias("c_custkey"))
    )
    both = building.intersect(urgent).select(F.lit("both").alias("tag"), "c_custkey")
    only = building.exceptAll(urgent).distinct().select(
        F.lit("building_only").alias("tag"), "c_custkey"
    )
    return both.unionByName(only)


@query(
    "q20_promo_supplier_semi",
    oracle="""
    WITH promo AS (
      SELECT l_suppkey, SUM(CAST(l_quantity AS DECIMAL(18,6))) AS qty
      FROM lineitem
      WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_type = 'PROMO')
      GROUP BY l_suppkey
    ),
    tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n, SUM(qty) AS total FROM promo)
    SELECT s_suppkey, s_name
    FROM supplier
    WHERE s_suppkey IN (
      SELECT l_suppkey FROM promo, tot WHERE qty * n > total
    )
    ORDER BY s_suppkey
    """,
)
def q20_promo_supplier_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape: nested semi-joins — suppliers whose PROMO-part
    shipment volume is above the per-supplier average. The above-average
    test is qty * n > total (multiplication, not division): exact decimal
    arithmetic on both engines, no rounding boundary to flip. part filters
    then SEMI-joins into lineitem (no payload duplication), and the scalar
    (n, total) broadcasts."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO")
    sup = load_table(spark, sf_dir, "supplier")
    promo = (
        li.join(part, li.l_partkey == part.p_partkey, "left_semi")
        .groupBy("l_suppkey")
        .agg(F.sum(_dec(F.col("l_quantity"))).alias("qty"))
    )
    tot = promo.agg(
        F.count(F.lit(1)).alias("n"), F.sum("qty").alias("total")
    )
    above = promo.crossJoin(F.broadcast(tot)).filter(
        F.col("qty") * F.col("n") > F.col("total")
    )
    return (
        sup.join(above, sup.s_suppkey == above.l_suppkey, "left_semi")
        .select("s_suppkey", "s_name")
        .orderBy("s_suppkey")
    )


@query(
    "q17_small_quantity_revenue",
    oracle="""
    SELECT CAST(ROUND(SUM(CAST(l.l_extendedprice AS DECIMAL(18,6))) / 7.0, 2) AS DOUBLE)
           AS avg_yearly
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    JOIN (
      SELECT l_partkey, AVG(l_quantity) AS avg_qty
      FROM lineitem GROUP BY l_partkey
    ) a ON a.l_partkey = l.l_partkey
    WHERE p.p_brand = 'Brand#1' AND l.l_quantity < 0.5 * a.avg_qty
    """,
)
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: revenue from orders below half a part's average
    quantity. The correlated scalar subquery decorrelates into a grouped
    self-aggregation joined back on l_partkey — both sides shuffle on the
    SAME key, so the per-part average co-locates with its detail rows.
    The 0.5*avg comparison stays in doubles on both engines (identical
    multiply), and only the final SUM is decimal."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#1")
    avg_qty = li.groupBy(F.col("l_partkey").alias("a_partkey")).agg(
        F.avg("l_quantity").alias("avg_qty")
    )
    return (
        li.join(part, li.l_partkey == part.p_partkey)
        .join(avg_qty, li.l_partkey == F.col("a_partkey"))
        .filter(F.col("l_quantity") < 0.5 * F.col("avg_qty"))
        .agg(
            F.round(F.sum(_dec(F.col("l_extendedprice"))) / 7.0, 2)
            .cast("double")
            .alias("avg_yearly")
        )
    )


@query(
    "q22_global_sales_opportunity",
    oracle="""
    WITH avg_bal AS (
      SELECT AVG(c_acctbal) AS a FROM customer WHERE c_acctbal > 0.0
    )
    SELECT c_mktsegment,
           CAST(COUNT(*) AS BIGINT) AS numcust,
           CAST(ROUND(SUM(CAST(c_acctbal AS DECIMAL(18,6))), 2) AS DOUBLE) AS totacctbal
    FROM customer, avg_bal
    WHERE c_acctbal > a
      AND NOT EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
    GROUP BY c_mktsegment
    ORDER BY c_mktsegment
    """,
)
def q22_global_sales_opportunity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: rich-but-inactive customers per segment ("no urgent
    orders" stands in for TPC-H's "no orders", which is empty on this
    synthetic data where nearly every customer orders). The scalar
    average broadcasts (one row), the NOT EXISTS is a left-anti join on
    c_custkey, and the double-precision average comparison is identical in
    both engines (no rounding involved until the final decimal sum)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderpriority") == "1-URGENT")
    avg_bal = c.filter(F.col("c_acctbal") > 0.0).agg(F.avg("c_acctbal").alias("a"))
    return (
        c.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("a"))
        .join(o, c.c_custkey == o.o_custkey, "left_anti")
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            _dsum(F.col("c_acctbal")).alias("totacctbal"),
        )
        .orderBy("c_mktsegment")
    )


@query(
    "events_funnel_counts",
    oracle="""
    WITH v AS (
      SELECT user_id, MIN(ts) AS t FROM events WHERE event_type = 'view' GROUP BY user_id
    ),
    c AS (
      SELECT e.user_id, MIN(e.ts) AS t
      FROM events e JOIN v ON e.user_id = v.user_id AND e.ts > v.t
      WHERE e.event_type = 'click' GROUP BY e.user_id
    ),
    p AS (
      SELECT e.user_id, MIN(e.ts) AS t
      FROM events e JOIN c ON e.user_id = c.user_id AND e.ts > c.t
      WHERE e.event_type = 'purchase' GROUP BY e.user_id
    )
    SELECT CAST((SELECT COUNT(*) FROM v) AS BIGINT) AS n_view,
           CAST((SELECT COUNT(*) FROM c) AS BIGINT) AS n_view_click,
           CAST((SELECT COUNT(*) FROM p) AS BIGINT) AS n_view_click_purchase
    """,
)
def events_funnel_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel: users who viewed, then clicked AFTER the view, then
    purchased AFTER that click. Earliest-qualifying-event chaining is the
    standard funnel semantics (greedy-earliest is exact for subsequence
    existence: the earliest view admits the most later clicks, etc.).
    Three grouped mins + two joins on user_id — every stage shuffles on the
    same key, so AQE coalesces them into co-partitioned exchanges."""
    ev = load_table(spark, sf_dir, "events")
    v = ev.filter(F.col("event_type") == "view").groupBy("user_id").agg(F.min("ts").alias("vt"))
    c = (
        ev.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter(F.col("ts") > F.col("vt"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("ct"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(F.col("ts") > F.col("ct"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("pt"))
    )
    return (
        v.agg(F.count(F.lit(1)).alias("n_view"))
        .crossJoin(c.agg(F.count(F.lit(1)).alias("n_view_click")))
        .crossJoin(p.agg(F.count(F.lit(1)).alias("n_view_click_purchase")))
    )


@query(
    "events_transition_matrix",
    oracle="""
    WITH s AS (
      SELECT user_id, event_type,
             lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_type
      FROM events
    )
    SELECT prev_type, event_type AS next_type, CAST(COUNT(*) AS BIGINT) AS n
    FROM s WHERE prev_type IS NOT NULL
    GROUP BY prev_type, next_type
    ORDER BY prev_type, next_type
    """,
)
def events_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-sequence transition matrix: per-user consecutive event-type
    bigrams (Markov transition counts — the sequence-mining primitive).
    One shuffle for the user window, one for the bigram agg; ordering is
    tie-broken (ts, event_id) so lag() is deterministic."""
    ev = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        ev.select("user_id", "event_type", F.lag("event_type").over(w).alias("prev_type"))
        .filter(F.col("prev_type").isNotNull())
        .groupBy("prev_type", F.col("event_type").alias("next_type"))
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("prev_type", "next_type")
    )


@query(
    "events_user_value_trend",
    oracle="""
    SELECT user_id,
           ROUND(covar_pop("value", epoch_us(ts) / 3600000000.0) /
                 nullif(var_pop(epoch_us(ts) / 3600000000.0), 0), 6) AS slope_per_hour,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM events
    GROUP BY user_id
    ORDER BY user_id
    """,
)
def events_user_value_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user least-squares trend of event value over time, computed as
    covar_pop/var_pop — the closed-form slope, entirely JVM-side built-in
    aggregates (one shuffle on user_id, partial aggregation map-side).
    This is deliberately NOT an applyInPandas regression: the closed form
    distributes; a per-group numpy lstsq would serialize each user's
    history into one Python worker. Time is rescaled to hours so slopes
    are O(1) and the 6-decimal round is meaningful."""
    ev = load_table(spark, sf_dir, "events")
    # events.ts may arrive as TIMESTAMP_NTZ (parquet isAdjustedToUTC=false);
    # unix_micros requires TIMESTAMP. Session TZ is pinned UTC, so the cast
    # is value-identical either way.
    x = F.unix_micros(F.col("ts").cast("timestamp")) / F.lit(3600000000.0)
    return (
        ev.groupBy("user_id")
        .agg(
            F.round(
                F.covar_pop(F.col("value"), x) / F.nullif(F.var_pop(x), F.lit(0.0)), 6
            ).alias("slope_per_hour"),
            F.count(F.lit(1)).alias("n"),
        )
        .orderBy("user_id")
    )


@query(
    "window_rolling_hour_sum",
    oracle="""
    SELECT event_id, user_id,
           strftime(ts, '%Y-%m-%d %H:%M:%S.%f') AS ts,
           CAST(ROUND(SUM(CAST("value" AS DECIMAL(18,6))) OVER (
                  PARTITION BY user_id ORDER BY ts
                  RANGE BETWEEN INTERVAL '1 hour' PRECEDING AND CURRENT ROW
                ), 4) AS DOUBLE) AS rolling_sum
    FROM events
    """,
)
def window_rolling_hour_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-RANGE window frame: per-user rolling 1-hour value sum — the
    frame is defined by the ORDER-BY value range (micros), not row counts,
    so ties share a frame deterministically in both engines. One shuffle
    + one sort; decimal accumulation inside the frame keeps the rolling
    sum exact."""
    ev = load_table(spark, sf_dir, "events")
    w = (
        W.partitionBy("user_id")
        .orderBy(F.unix_micros(F.col("ts").cast("timestamp")))
        .rangeBetween(-3_600_000_000, 0)
    )
    return ev.select(
        "event_id",
        "user_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("ts"),
        F.round(F.sum(F.col("value").cast("decimal(18,6)")).over(w), 4)
        .cast("double")
        .alias("rolling_sum"),
    )


def _ewma_fn(pdf):
    """Per-group EWMA fold (runs inside an Arrow batch executor-side)."""
    import pandas as pd

    pdf = pdf.sort_values(["ts", "event_id"])
    ew = None
    for v in pdf["value"].to_numpy():
        ew = v if ew is None else 0.3 * v + 0.7 * ew
    return pd.DataFrame(
        {"user_id": [pdf["user_id"].iloc[0]], "ewma_raw": [ew], "n": [len(pdf)]}
    )


@query(
    "events_user_ewma",
    oracle="""
    SELECT user_id,
           ROUND(list_reduce(list("value" ORDER BY ts, event_id),
                             (acc, x) -> 0.3 * x + 0.7 * acc), 6) AS ewma,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM events
    GROUP BY user_id
    ORDER BY user_id
    """,
)
def events_user_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially-weighted moving average of each user's event values —
    an ORDER-DEPENDENT recursive fold no closed-form SQL aggregate
    expresses, so this is the canonical applyInPandas custom-grouped-op
    path: one shuffle on user_id, each group folded in an Arrow batch.
    The identical double-op sequence on both engines (DuckDB list_reduce
    over the same tie-broken ordering) makes the result deterministic;
    rounding happens once, engine-side, after the fold."""
    ev = load_table(spark, sf_dir, "events")
    out = ev.select("user_id", "event_id", "ts", "value").groupBy("user_id").applyInPandas(
        _ewma_fn, "user_id long, ewma_raw double, n long"
    )
    return out.select(
        "user_id", F.round("ewma_raw", 6).alias("ewma"), "n"
    ).orderBy("user_id")


@query(
    "scd2_user_daily_value",
    oracle="""
    WITH last_per_day AS (
      SELECT user_id, strftime(CAST(ts AS DATE), '%Y-%m-%d') AS day, "value"
      FROM (
        SELECT user_id, ts, "value",
               row_number() OVER (PARTITION BY user_id, CAST(ts AS DATE)
                                  ORDER BY ts DESC, event_id DESC) AS rn
        FROM events
      ) WHERE rn = 1
    )
    SELECT user_id, "value",
           day AS valid_from,
           coalesce(lead(day) OVER (PARTITION BY user_id ORDER BY day), '9999-12-31')
             AS valid_to,
           CASE WHEN lead(day) OVER (PARTITION BY user_id ORDER BY day) IS NULL
                THEN 1 ELSE 0 END AS is_current
    FROM last_per_day
    """,
)
def scd2_user_daily_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slowly-changing-dimension (type 2) snapshot build: each user's last
    event value per day becomes a dimension VERSION, valid from that day
    until the next version's day (open versions get the 9999-12-31
    sentinel + is_current flag). Two windows over the same (user_id,
    day-ordered) sort — one partition-compatible shuffle total. This is
    the merge/upsert surface the reference's append-only loader lacks:
    re-running a day replaces that day's version instead of duplicating
    it."""
    ev = load_table(spark, sf_dir, "events")
    day = F.date_format("ts", "yyyy-MM-dd")
    last = (
        ev.select("user_id", day.alias("day"), "value", "ts", "event_id")
        .withColumn("rn", F.row_number().over(W.partitionBy("user_id", "day").orderBy(F.desc("ts"), F.desc("event_id"))))
        .filter(F.col("rn") == 1)
        .drop("rn", "ts", "event_id")
    )
    w_ver = W.partitionBy("user_id").orderBy("day")
    nxt = F.lead("day").over(w_ver)
    return last.select(
        "user_id",
        "value",
        F.col("day").alias("valid_from"),
        F.coalesce(nxt, F.lit("9999-12-31")).alias("valid_to"),
        F.when(nxt.isNull(), F.lit(1)).otherwise(F.lit(0)).alias("is_current"),
    )


@query(
    "split_train_holdout",
    oracle="""
    SELECT CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) IN ('0', '1')
                THEN 'holdout' ELSE 'train' END AS split,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(MIN(doc_id) AS BIGINT) AS min_id,
           CAST(MAX(doc_id) AS BIGINT) AS max_id
    FROM documents
    GROUP BY 1 ORDER BY 1
    """,
)
def split_train_holdout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic content-hash train/holdout split (~1/8 holdout): the
    leakage-safe splitter for training corpora — membership depends only
    on the id's md5, so it is stable across runs, engines, partitionings,
    and corpus growth (a doc never migrates between splits). Pure
    projection + one tiny agg; no RNG, no sampleBy seed to disagree on."""
    docs = load_table(spark, sf_dir, "documents")
    split = F.when(
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1).isin("0", "1"),
        F.lit("holdout"),
    ).otherwise(F.lit("train"))
    return (
        docs.select(split.alias("split"), "doc_id")
        .groupBy("split")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("doc_id").alias("min_id"),
            F.max("doc_id").alias("max_id"),
        )
        .orderBy("split")
    )


@query(
    "join_interval_banded",
    oracle="""
    WITH iv AS (
      SELECT user_id AS iv_user,
             date_trunc('day', ts) AS d,
             MIN(ts) AS start_ts
      FROM events
      WHERE user_id % 5 = 0
      GROUP BY 1, 2
    )
    SELECT iv.iv_user,
           strftime(iv.d, '%Y-%m-%d') AS day,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           ROUND(SUM(CAST(e."value" AS DECIMAL(18,6))), 2) :: DOUBLE AS sum_value
    FROM iv
    JOIN events e
      ON e.ts >= iv.start_ts AND e.ts < iv.start_ts + INTERVAL 2 HOUR
    GROUP BY 1, 2
    ORDER BY 1, 2
    """,
)
def join_interval_banded(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-interval join between two LARGE sides via the banded
    range-join operator (operators/rangejoin.py): traffic from ALL users
    inside each sampled user's daily 2-hour opening window. The naive
    non-equi formulation is a BroadcastNestedLoopJoin — O(|events| x
    |intervals|); banding (bands ~ the interval length) turns it into a
    hash equi-join on the band id, which survives both sides growing
    1000x. Residual keeps exact half-open semantics. Band width is
    AUTO-PICKED from the measured median interval length
    (operators/rangejoin.py::auto_band_seconds) — the hardcoded 3600 s
    band was the one super-linear term the r3 10x stress caught."""
    from etl_from_s3_to_postgresql_template_spark.operators.rangejoin import interval_join

    ev = load_table(spark, sf_dir, "events")
    intervals = (
        ev.where(F.col("user_id") % 5 == 0)
        .groupBy(
            F.col("user_id").alias("iv_user"),
            F.date_trunc("day", "ts").alias("d"),
        )
        .agg(F.min("ts").alias("start_ts"))
        .withColumn("end_ts", F.col("start_ts") + F.expr("INTERVAL 2 HOURS"))
    )
    points = ev.select("ts", "value")
    return (
        interval_join(points, intervals, "ts", "start_ts", "end_ts")
        .groupBy("iv_user", F.date_format("d", "yyyy-MM-dd").alias("day"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            _dsum(F.col("value")).alias("sum_value"),
        )
        .orderBy("iv_user", "day")
    )


@query(
    "events_outlier_iqr",
    oracle="""
    WITH r AS (
      SELECT event_id, event_type, value,
             CAST(ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY value, event_id) AS BIGINT) AS rn,
             CAST(COUNT(*) OVER (PARTITION BY event_type) AS BIGINT) AS cnt
      FROM events
    ), q AS (
      SELECT event_type,
             MAX(CASE WHEN rn = CAST(ceil(0.25 * cnt) AS BIGINT) THEN value END) AS q1,
             MAX(CASE WHEN rn = CAST(ceil(0.75 * cnt) AS BIGINT) THEN value END) AS q3
      FROM r GROUP BY event_type
    )
    SELECT r.event_id, r.event_type, r.value,
           CASE WHEN r.value > q.q3 + 1.5 * (q.q3 - q.q1) THEN 'high' ELSE 'low' END AS side
    FROM r JOIN q USING (event_type)
    WHERE r.value > q.q3 + 1.5 * (q.q3 - q.q1)
       OR r.value < q.q1 - 1.5 * (q.q3 - q.q1)
    ORDER BY r.event_id
    """,
)
def events_outlier_iqr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tukey-fence outlier detection per event_type. Quantiles are computed
    MANUALLY (row_number + rank pick = percentile_disc) instead of each
    engine's quantile function — disc/interpolation conventions differ
    across engines, but "the value at rank ceil(p*n)" is one definition
    both compute identically. Fence arithmetic is the same IEEE expression
    tree on both sides, and flagged values pass through untouched (no
    divide-then-round hazard). One shuffle on event_type; the quantile
    table (5 rows) broadcasts back onto the events."""
    e = load_table(spark, sf_dir, "events").select("event_id", "event_type", "value")
    r = e.select(
        "event_id",
        "event_type",
        "value",
        F.row_number().over(W.partitionBy("event_type").orderBy("value", "event_id")).cast("long").alias("rn"),
        F.count(F.lit(1)).over(W.partitionBy("event_type")).cast("long").alias("cnt"),
    )
    q = r.groupBy("event_type").agg(
        F.max(F.when(F.col("rn") == F.ceil(0.25 * F.col("cnt")), F.col("value"))).alias("q1"),
        F.max(F.when(F.col("rn") == F.ceil(0.75 * F.col("cnt")), F.col("value"))).alias("q3"),
    )
    hi = F.col("q3") + 1.5 * (F.col("q3") - F.col("q1"))
    lo = F.col("q1") - 1.5 * (F.col("q3") - F.col("q1"))
    return (
        e.join(F.broadcast(q), "event_type")
        .where((F.col("value") > hi) | (F.col("value") < lo))
        .select(
            "event_id",
            "event_type",
            "value",
            F.when(F.col("value") > hi, F.lit("high")).otherwise(F.lit("low")).alias("side"),
        )
        .orderBy("event_id")
    )


@query(
    "events_resample_ffill",
    oracle="""
    WITH e AS (
      SELECT user_id, event_id, CAST(ts AS DATE) AS day, ts, value FROM events
    ), daily AS (
      SELECT user_id, day, value FROM (
        SELECT user_id, day, value,
               ROW_NUMBER() OVER (PARTITION BY user_id, day ORDER BY ts DESC, event_id DESC) AS rn
        FROM e) t WHERE rn = 1
    ), span AS (
      SELECT user_id, MIN(day) AS d0, MAX(day) AS d1 FROM e GROUP BY user_id
    ), spine AS (
      SELECT user_id, CAST(UNNEST(generate_series(d0, d1, INTERVAL 1 DAY)) AS DATE) AS day
      FROM span
    )
    SELECT s.user_id, strftime(s.day, '%Y-%m-%d') AS day,
           LAST_VALUE(d.value IGNORE NULLS) OVER (
             PARTITION BY s.user_id ORDER BY s.day
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS value_ffill
    FROM spine s LEFT JOIN daily d USING (user_id, day)
    ORDER BY s.user_id, s.day
    """,
)
def events_resample_ffill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series resampling: a daily spine per user (min..max active day)
    left-joined with the last event value of each day, gaps forward-filled
    (last non-null over preceding rows). The spine comes from sequence()
    + explode — rows generated ON the executors, sized by each user's own
    span, never a driver loop. Filled values pass through bit-identical
    (no arithmetic). Shuffles: one on user_id for the spine agg, one on
    (user_id, day) for the daily pick; the ffill window rides the spine
    join's partitioning."""
    e = load_table(spark, sf_dir, "events").select(
        "user_id", "event_id", F.to_date("ts").alias("day"), "ts", "value"
    )
    daily = (
        e.withColumn(
            "rn",
            F.row_number().over(
                W.partitionBy("user_id", "day").orderBy(F.desc("ts"), F.desc("event_id"))
            ),
        )
        .where(F.col("rn") == 1)
        .select("user_id", "day", "value")
    )
    spine = (
        e.groupBy("user_id")
        .agg(F.min("day").alias("d0"), F.max("day").alias("d1"))
        .select("user_id", F.explode(F.sequence("d0", "d1")).alias("day"))
    )
    ffill = F.last("value", ignorenulls=True).over(
        W.partitionBy("user_id").orderBy("day").rowsBetween(W.unboundedPreceding, 0)
    )
    return (
        spine.join(daily, ["user_id", "day"], "left")
        .select("user_id", F.date_format("day", "yyyy-MM-dd").alias("day"), ffill.alias("value_ffill"))
        .orderBy("user_id", "day")
    )


@query(
    "orders_cohort_retention",
    oracle="""
    WITH firsts AS (
      SELECT o_custkey, MIN(date_trunc('month', o_orderdate)) AS cohort
      FROM orders GROUP BY o_custkey
    ), activity AS (
      SELECT DISTINCT o.o_custkey, f.cohort,
             date_trunc('month', o.o_orderdate) AS act_month
      FROM orders o JOIN firsts f ON f.o_custkey = o.o_custkey
    )
    SELECT strftime(cohort, '%Y-%m') AS cohort_month,
           CAST(datediff('month', cohort, act_month) AS BIGINT) AS month_offset,
           CAST(COUNT(*) AS BIGINT) AS active_customers
    FROM activity
    GROUP BY cohort, month_offset
    ORDER BY cohort_month, month_offset
    """,
)
def orders_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention matrix: customers grouped by first-order month,
    counted in each subsequent active month. Two shuffles (first-order agg
    on custkey; cohort-cell agg) — the per-customer month set is DISTINCT
    before counting so multi-order months count once. Months emit as
    strings (date-hash parity rule)."""
    o = load_table(spark, sf_dir, "orders").select("o_custkey", "o_orderdate")
    firsts = o.groupBy("o_custkey").agg(F.trunc(F.min("o_orderdate"), "month").alias("cohort"))
    activity = (
        o.join(firsts, "o_custkey")
        .select("o_custkey", "cohort", F.trunc("o_orderdate", "month").alias("act_month"))
        .distinct()
    )
    offset = (
        (F.year("act_month") - F.year("cohort")) * 12 + (F.month("act_month") - F.month("cohort"))
    ).cast("long")
    return (
        activity.select(
            F.date_format("cohort", "yyyy-MM").alias("cohort_month"),
            offset.alias("month_offset"),
        )
        .groupBy("cohort_month", "month_offset")
        .agg(F.count(F.lit(1)).alias("active_customers"))
        .orderBy("cohort_month", "month_offset")
    )


@query(
    "events_value_histogram",
    oracle="""
    SELECT event_type,
           CAST(FLOOR(value / 25.0) AS BIGINT) AS bin,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM events
    GROUP BY event_type, bin
    ORDER BY event_type, bin
    """,
)
def events_value_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equal-width value histogram per event type: bin = floor(value/25)
    — one IEEE divide + floor, identical on both engines; counts exact.
    One shuffle, map-side partial agg, output size = #types x #bins."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy("event_type", F.floor(F.col("value") / 25.0).cast("long").alias("bin"))
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("event_type", "bin")
    )
