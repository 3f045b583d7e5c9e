"""Core-operator queries: the reference's ingest/cleanse surface re-expressed
over the fixture tables (SURVEY.md §2.1-2.4, §2.6-2.7, §2.9-2.10).

The reference operates on files whose names carry the partition date; the
fixture tables carry dates in data. Where an operator is filename-shaped
(date extraction, per-file counts), the query synthesizes deterministic
filenames from table data and runs the real extraction cascade over them —
same expressions, same precedence, oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_from_s3_to_postgresql_template_spark.functions.dates import extract_date_col, extract_date_str_col
from etl_from_s3_to_postgresql_template_spark.operators.cleanse import (
    add_metadata_columns,
    clean_column_names,
    dedup_exact,
    union_by_name,
)
from etl_from_s3_to_postgresql_template_spark.plans.registry import query
from etl_from_s3_to_postgresql_template_spark.sources.registry import load_table


def _synth_filenames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic filename column derived from orders: four naming
    conventions (iso/compact/underscore/dot), one per orderkey mod 4 —
    exercises four branches of the pattern cascade at once."""
    o = load_table(spark, sf_dir, "orders")
    d = F.col("o_orderdate")
    fn = (
        F.when(F.col("o_orderkey") % 4 == 0, F.concat(F.lit("sales_"), F.date_format(d, "yyyy-MM-dd"), F.lit(".csv")))
        .when(F.col("o_orderkey") % 4 == 1, F.concat(F.lit("data_"), F.date_format(d, "yyyyMMdd"), F.lit("_export.csv.gz")))
        .when(F.col("o_orderkey") % 4 == 2, F.concat(F.lit("logs_"), F.date_format(d, "yyyy_MM_dd"), F.lit(".txt")))
        .otherwise(F.concat(F.lit("analytics."), F.date_format(d, "yyyy.MM.dd"), F.lit(".json")))
    )
    return o.select(F.col("o_orderkey"), fn.alias("filename"))


# DuckDB twin of _synth_filenames (kept adjacent so drift is visible).
_SYNTH_SQL = """
    SELECT o_orderkey,
           CASE
             WHEN o_orderkey % 4 = 0 THEN 'sales_' || strftime(o_orderdate, '%Y-%m-%d') || '.csv'
             WHEN o_orderkey % 4 = 1 THEN 'data_' || strftime(o_orderdate, '%Y%m%d') || '_export.csv.gz'
             WHEN o_orderkey % 4 = 2 THEN 'logs_' || strftime(o_orderdate, '%Y_%m_%d') || '.txt'
             ELSE 'analytics.' || strftime(o_orderdate, '%Y.%m.%d') || '.json'
           END AS filename,
           CAST(o_orderdate AS DATE) AS true_date
    FROM orders
"""


@query(
    "filter_filename_date",
    oracle=f"""
    SELECT o_orderkey, filename
    FROM ({_SYNTH_SQL})
    WHERE true_date = DATE '1996-03-15'
    """,
)
def filter_filename_date(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S6/F1: prune by filename-extracted date == target day. The Spark side
    runs the full 11-pattern cascade (reference etl_pipeline.py:314-324); the
    oracle knows ground truth by construction."""
    files = _synth_filenames(spark, sf_dir)
    return files.filter(extract_date_col("filename") == F.lit("1996-03-15").cast("date")).select(
        "o_orderkey", "filename"
    )


@query(
    "agg_files_per_date",
    oracle=f"""
    SELECT strftime(true_date, '%Y-%m-%d') AS src_date, CAST(COUNT(*) AS BIGINT) AS file_count
    FROM ({_SYNTH_SQL})
    GROUP BY true_date
    ORDER BY src_date
    """,
)
def agg_files_per_date(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4: date histogram over a bucket (reference analyze_bucket_dates,
    etl_pipeline.py:618-632), via the real extraction cascade. Dates are
    emitted as ISO strings: the driver hash-compares pandas values, and a
    Spark date (datetime.date) never equals a DuckDB date (datetime64)."""
    files = _synth_filenames(spark, sf_dir)
    return (
        files.select(extract_date_col("filename").alias("d"))
        .groupBy("d")
        .agg(F.count(F.lit(1)).alias("file_count"))
        .select(F.date_format("d", "yyyy-MM-dd").alias("src_date"), "file_count")
        .orderBy("src_date")
    )


@query(
    "agg_date_range",
    oracle=f"""
    SELECT strftime(MIN(true_date), '%Y-%m-%d') AS min_date,
           strftime(MAX(true_date), '%Y-%m-%d') AS max_date,
           CAST(COUNT(DISTINCT true_date) AS BIGINT) AS distinct_dates
    FROM ({_SYNTH_SQL})
    """,
)
def agg_date_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A5: min/max/distinct of extracted dates (etl_pipeline.py:636-640)."""
    files = _synth_filenames(spark, sf_dir)
    d = extract_date_col("filename")
    return files.agg(
        F.date_format(F.min(d), "yyyy-MM-dd").alias("min_date"),
        F.date_format(F.max(d), "yyyy-MM-dd").alias("max_date"),
        F.countDistinct(d).alias("distinct_dates"),
    )


@query(
    "project_extract_date_str",
    oracle=f"""
    SELECT filename, strftime(true_date, '%Y-%m-%d') AS extracted_date
    FROM ({_SYNTH_SQL})
    """,
)
def project_extract_date_str(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X1 string mode: reference extract_date_simple over every filename."""
    files = _synth_filenames(spark, sf_dir)
    return files.select("filename", extract_date_str_col("filename").alias("extracted_date"))


def _scan_fixture_dir(spark: SparkSession, sf_dir: str, gz: bool) -> str:
    """Materialize nation as deterministic CSV/CSV.gz files (once per sf),
    so the scan operators read real files of each format. Content derives
    from the fixture table -> the oracle can check against `nation`."""
    import os

    # v2 in the path: cache-busts fixtures written by older code revisions
    # (a stale /tmp from a previous round would silently feed wrong data)
    suffix = "csv_gz" if gz else "csv"
    out = f"/tmp/spark_graft_scan_v2/{os.path.basename(sf_dir.rstrip('/'))}/{suffix}"
    if not os.path.exists(out):
        n = load_table(spark, sf_dir, "nation").orderBy("n_nationkey")
        w = n.coalesce(1).write.mode("overwrite").option("header", "true")
        if gz:
            w = w.option("compression", "gzip")
        w.csv(out)
    return out


@query(
    "scan_csv",
    oracle="SELECT n_nationkey, n_name, n_regionkey FROM nation",
)
def scan_csv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S4: header CSV scan with schema inference (reference
    pd.read_csv(low_memory=False), etl_pipeline.py:372-374)."""
    path = _scan_fixture_dir(spark, sf_dir, gz=False)
    return spark.read.option("header", "true").option("inferSchema", "true").csv(path)


@query(
    "scan_csv_gz",
    oracle="SELECT n_nationkey, n_name, n_regionkey FROM nation",
)
def scan_csv_gz(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S3: gzipped CSV scan — Hadoop auto-decompresses by extension; the
    reference's gzip.open + temp-file dance (etl_pipeline.py:359-371)
    disappears entirely."""
    path = _scan_fixture_dir(spark, sf_dir, gz=True)
    return spark.read.option("header", "true").option("inferSchema", "true").csv(path)


def _scan_fixture_fmt(spark: SparkSession, sf_dir: str, fmt: str) -> str:
    """Materialize nation in `fmt` (json lines / orc) once per sf, same
    cache-busting scheme as _scan_fixture_dir."""
    import os

    out = f"/tmp/spark_graft_scan_v2/{os.path.basename(sf_dir.rstrip('/'))}/{fmt}"
    if not os.path.exists(out):
        n = load_table(spark, sf_dir, "nation").orderBy("n_nationkey")
        n.coalesce(1).write.mode("overwrite").format(fmt).save(out)
    return out


@query(
    "scan_jsonl",
    oracle="SELECT n_nationkey, n_name, n_regionkey FROM nation",
)
def scan_jsonl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S4-adjacent: newline-delimited JSON scan with schema inference — the
    standard interchange format for training-data pipelines. Spark's JSON
    reader infers integers as LongType, so keys are cast back to int to
    match the parquet-derived oracle schema. At scale: JSONL scans
    parallelize per-file (and per-block for uncompressed), but prefer
    converting to parquet at the landing zone — JSON re-parses every byte
    on every read and supports no column pruning or predicate pushdown."""
    path = _scan_fixture_fmt(spark, sf_dir, "json")
    return spark.read.json(path).select(
        F.col("n_nationkey").cast("int"),
        F.col("n_name"),
        F.col("n_regionkey").cast("int"),
    )


@query(
    "scan_orc",
    oracle="SELECT n_nationkey, n_name, n_regionkey FROM nation",
)
def scan_orc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S4-adjacent: ORC columnar scan (built-in Spark format) — same
    pushdown/pruning properties as parquet; included so the engine's
    source matrix covers both columnar formats the Hadoop ecosystem
    ships."""
    path = _scan_fixture_fmt(spark, sf_dir, "orc")
    return spark.read.orc(path).select("n_nationkey", "n_name", "n_regionkey")


@query("scan_file_listing")  # listing metadata is filesystem-local -> rows-only
def scan_file_listing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S1: enumerate files as a DataFrame with extracted src_date (the
    analyze-dates input; reference etl_pipeline.py:287-302)."""
    from etl_from_s3_to_postgresql_template_spark.sources.csv_ingest import file_listing_df, list_files

    files = list_files(sf_dir, "*.parquet")
    return file_listing_df(spark, files).select("filename", "size", "src_date")


@query(
    "union_by_name",
    oracle="""
    SELECT c_custkey, c_name, c_mktsegment, CAST(NULL AS DOUBLE) AS c_acctbal FROM customer
    UNION ALL
    SELECT c_custkey, NULL AS c_name, NULL AS c_mktsegment, c_acctbal FROM customer
    """,
)
def union_by_name_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U1: union-by-name with null-fill across drifted schemas
    (reference pd.concat, etl_pipeline.py:413-418)."""
    c = load_table(spark, sf_dir, "customer")
    a = c.select("c_custkey", "c_name", "c_mktsegment")
    b = c.select("c_custkey", "c_acctbal")
    return union_by_name([a, b])


@query(
    "dedup_exact",
    oracle="""
    SELECT DISTINCT l_returnflag, l_linestatus, l_quantity FROM lineitem
    """,
)
def dedup_exact_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U2: full-row exact dedup (reference drop_duplicates,
    etl_pipeline.py:479-483), on a projection that actually has duplicates."""
    li = load_table(spark, sf_dir, "lineitem").select("l_returnflag", "l_linestatus", "l_quantity")
    return dedup_exact(li)


@query(
    "agg_duplicate_count",
    oracle="""
    SELECT CAST(COALESCE(SUM(cnt - 1), 0) AS BIGINT) AS dup_rows
    FROM (
      SELECT COUNT(*) AS cnt
      FROM lineitem
      GROUP BY l_returnflag, l_linestatus, l_quantity
    )
    """,
)
def agg_duplicate_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2: rows beyond first occurrence (reference duplicated().sum(),
    etl_pipeline.py:457-458) in one grouped pass, not count+distinct-count."""
    li = load_table(spark, sf_dir, "lineitem").select("l_returnflag", "l_linestatus", "l_quantity")
    per_key = li.groupBy(*li.columns).agg(F.count(F.lit(1)).alias("cnt"))
    return per_key.agg(F.coalesce(F.sum(F.col("cnt") - 1), F.lit(0)).cast("long").alias("dup_rows"))


@query(
    "agg_rows_per_file",
    oracle="""
    SELECT source, CAST(COUNT(*) AS BIGINT) AS row_count
    FROM documents
    GROUP BY source
    ORDER BY row_count DESC, source
    """,
)
def agg_rows_per_file(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1: rows per source (reference value_counts on source_file,
    etl_pipeline.py:421-425); documents.source plays the file role."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.groupBy("source")
        .agg(F.count(F.lit(1)).alias("row_count"))
        .orderBy(F.desc("row_count"), "source")
    )


@query(
    "agg_rows_per_day",
    oracle="""
    SELECT strftime(o_orderdate, '%Y-%m-%d') AS source_date, CAST(COUNT(*) AS BIGINT) AS row_count
    FROM orders
    GROUP BY 1
    ORDER BY source_date DESC
    """,
)
def agg_rows_per_day(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A8: the README's rows-per-day monitoring query (README.md:218-222)."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.groupBy(F.date_format("o_orderdate", "yyyy-MM-dd").alias("source_date"))
        .agg(F.count(F.lit(1)).alias("row_count"))
        .orderBy(F.desc("source_date"))
    )


@query(
    "agg_null_col_detect",
    oracle="""
    SELECT CAST(COUNT(event_id) AS BIGINT) AS event_id,
           CAST(COUNT(ts) AS BIGINT) AS ts,
           CAST(COUNT(user_id) AS BIGINT) AS user_id,
           CAST(COUNT(event_type) AS BIGINT) AS event_type,
           CAST(COUNT("value") AS BIGINT) AS value,
           CAST(COUNT(props) AS BIGINT) AS props
    FROM events
    """,
)
def agg_null_col_detect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A3/P5: per-column non-null counts in ONE aggregate pass
    (reference isnull().all(), etl_pipeline.py:453)."""
    ev = load_table(spark, sf_dir, "events")
    return ev.agg(*[F.count(F.col(c)).alias(c) for c in ev.columns])


@query(
    "project_clean_colnames",
    oracle="""
    SELECT c_custkey, c_name FROM customer
    """,
)
def project_clean_colnames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P1: strip braces/whitespace from column names
    (reference etl_pipeline.py:381-386). Dirty names are injected first so
    the cleaner has real work to do."""
    c = load_table(spark, sf_dir, "customer")
    dirty = c.select(F.col("c_custkey").alias("{c_custkey}"), F.col("c_name").alias(" c_name "))
    return clean_column_names(dirty)


@query(
    "project_epoch_to_ts",
    oracle="""
    SELECT event_id,
           1700000000 + event_id AS epoch_s,
           strftime(CAST(to_timestamp(1700000000 + event_id) AS TIMESTAMP),
                    '%Y-%m-%d %H:%M:%S') AS epoch_s_datetime
    FROM events
    """,
)
def project_epoch_to_ts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P3: epoch-seconds -> timestamp derived column, original kept
    (reference pd.to_datetime(unit='s', errors='coerce'),
    etl_pipeline.py:431-441). The numeric-dtype guard is exercised via the
    epoch_to_timestamp operator in unit tests; here the plan-level semantics
    are oracle-checked."""
    from etl_from_s3_to_postgresql_template_spark.operators.cleanse import epoch_to_timestamp

    ev = load_table(spark, sf_dir, "events").select(
        "event_id", (F.lit(1700000000) + F.col("event_id")).alias("epoch_s")
    )
    out = epoch_to_timestamp(ev, columns=("epoch_s",))
    return out.withColumn("epoch_s_datetime", F.date_format("epoch_s_datetime", "yyyy-MM-dd HH:mm:ss"))


@query(
    "project_metadata_cols",
    oracle="""
    SELECT n_nationkey, n_name,
           strftime(CAST('1995-01-01' AS TIMESTAMP), '%Y-%m-%d %H:%M:%S') AS source_date,
           3 AS files_merged_count
    FROM nation
    """,
)
def project_metadata_cols(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P4: audit metadata literals (etl_pipeline.py:443-446).
    ``processed_date`` (wall clock) is dropped for oracle determinism; the
    pipeline e2e test covers it."""
    n = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    out = add_metadata_columns(n, "1995-01-01", 3).drop("processed_date")
    return out.withColumn("source_date", F.date_format("source_date", "yyyy-MM-dd HH:mm:ss"))


@query(
    "sort_limit_topn",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 10
    """,
)
def sort_limit_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O2/O3: deterministic top-N (reference head-N diagnostics + README
    recent-runs query). Spark executes this as TakeOrderedAndProject — no
    global sort materialization."""
    o = load_table(spark, sf_dir, "orders")
    return o.select("o_orderkey", "o_custkey", "o_totalprice").orderBy(
        F.desc("o_totalprice"), "o_orderkey"
    ).limit(10)


@query(
    "project_extract_all_dates",
    oracle=f"""
    WITH f AS ({_SYNTH_SQL})
    SELECT o_orderkey, filename, 'iso_date' AS pattern,
           strftime(true_date, '%Y-%m-%d') AS extracted
    FROM f WHERE o_orderkey % 4 = 0
    UNION ALL
    SELECT o_orderkey, filename, 'year_month', strftime(true_date, '%Y-%m')
    FROM f WHERE o_orderkey % 4 = 0
    UNION ALL
    SELECT o_orderkey, filename, 'compact_date', strftime(true_date, '%Y-%m-%d')
    FROM f WHERE o_orderkey % 4 = 1
    UNION ALL
    SELECT o_orderkey, filename, 'underscore_date', strftime(true_date, '%Y-%m-%d')
    FROM f WHERE o_orderkey % 4 = 2
    UNION ALL
    SELECT o_orderkey, filename, 'dot_date', strftime(true_date, '%Y-%m-%d')
    FROM f WHERE o_orderkey % 4 = 3
    ORDER BY o_orderkey, pattern
    """,
)
def project_extract_all_dates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """X2 table-valued mode (reference extract_all_dates,
    etl_pipeline.py:217-230, return_format='dict'): ONE ROW PER MATCHING
    PATTERN instead of first-match-wins. Spark-first this is
    explode(array(struct(pattern, value))) over the same Column cascade —
    a generator expression fused with the scan, where a Python UDTF would
    be a per-row interpreter hop (SURVEY §2.12: explode covers UDTF-shaped
    needs). The oracle knows the matching patterns by construction of the
    synthetic filenames."""
    from etl_from_s3_to_postgresql_template_spark.functions.dates import DEFAULT_PATTERNS

    files = _synth_filenames(spark, sf_dir)
    candidates = F.array(
        *[
            F.struct(
                F.lit(p.name).alias("pattern"),
                p.date_str(F.col("filename")).alias("extracted"),
            )
            for p in DEFAULT_PATTERNS
        ]
    )
    return (
        files.select(
            "o_orderkey", "filename", F.explode(candidates).alias("m")
        )
        .filter(F.col("m.extracted").isNotNull())
        .select("o_orderkey", "filename", F.col("m.pattern").alias("pattern"), F.col("m.extracted").alias("extracted"))
        .orderBy("o_orderkey", "pattern")
    )
