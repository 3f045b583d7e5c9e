"""Column-builder function library (compile-time expression construction).

Every function here returns a ``pyspark.sql.Column`` so it can slot into any
lazy plan and stay JVM-side (whole-stage codegen) — no Python UDFs.
"""

from etl_from_s3_to_postgresql_template_spark.functions.dates import (
    DEFAULT_PATTERN_ORDER,
    extract_all_dates_col,
    extract_date_col,
    extract_date_range_col,
    extract_date_str_col,
    extract_datetime_col,
)

__all__ = [
    "DEFAULT_PATTERN_ORDER",
    "extract_all_dates_col",
    "extract_date_col",
    "extract_date_range_col",
    "extract_date_str_col",
    "extract_datetime_col",
]
