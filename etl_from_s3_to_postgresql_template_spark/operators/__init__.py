from etl_from_s3_to_postgresql_template_spark.operators.cleanse import (
    clean_column_names,
    union_by_name,
    dedup_exact,
    duplicate_count,
    epoch_to_timestamp,
    add_metadata_columns,
    null_column_counts,
    drop_all_null_columns,
    rows_per_file,
)

__all__ = [
    "clean_column_names",
    "union_by_name",
    "dedup_exact",
    "duplicate_count",
    "epoch_to_timestamp",
    "add_metadata_columns",
    "null_column_counts",
    "drop_all_null_columns",
    "rows_per_file",
]
