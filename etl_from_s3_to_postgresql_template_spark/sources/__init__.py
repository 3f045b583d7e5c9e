from etl_from_s3_to_postgresql_template_spark.sources.registry import TABLES, load_table, load_tables, register_views
from etl_from_s3_to_postgresql_template_spark.sources.csv_ingest import (
    list_files,
    prune_paths_by_date,
    read_csv_auto,
    file_listing_df,
)

__all__ = [
    "TABLES",
    "load_table",
    "load_tables",
    "register_views",
    "list_files",
    "prune_paths_by_date",
    "read_csv_auto",
    "file_listing_df",
]
