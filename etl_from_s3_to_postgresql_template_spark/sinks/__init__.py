from etl_from_s3_to_postgresql_template_spark.sinks.base import ParquetSink, JdbcSink, Sink

__all__ = ["ParquetSink", "JdbcSink", "Sink"]
