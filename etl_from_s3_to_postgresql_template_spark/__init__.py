"""PySpark-native analytics/ETL engine.

A from-scratch, Spark-first re-expression of the query and data-processing
capabilities of the reference ETL template (an S3 -> PostgreSQL pandas
pipeline; see SURVEY.md), plus the large-scale training-data-pipeline
operators (dedup, similarity search, text analysis, multimodal columns)
required by the north star.

Design stance (SURVEY.md §7): a thin library of Column-builder functions and
lazy DataFrame plan builders. Everything is declarative DataFrame/SQL so
Catalyst handles pushdown, pruning, join selection, and AQE; Python UDFs are
confined to the few operators Spark genuinely cannot express (and are
Arrow-vectorized Pandas UDFs when they exist at all).
"""

from etl_from_s3_to_postgresql_template_spark.session import get_spark

__all__ = ["get_spark"]
