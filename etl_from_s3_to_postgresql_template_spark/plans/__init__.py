"""Named query plans: the driver-contract surface.

``registry.QUERIES`` maps query-name -> (spark, sf_dir) -> DataFrame;
``registry.ORACLE`` maps query-name -> equivalent DuckDB SQL. Import the
submodules for their registration side effects.
"""

# Registration order = the order the driver's correctness gate walks the
# registry (it verifies a bounded prefix per round). Round 1 proved the
# §2 core + query_pack surface green (CORRECTNESS_r01.json, 49/49), so
# the not-yet-driver-verified north-star surface (LLM dedup/similarity/
# text, corpus prep, streaming, multimodal, TPC-H extensions) registers
# FIRST this round; the proven core rotates to the back.
from etl_from_s3_to_postgresql_template_spark.plans import registry
from etl_from_s3_to_postgresql_template_spark.plans import llm_ops  # noqa: F401
from etl_from_s3_to_postgresql_template_spark.plans import corpus_ops  # noqa: F401
from etl_from_s3_to_postgresql_template_spark.plans import streaming_ops  # noqa: F401
from etl_from_s3_to_postgresql_template_spark.plans import multimodal_ops  # noqa: F401
from etl_from_s3_to_postgresql_template_spark.plans import query_pack_tpch2  # noqa: F401
from etl_from_s3_to_postgresql_template_spark.plans import query_pack_ext  # noqa: F401
from etl_from_s3_to_postgresql_template_spark.plans import llm_ops2  # noqa: F401
from etl_from_s3_to_postgresql_template_spark.plans import analytics_ops  # noqa: F401
from etl_from_s3_to_postgresql_template_spark.plans import query_pack  # noqa: F401
from etl_from_s3_to_postgresql_template_spark.plans import core_ops  # noqa: F401

QUERIES = registry.QUERIES
ORACLE = registry.ORACLE

__all__ = ["QUERIES", "ORACLE", "registry"]
