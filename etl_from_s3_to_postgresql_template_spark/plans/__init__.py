"""Named query plans: the driver-contract surface.

``registry.QUERIES`` maps query-name -> (spark, sf_dir) -> DataFrame;
``registry.ORACLE`` maps query-name -> equivalent DuckDB SQL. Import the
submodules for their registration side effects.
"""

# Registration order = the order the driver's correctness gate walks the
# registry (it verifies a bounded prefix per round). Round 1 proved the
# §2 core + query_pack surface (CORRECTNESS_r01.json); round 2 proved
# llm_ops/corpus_ops/streaming_ops/multimodal_ops (CORRECTNESS_r02.json).
# Round 3 rotates the remaining never-driver-verified modules to the
# front (tpch2 + ext + llm_ops2 + analytics_ops = 41 entries), followed
# by llm_ops3 (new this round), so every unproven query sits inside the
# gate's checked prefix; proven modules register last.
from etl_from_s3_to_postgresql_template_spark.plans import registry
from etl_from_s3_to_postgresql_template_spark.plans import query_pack_tpch2  # noqa: F401
from etl_from_s3_to_postgresql_template_spark.plans import query_pack_ext  # noqa: F401
from etl_from_s3_to_postgresql_template_spark.plans import llm_ops2  # noqa: F401
from etl_from_s3_to_postgresql_template_spark.plans import analytics_ops  # noqa: F401
from etl_from_s3_to_postgresql_template_spark.plans import llm_ops3  # noqa: F401
from etl_from_s3_to_postgresql_template_spark.plans import llm_ops  # noqa: F401
from etl_from_s3_to_postgresql_template_spark.plans import corpus_ops  # noqa: F401
from etl_from_s3_to_postgresql_template_spark.plans import streaming_ops  # noqa: F401
from etl_from_s3_to_postgresql_template_spark.plans import multimodal_ops  # noqa: F401
from etl_from_s3_to_postgresql_template_spark.plans import query_pack  # noqa: F401
from etl_from_s3_to_postgresql_template_spark.plans import core_ops  # noqa: F401

QUERIES = registry.QUERIES
ORACLE = registry.ORACLE

__all__ = ["QUERIES", "ORACLE", "registry"]
