"""Empty-input hardening: every registered query must plan and execute
against schema-only (0-row) tables without crashing.

Real pipelines hit empty partitions constantly (a day with no files, a
source that produced nothing, a filter that eliminated everything); an
operator that throws on empty input turns a quiet day into a paged
incident. Queries legitimately undefined on empty input (model fitting)
are listed with the reason."""

from __future__ import annotations

import os

import pytest

from etl_from_s3_to_postgresql_template_spark.plans import QUERIES
from etl_from_s3_to_postgresql_template_spark.sources.registry import TABLES, load_table

SF = "/root/testdata/sf0.001"

# genuinely undefined on empty input, with why
SKIP = {
    "similarity_topk_ivf": "KMeans training requires >=1 vector",
    "similarity_ivf_recall_gate": "KMeans training requires >=1 vector",
}

# streaming queries drive their own sources; multimodal/scan read fixture
# files directly — both exercised elsewhere (test_streaming, test_queries)
PREFIX_SKIP = ("streaming_", "scan_")


@pytest.fixture(scope="module")
def empty_sf(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("empty_sf"))
    for t in TABLES:
        df = load_table(spark, SF, t)
        df.limit(0).write.mode("overwrite").parquet(os.path.join(d, f"{t}.parquet"))
    return d


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_survives_empty_tables(spark, empty_sf, name):
    if name in SKIP:
        pytest.skip(SKIP[name])
    if name.startswith(PREFIX_SKIP):
        pytest.skip("drives its own source")
    rows = QUERIES[name](spark, empty_sf).collect()
    assert isinstance(rows, list)
