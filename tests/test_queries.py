"""Contract-level checks over the full query registry."""

from __future__ import annotations

import pytest

from etl_from_s3_to_postgresql_template_spark.plans import ORACLE, QUERIES

SF = "/root/testdata/sf0.001"


def test_all_oracles_have_queries():
    assert set(ORACLE) <= set(QUERIES)


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_runs_and_has_clean_column_names(spark, name):
    df = QUERIES[name](spark, SF)
    for c in df.columns:
        assert "(" not in c, f"{name}: unaliased computed column {c!r}"
    n = df.count()
    assert n >= 0
    if name not in ("join_anti",):
        assert n > 0, f"{name}: empty result weakens the oracle check"
