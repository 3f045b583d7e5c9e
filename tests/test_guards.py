"""Fail-fast fixture-scale guards on the registered quadratic twins."""

from __future__ import annotations

import numpy as np
import pytest

from etl_from_s3_to_postgresql_template_spark.operators.guards import (
    ENV_VAR,
    FixtureScaleExceeded,
    assert_fixture_scale,
)
from etl_from_s3_to_postgresql_template_spark.plans import QUERIES

SF = "/root/testdata/sf0.001"


def test_guard_passes_small_input(spark):
    df = spark.range(100).toDF("vec_id")
    assert assert_fixture_scale(df, "x") is df


def test_guard_raises_above_bound(spark):
    df = spark.range(25_001).toDF("vec_id")
    with pytest.raises(FixtureScaleExceeded, match="all-pairs"):
        assert_fixture_scale(df, "x", max_rows=25_000)


def test_guard_env_override(spark, monkeypatch):
    df = spark.range(50).toDF("vec_id")
    monkeypatch.setenv(ENV_VAR, "10")
    with pytest.raises(FixtureScaleExceeded):
        assert_fixture_scale(df, "x")
    monkeypatch.setenv(ENV_VAR, "100")
    assert_fixture_scale(df, "x")


@pytest.mark.parametrize("name", ["dedup_embedding_pairs", "split_leakage_scan_exact"])
def test_quadratic_twins_fail_fast_on_oversized_corpus(spark, tmp_path, name, monkeypatch):
    """Pointed at a corpus-scale embeddings table, the registered all-pairs
    twins raise at plan-build time — no pair enumeration starts. 'Corpus
    scale' is planted by lowering the bound instead of writing millions of
    rows: the guard's behavior is identical, only the threshold moves."""
    monkeypatch.setenv(ENV_VAR, "100")
    rng = np.random.default_rng(0)
    emb = spark.createDataFrame(
        [(int(i), [float(x) for x in rng.normal(size=8)]) for i in range(200)],
        "vec_id long, embedding array<float>",
    )
    emb.write.parquet(str(tmp_path / "embeddings.parquet"))
    with pytest.raises(FixtureScaleExceeded):
        QUERIES[name](spark, str(tmp_path))


@pytest.mark.parametrize("name", ["dedup_embedding_pairs", "split_leakage_scan_exact"])
def test_quadratic_twins_still_build_at_fixture_scale(spark, name):
    df = QUERIES[name](spark, SF)
    assert df.count() >= 0
