"""Fail-fast scale guards for fixture-only plans.

Two registered entries are QUADRATIC BY CONSTRUCTION — ``dedup_embedding_
pairs`` and ``split_leakage_scan_exact`` are the all-pairs ground-truth
baselines that the LSH / IVF blocking tiers' recall gates measure
against. They are correct, deliberately registered, and documented as
excluded from the scale sweeps — but documentation does not STOP anyone
from pointing them at a 100 TB corpus, where O(n^2) pair enumeration is
not slow but impossible. This guard makes the contract mechanical: the
plan builder counts its input (bounded probe — ``limit(bound+1).count()``
never scans past the bound) and raises ``FixtureScaleExceeded`` before
any pair is enumerated.

The bound is configurable per call and via ``SPARK_GRAFT_FIXTURE_MAX_
ROWS`` (for a deliberate oversized ground-truth run on a beefy cluster,
raise it explicitly — an informed opt-in instead of a silent quadratic).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame

__all__ = ["FixtureScaleExceeded", "assert_fixture_scale", "DEFAULT_MAX_ROWS", "ENV_VAR"]

DEFAULT_MAX_ROWS = 20_000
ENV_VAR = "SPARK_GRAFT_FIXTURE_MAX_ROWS"


class FixtureScaleExceeded(RuntimeError):
    """An all-pairs ground-truth plan was given corpus-scale input."""


def assert_fixture_scale(
    df: DataFrame, plan_name: str, max_rows: int | None = None
) -> DataFrame:
    """Raise if ``df`` has more than the fixture bound's rows; otherwise
    return it unchanged. Runs one bounded count at plan-BUILD time (the
    probe stops at bound+1 rows, so the guard itself stays O(bound) even
    against a huge table)."""
    bound = max_rows if max_rows is not None else int(os.environ.get(ENV_VAR, DEFAULT_MAX_ROWS))
    n = df.limit(bound + 1).count()
    if n > bound:
        raise FixtureScaleExceeded(
            f"{plan_name} is an all-pairs ground-truth twin (O(n^2) by design): "
            f"input exceeds {bound} rows. Use its blocked production counterpart "
            f"(LSH / IVF tiers) at this scale, or raise {ENV_VAR} to opt in "
            f"explicitly."
        )
    return df
