"""Declarative data-quality rules: expectation checks as ONE aggregate pass.

The reference validates operationally (log lines + the audit table); this is
the engine-native version: each rule compiles to a conditional-count Column,
all rules evaluate in a single scan, and the output is a (rule, violations,
checked) table a pipeline can gate on. No per-rule jobs, no collect-loop —
rule count scales free of data size.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["Rule", "not_null", "unique", "in_set", "in_range", "matches", "check_rules"]


@dataclass(frozen=True)
class Rule:
    name: str
    violation: Column  # boolean Column: TRUE where the row violates
    distinct_on: str | None = None  # set for uniqueness rules


def not_null(column: str) -> Rule:
    return Rule(f"not_null({column})", F.col(column).isNull())


def in_set(column: str, values: tuple) -> Rule:
    return Rule(f"in_set({column})", ~F.col(column).isin(*values) | F.col(column).isNull())


def in_range(column: str, lo: Any, hi: Any) -> Rule:
    return Rule(
        f"in_range({column})",
        F.col(column).isNull() | (F.col(column) < lo) | (F.col(column) > hi),
    )


def matches(column: str, pattern: str) -> Rule:
    return Rule(
        f"matches({column})",
        F.col(column).isNull() | ~F.col(column).rlike(pattern),
    )


def unique(column: str) -> Rule:
    # counted as rows beyond the first occurrence per value
    return Rule(f"unique({column})", F.lit(None), distinct_on=column)


def check_rules(df: DataFrame, rules: list[Rule]) -> DataFrame:
    """Evaluate all rules in one aggregate pass (+one pass per unique rule).
    Returns (rule string, violations long, checked long)."""
    plain = [r for r in rules if r.distinct_on is None]
    uniq = [r for r in rules if r.distinct_on is not None]

    aggs = [F.count(F.lit(1)).alias("__checked")]
    for r in plain:
        aggs.append(F.coalesce(F.sum(r.violation.cast("long")), F.lit(0)).alias(r.name))
    row = df.agg(*aggs).collect()[0]
    checked = row["__checked"]

    results = [(r.name, int(row[r.name]), int(checked)) for r in plain]
    for r in uniq:
        dups = (
            df.groupBy(r.distinct_on)
            .agg(F.count(F.lit(1)).alias("c"))
            .agg(F.coalesce(F.sum(F.col("c") - 1), F.lit(0)).alias("d"))
            .collect()[0]["d"]
        )
        results.append((r.name, int(dups), int(checked)))

    spark = df.sparkSession
    return spark.createDataFrame(results, "rule string, violations long, checked long")
