"""Query registry: the single source of truth for the driver contract.

Every implemented operator from SURVEY.md §2 registers here under its
Query-name, optionally with a DuckDB oracle SQL twin. Column names are
aliased identically on both sides (the driver's compare hashes values under
sorted column names).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLE: dict[str, str] = {}


# Session confs every query depends on, applied defensively because the
# driver harness builds its OWN SparkSession (entry(spark)) without our
# session.py defaults. All three are runtime-settable:
# - ANSI off: the date cascade relies on invalid-parse -> NULL (Spark 4
#   defaults ANSI on, which would raise instead);
# - UTC: date_format outputs are oracle-compared against UTC-naive DuckDB;
# - nanosAsLong: events.parquet is TIMESTAMP(NANOS).
_REQUIRED_CONFS = {
    "spark.sql.ansi.enabled": "false",
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.legacy.parquet.nanosAsLong": "true",
}


def ensure_session_confs(spark: SparkSession) -> None:
    for k, v in _REQUIRED_CONFS.items():
        spark.conf.set(k, v)


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register a query plan and (optionally) its DuckDB oracle SQL."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query name: {name}")

        def wrapped(spark: SparkSession, sf_dir: str):
            ensure_session_confs(spark)
            return fn(spark, sf_dir)

        wrapped.__name__ = fn.__name__
        wrapped.__doc__ = fn.__doc__
        QUERIES[name] = wrapped
        if oracle is not None:
            ORACLE[name] = oracle
        return fn

    return deco
