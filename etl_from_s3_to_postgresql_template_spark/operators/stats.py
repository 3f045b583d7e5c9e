"""Footer-stats table statistics: MIN/MAX/COUNT without scanning data.

Parquet footers already store per-row-group min/max/count; Spark's V2
parquet source can answer whole-table MIN/MAX/COUNT aggregates from those
stats alone (`spark.sql.parquet.aggregatePushdown`) — a metadata-only
read that touches zero data pages. At 100 TB that is the difference
between an O(files) planning-time operation and a full scan, and it is
what a lake catalog uses to maintain table-level stats cheaply.

The engine keeps the V1 source globally (the ingest pipeline depends on
V1 dynamic-partition-overwrite semantics; sinks/ParquetSink), so this
operator scopes the V2 + pushdown confs to its own action and restores
them in a finally block. Limitations honestly: pushdown covers numeric /
string min-max and COUNT(*); timestamp min/max does not push in Spark 4
(falls back to a normal scan, still correct); any filter disables it.

Reference scope: the reference's --analyze-dates mode computes exactly
this shape of stats (etl_pipeline.py date-coverage min/max/counts) by
downloading and reading every file; this is the Spark-native form.
"""

from __future__ import annotations

from pyspark.sql import Row, SparkSession
from pyspark.sql import functions as F

__all__ = ["footer_stats", "parquet_rowgroup_stats"]

_V1_KEY = "spark.sql.sources.useV1SourceList"
_PUSH_KEY = "spark.sql.parquet.aggregatePushdown"


def footer_stats(
    spark: SparkSession,
    parquet_path: str,
    min_max_cols: list[str],
    require_pushed: bool = False,
) -> Row:
    """COUNT(*) plus MIN/MAX of ``min_max_cols`` for the parquet table at
    ``parquet_path``, answered from footer statistics (V2 source +
    aggregate pushdown), collected eagerly so the conf scope can't leak.
    Returns one Row: n_rows, min_<c>, max_<c>...

    ``require_pushed=True`` asserts the plan actually pushed the
    aggregate (used by tests; catches silent fallback to a full scan)."""
    prev_v1 = spark.conf.get(_V1_KEY, None)
    prev_push = spark.conf.get(_PUSH_KEY, None)
    spark.conf.set(_V1_KEY, "")
    spark.conf.set(_PUSH_KEY, "true")
    try:
        df = spark.read.parquet(parquet_path)
        aggs = [F.count(F.lit(1)).alias("n_rows")]
        for c in min_max_cols:
            aggs.append(F.min(c).alias(f"min_{c}"))
            aggs.append(F.max(c).alias(f"max_{c}"))
        agg = df.agg(*aggs)
        if require_pushed:
            plan = agg._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("simple")
            )
            if "PushedAggregation: [COUNT(*)" not in plan.replace("\n", " "):
                raise AssertionError(f"aggregate not pushed:\n{plan}")
        return agg.collect()[0]
    finally:
        for key, prev in ((_V1_KEY, prev_v1), (_PUSH_KEY, prev_push)):
            if prev is None:
                spark.conf.unset(key)
            else:
                spark.conf.set(key, prev)


def parquet_rowgroup_stats(spark: SparkSession, paths: list[str]):
    """Row-group zone maps straight from parquet footers, computed
    EXECUTOR-side: distribute the file list, each task opens only the
    footer with pyarrow (no data pages) and emits per-(row_group, column)
    min/max/count. This is the real version of events_zone_map_skip's
    simulated zones — the statistics a lake maintenance job aggregates
    into its catalog, at O(files) cost. The file list parallelizes like
    any DataFrame; at 100 TB with millions of files this runs as a normal
    distributed map, never on the driver.

    Values render as strings (ints/strings verbatim, timestamps
    ISO-formatted) to stay engine-neutral against DuckDB's
    parquet_metadata() oracle."""
    import datetime

    import pandas as pd  # noqa: F811 (executor-side import mirrors module style)

    def render(v) -> str | None:
        if v is None:
            return None
        if isinstance(v, datetime.datetime):
            return v.strftime("%Y-%m-%d %H:%M:%S")
        if isinstance(v, bytes):
            return v.decode("utf-8", "replace")
        return str(v)

    def run(batches):
        import pyarrow.parquet as pq

        for pdf in batches:
            out = []
            for path in pdf["path"]:
                md = pq.ParquetFile(path).metadata
                for rg_i in range(md.num_row_groups):
                    rg = md.row_group(rg_i)
                    for c_i in range(rg.num_columns):
                        col = rg.column(c_i)
                        st = col.statistics
                        out.append(
                            {
                                # path disambiguates multi-file calls:
                                # without it, row groups from different
                                # files collide on (row_group_id, column)
                                "path": path,
                                "row_group_id": rg_i,
                                "column_name": col.path_in_schema,
                                "num_values": col.num_values,
                                "min_value": render(st.min if st else None),
                                "max_value": render(st.max if st else None),
                            }
                        )
            yield pd.DataFrame(
                out,
                columns=[
                    "path",
                    "row_group_id",
                    "column_name",
                    "num_values",
                    "min_value",
                    "max_value",
                ],
            )

    files = spark.createDataFrame([(p,) for p in paths], "path string")
    return files.mapInPandas(
        run,
        "path string, row_group_id long, column_name string, num_values long, "
        "min_value string, max_value string",
    )
