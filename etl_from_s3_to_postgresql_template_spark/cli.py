"""CLI entry point: the reference's ``main()`` (``etl_pipeline.py:663-727``),
Spark-first.

Same surface: ``--start-date`` / ``--end-date`` / ``--analyze-dates`` with
identical semantics (end defaults to start; ``--analyze-dates`` profiles the
source and exits; start>end and malformed dates abort before any work;
``etl_pipeline.py:680-700``). Source/sink configuration comes from flags
with environment-variable fallbacks mirroring the reference's ``.env`` keys
(``DW_PG_HOST/PORT/DATABASE/USER/PASSWORD``, ``DB_TYPE``;
``etl_pipeline.py:548-560``).

Deviations (deliberate):

- Exit codes are meaningful (0 ok, 1 runtime/config failure, 2 bad args);
  the reference logs and returns success regardless.
- A ``--lake-path`` parquet sink is first-class (the 100-TB landing path)
  and takes PRECEDENCE: when given, it is the sink and JDBC env config is
  ignored. Without it, JDBC engages when the DW_PG_* env is complete —
  like the reference's "skip upload when DB config missing" behavior,
  except we *fail* when neither destination is configured, because a
  pipeline that quietly discards its output is not auditable.

Usage::

    python -m etl_from_s3_to_postgresql_template_spark \
        --source-dir /data/in --start-date 2025-01-15 --lake-path /data/lake
"""

from __future__ import annotations

import argparse
import datetime as dt
import logging
import os
import sys

logger = logging.getLogger("etl_from_s3_to_postgresql_template_spark")


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="etl_from_s3_to_postgresql_template_spark",
        description=(
            "Process source data files, merge by filename date, and load to "
            "a database or parquet lake (Spark-native)"
        ),
    )
    p.add_argument("--start-date", help="Start date (YYYY-MM-DD)")
    p.add_argument(
        "--end-date", help="End date (YYYY-MM-DD, default: same as start-date)", default=None
    )
    p.add_argument(
        "--analyze-dates",
        action="store_true",
        help="Analyze available dates in the source and exit",
    )
    p.add_argument(
        "--source-dir",
        default=os.environ.get("ETL_SOURCE_DIR"),
        help="Source directory or s3a:// prefix (env: ETL_SOURCE_DIR)",
    )
    p.add_argument(
        "--lake-path",
        default=os.environ.get("ETL_LAKE_PATH"),
        help="Parquet lake output path (env: ETL_LAKE_PATH); day-partitioned, idempotent",
    )
    p.add_argument("--table-name", default="table_name", help="Destination table name")
    p.add_argument(
        "--on-error",
        choices=("fail", "skip"),
        default="fail",
        help="Unreadable source files: fail the day (default) or skip-and-count",
    )
    p.add_argument(
        "--env-file",
        default=".env",
        help="KEY=VALUE config file loaded before flags resolve (reference "
        "load_dotenv parity; existing environment wins). Default: ./.env",
    )
    return p


def load_env_file(path: str) -> dict[str, str]:
    """Minimal .env loader (reference etl_pipeline.py:269-284 uses
    python-dotenv; same semantics without the dependency): KEY=VALUE lines,
    '#' comments and blanks skipped, optional single/double quotes
    stripped, EXISTING environment variables are NOT overridden — the
    shell outranks the file, exactly like load_dotenv(override=False)."""
    loaded: dict[str, str] = {}
    if not os.path.isfile(path):
        return loaded
    with open(path, encoding="utf-8") as f:
        for line in f:
            line = line.strip()
            if not line or line.startswith("#") or "=" not in line:
                continue
            key, _, value = line.partition("=")
            key = key.strip()
            value = value.strip()
            if len(value) >= 2 and value[0] == value[-1] and value[0] in "'\"":
                value = value[1:-1]
            if key and key not in os.environ:
                os.environ[key] = value
                loaded[key] = value
    return loaded


class _BadDate(Exception):
    pass


def _parse_day(label: str, value: str) -> dt.date:
    try:
        return dt.date.fromisoformat(value)
    except ValueError:
        raise _BadDate(f"Invalid {label} date format '{value}'. Please use YYYY-MM-DD") from None


def _jdbc_sink_from_env(table_name: str):
    """Reference create_db_engine parity (etl_pipeline.py:548-596): DB_TYPE
    + DW_PG_* env vars -> JdbcSink, or None when config is incomplete."""
    from etl_from_s3_to_postgresql_template_spark.sinks.base import JdbcSink, make_jdbc_url

    host = os.environ.get("DW_PG_HOST")
    port = os.environ.get("DW_PG_PORT")
    database = os.environ.get("DW_PG_DATABASE")
    user = os.environ.get("DW_PG_USER")
    password = os.environ.get("DW_PG_PASSWORD")
    if not all([host, database, user, password]):
        return None
    url = make_jdbc_url(os.environ.get("DB_TYPE", "postgresql"), host, port, database)
    return JdbcSink(url=url, table_name=table_name, properties={"user": user, "password": password})


def main(argv: list[str] | None = None) -> int:
    logging.basicConfig(level=logging.INFO, format="%(asctime)s - %(levelname)s - %(message)s")
    argv = list(sys.argv[1:]) if argv is None else list(argv)
    # .env must load BEFORE the parser builds (env-var flag defaults like
    # ETL_SOURCE_DIR resolve at build time), so pre-scan for --env-file.
    env_file = ".env"
    for i, a in enumerate(argv):
        if a == "--env-file" and i + 1 < len(argv):
            env_file = argv[i + 1]
        elif a.startswith("--env-file="):
            env_file = a.split("=", 1)[1]
    load_env_file(env_file)
    args = build_parser().parse_args(argv)

    if not args.source_dir:
        logger.error("--source-dir (or ETL_SOURCE_DIR) is required")
        return 2

    from etl_from_s3_to_postgresql_template_spark.pipeline import (
        PipelineConfig,
        analyze_dates,
        process_range,
    )
    from etl_from_s3_to_postgresql_template_spark.session import get_spark

    config = PipelineConfig(
        source_dir=args.source_dir, table_name=args.table_name, on_error=args.on_error
    )

    if args.analyze_dates:
        spark = get_spark("analyze-dates")
        rows = analyze_dates(spark, config).collect()
        total = sum(r["file_count"] for r in rows)
        dated = [r for r in rows if r["src_date"] is not None]
        logger.info("Total files: %d", total)
        if dated:
            logger.info(
                "Date range: %s to %s (%d distinct dates)",
                dated[0]["src_date"],
                dated[-1]["src_date"],
                len(dated),
            )
        for r in rows[:20]:
            logger.info("  %s: %d file(s)", r["src_date"], r["file_count"])
        return 0

    if not args.start_date:
        logger.error("--start-date is required unless using --analyze-dates")
        build_parser().print_help()
        return 2

    try:
        start = _parse_day("start", args.start_date)
        end = _parse_day("end", args.end_date) if args.end_date else start
    except _BadDate as e:
        logger.error("%s", e)
        return 2
    if start > end:
        logger.error("Start date (%s) is after end date (%s)", start, end)
        return 2

    if args.lake_path:
        from etl_from_s3_to_postgresql_template_spark.sinks import ParquetSink

        sink = ParquetSink(args.lake_path, table_name=args.table_name)
    else:
        sink = _jdbc_sink_from_env(args.table_name)
        if sink is None:
            logger.error(
                "No sink: provide --lake-path or complete DW_PG_* database "
                "configuration. Refusing to run without a destination."
            )
            return 1

    days = (end - start).days + 1
    logger.info("Processing data from %s to %s (%d day(s))", start, end, days)
    spark = get_spark("ingest")
    results = process_range(spark, config, start.isoformat(), end.isoformat(), sink)
    ok = sum(1 for r in results if r.ok)
    for r in results:
        logger.info(
            "%s: files=%d/%d rows=%d cols=%d%s",
            r.day,
            r.files_processed,
            r.files_found,
            r.total_rows,
            r.column_count,
            f" skipped={r.skipped_files}" if r.skipped_files else "",
        )
    logger.info("PROCESS COMPLETE: %d/%d day(s) successful", ok, days)
    # Meaningful exit status (module docstring deviation 1): a day that HAD
    # matching files but processed none is a failure; a day with no matching
    # files at all is merely empty (normal inside a backfill range) — but if
    # EVERY day is empty/failed, the run produced nothing and that's 1 too.
    failed = [r for r in results if r.files_found > 0 and not r.ok]
    if failed or ok == 0:
        logger.error(
            "Run unsuccessful: %d day(s) failed, %d/%d successful",
            len(failed),
            ok,
            days,
        )
        return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
