"""CLI parity tests: argument surface + validation mirror the reference's
main() (etl_pipeline.py:663-727), plus a full run against the e2e fixture."""

from __future__ import annotations

import gzip
import os

import pytest

from etl_from_s3_to_postgresql_template_spark.cli import main
from etl_from_s3_to_postgresql_template_spark.sinks.base import make_jdbc_url


@pytest.fixture(scope="module")
def cli_source(tmp_path_factory):
    d = tmp_path_factory.mktemp("cli_src")
    (d / "sales_2025-02-03.csv").write_text("id,amount\n1,10.5\n2,20.0\n")
    with gzip.open(d / "data_2025-02-04T030000_export.csv.gz", "wt") as f:
        f.write("id,amount\n3,30.0\n")
    return str(d)


def test_missing_source_dir_is_usage_error(monkeypatch):
    monkeypatch.delenv("ETL_SOURCE_DIR", raising=False)
    assert main(["--start-date", "2025-02-03"]) == 2


def test_missing_start_date_is_usage_error(cli_source):
    assert main(["--source-dir", cli_source]) == 2


def test_bad_date_format_is_usage_error(cli_source):
    assert main(["--source-dir", cli_source, "--start-date", "02/03/2025"]) == 2
    assert main(
        ["--source-dir", cli_source, "--start-date", "2025-02-03", "--end-date", "garbage"]
    ) == 2


def test_start_after_end_is_usage_error(cli_source):
    assert (
        main(
            [
                "--source-dir",
                cli_source,
                "--start-date",
                "2025-02-05",
                "--end-date",
                "2025-02-03",
            ]
        )
        == 2
    )


def test_no_sink_refuses_to_run(cli_source, monkeypatch):
    for k in ("DW_PG_HOST", "DW_PG_DATABASE", "DW_PG_USER", "DW_PG_PASSWORD"):
        monkeypatch.delenv(k, raising=False)
    assert main(["--source-dir", cli_source, "--start-date", "2025-02-03"]) == 1


def test_analyze_dates_runs(cli_source, spark):
    assert main(["--source-dir", cli_source, "--analyze-dates"]) == 0


def test_full_run_range_to_lake(cli_source, spark, tmp_path):
    lake = str(tmp_path / "lake")
    rc = main(
        [
            "--source-dir",
            cli_source,
            "--start-date",
            "2025-02-03",
            "--end-date",
            "2025-02-04",
            "--lake-path",
            lake,
            "--table-name",
            "merged",
        ]
    )
    assert rc == 0
    merged = spark.read.parquet(f"{lake}/merged")
    assert merged.count() == 3  # 2 rows day 1 + 1 row day 2
    assert sorted(str(r["dt"]) for r in merged.select("dt").distinct().collect()) == [
        "2025-02-03",
        "2025-02-04",
    ]
    audit = spark.read.parquet(f"{lake}/data_processing_log")
    assert audit.count() == 2  # one audit row per day


def test_failed_day_exits_nonzero(spark, tmp_path):
    """A day whose only matching file is unreadable (on_error=skip drops it,
    zero processed) must exit 1 — the docstring's 'meaningful exit codes'."""
    d = tmp_path / "src"
    d.mkdir()
    # .gz magic bytes absent -> gzip read fails -> skipped -> 0 readable files
    (d / "data_2025-02-03.csv.gz").write_bytes(b"not actually gzip")
    rc = main(
        [
            "--source-dir",
            str(d),
            "--start-date",
            "2025-02-03",
            "--on-error",
            "skip",
            "--lake-path",
            str(tmp_path / "lake"),
        ]
    )
    assert rc == 1


def test_empty_range_exits_nonzero(cli_source, tmp_path):
    """A range where no day matches any file produced nothing: exit 1."""
    rc = main(
        [
            "--source-dir",
            cli_source,
            "--start-date",
            "2024-01-01",
            "--lake-path",
            str(tmp_path / "lake"),
        ]
    )
    assert rc == 1


def test_make_jdbc_url_dialects():
    assert (
        make_jdbc_url("postgresql", "h", None, "db")
        == "jdbc:postgresql://h:5432/db?reWriteBatchedInserts=true"
    )
    assert make_jdbc_url("mysql", "h", 3307, "db").startswith("jdbc:mysql://h:3307/db")
    assert make_jdbc_url("mssql", "h", None, "db") == "jdbc:sqlserver://h:1433;databaseName=db"
    with pytest.raises(ValueError, match="Unsupported database type"):
        make_jdbc_url("oracle", "h", None, "db")


def test_env_file_loading(cli_source, tmp_path, monkeypatch, spark):
    """Reference load_dotenv parity: KEY=VALUE file feeds flag defaults
    (ETL_SOURCE_DIR etc.), quotes are stripped, comments skipped, and a
    real environment variable outranks the file."""
    from etl_from_s3_to_postgresql_template_spark.cli import load_env_file

    monkeypatch.delenv("ETL_SOURCE_DIR", raising=False)
    monkeypatch.delenv("ETL_LAKE_PATH", raising=False)
    monkeypatch.setenv("ALREADY_SET", "env-wins")
    envf = tmp_path / "config.env"
    lake = tmp_path / "lake"
    envf.write_text(
        "# comment line\n"
        f"ETL_SOURCE_DIR={cli_source}\n"
        f'ETL_LAKE_PATH="{lake}"\n'
        "ALREADY_SET=file-loses\n"
        "\n"
        "not a kv line\n"
    )
    loaded = load_env_file(str(envf))
    assert loaded["ETL_SOURCE_DIR"] == cli_source
    assert loaded["ETL_LAKE_PATH"] == str(lake)  # quotes stripped
    assert "ALREADY_SET" not in loaded and os.environ["ALREADY_SET"] == "env-wins"

    # And end-to-end: source dir + lake path come entirely from the file.
    monkeypatch.delenv("ETL_SOURCE_DIR", raising=False)
    monkeypatch.delenv("ETL_LAKE_PATH", raising=False)
    rc = main(["--env-file", str(envf), "--start-date", "2025-02-03", "--table-name", "merged"])
    assert rc == 0
    assert spark.read.parquet(f"{lake}/merged").count() == 2


def test_missing_env_file_is_fine(cli_source, tmp_path):
    from etl_from_s3_to_postgresql_template_spark.cli import load_env_file

    assert load_env_file(str(tmp_path / "nope.env")) == {}


def test_jdbc_target_from_env(monkeypatch):
    from etl_from_s3_to_postgresql_template_spark.sinks.base import jdbc_target_from_env

    monkeypatch.delenv("JDBC_URL", raising=False)
    url, props = jdbc_target_from_env("jdbc:derby:/tmp/x;create=true")
    assert url == "jdbc:derby:/tmp/x;create=true" and props == {}

    monkeypatch.setenv("JDBC_URL", make_jdbc_url("postgresql", "pg.example", None, "lake"))
    monkeypatch.setenv("JDBC_USER", "etl")
    monkeypatch.setenv("JDBC_PASSWORD", "s3cret")
    url, props = jdbc_target_from_env("jdbc:derby:/tmp/x;create=true")
    # the PG-specific batching option must be present in the built URL ...
    assert url == "jdbc:postgresql://pg.example:5432/lake?reWriteBatchedInserts=true"
    # ... and credentials ride as properties, never inside the URL
    assert props == {"user": "etl", "password": "s3cret"}
    assert "s3cret" not in url
