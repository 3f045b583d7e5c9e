"""P2/K3 driver-visibility entries (plans/core_ops2.py): the named-csv
fixture makes file provenance and the audit row deterministic; pinned
here against the live tables and the real pipeline."""

from __future__ import annotations

import duckdb

from etl_from_s3_to_postgresql_template_spark.plans import ORACLE, QUERIES

from tests.conftest import SF_DIR


def _oracle_sf(name):
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW nation AS SELECT * FROM read_parquet('{SF_DIR}/nation.parquet')"
    )
    return con.execute(ORACLE[name]).fetchall()


def test_project_source_file_parity_mapping(spark):
    rows = QUERIES["project_source_file"](spark, SF_DIR).collect()
    assert len(rows) == 25
    for r in rows:
        want = "nation_even_2024-01-01.csv" if r.n_nationkey % 2 == 0 else "nation_odd_2024-01-01.csv"
        assert r.source_file == want


def test_project_source_file_matches_oracle(spark):
    got = [tuple(r) for r in QUERIES["project_source_file"](spark, SF_DIR).collect()]
    assert got == [tuple(r) for r in _oracle_sf("project_source_file")]


def test_audit_log_row_fields(spark):
    row = QUERIES["audit_log_row"](spark, SF_DIR).collect()
    assert len(row) == 1
    r = row[0]
    assert r.files_processed == 2 and r.files_merged == 2
    assert r.table_name == "nation_day"
    assert r.total_row_count == 25
    assert r.column_count == 7
    assert r.source_files == (
        "nation_even_2024-01-01.csv, nation_odd_2024-01-01.csv"
    )


def test_audit_log_row_matches_oracle(spark):
    got = [tuple(r) for r in QUERIES["audit_log_row"](spark, SF_DIR).collect()]
    assert got == [tuple(r) for r in _oracle_sf("audit_log_row")]
