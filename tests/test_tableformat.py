"""Table-format backend seam: parquet routing unchanged, Delta dep-gated."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_from_s3_to_postgresql_template_spark.sinks.tableformat import (
    BackendUnavailable,
    DeltaBackend,
    ParquetBackend,
    delta_available,
    get_backend,
)
from etl_from_s3_to_postgresql_template_spark.sources.registry import load_table

SF = "/root/testdata/sf0.001"


def test_auto_falls_back_to_parquet_without_delta(spark):
    b = get_backend("auto", spark)
    if delta_available(spark):
        assert b.name == "delta"
    else:
        assert b.name == "parquet"


def test_explicit_delta_fails_loudly_when_absent(spark):
    if delta_available(spark):
        pytest.skip("delta present in this runtime")
    with pytest.raises(BackendUnavailable, match="delta-spark"):
        get_backend("delta", spark)


def test_unknown_backend_rejected():
    with pytest.raises(ValueError, match="unknown table backend"):
        get_backend("hudi")


def test_parquet_backend_merge_routes_to_existing_impl(spark, tmp_path):
    """Backend-routed merge == direct merge_upsert on an identical copy:
    the seam adds no behavior to the parquet path."""
    from etl_from_s3_to_postgresql_template_spark.sinks.merge import merge_upsert

    nation = load_table(spark, SF, "nation")
    a, b = str(tmp_path / "a"), str(tmp_path / "b")
    nation.write.parquet(a)
    nation.write.parquet(b)
    updates = spark.createDataFrame(
        [(0, "RENAMED", 0), (99, "NEWLAND", 1)],
        "n_nationkey long, n_name string, n_regionkey long",
    )
    r1 = ParquetBackend().merge_upsert(spark, a, updates, "n_nationkey")
    r2 = merge_upsert(spark, b, updates, "n_nationkey")
    assert r1 == r2
    da, db = spark.read.parquet(a), spark.read.parquet(b)
    assert da.exceptAll(db).count() == 0 and db.exceptAll(da).count() == 0


def test_parquet_backend_delete_and_compact_route(spark, tmp_path):
    out = str(tmp_path / "tbl")
    load_table(spark, SF, "events").repartition(6).write.parquet(out)
    b = ParquetBackend()
    keys = spark.createDataFrame([(1,), (2,)], "event_id long")
    rep = b.delete_rows(spark, out, keys, "event_id")
    assert rep.rows_deleted == 2
    crep = b.compact(spark, out, target_file_bytes=1 << 30)
    assert crep.files_after == 1
    back = spark.read.parquet(out)
    assert back.where(F.col("event_id").isin([1, 2])).count() == 0


def test_delta_backend_merge_functional(spark, tmp_path):
    """Runs wherever delta-spark + jars exist (not this container): MERGE
    commits atomically and the report matches the parquet backend's shape.
    Dep-gated like the PIL/pyav/kafka tests."""
    pytest.importorskip("delta")
    if not delta_available(spark):
        pytest.skip("delta-spark python package present but jars absent")
    nation = load_table(spark, SF, "nation")
    path = str(tmp_path / "d")
    nation.write.format("delta").save(path)
    updates = spark.createDataFrame(
        [(0, "RENAMED", 0, "x")],
        "n_nationkey long, n_name string, n_regionkey long, n_comment string",
    )
    rep = DeltaBackend().merge_upsert(spark, path, updates, "n_nationkey")
    assert rep.updated == 1 and rep.inserted == 0


# ---------------------------------------------------------------------------
# Iceberg backend (dep-gated: jars absent in this container — structural
# coverage here, functional via tools/integration_matrix.py where present)
# ---------------------------------------------------------------------------


def test_iceberg_unavailable_raises_with_setup_text(spark):
    from etl_from_s3_to_postgresql_template_spark.sinks.tableformat import (
        BackendUnavailable,
        get_backend,
        iceberg_available,
    )

    if iceberg_available(spark):
        pytest.skip("iceberg present in this runtime")
    with pytest.raises(BackendUnavailable) as e:
        get_backend("iceberg", spark)
    assert "iceberg-spark-runtime" in str(e.value)


def test_iceberg_auto_falls_back_to_parquet(spark):
    from etl_from_s3_to_postgresql_template_spark.sinks.tableformat import (
        delta_available,
        get_backend,
        iceberg_available,
    )

    # auto NEVER routes to Iceberg (path-vs-catalog addressing mismatch);
    # only Delta outranks parquet
    if delta_available(spark):
        pytest.skip("delta present; auto prefers it")
    assert get_backend("auto", spark).name == "parquet"


def test_iceberg_sql_builders():
    """The statement shapes are unit-testable without the jars: MERGE with
    and without the delete clause, IN-subquery DELETE (supported by
    Iceberg's extensions, unlike OSS Delta), rewrite_data_files CALL."""
    from etl_from_s3_to_postgresql_template_spark.sinks.tableformat import (
        _iceberg_delete_sql,
        _iceberg_merge_sql,
        _iceberg_rewrite_sql,
    )

    m = _iceberg_merge_sql("cat.db.t", "id", ["v", "w"], None)
    assert "MERGE INTO cat.db.t t" in m
    assert "ON t.id = u.id" in m
    assert "UPDATE SET t.v = u.v, t.w = u.w" in m
    assert "INSERT (id, v, w) VALUES (u.id, u.v, u.w)" in m
    assert "THEN DELETE" not in m
    md = _iceberg_merge_sql("cat.db.t", "id", ["v"], "is_deleted")
    assert "WHEN MATCHED AND u.is_deleted = true THEN DELETE" in md
    # delete clause must precede the update clause (first match wins)
    assert md.index("THEN DELETE") < md.index("UPDATE SET")
    d = _iceberg_delete_sql("cat.db.t", "id")
    assert d == "DELETE FROM cat.db.t WHERE id IN (SELECT id FROM __ib_keys)"
    c = _iceberg_rewrite_sql("cat", "db.t", 128 * 1024 * 1024)
    assert c.startswith("CALL cat.system.rewrite_data_files(")
    assert "'134217728'" in c
