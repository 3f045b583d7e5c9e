"""Arrow-native parquet DataSource (sources/arrowds.py): pushFilters
contract, in-scanner filtering, residual re-application by Spark,
projection, and parity with Spark's native parquet reader."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest
from pyspark.sql.datasource import (
    EqualTo,
    GreaterThanOrEqual,
    In,
    IsNotNull,
    StringContains,
)

from etl_from_s3_to_postgresql_template_spark.sources.arrowds import (
    ArrowParquetDataSource,
    _ArrowParquetReader,
)


@pytest.fixture()
def planted(spark, tmp_path):
    path = str(tmp_path / "docs.parquet")
    rows = [(i, f"text {i}", "en" if i % 2 else "de", i * 10) for i in range(100)]
    # several files so partition planning is real (one split per file)
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, n_chars long"
    ).repartition(4).write.parquet(path)
    return path


def _register(spark):
    spark.dataSource.register(ArrowParquetDataSource)
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")


def test_pushfilters_accepts_supported_returns_rest_by_reference():
    r = _ArrowParquetReader("/nonexistent", None, 8192)
    supported = [
        GreaterThanOrEqual(("n_chars",), 200),
        EqualTo(("lang",), "en"),
        In(("lang",), ("en", "de")),
        IsNotNull(("text",)),
    ]
    unsupported = [
        StringContains(("text",), "q"),      # not translated
        EqualTo(("a", "b"), 1),              # nested column path
    ]
    residual = list(r.pushFilters(supported + unsupported))
    assert residual == unsupported            # by reference, per the API
    assert [d[0] for d in r.pushed] == [">=", "==", "in", "notnull"]


def test_read_applies_pushed_filters_inside_arrow(spark, planted):
    """Drive the reader directly: after pushFilters, every batch yielded
    by read() must already satisfy the pushed predicates — proof the
    filter runs in the scanner, not in Spark."""
    r = _ArrowParquetReader(planted, ["doc_id", "n_chars"], 8192)
    r.pushFilters([GreaterThanOrEqual(("n_chars",), 500)])
    parts = r.partitions()
    assert len(parts) >= 2  # one split per file
    got = []
    for p in parts:
        for batch in r.read(p):
            assert batch.num_rows > 0
            assert min(batch.column("n_chars").to_pylist()) >= 500
            got += batch.column("doc_id").to_pylist()
    assert sorted(got) == list(range(50, 100))


def test_e2e_matches_native_parquet_with_residual(spark, planted):
    """A WHERE mixing pushable (>=, =) and non-pushable (contains)
    predicates: the source takes the pushable part, Spark re-applies the
    residual — result must equal the native parquet scan bit-for-bit."""
    _register(spark)
    pred = (
        (F.col("n_chars") >= 200)
        & (F.col("lang") == "en")
        & F.col("text").contains("7")
    )
    via_arrow = (
        spark.read.format("arrowparquet")
        .option("path", planted)
        .load()
        .where(pred)
        .orderBy("doc_id")
        .collect()
    )
    native = spark.read.parquet(planted).where(pred).orderBy("doc_id").collect()
    assert [tuple(r) for r in via_arrow] == [tuple(r) for r in native]
    assert len(via_arrow) > 0


def test_projection_option_prunes_schema_and_empty_result(spark, planted):
    _register(spark)
    df = (
        spark.read.format("arrowparquet")
        .option("path", planted)
        .option("columns", "doc_id,lang")
        .load()
    )
    assert df.columns == ["doc_id", "lang"]
    assert df.count() == 100
    # a filter matching nothing flows through as an empty frame
    assert df.where(F.col("doc_id") < 0).count() == 0
