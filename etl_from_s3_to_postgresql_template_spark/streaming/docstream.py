"""Streaming DOCUMENT ingest: the quality-gate-in-the-stream rung of
the cleaning surface.

``streaming/ingest.py`` covers the events side (windows, state, joins,
recovery); this module adds the file-source documents stream and the
stateless quality-gate projection a production ingest runs BEFORE
anything lands in the lake — every micro-batch passes through the
gopher_rep Arrow kernel and the shape expressions exactly as the batch
plan does, so the drained output hash-matches the batch oracle.

New module by policy (VERDICT r8 item 1): plan-module fingerprints
include one level of in-package imports, so adding this rung to
streaming/ingest.py would have re-queued every stamped streaming_*
entry for a source they don't use.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from etl_from_s3_to_postgresql_template_spark.streaming.ingest import _run_to_memory

#: documents.parquet physical schema (fixed across fixtures)
_DOCS_SCHEMA = "doc_id long, text string, lang string, source string, n_chars long"


def stream_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-source streaming read of the documents table.

    Two fixture layouts exist: the driver fixtures ship
    documents.parquet as a single FILE (stream from sf_dir with a name
    glob — the source's basePath must be a directory), while planted
    test corpora write it as a parquet DIRECTORY (stream from the
    directory itself). Both resolve to the same rows; the check is a
    local-fs probe because every fixture in this harness is local — an
    object-store deployment streams from the directory layout only.

    The declared schema is ASSERTED against a one-off batch footer read
    before streaming starts (ADVICE r9): a streaming source silently
    yields NULL for any declared column the files don't carry, so a
    renamed/retyped fixture column would make the stream diverge from
    its batch oracle at runtime instead of failing loudly here."""
    import os

    from pyspark.sql import types as T

    table = f"{sf_dir}/documents.parquet"
    actual = spark.read.parquet(table).schema
    expected = T.StructType.fromDDL(_DOCS_SCHEMA)
    # sorted: the streaming source resolves columns BY NAME, so a
    # reordered-but-identical physical layout is not drift (review r10)
    got = sorted((f.name, f.dataType) for f in actual.fields)
    want = sorted((f.name, f.dataType) for f in expected.fields)
    if got != want:
        raise ValueError(
            f"documents schema drift: files carry {got}, stream declares {want}"
        )
    rs = spark.readStream.schema(_DOCS_SCHEMA)
    if os.path.isdir(table):
        return rs.parquet(table)
    return rs.option("pathGlobFilter", "documents.parquet").parquet(sf_dir)


def run_quality_gate_stream(
    spark: SparkSession, sf_dir: str, gate_cols
) -> DataFrame:
    """Drain the stateless gate projection over the documents stream.

    ``gate_cols`` is a callable DataFrame -> DataFrame applying the gate
    projection (passed in by the plan module so the gate logic lives in
    ONE place, llm_ops11). Append mode: a stateless projection emits
    every row exactly once; ordering is applied by the caller on the
    drained batch table (sorting is not a streaming operation).
    """
    return _run_to_memory(spark, gate_cols(stream_documents(spark, sf_dir)), "append")
