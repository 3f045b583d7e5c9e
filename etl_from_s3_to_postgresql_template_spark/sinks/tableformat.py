"""Table-format backend seam: MERGE / compact / delete behind one interface.

The hand-rolled parquet implementations (sinks/merge.py, sinks/compact.py,
sinks/delete.py) are correct and honest about their cost — rewrite-and-swap
with O(|target|) or O(|touched files|) I/O and a documented non-atomic
window. A real table format (Delta / Iceberg) replaces the swap with an
atomic snapshot commit and the file probe with transaction-log pruning.
This module is the seam between the two, in the same dep-gated pattern as
the Kafka builder (streaming/ingest.py) and the PIL/pyav codecs
(operators/multimodal.py): callers pick a backend by name, ``"auto"``
uses Delta when the runtime has it and plain parquet otherwise, and the
parquet path is byte-for-byte the pre-existing implementations (asserted
in tests/test_tableformat.py).

Delta availability means BOTH halves exist: the ``delta-spark`` Python
package AND the Delta jars on the session's classpath (configured at
submit time via ``spark.jars.packages=io.delta:delta-spark_2.13:...`` +
the catalyst extension confs). The container has neither, so the Delta
backend is exercised structurally (selection, gating, error text) here
and functionally wherever the jar exists.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

from etl_from_s3_to_postgresql_template_spark.sinks.compact import (
    CompactionReport,
    compact_parquet,
)
from etl_from_s3_to_postgresql_template_spark.sinks.delete import DeleteReport, delete_rows
from etl_from_s3_to_postgresql_template_spark.sinks.merge import MergeReport, merge_upsert

__all__ = [
    "BackendUnavailable",
    "ParquetBackend",
    "DeltaBackend",
    "IcebergBackend",
    "get_backend",
    "delta_available",
    "iceberg_available",
]


class BackendUnavailable(RuntimeError):
    """The requested table-format backend is not usable in this runtime."""


def delta_available(spark: SparkSession | None = None) -> bool:
    """True when the delta-spark package imports AND (if a session is
    given) the Delta classes are on the JVM classpath."""
    try:
        import delta  # noqa: F401
    except ImportError:
        return False
    if spark is not None:
        try:
            spark.sparkContext._jvm.java.lang.Class.forName(
                "org.apache.spark.sql.delta.DeltaLog"
            )
        except Exception:
            return False
    return True


@dataclass
class ParquetBackend:
    """Plain-parquet backend: exactly the pre-existing rewrite-and-swap
    implementations, unchanged — this class only routes."""

    name: str = "parquet"

    def merge_upsert(
        self,
        spark: SparkSession,
        target_path: str,
        updates: DataFrame,
        key: str,
        delete_col: str | None = None,
    ) -> MergeReport:
        return merge_upsert(spark, target_path, updates, key, delete_col)

    def compact(
        self,
        spark: SparkSession,
        path: str,
        target_file_bytes: int = 128 * 1024 * 1024,
        sort_by: list[str] | None = None,
    ) -> CompactionReport:
        return compact_parquet(spark, path, target_file_bytes, sort_by)

    def delete_rows(
        self, spark: SparkSession, path: str, keys: DataFrame, key_col: str
    ) -> DeleteReport:
        return delete_rows(spark, path, keys, key_col)


@dataclass
class DeltaBackend:
    """Delta Lake backend: the same three operations as ATOMIC snapshot
    commits with log-based file pruning — MERGE touches only files whose
    stats overlap the update keys, delete is a transactional MERGE-style
    rewrite of matched files, compaction is OPTIMIZE's bin-packing. The
    report dataclasses match the parquet backend's so callers swap
    backends without touching call sites."""

    name: str = "delta"

    def _require(self, spark: SparkSession):
        if not delta_available(spark):
            raise BackendUnavailable(
                "Delta backend needs the delta-spark package and the Delta "
                "jars on the classpath (spark.jars.packages=io.delta:"
                "delta-spark_2.13:<ver> plus spark.sql.extensions/"
                "spark.sql.catalog.spark_catalog confs); fall back to "
                "get_backend('parquet') otherwise"
            )
        from delta.tables import DeltaTable

        return DeltaTable

    def merge_upsert(
        self,
        spark: SparkSession,
        target_path: str,
        updates: DataFrame,
        key: str,
        delete_col: str | None = None,
    ) -> MergeReport:
        DeltaTable = self._require(spark)
        dup = updates.groupBy(key).count().where("count > 1").limit(1).count()
        if dup:
            raise ValueError(
                "updates contain duplicate keys; merge would be non-deterministic"
            )
        t = DeltaTable.forPath(spark, target_path)
        tdf = t.toDF()
        # rows_before from the transaction log's per-file stats, not a data
        # scan: COUNT(*) over a Delta table is answered by
        # MetadataOnlyDeltaQuery from AddFile.stats.numRecords (Delta >= 2.2)
        # — O(log), consistent with this backend's log-pruning rationale.
        before = tdf.count()
        m = t.alias("t").merge(updates.alias("u"), f"t.{key} = u.{key}")
        if delete_col is not None:
            m = m.whenMatchedDelete(condition=f"u.{delete_col} = true")
        data_cols = [c for c in tdf.columns if c != key]
        sets = {c: f"u.{c}" for c in data_cols}
        inserts = {key: f"u.{key}", **sets}
        m.whenMatchedUpdate(set=sets).whenNotMatchedInsert(values=inserts).execute()
        # operation metrics from the commit that just ran — no re-scan
        hist = t.history(1).select("operationMetrics").collect()[0][0]
        ins = int(hist.get("numTargetRowsInserted", 0))
        upd = int(hist.get("numTargetRowsUpdated", 0))
        dele = int(hist.get("numTargetRowsDeleted", 0))
        return MergeReport(
            rows_before=int(before),
            rows_after=int(before) + ins - dele,
            inserted=ins,
            updated=upd,
            deleted=dele,
        )

    def compact(
        self,
        spark: SparkSession,
        path: str,
        target_file_bytes: int = 128 * 1024 * 1024,
        sort_by: list[str] | None = None,
    ) -> CompactionReport:
        DeltaTable = self._require(spark)
        conf_key = "spark.databricks.delta.optimize.maxFileSize"
        prev = spark.conf.get(conf_key, None)
        spark.conf.set(conf_key, str(target_file_bytes))
        try:
            t = DeltaTable.forPath(spark, path)
            # file count + table size from DESCRIBE DETAIL (snapshot
            # metadata), not a scan — and bytes_total keeps the parquet
            # backend's meaning (total dataset bytes), not bytes-rewritten
            detail = t.detail().select("numFiles", "sizeInBytes").collect()[0]
            files_before = detail["numFiles"]
            opt = t.optimize()
            res = (
                opt.executeZOrderBy(*sort_by) if sort_by else opt.executeCompaction()
            ).collect()[0]
            metrics = res["metrics"]
            return CompactionReport(
                files_before=int(files_before),
                files_after=int(
                    files_before - metrics.numFilesRemoved + metrics.numFilesAdded
                ),
                bytes_total=int(detail["sizeInBytes"]),
                target_file_bytes=target_file_bytes,
            )
        finally:
            # per-call setting must not leak into later session OPTIMIZEs
            if prev is None:
                spark.conf.unset(conf_key)
            else:
                spark.conf.set(conf_key, prev)

    def delete_rows(
        self, spark: SparkSession, path: str, keys: DataFrame, key_col: str
    ) -> DeleteReport:
        DeltaTable = self._require(spark)
        t = DeltaTable.forPath(spark, path)
        # file count from DESCRIBE DETAIL (snapshot metadata), not a scan
        files_total = t.detail().select("numFiles").collect()[0][0]
        # OSS Delta rejects subqueries in DELETE/UPDATE conditions
        # (AnalysisException "Subqueries are not supported in the DELETE"),
        # so a keyed bulk delete is expressed as MERGE ... whenMatchedDelete:
        # the same log-pruned rewrite of only the files whose stats overlap
        # the key set, one atomic commit, and no bound on |keys| (a literal
        # IN-list would cap out on expression-tree size).
        (
            t.alias("t")
            .merge(
                keys.select(key_col).distinct().alias("u"),
                f"t.{key_col} = u.{key_col}",
            )
            .whenMatchedDelete()
            .execute()
        )
        hist = t.history(1).select("operationMetrics").collect()[0][0]
        return DeleteReport(
            files_total=int(files_total),
            files_touched=int(hist.get("numTargetFilesRemoved", 0)),
            rows_deleted=int(hist.get("numTargetRowsDeleted", 0)),
            rows_rewritten=int(hist.get("numTargetRowsCopied", 0)),
        )


def get_backend(name: str = "auto", spark: SparkSession | None = None):
    """Resolve a table backend: ``"parquet"``, ``"delta"``, ``"iceberg"``,
    or ``"auto"`` (Delta when available, else Iceberg, else parquet — the
    path-addressed backends first, since callers pass filesystem paths
    unless they opted into Iceberg's catalog namespace). An explicit ask
    for an absent backend raises ``BackendUnavailable`` with setup
    instructions rather than silently degrading."""
    if name == "parquet":
        return ParquetBackend()
    if name == "delta":
        if not delta_available(spark):
            raise BackendUnavailable(
                "Delta backend needs the delta-spark package (and the Delta "
                "jars on the classpath); install them or use "
                "get_backend('parquet')"
            )
        return DeltaBackend()
    if name == "iceberg":
        if not iceberg_available(spark):
            raise BackendUnavailable(
                "Iceberg backend needs the iceberg-spark-runtime jar and a "
                "configured Iceberg catalog; install them or use "
                "get_backend('parquet')"
            )
        return IcebergBackend()
    if name == "auto":
        # NOT Iceberg: auto callers pass filesystem paths, and Iceberg is
        # addressed by catalog table identifier — silently routing a path
        # there would fail on every operation. Iceberg is explicit-only.
        return DeltaBackend() if delta_available(spark) else ParquetBackend()
    raise ValueError(
        f"unknown table backend {name!r} (parquet | delta | iceberg | auto)"
    )


def iceberg_available(spark: SparkSession | None = None) -> bool:
    """True when the Iceberg Spark runtime classes are on the JVM
    classpath (``org.apache.iceberg:iceberg-spark-runtime-...`` at submit
    time, plus a configured ``spark.sql.catalog.<name>`` Iceberg catalog).
    Unlike Delta there is no Python package half — Iceberg's Spark
    surface is SQL (MERGE INTO / DELETE FROM / CALL procedures)."""
    if spark is None:
        return False
    try:
        spark.sparkContext._jvm.java.lang.Class.forName(
            "org.apache.iceberg.spark.SparkCatalog"
        )
        return True
    except Exception:
        return False


def _iceberg_merge_sql(
    table: str,
    key: str,
    data_cols: list[str],
    delete_col: str | None,
    view: str = "__ib_updates",
) -> str:
    """MERGE INTO statement for an upsert from a per-call temp view (the
    caller generates a unique name so concurrent merges on one session
    cannot clobber each other's inputs) — split out as a pure function so
    statement shape is unit-tested without the Iceberg jars."""
    sets = ", ".join(f"t.{c} = u.{c}" for c in data_cols)
    cols = ", ".join([key, *data_cols])
    vals = ", ".join(f"u.{c}" for c in [key, *data_cols])
    delete_clause = (
        f"WHEN MATCHED AND u.{delete_col} = true THEN DELETE\n" if delete_col else ""
    )
    return (
        f"MERGE INTO {table} t\n"
        f"USING {view} u\n"
        f"ON t.{key} = u.{key}\n"
        f"{delete_clause}"
        f"WHEN MATCHED THEN UPDATE SET {sets}\n"
        f"WHEN NOT MATCHED THEN INSERT ({cols}) VALUES ({vals})"
    )


def _iceberg_delete_sql(table: str, key_col: str, view: str = "__ib_keys") -> str:
    """Keyed bulk delete. Iceberg's Spark extensions DO support IN-
    subqueries in DELETE (unlike OSS Delta, whose path is MERGE ...
    whenMatchedDelete — see DeltaBackend.delete_rows), so the natural
    statement works and stays unbounded in |keys|."""
    return f"DELETE FROM {table} WHERE {key_col} IN (SELECT {key_col} FROM {view})"


def _iceberg_rewrite_sql(catalog: str, table_no_catalog: str, target_file_bytes: int) -> str:
    """rewrite_data_files maintenance procedure (bin-packing compaction,
    Iceberg's OPTIMIZE analog)."""
    return (
        f"CALL {catalog}.system.rewrite_data_files("
        f"table => '{table_no_catalog}', "
        f"options => map('target-file-size-bytes', '{target_file_bytes}'))"
    )


@dataclass
class IcebergBackend:
    """Apache Iceberg backend: the same three operations as atomic
    snapshot commits via Iceberg's Spark SQL surface. NOTE the addressing
    difference: Iceberg tables live in a configured catalog, so the
    ``target_path``/``path`` arguments are CATALOG TABLE IDENTIFIERS
    (``<catalog>.<db>.<table>``), not filesystem paths — same report
    dataclasses, different namespace (documented loudly because the
    parquet/Delta backends take paths).

    Metrics come from the snapshot summary of the commit just executed
    (``<table>.snapshots``) and file counts from the ``<table>.files``
    metadata table. MERGE attribution (inserted/updated/deleted) cannot
    be read from the summary of a mixed commit, so it is computed with
    key-only count jobs BEFORE the merge — these are extra jobs (pruned
    to the key column, but they do read data) and they assume a SINGLE
    WRITER between the counts and the commit plus unique target keys;
    under concurrent writers the counts describe the pre-merge snapshot,
    while ``rows_after`` is re-read from the commit's own summary."""

    name: str = "iceberg"

    def _require(self, spark: SparkSession) -> None:
        if not iceberg_available(spark):
            raise BackendUnavailable(
                "Iceberg backend needs the iceberg-spark-runtime jar "
                "(spark.jars.packages=org.apache.iceberg:iceberg-spark-"
                "runtime-4.0_2.13:<ver>) plus a configured "
                "spark.sql.catalog.<name> Iceberg catalog; fall back to "
                "get_backend('parquet') otherwise"
            )

    def _last_summary(self, spark: SparkSession, table: str) -> dict:
        # committed_at is millisecond-resolution and can TIE under rapid
        # successive commits — read the CURRENT snapshot deterministically
        # via the current_snapshot_id ref instead of a timestamp sort
        rows = spark.sql(
            f"""SELECT s.summary FROM {table}.snapshots s
                JOIN {table}.refs r ON s.snapshot_id = r.snapshot_id
                WHERE r.name = 'main' LIMIT 1"""
        ).collect()
        if not rows:
            # a freshly created table has no snapshots yet — empty summary,
            # so the bootstrap first merge reads rows_before = 0; keep the
            # timestamp path as fallback for non-main-ref writes, with
            # snapshot_id (monotonic per commit) breaking committed_at ties
            rows = spark.sql(
                f"SELECT summary FROM {table}.snapshots "
                "ORDER BY committed_at DESC, snapshot_id DESC LIMIT 1"
            ).collect()
        return dict(rows[0]["summary"]) if rows else {}

    def merge_upsert(
        self,
        spark: SparkSession,
        target_path: str,
        updates: DataFrame,
        key: str,
        delete_col: str | None = None,
    ) -> MergeReport:
        self._require(spark)
        dup = updates.groupBy(key).count().where("count > 1").limit(1).count()
        if dup:
            raise ValueError(
                "updates contain duplicate keys; merge would be non-deterministic"
            )
        before = int(
            self._last_summary(spark, target_path).get("total-records", 0)
        )
        import uuid

        view = f"__ib_updates_{uuid.uuid4().hex}"
        updates.createOrReplaceTempView(view)
        target_cols = [f.name for f in spark.table(target_path).schema.fields]
        data_cols = [c for c in target_cols if c != key]
        # the snapshot summary cannot separate inserts from deletes in a
        # mixed commit, so attribute rows with key-only counts BEFORE the
        # merge (single-writer assumption — see class docstring):
        n_updates = updates.count()
        matched = (
            spark.table(target_path)
            .join(updates.select(key), key, "left_semi")
            .count()
        )
        deleted = 0
        if delete_col is not None:
            deleted = (
                updates.where(f"{delete_col} = true")
                .join(spark.table(target_path).select(key), key, "left_semi")
                .count()
            )
        try:
            spark.sql(_iceberg_merge_sql(target_path, key, data_cols, delete_col, view))
        finally:
            spark.catalog.dropTempView(view)
        inserted = n_updates - matched
        after = before + inserted - deleted
        summary = self._last_summary(spark, target_path)
        if "total-records" in summary:  # cross-check against the commit
            after = int(summary["total-records"])
        return MergeReport(
            rows_before=before,
            rows_after=after,
            inserted=int(inserted),
            updated=int(matched - deleted),
            deleted=int(deleted),
        )

    def compact(
        self,
        spark: SparkSession,
        path: str,
        target_file_bytes: int = 128 * 1024 * 1024,
        sort_by: list[str] | None = None,
    ) -> CompactionReport:
        self._require(spark)
        if sort_by:
            # sort-order rewrite is a separate procedure; bin-pack only here
            raise ValueError(
                "IcebergBackend.compact is bin-packing only; set the table's "
                "sort order and use rewrite_data_files(strategy => 'sort')"
            )
        files_before = spark.sql(f"SELECT count(*) AS c FROM {path}.files").collect()[0]["c"]
        catalog, _, rest = path.partition(".")
        res = spark.sql(_iceberg_rewrite_sql(catalog, rest, target_file_bytes)).collect()[0]
        rewritten = int(res["rewritten_data_files_count"])
        added = int(res["added_data_files_count"])
        # bytes_total keeps the parquet backend's meaning — TOTAL dataset
        # bytes (metadata read over the files table), not bytes-rewritten
        total_bytes = spark.sql(
            f"SELECT COALESCE(sum(file_size_in_bytes), 0) AS b FROM {path}.files"
        ).collect()[0]["b"]
        return CompactionReport(
            files_before=int(files_before),
            files_after=int(files_before - rewritten + added),
            bytes_total=int(total_bytes),
            target_file_bytes=target_file_bytes,
        )

    def delete_rows(
        self, spark: SparkSession, path: str, keys: DataFrame, key_col: str
    ) -> DeleteReport:
        self._require(spark)
        files_total = spark.sql(f"SELECT count(*) AS c FROM {path}.files").collect()[0]["c"]
        import uuid

        view = f"__ib_keys_{uuid.uuid4().hex}"
        keys.select(key_col).distinct().createOrReplaceTempView(view)
        try:
            spark.sql(_iceberg_delete_sql(path, key_col, view))
        finally:
            spark.catalog.dropTempView(view)
        summary = self._last_summary(spark, path)
        return DeleteReport(
            files_total=int(files_total),
            files_touched=int(summary.get("deleted-data-files", 0)),
            rows_deleted=int(summary.get("deleted-records", 0)),
            rows_rewritten=int(summary.get("added-records", 0)),
        )
