"""Incremental view maintenance for distributive aggregates.

The batch complement to the streaming rollups and the production form of
``events_tiered_rollup`` (plans/llm_ops4.py): instead of re-aggregating
the whole history every day, combine yesterday's materialized rollup with
today's partial aggregate. Correct for DISTRIBUTIVE aggregates only
(sum / count-as-sum / min / max) — their combine step is the aggregate
itself, so

    agg(days 1..n)  ==  combine(agg(days 1..n-1), agg(day n))

holds exactly (DECIMAL sums keep it exact across partitionings too).
COUNT DISTINCT and exact quantiles are NOT distributive; maintain an HLL
sketch / t-digest column instead, or recompute — refusing them here is a
contract, not a limitation (see plans/llm_ops.py agg_approx_sketches for
the sketch tier).

Idempotent replay: every delta application is tagged with a caller token
(e.g. the day being applied) recorded in a ``_applied`` ledger next to
the rollup. Re-applying an already-applied token is a no-op — the same
guarantee foreachBatch gives the streaming landing sink (streaming/
sink.py), here for batch backfills, so a retried orchestrator step can't
double-count. Scale shape: the combine touches |rollup| + |delta| rows
(rollup tables are aggregate-sized, orders smaller than facts); the
rewrite-and-swap follows sinks/merge.py's safe-swap discipline.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

__all__ = ["RollupSpec", "apply_delta"]


@dataclass
class RollupSpec:
    """Which columns are keys and which are (distributive) measures."""

    keys: list[str]
    sums: list[str] = field(default_factory=list)
    mins: list[str] = field(default_factory=list)
    maxs: list[str] = field(default_factory=list)

    def combine(self, df: DataFrame) -> DataFrame:
        aggs = (
            [F.sum(c).alias(c) for c in self.sums]
            + [F.min(c).alias(c) for c in self.mins]
            + [F.max(c).alias(c) for c in self.maxs]
        )
        return df.groupBy(*self.keys).agg(*aggs)


def _fs(spark: SparkSession, path: str):
    jvm = spark.sparkContext._jvm
    conf = spark.sparkContext._jsc.hadoopConfiguration()
    return (
        jvm.org.apache.hadoop.fs.FileSystem.get(jvm.java.net.URI.create(path), conf),
        jvm.org.apache.hadoop.fs.Path,
    )


def apply_delta(
    spark: SparkSession,
    rollup_path: str,
    delta: DataFrame,
    spec: RollupSpec,
    token: str,
) -> bool:
    """Fold ``delta`` rows (raw or pre-aggregated) into the rollup at
    ``rollup_path`` under ``spec``. Returns True if applied, False if
    ``token`` was already applied (idempotent no-op). First application
    creates the rollup."""
    ledger_path = rollup_path.rstrip("/") + "._applied"
    fs, Path = _fs(spark, rollup_path)

    if fs.exists(Path(ledger_path)):
        applied = {r[0] for r in spark.read.parquet(ledger_path).collect()}
        if token in applied:
            return False

    partial = spec.combine(delta)
    if fs.exists(Path(rollup_path)):
        current = spark.read.parquet(rollup_path)
        merged = spec.combine(current.unionByName(partial))
        tmp = rollup_path.rstrip("/") + ".inc.tmp"
        merged.write.mode("overwrite").parquet(tmp)
        bak = rollup_path.rstrip("/") + ".inc.bak"
        fs.rename(Path(rollup_path), Path(bak))
        if not fs.rename(Path(tmp), Path(rollup_path)):
            fs.rename(Path(bak), Path(rollup_path))
            raise IOError(f"incremental swap failed for {rollup_path}")
        fs.delete(Path(bak), True)
    else:
        partial.write.mode("overwrite").parquet(rollup_path)

    spark.createDataFrame([(token,)], "token string").write.mode("append").parquet(
        ledger_path
    )
    return True
