"""As-of join: for each left row, the latest right row at-or-before it.

Spark SQL has no native as-of join (SURVEY §2.5). This composes one from
built-ins: range-join on (by-key, right_ts <= left_ts) + window row_number
to keep the closest right row, then a left join to preserve unmatched left
rows. Everything stays JVM-side.

Scale notes:

- The inner range-join is an equi-join on the `by` key with a range
  predicate — Catalyst executes it as a hash/sort-merge join on the key with
  the range as a post-filter, so per-key fan-out is |left_k| * |right_k|. At
  100 TB with dense keys, bound the fan-out with ``tolerance`` (pre-filters
  right rows to ``left_ts - tolerance``) — this is the same contract as
  ``pandas.merge_asof(tolerance=...)``.
- Alternative physical strategy for extreme per-key density: repartition
  both sides by key, sort within partitions, and run
  ``applyInPandas(pd.merge_asof)`` per key group — O(n log n) instead of
  O(n*m) per key. Provided as ``asof_join_grouped`` below; same semantics,
  chosen by the caller (a cost-based pick needs stats the engine doesn't
  collect yet).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window as W
from pyspark.sql import functions as F

__all__ = ["asof_join", "asof_join_grouped"]


def asof_join(
    left: DataFrame,
    right: DataFrame,
    left_on: str,
    right_on: str,
    left_by: str | None = None,
    right_by: str | None = None,
    tolerance: Column | None = None,
    right_tiebreak: str | None = None,
    left_id: str | None = None,
) -> DataFrame:
    """Left as-of join: latest right row with right_on <= left_on per key.

    ``right_tiebreak``: right column whose descending order breaks exact-ts
    ties deterministically (required for reproducible results when right
    timestamps repeat). ``left_id``: a unique left key column to anchor rows;
    falls back to ``monotonically_increasing_id()`` (stable within one plan
    execution, but prefer a natural key when one exists). Left and right
    column names must be disjoint (rename before calling).
    """
    if left_id is not None:
        lid = left_id
        lkey = left
    else:
        lid = "__asof_lid"
        lkey = left.withColumn(lid, F.monotonically_increasing_id())

    cond = right[right_on] <= lkey[left_on]
    if left_by is not None:
        cond = (lkey[left_by] == right[right_by]) & cond
    if tolerance is not None:
        cond = cond & (right[right_on] >= lkey[left_on] - tolerance)

    order = [F.desc(right_on)]
    if right_tiebreak is not None:
        order.append(F.desc(right_tiebreak))
    w = W.partitionBy(lid).orderBy(*order)

    matched = (
        lkey.join(right, cond, "inner")
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn", *[c for c in lkey.columns if c != lid])
    )
    out = lkey.join(matched, lid, "left")
    if left_id is None:
        out = out.drop(lid)
    if right_by is not None and right_by in out.columns and right_by != left_by:
        out = out.drop(right_by)
    return out


def asof_join_grouped(
    left: DataFrame,
    right: DataFrame,
    left_on: str,
    right_on: str,
    by: str,
    direction: str = "backward",
) -> DataFrame:
    """Per-key sorted-merge as-of via ``applyInPandas(pd.merge_asof)``.

    O(n log n) per key group; the shuffle partitions by ``by`` so each group
    merges locally. Preferred when per-key row counts are large enough that
    the range-join fan-out of :func:`asof_join` dominates.
    """
    import pandas as pd

    lcols = left.columns
    rextra = [c for c in right.columns if c != by and c != right_on]
    out_fields = [f"`{f.name}` {f.dataType.simpleString()}" for f in left.schema.fields]
    out_fields += [
        f"`{f.name}` {f.dataType.simpleString()}"
        for f in right.schema.fields
        if f.name != by
    ]
    out_schema = ", ".join(out_fields)

    def merge(key, lpdf: pd.DataFrame, rpdf: pd.DataFrame) -> pd.DataFrame:
        if lpdf.empty:
            return pd.DataFrame(columns=lcols + [right_on, *rextra])
        lpdf = lpdf.sort_values(left_on)
        if rpdf.empty:
            out = lpdf[lcols].copy()
            for c in [right_on, *rextra]:
                out[c] = None
            return out
        rpdf = rpdf.sort_values(right_on)
        return pd.merge_asof(
            lpdf[lcols],
            rpdf[[right_on, *rextra]],
            left_on=left_on,
            right_on=right_on,
            direction=direction,
        )

    return left.groupBy(by).cogroup(right.groupBy(by)).applyInPandas(merge, out_schema)
