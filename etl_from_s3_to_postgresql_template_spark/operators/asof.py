"""As-of join: for each left row, the closest right row at-or-before it
(backward, the default), at-or-after it (forward), or on either side
(nearest) — the full ``pandas.merge_asof`` direction surface.

Spark SQL has no native as-of join (SURVEY §2.5). This composes one from
built-ins: range-join on (by-key, direction predicate) + window row_number
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
    direction: str = "backward",
) -> DataFrame:
    """Left as-of join per key: the closest right row at-or-before
    (``direction='backward'``, the default), at-or-after (``'forward'``),
    or on either side (``'nearest'``) of each left row — the full
    ``pandas.merge_asof`` direction surface, composed from built-ins.

    ``nearest`` breaks equidistant ties toward the EARLIER right row
    (backward), deterministically. ``right_tiebreak``: right column whose
    descending order breaks exact-ts ties (required for reproducible
    results when right timestamps repeat). ``left_id``: a unique left key
    column to anchor rows; falls back to ``monotonically_increasing_id()``
    (stable within one plan execution, but prefer a natural key when one
    exists). Left and right column names must be disjoint (rename before
    calling)."""
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(f"direction must be backward|forward|nearest, got {direction!r}")
    if left_id is not None:
        lid = left_id
        lkey = left
    else:
        lid = "__asof_lid"
        lkey = left.withColumn(lid, F.monotonically_increasing_id())

    if direction == "backward":
        cond = right[right_on] <= lkey[left_on]
        order = [F.desc(right_on)]
    elif direction == "forward":
        cond = right[right_on] >= lkey[left_on]
        order = [F.asc(right_on)]
    else:  # nearest: bounded ONLY by tolerance — require one at scale
        cond = F.lit(True)
        # distance asc; equidistant -> backward (earlier right row) wins.
        # NTZ timestamps don't cast to double directly; go through
        # TIMESTAMP (value-identical under the engine's pinned UTC TZ)
        order = [
            F.abs(
                F.col(right_on).cast("timestamp").cast("double")
                - F.col(left_on).cast("timestamp").cast("double")
            ),
            F.asc(right_on),
        ]
    if left_by is not None:
        cond = (lkey[left_by] == right[right_by]) & cond
    if tolerance is not None:
        if direction == "backward":
            cond = cond & (right[right_on] >= lkey[left_on] - tolerance)
        elif direction == "forward":
            cond = cond & (right[right_on] <= lkey[left_on] + tolerance)
        else:
            cond = cond & (
                (right[right_on] >= lkey[left_on] - tolerance)
                & (right[right_on] <= lkey[left_on] + tolerance)
            )

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
