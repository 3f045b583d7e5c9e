"""Banded interval join: the scale path for point-in-interval joins.

A naive `e.ts BETWEEN iv.start AND iv.end` join between two LARGE tables
compiles to BroadcastNestedLoopJoin (or worse, a cartesian) — O(|events| x
|intervals|) comparisons, which is exactly the plan that dies at 100 TB.
The standard fix (Databricks calls it the "range join optimization"; the
same trick underlies interval trees flattened onto a grid): quantize time
into fixed-width bands, explode each interval into the bands it covers,
map each point to its single band, equi-join on the band id, then apply
the exact predicate as a residual filter.

Cost model: shuffle becomes hash-partitioned on band id;
comparisons drop to sum over bands of |points_in_band| x
|intervals_covering_band|. Choose `band_seconds` on the order of the
median interval length — too small explodes the interval side
(end-start)/band rows per interval, too large degrades toward the
nested-loop cross within each band.

No reference parity line: the reference (etl_pipeline.py) has no joins at
all; this operator exists for the north-star event-analytics surface.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

BAND_COL = "__band"


def _band(ts: Column, band_seconds: int) -> Column:
    # unix_timestamp truncates sub-second precision; safe for band
    # ASSIGNMENT (band edges sit on whole multiples of band_seconds, and
    # truncation never moves a timestamp across an integer second, so
    # never across a band edge) while the residual compares full values.
    return F.floor(F.unix_timestamp(ts) / F.lit(band_seconds))


def auto_band_seconds(
    intervals: DataFrame, start_col: str, end_col: str, floor_seconds: int = 60
) -> int:
    """Measure the median interval length and use it as the band width.

    The band-width sweet spot tracks the data, not a constant: bands much
    narrower than the typical interval multiply the interval side by
    (length/band) exploded rows; much wider degrades toward a nested loop
    within each band. The median (percentile_approx over the interval
    frame — one cheap scalar aggregate, the only driver-side value this
    operator ever pulls) lands within 2x of optimal for unimodal length
    distributions, and band choice NEVER affects results (the exact
    predicate is always applied as residual) — only cost. The r3 10x
    stress measured join_interval_banded super-linear (8.7x) with a
    hardcoded 3600 s band; auto-pick removes that class of drift as data
    distributions shift."""
    length = F.unix_timestamp(F.col(end_col)) - F.unix_timestamp(F.col(start_col))
    med = intervals.select(F.percentile_approx(length, 0.5, 1000).alias("m")).first()["m"]
    if med is None or med <= 0:
        return 3600
    return max(floor_seconds, int(med))


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    ts_col: str,
    start_col: str,
    end_col: str,
    band_seconds: int | None = None,
    how: str = "inner",
) -> DataFrame:
    """Join each point row to every interval row with
    start <= ts < end (half-open), via band equi-join.

    `points` and `intervals` must have disjoint column names apart from
    none (the caller aliases); the returned frame has all columns of both
    minus the internal band column. `how` supports 'inner' and
    'left_semi' (points that fall in at least one interval).
    ``band_seconds=None`` auto-picks from the measured median interval
    length (auto_band_seconds).
    """
    if how not in ("inner", "left_semi"):
        raise ValueError(f"unsupported join type: {how}")
    if band_seconds is None:
        band_seconds = auto_band_seconds(intervals, start_col, end_col)
    p = points.withColumn(BAND_COL, _band(F.col(ts_col), band_seconds))
    iv = intervals.withColumn(
        BAND_COL,
        F.explode(
            F.sequence(
                _band(F.col(start_col), band_seconds),
                _band(F.col(end_col), band_seconds),
            )
        ),
    )
    cond = (
        (p[BAND_COL] == iv[BAND_COL])
        & (p[ts_col] >= iv[start_col])
        & (p[ts_col] < iv[end_col])
    )
    joined = p.join(iv, cond, how)
    return joined.drop(BAND_COL)
