"""Filename date extraction as pure Column expressions.

The reference's flagship scalar function (reference ``etl_pipeline.py:27-213``,
~25% of the file) tries 11 regex patterns against a filename and returns the
first match **in pattern-declaration order**, where a pattern only counts as
matched if its captured text parses as a valid date (invalid dates raise
inside the reference's handler and the pattern is skipped —
``etl_pipeline.py:204-206``).

Spark-first re-expression: each pattern becomes a candidate Column built from
``regexp_extract`` + ``to_date``/``to_timestamp`` (strict CORRECTED parser,
ANSI off → invalid parse = NULL = "pattern skipped"), and the
first-match-wins precedence is a single ``coalesce`` over the candidates in
declaration order. The whole thing compiles to one codegen'd expression tree —
no UDF, no driver round-trip — so it can run over billions of
``input_file_name()`` values or any string column.

Precedence parity notes (vs reference ``etl_pipeline.py:206``):

- ``iso_datetime_compact`` shadows ``iso_date`` which shadows ``year_month``
  for the same text; declaration order below is the reference's dict
  insertion order exactly.
- ``date_range`` stores no ``'date'``/``'datetime_obj'`` key in the
  reference, so string/datetime modes yield None for it; here it contributes
  a NULL candidate (which coalesce skips). Unreachable divergence under
  default patterns, because a ``date_range`` match always contains an
  ``iso_date`` match that precedes it.
- ``unix_timestamp`` uses ``datetime.fromtimestamp`` (local TZ) in the
  reference; this engine pins the session to UTC (session.py), so epoch
  extraction is UTC — an intentional determinism fix.
- ``year_month`` string mode returns ``'YYYY-MM'`` (not padded to a day),
  matching the reference; date mode maps it to the first of the month.

Custom patterns (reference ``get_custom_patterns``, ``etl_pipeline.py:234-249``)
are supported via :class:`PatternSpec`. (In the reference, custom pattern
names fall through the handler if/elif chain and are silently ignored — a
latent bug we fix rather than copy.)
"""

from __future__ import annotations

from collections.abc import Sequence
from dataclasses import dataclass

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = [
    "PatternSpec",
    "DEFAULT_PATTERNS",
    "DEFAULT_PATTERN_ORDER",
    "CUSTOM_PATTERNS",
    "extract_date_col",
    "extract_date_str_col",
    "extract_datetime_col",
    "extract_all_dates_col",
    "extract_date_range_col",
]


@dataclass(frozen=True)
class PatternSpec:
    """One filename-date pattern: a regex plus Spark datetime formats.

    ``regex`` must have ≥1 capture group. ``date_fmt`` parses group 1 into a
    date; ``time_fmt`` (optional) parses group 2, in which case the timestamp
    candidate is ``to_timestamp(g1 || ' ' || g2, date_fmt || ' ' || time_fmt)``.
    ``str_expr`` controls the string-mode output: ``"iso"`` (ISO yyyy-MM-dd of
    the parsed date), ``"raw"`` (group 1 verbatim — used by year_month), or
    ``"none"`` (pattern matches but contributes no date — date_range).
    """

    name: str
    regex: str
    date_fmt: str | None = None
    time_fmt: str | None = None
    str_expr: str = "iso"
    epoch: bool = False  # group 1 is epoch seconds
    month_only: bool = False  # group 1 is yyyy-MM; date = first of month

    def _g(self, col: Column, i: int) -> Column:
        return F.regexp_extract(col, self.regex, i)

    def timestamp(self, col: Column) -> Column:
        """Timestamp candidate: NULL unless the regex matches AND parses."""
        if self.epoch:
            g = self._g(col, 1)
            return F.when(g != "", F.timestamp_seconds(g.cast("long")))
        if self.str_expr == "none":
            return F.lit(None).cast("timestamp")
        if self.time_fmt is not None:
            return F.to_timestamp(
                F.when(self._g(col, 1) != "", F.concat_ws(" ", self._g(col, 1), self._g(col, 2))),
                f"{self.date_fmt} {self.time_fmt}",
            )
        if self.month_only:
            return F.to_timestamp(
                F.when(self._g(col, 1) != "", F.concat(self._g(col, 1), F.lit("-01"))),
                "yyyy-MM-dd",
            )
        return F.to_timestamp(F.when(self._g(col, 1) != "", self._g(col, 1)), self.date_fmt)

    def date(self, col: Column) -> Column:
        return self.timestamp(col).cast("date")

    def date_str(self, col: Column) -> Column:
        """Reference string-mode parity: the ``'date'`` dict value."""
        if self.str_expr == "none":
            return F.lit(None).cast("string")
        if self.str_expr == "raw":  # year_month: 'YYYY-MM', only if valid
            return F.when(self.date(col).isNotNull(), self._g(col, 1))
        return F.date_format(self.date(col), "yyyy-MM-dd")


# Declaration order IS the precedence order (reference etl_pipeline.py:43-76).
DEFAULT_PATTERNS: tuple[PatternSpec, ...] = (
    # 2025-02-03T030000
    PatternSpec("iso_datetime_compact", r"(\d{4}-\d{2}-\d{2})T(\d{6})", "yyyy-MM-dd", "HHmmss"),
    # 2025-02-03T03:00:00
    PatternSpec("iso_datetime_full", r"(\d{4}-\d{2}-\d{2})T(\d{2}:\d{2}:\d{2})", "yyyy-MM-dd", "HH:mm:ss"),
    # 2025-02-03
    PatternSpec("iso_date", r"(\d{4}-\d{2}-\d{2})", "yyyy-MM-dd"),
    # 02-03-2025_030000 (MM-DD-YYYY)
    PatternSpec("us_datetime", r"(\d{2}-\d{2}-\d{4})_(\d{6})", "MM-dd-yyyy", "HHmmss"),
    # 02-03-2025
    PatternSpec("us_date", r"(\d{2}-\d{2}-\d{4})", "MM-dd-yyyy"),
    # 20250203
    PatternSpec("compact_date", r"(\d{8})", "yyyyMMdd"),
    # 2025_02_03
    PatternSpec("underscore_date", r"(\d{4}_\d{2}_\d{2})", "yyyy_MM_dd"),
    # 2025.02.03
    PatternSpec("dot_date", r"(\d{4}\.\d{2}\.\d{2})", "yyyy.MM.dd"),
    # 2025-02
    PatternSpec("year_month", r"(\d{4}-\d{2})", "yyyy-MM", str_expr="raw", month_only=True),
    # timestamp_1706918400
    PatternSpec("unix_timestamp", r"timestamp_(\d{10})", epoch=True),
    # 2025-02-03_to_2025-02-10 (no single date; see extract_date_range_col)
    PatternSpec("date_range", r"(\d{4}-\d{2}-\d{2})_to_(\d{4}-\d{2}-\d{2})", str_expr="none"),
)

DEFAULT_PATTERN_ORDER: tuple[str, ...] = tuple(p.name for p in DEFAULT_PATTERNS)

# Business patterns from the reference's get_custom_patterns
# (etl_pipeline.py:234-249), given real handlers here.
CUSTOM_PATTERNS: tuple[PatternSpec, ...] = (
    PatternSpec("sales_daily", r"sales_(\d{4}-\d{2}-\d{2})_daily\.csv", "yyyy-MM-dd"),
    PatternSpec("sales_monthly", r"sales_(\d{4}-\d{2})_monthly\.csv", "yyyy-MM", str_expr="raw", month_only=True),
    PatternSpec("log_file", r"app_(\d{8})_(\d{6})\.log", "yyyyMMdd", "HHmmss"),
    PatternSpec("backup_file", r"backup_(\d{4}_\d{2}_\d{2})_\d{2}_\d{2}_\d{2}\.sql", "yyyy_MM_dd"),
)


def _resolve(patterns: Sequence[PatternSpec] | None) -> Sequence[PatternSpec]:
    return DEFAULT_PATTERNS if patterns is None else patterns


def extract_date_col(col: Column | str, patterns: Sequence[PatternSpec] | None = None) -> Column:
    """DateType: first valid pattern match in declaration order, else NULL."""
    c = F.col(col) if isinstance(col, str) else col
    return F.coalesce(*[p.date(c) for p in _resolve(patterns)])


def extract_date_str_col(col: Column | str, patterns: Sequence[PatternSpec] | None = None) -> Column:
    """String mode, exact reference parity (incl. 'YYYY-MM' for year_month)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.coalesce(*[p.date_str(c) for p in _resolve(patterns)])


def extract_datetime_col(col: Column | str, patterns: Sequence[PatternSpec] | None = None) -> Column:
    """TimestampType: date-only patterns yield midnight UTC."""
    c = F.col(col) if isinstance(col, str) else col
    return F.coalesce(*[p.timestamp(c) for p in _resolve(patterns)])


def extract_all_dates_col(col: Column | str, patterns: Sequence[PatternSpec] | None = None) -> Column:
    """Struct of per-pattern date strings (reference return_format='dict')."""
    c = F.col(col) if isinstance(col, str) else col
    return F.struct(*[p.date_str(c).alias(p.name) for p in _resolve(patterns)])


def extract_date_range_col(col: Column | str) -> Column:
    """Struct(start_date, end_date) for the date_range pattern, else NULL fields."""
    c = F.col(col) if isinstance(col, str) else col
    rx = r"(\d{4}-\d{2}-\d{2})_to_(\d{4}-\d{2}-\d{2})"
    start = F.to_date(F.when(F.regexp_extract(c, rx, 1) != "", F.regexp_extract(c, rx, 1)), "yyyy-MM-dd")
    end = F.to_date(F.when(F.regexp_extract(c, rx, 2) != "", F.regexp_extract(c, rx, 2)), "yyyy-MM-dd")
    return F.struct(start.alias("start_date"), end.alias("end_date"))
