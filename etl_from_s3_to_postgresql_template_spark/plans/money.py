"""Exact money accumulators shared by the query-pack modules.

Lives in its own module (no ``@query`` registrations) so that importing it
never triggers another module's registry side effects — registration order
is the driver's verification order and must stay under explicit control
(see plans/__init__.py).
"""

from __future__ import annotations

from pyspark.sql import functions as F


def _dec(c):
    """Exact, order-independent money accumulator: cast each row's double to
    DECIMAL(18,6) before SUM. Double summation order differs between Spark
    partitions and the DuckDB oracle, and a half-cent boundary then flips
    ROUND (seen live: 378060.515 at sf0.01). Decimal sums are exact, so the
    pre-round value is bit-identical in both engines; oracles mirror this
    with SUM(CAST(x AS DECIMAL(18,6)))."""
    return c.cast("decimal(18,6)")


def _dsum(c, scale=2):
    return F.round(F.sum(_dec(c)), scale).cast("double")


def _davg(c, scale=2):
    return F.round(F.sum(_dec(c)).cast("double") / F.count(F.lit(1)), scale).cast("double")
