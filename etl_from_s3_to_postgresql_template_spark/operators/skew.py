"""Skew-mitigation: salted join for hot keys.

AQE's skew-join split (on by default, session.py) handles most skew by
splitting oversized shuffle partitions. Salting is the explicit fallback
for the pathological case AQE can't fix: ONE key so hot its single hash
partition exceeds an executor (power-law user_ids, null-heavy keys).

Mechanics: the big side gets a per-ROW salt in [0, n); the small side is
replicated n times (explode over the salt range); the join key becomes
(key, salt). Hot-key rows spread across n tasks; the small side grows n×,
which is fine because salting is only ever applied to a join whose build
side is small. The salt must vary WITHIN a key — deriving it from payload
columns fails exactly on the pathological inputs salting exists for
(identical/null-heavy hot rows would all hash to one salt). Per-row ids
give uniform spread; the join RESULT is salt-independent, so run-to-run
id instability is irrelevant.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["salted_join"]


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join ``big ⋈ small`` on ``on`` with the hot-key pressure spread
    over ``n_salts`` sub-keys. Result set identical to ``big.join(small,
    on, how)``. Only 'inner' and 'left' are valid: right/outer would
    duplicate unmatched small-side rows once per salt."""
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner/left, got {how!r}")
    b = big.withColumn(
        "__salt",
        F.pmod(F.xxhash64(F.monotonically_increasing_id()), F.lit(n_salts)).cast("int"),
    )
    s = small.withColumn("__salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)])))
    out = b.join(s, [on, "__salt"], how)
    return out.drop("__salt")
