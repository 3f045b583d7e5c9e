"""Vector math over array<float|double> columns — pure Column expressions.

North-star extension E2 (similarity search over ``embeddings``). The dot
product / norm / cosine are sequential folds over the array (``F.aggregate``
/ ``F.zip_with``) — JVM-side, and crucially *order-deterministic*, so results
are bit-reproducible and oracle-comparable (cast to double first; float32
accumulation order would otherwise diverge between engines).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = ["as_double_vec", "dot_col", "norm_col", "cosine_col"]


def as_double_vec(v: Column | str) -> Column:
    c = F.col(v) if isinstance(v, str) else v
    return F.transform(c, lambda x: x.cast("double"))


def dot_col(a: Column, b: Column) -> Column:
    """Sequential-fold dot product: sum(a[i]*b[i]) in index order."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm_col(a: Column) -> Column:
    return F.sqrt(dot_col(a, a))


def cosine_col(a: Column, b: Column) -> Column:
    return dot_col(a, b) / (norm_col(a) * norm_col(b))
