"""Vector column expressions over ArrayType(FloatType) embeddings.

All pure Catalyst higher-order functions (zip_with / aggregate): the
dot product is a sequential left fold in double precision — deterministic
element order, no Python, no shuffle.  For wide batch scoring the
pandas_udf path in operators/similarity.py (numpy matmul over Arrow
batches) is the 100 TB-scale alternative; these expressions are the
zero-dependency baseline and the semantics oracle.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def to_double_expr(vec: Column | str) -> Column:
    return F.transform(_col(vec), lambda x: x.cast("double"))


def dot_expr(a: Column | str, b: Column | str) -> Column:
    """Σ aᵢ·bᵢ as a sequential double fold (cast first: float32 pairs
    multiplied in float would lose bits differently per engine)."""
    prods = F.zip_with(_col(a), _col(b), lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(prods, F.lit(0.0), lambda acc, x: acc + x)


def norm_expr(a: Column | str) -> Column:
    return F.sqrt(dot_expr(a, a))


def cosine_expr(a: Column | str, b: Column | str) -> Column:
    return dot_expr(a, b) / F.nullif(norm_expr(a) * norm_expr(b), F.lit(0.0))
