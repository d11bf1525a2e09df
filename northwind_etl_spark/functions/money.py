"""Order-independent money aggregates (see operators/derive.py rationale).

Double summation is order-dependent; a distributed aggregation cannot
promise bit-equal results run-to-run, let alone equal to a single-node
oracle.  Casting each term to DECIMAL(38,6) makes the sum exact and
therefore order-independent — the same trick the reference gets for free
from SQL Server's MONEY type (``Project Plan2.md:54``).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def decimal_sum(col: Column | str, alias: str, *, scale: int = 2) -> Column:
    """SUM as exact decimal → round(scale) → double."""
    return F.round(F.sum(_col(col).cast("decimal(38,6)")), scale).cast("double").alias(alias)


def conditional_decimal(cond: Column, col: Column | str) -> Column:
    """CASE WHEN cond THEN col ELSE 0 END, kept in the decimal domain.

    Both branches are DECIMAL(38,6) so Spark types the whole CASE (and
    any SUM over it) as decimal — writing ``otherwise(lit(0.0))`` would
    widen the CASE to DOUBLE and silently re-introduce order-dependent
    summation for exactly the conditional-aggregate shapes (q8, q14)
    the decimal contract exists for.
    """
    dec = "decimal(38,6)"
    return F.when(cond, _col(col).cast(dec)).otherwise(F.lit(0).cast(dec))


def decimal_avg(col: Column | str, alias: str, *, scale: int = 6) -> Column:
    """AVG: exact decimal sum → double → /count → round(scale).

    The sum is decimal (order-independent); the division happens in
    double with a single well-defined IEEE rounding — decimal *division*
    is avoided because its result scale differs across engines.
    """
    c = _col(col)
    return (
        F.round(F.sum(c.cast("decimal(38,6)")).cast("double") / F.count(c), scale)
        .cast("double")
        .alias(alias)
    )
