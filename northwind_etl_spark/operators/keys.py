"""Surrogate key generation (K1).

The reference delegates keys to SQL Server ``IDENTITY(1,1)``
(``Project Plan2.md:37``, ``Project Plan5.md:225,239``): dense,
sequential, assigned in insert order.  Spark has no identity columns;
we provide two strategies with explicit scale contracts:

- ``dense_keys``: ``row_number() OVER (ORDER BY natural_key)`` — dense,
  deterministic, oracle-reproducible, but a single-partition sort.
  Correct tool for *dimensions* (small by definition: 8 categories, 77
  products in the reference) and deliberately wrong for facts — the one
  scale-limited operator, documented per SURVEY.md §4.
- ``sparse_keys``: ``monotonically_increasing_id`` — fully parallel,
  unique, NOT dense; for fact-scale keys where density is cosmetic.
  (The reference's own fact key, OrderFactKey BIGINT IDENTITY, is never
  read by any query — sparseness costs nothing.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def dense_keys(df: DataFrame, key_name: str, order_by: str | list[str]) -> DataFrame:
    """Dense 1..N keys by natural-key order. Dimension-scale only."""
    order_cols = [order_by] if isinstance(order_by, str) else list(order_by)
    w = Window.orderBy(*[F.col(c) for c in order_cols])
    return df.withColumn(key_name, F.row_number().over(w).cast("int"))


def sparse_keys(df: DataFrame, key_name: str) -> DataFrame:
    """Unique sparse 64-bit keys, no shuffle, fact-scale safe."""
    return df.withColumn(key_name, F.monotonically_increasing_id())
