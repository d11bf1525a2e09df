"""Sort + top-k (A3).

Reference A3: ``SELECT TOP 10 ... ORDER BY ExtendedPrice DESC``
(``Project Plan6.md:162``).  Spark plans orderBy+limit as
TakeOrderedAndProject: each partition keeps its local top-k, the driver
merges k·partitions rows — no global sort, no shuffle of the full data.
That is exactly the right physical shape at 100 TB, and we always pass
tie-breaker columns so the selected rowset is deterministic (the driver
hash-compares results; ties broken arbitrarily would flap).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame


def top_k(df: DataFrame, order: Sequence[Column], k: int) -> DataFrame:
    """Deterministic top-k: caller supplies a total order (include unique
    tie-breaker keys)."""
    return df.orderBy(*order).limit(k)
