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


def group_topk(
    df: DataFrame,
    group_cols: Sequence[str],
    order: Sequence[Column],
    k: int,
    *,
    rank_col: str = "rank",
    salt_buckets: int = 8,
) -> DataFrame:
    """Deterministic top-k PER GROUP without a hot-group window: the
    per-source-top-terms / per-user-top-events shape.  A plain
    row_number window ranks each group's whole population in one task —
    a 10⁹-row group is a straggler.  Here phase 1 ranks within (group,
    hash-salt) slices and keeps ≤ k per slice; phase 2 ranks the
    ≤ salt_buckets·k survivors per group.  The top-k of a partition's
    per-slice top-k's IS the global top-k (the sampling.py::group_sample
    lattice argument — any row in the true top-k is in its slice's
    top-k), so the result equals the single-window form bit-for-bit
    when `order` is a total order; callers must include tie-breaker
    columns, same contract as top_k above.

    The salt hashes the FULL input row (xxhash64 over every column),
    so duplicate order-values spread across slices.
    """
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    ordered = list(order)
    salt = F.pmod(
        F.xxhash64(*[F.col(c) for c in df.columns]), F.lit(salt_buckets)
    )
    salted = df.withColumn("__salt", salt)
    w1 = Window.partitionBy(*group_cols, "__salt").orderBy(*ordered)
    survivors = (
        salted.withColumn("__r1", F.row_number().over(w1))
        .where(F.col("__r1") <= k)
        .drop("__r1", "__salt")
    )
    w2 = Window.partitionBy(*group_cols).orderBy(*ordered)
    return survivors.withColumn(rank_col, F.row_number().over(w2)).where(
        F.col(rank_col) <= k
    )
