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
) -> DataFrame:
    """Deterministic top-k PER GROUP — the per-source-top-terms /
    per-user-top-events shape — as the plain row_number window,
    BECAUSE the engine already makes that form hot-group-proof:
    Spark ≥3.5 plans `row_number() ... WHERE rank <= k` with a
    **WindowGroupLimit(Partial)** below the exchange — every map task
    keeps only its LOCAL top-k per group before anything shuffles, so
    a 10⁹-row group never sorts whole in one task (the map side holds
    ≤ k rows per group per task, the reduce side ≤ k·P).

    Measured (PLANS.md "group_topk" probe): on a 48 M-row single hot
    group + 999 cold groups, this form runs 1.4 s vs 4.5 s for a
    hand-salted two-phase ranking — the manual mitigation pays an
    extra shuffle to re-derive exactly what WindowGroupLimit already
    did.  tests/test_operators.py plan-asserts the Partial
    WindowGroupLimit so an engine regression (or an accidental
    rank-expression change that defeats the rewrite — e.g. rank()
    without the <= filter) fails loudly.

    Callers must pass a total order (include tie-breaker columns) —
    same determinism contract as top_k above.
    """
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    w = Window.partitionBy(*group_cols).orderBy(*order)
    return df.withColumn(rank_col, F.row_number().over(w)).where(
        F.col(rank_col) <= k
    )
