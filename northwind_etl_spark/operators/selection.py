"""Exact distributed selection (k-th smallest / exact median) without
a global sort.

The naive exact median is ORDER BY + OFFSET — a single-task total sort
(the `Exchange SinglePartition` trap global ranking already documents).
`percentile_approx` avoids the sort but is approximate.  This operator
gets the EXACT order statistic with a driver-side binary search over
value space: each pass is one histogram aggregation (map-side
combined, 1024 bins), the driver keeps only the 1024 counts, picks
the bin containing the k-th element, and narrows the range.  A
double's exponent+mantissa range collapses in a handful of passes
(each divides the candidate interval by 1024); ties collapse the
interval to a point immediately.

Per pass: one scan-filter + one tiny aggregation; driver state: 1024
longs.  At 100 TB the scan-filter pushes the narrowed [lo, hi] range
into the parquet row-group stats, so later passes read a shrinking
fraction of the data — the selection gets CHEAPER as it converges.

Verified: tests/test_selection.py (vs numpy.partition on random data,
all-duplicates, k=1/k=n, negative values, convergence-pass bound) and
the oracle-checked `exact_median_order_price` entry (DuckDB ORDER BY
… OFFSET — the unambiguous definition of the k-th element).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_BINS = 1024


def kth_smallest(
    df: DataFrame,
    col: str,
    k: int | None = None,
    *,
    max_passes: int = 12,
) -> tuple[float, int, int]:
    """Exact k-th smallest value of `col` (1-based k; default k =
    (n+1)//2, the lower median).  Returns (value, k, n).

    NULLs are excluded (order statistics over present values).  The
    driver never holds more than the 1024-bin histogram.
    """
    base = df.select(F.col(col).alias("v")).where(F.col("v").isNotNull())
    total = base.count()
    if total == 0:
        raise ValueError("kth_smallest on an empty relation")
    if k is None:
        k = (total + 1) // 2
    if not 1 <= k <= total:
        raise ValueError(f"k={k} outside 1..{total}")

    row = base.agg(F.min("v").alias("lo"), F.max("v").alias("hi")).first()
    lo, hi = float(row.lo), float(row.hi)
    remaining_k = k
    cur = base
    for _ in range(max_passes):
        if lo == hi:
            return lo, k, total
        width = (hi - lo) / _BINS
        if width == 0 or not math.isfinite(width):
            break
        # bin index, clipped into [0, _BINS-1] (hi lands in the last bin)
        b = F.least(
            F.lit(_BINS - 1),
            F.greatest(
                F.lit(0),
                F.floor((F.col("v") - F.lit(lo)) / F.lit(width)).cast("int"),
            ),
        )
        counts = dict(
            cur.where(F.col("v").between(lo, hi))
            .groupBy(b.alias("b"))
            .count()
            .collect()
        )
        cum = 0
        chosen = _BINS - 1
        for i in range(_BINS):
            c = counts.get(i, 0)
            if cum + c >= remaining_k:
                chosen = i
                remaining_k -= cum
                break
            cum += c
        new_lo = lo + chosen * width
        new_hi = hi if chosen == _BINS - 1 else lo + (chosen + 1) * width
        # Guard against float stagnation: if the interval no longer
        # shrinks, the candidates are a handful of adjacent doubles.
        if (new_lo, new_hi) == (lo, hi):
            break
        # The bin predicate is [new_lo, new_hi) except the last bin,
        # which is inclusive — re-anchor on the exact same predicate.
        lo, hi = new_lo, new_hi
        cur = cur.where(
            (F.col("v") >= F.lit(lo))
            & (
                F.col("v") <= F.lit(hi)
                if chosen == _BINS - 1
                else F.col("v") < F.lit(hi)
            )
        )
    # Finish exactly: after the loop the survivors span a handful of
    # adjacent distinct doubles (float stagnation), however many ROWS
    # hold them — so walk the per-distinct-value counts (driver gets
    # one row per distinct survivor value, not per row).
    vals = sorted(
        cur.where(F.col("v").between(lo, hi)).groupBy("v").count().collect(),
        key=lambda r: r.v,
    )
    cum = 0
    for r in vals:
        cum += r["count"]
        if cum >= remaining_k:
            return float(r.v), k, total
    raise AssertionError("selection invariant violated")  # pragma: no cover


def exact_quantile(
    df: DataFrame, col: str, q: float, **kw
) -> tuple[float, int, int]:
    """Exact discrete quantile: the k-th smallest with
    k = max(1, ceil(q·n)) — the `quantile_disc` convention."""
    base = df.select(F.col(col).alias("v")).where(F.col("v").isNotNull())
    n = base.count()
    k = max(1, math.ceil(q * n))
    return kth_smallest(df, col, k, **kw)
