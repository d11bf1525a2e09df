"""Exact distributed selection (k-th smallest / exact median) without
a global sort.

The naive exact median is ORDER BY + OFFSET — a single-task total sort
(the `Exchange SinglePartition` trap global ranking already documents).
`percentile_approx` avoids the sort but is approximate.  This operator
gets the EXACT order statistic with a driver-side binary search over
value space: each pass is one histogram aggregation (map-side
combined, 1024 bins), the driver keeps only the 1024 counts, picks
the bin containing the k-th element, and narrows to that bin.  A
double's exponent+mantissa range collapses in a handful of passes
(each divides the candidate interval by 1024); ties collapse the
interval to a point immediately.

Floating-point discipline: rows are filtered by the SAME bin
expression that produced the counts (`floor((v - lo)/width) ==
chosen`, identical literals), never by re-derived `lo + chosen·width`
bounds — product-form bounds and floor classification can round
differently at bin edges, which would desynchronize the rank
bookkeeping from the surviving rows.  The next pass's [lo, hi] is
then the measured min/max of the survivors (authoritative, not
arithmetic).  Non-finite values (NaN/±inf) have no place on the
histogram number line; the initial scan counts them and raises — the
caller decides how to clean them (the ANSI order-statistic convention
of silently sorting NaN greatest is exactly the kind of silent
semantics this repo's oracles exist to preclude).

Per pass: one filtered histogram aggregation + one min/max of the
survivors; driver state: 1024 longs.  At 100 TB the narrowed range
filter pushes into parquet row-group stats, so later passes read a
shrinking fraction of the data — the selection gets CHEAPER as it
converges.

Verified: tests/test_selection.py (vs numpy.partition on random data,
all-duplicates, k=1/k=n, negative values, adjacent-double stagnation,
NaN/inf rejection, quantile convention) and the oracle-checked
`exact_median_order_price` entry (DuckDB ORDER BY … OFFSET — the
unambiguous definition of the k-th element).
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
    q: float | None = None,
    max_passes: int = 12,
) -> tuple[float, int, int]:
    """Exact k-th smallest value of `col` (1-based k).  Exactly one of
    `k` / `q` may be given; default is the lower median.  With `q`,
    k = max(1, ceil(q·n)) — the `quantile_disc` convention.  Returns
    (value, k, n).

    NULLs are excluded (order statistics over present values);
    NaN/±inf raise.  The driver never holds more than the 1024-bin
    histogram.
    """
    if k is not None and q is not None:
        raise ValueError("pass k or q, not both")
    v = F.col("v")
    base = df.select(F.col(col).alias("v")).where(v.isNotNull())
    # ONE initial job: count, range, and the non-finite census.
    first = base.agg(
        F.count(v).alias("n"),
        F.min(v).alias("lo"),
        F.max(v).alias("hi"),
        F.sum(
            F.when(
                F.isnan(v) | (v == float("inf")) | (v == float("-inf")), 1
            ).otherwise(0)
        ).alias("bad"),
    ).first()
    total = first.n
    if total == 0:
        raise ValueError("kth_smallest on an empty relation")
    if first.bad:
        raise ValueError(
            f"kth_smallest: {first.bad} non-finite value(s) in {col!r};"
            " filter NaN/inf first — they have no place on the"
            " histogram number line"
        )
    if q is not None:
        k = max(1, math.ceil(q * total))
    elif k is None:
        k = (total + 1) // 2
    if not 1 <= k <= total:
        raise ValueError(f"k={k} outside 1..{total}")

    lo, hi = float(first.lo), float(first.hi)
    remaining_k = k
    cur = base
    for _ in range(max_passes):
        if lo == hi:
            return lo, k, total
        width = (hi - lo) / _BINS
        if width == 0 or not math.isfinite(width):
            break
        # THE bin expression — used for both counting and filtering,
        # so classification and survival can never disagree.
        b = F.least(
            F.lit(_BINS - 1),
            F.greatest(
                F.lit(0),
                F.floor((v - F.lit(lo)) / F.lit(width)).cast("int"),
            ),
        )
        counts = dict(cur.groupBy(b.alias("b")).count().collect())
        cum = 0
        chosen = _BINS - 1
        for i in range(_BINS):
            c = counts.get(i, 0)
            if cum + c >= remaining_k:
                chosen = i
                remaining_k -= cum
                break
            cum += c
        cur = cur.where(b == F.lit(chosen))
        # Authoritative bounds for the next pass: the survivors'
        # actual range (never re-derived bin-edge arithmetic).
        row = cur.agg(F.min(v).alias("lo"), F.max(v).alias("hi")).first()
        new_lo, new_hi = float(row.lo), float(row.hi)
        if (new_lo, new_hi) == (lo, hi):
            break  # float stagnation: a handful of adjacent doubles
        lo, hi = new_lo, new_hi
    # Finish exactly: however many ROWS remain, they span few distinct
    # doubles — walk per-distinct-value counts (one row per value).
    vals = sorted(
        cur.groupBy("v").count().collect(), key=lambda r: r.v
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
    """Exact discrete quantile — thin wrapper over kth_smallest(q=q)
    (one scan computes count/range/census; no separate count job)."""
    return kth_smallest(df, col, q=q, **kw)
